"""Config dataclasses: defaults must track the model classes, and the
argparse glue (add_model_flags + ModelConfig.from_args) must round-trip —
the drivers in apps/ build their models exclusively through this path."""
import argparse
import dataclasses

from vfidkr_tpu.config import Config, ModelConfig, add_model_flags
from vfidkr_tpu.models import DAIN, DAINSlowMotion


def test_model_config_defaults_match_model_classes():
    """ModelConfig is the single source of construction defaults; a drifted
    default (round-3 verdict: filter_impl 'block' vs models 'slab') would
    silently change what drivers run."""
    mc = ModelConfig()
    for field in ("filter_size", "filter_impl", "compute_dtype"):
        model_default = DAIN.__dataclass_fields__[
            "channel" if field == "channels" else field].default
        assert getattr(mc, field) == model_default, field
    assert mc.channels == DAIN.__dataclass_fields__["channel"].default
    assert mc.time_step == 0.5
    assert (mc.depth_impl ==
            DAINSlowMotion.__dataclass_fields__["depth_impl"].default)


def test_from_args_round_trip_and_overrides():
    ap = argparse.ArgumentParser()
    add_model_flags(ap, net_name="DAIN", time_step=0.5)
    args = ap.parse_args(["--compute-dtype", "bfloat16",
                          "--filter-impl", "slab8"])
    mc = ModelConfig.from_args(args)
    assert mc.net_name == "DAIN"
    assert mc.compute_dtype == "bfloat16"
    assert mc.filter_impl == "slab8"
    # overrides win over parsed flags (drivers pin net_name/time_step)
    mc2 = ModelConfig.from_args(args, net_name="DAIN_slowmotion",
                                time_step=0.25)
    assert mc2.net_name == "DAIN_slowmotion" and mc2.time_step == 0.25


def test_build_constructs_models_with_flags():
    m = ModelConfig(filter_impl="slab8", compute_dtype="bfloat16").build()
    assert isinstance(m, DAIN)
    assert m.filter_impl == "slab8" and m.compute_dtype == "bfloat16"

    ms = ModelConfig(net_name="DAIN_slowmotion", time_step=0.25,
                     depth_impl="packed").build()
    assert isinstance(ms, DAINSlowMotion)
    assert ms.timestep == 0.25 and ms.depth_impl == "packed"


def test_config_tree_is_plain_frozen_data():
    cfg = Config()
    assert dataclasses.is_dataclass(cfg.model)
    # frozen: assignment raises (the reference's my_args mutates globals)
    try:
        cfg.model.net_name = "x"   # type: ignore[misc]
        raise AssertionError("ModelConfig must be frozen")
    except dataclasses.FrozenInstanceError:
        pass
