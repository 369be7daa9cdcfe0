"""Explicit configuration — the equivalent of the reference's global argparse
namespace (``my_args.py:13-74``) as side-effect-free dataclasses.

The reference's config module creates directories, truncates log files and
flips cudnn flags at *import* time (``my_args.py:80-124``, called out in
SURVEY.md §1 as a pattern not to replicate).  Here configuration is plain
data; drivers in ``apps/`` own all I/O and build their configs from argparse
via :func:`add_model_flags` + :meth:`ModelConfig.from_args` (the single
source of model-construction defaults).

Defaults mirror ``my_args.py`` where a reference analog exists.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from vfidkr_tpu.training.train_state import TrainConfig  # re-export


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """netName / channels / filter_size / time_step (my_args.py:14-38) plus
    the TPU implementation knobs the reference has no analog for."""
    net_name: str = "DAIN"
    channels: int = 3
    filter_size: int = 4
    time_step: float = 0.5
    # TPU-specific implementation selectors (defaults MUST match the model
    # class defaults in models/dain.py — asserted by tests/test_layers.py)
    filter_impl: str = "slab"        # core warp op; eval drivers pass
                                     # "slab8" (frames on the 8-bit grid)
    compute_dtype: str = "float32"   # "bfloat16" = fast-eval lane (convs in
                                     # bf16, custom ops stay f32-exact)
    depth_impl: str = "chained"      # DAIN_slowmotion MegaDepth evaluation
    steps_impl: str = "unroll"       # DAIN_slowmotion time-step loop;
                                     # "scan" compiles the step once
    pwc_batch_chunk: Optional[int] = 4   # cap PWC's internal conv batch
                                     # (measured eval win at B=4; training
                                     # drivers pass None — see apps/train.py)
    dense_impl: str = "concat"       # PWC dense-block evaluation; training
                                     # drivers pass "split": its BACKWARD is
                                     # 2.5x faster (no concat-grad buffers,
                                     # tools/ubench_trainstep.py round 5);
                                     # eval keeps the reference-shaped
                                     # concat (fwd within noise)

    def build(self):
        from vfidkr_tpu.models import build_model
        kwargs = dict(channel=self.channels, filter_size=self.filter_size,
                      timestep=self.time_step, filter_impl=self.filter_impl,
                      compute_dtype=self.compute_dtype,
                      pwc_batch_chunk=self.pwc_batch_chunk,
                      dense_impl=self.dense_impl)
        if self.net_name == "DAIN_slowmotion":
            kwargs["depth_impl"] = self.depth_impl
            kwargs["steps_impl"] = self.steps_impl
        return build_model(self.net_name, **kwargs)

    @classmethod
    def from_args(cls, args, **overrides):
        """Build from an argparse namespace produced by a parser that went
        through :func:`add_model_flags`; ``overrides`` win over flags."""
        fields = {f.name for f in dataclasses.fields(cls)}
        picked = {k: v for k, v in vars(args).items() if k in fields}
        picked.update(overrides)
        return cls(**picked)


def add_model_flags(ap, filter_impl: str = "slab8",
                    net_name: Optional[str] = None,
                    time_step: Optional[float] = None,
                    depth_impl: str = "chained"):
    """Register the shared model-construction flags on an argparse parser.

    Eval drivers default ``filter_impl`` to "slab8" (decoded frames sit on
    the 8-bit grid, where the single-limb kernel is exact); training keeps
    the any-f32 "slab".  ``net_name``/``time_step`` are registered only when
    a default is supplied (drivers that pin the model omit them).
    """
    if net_name is not None:
        ap.add_argument("--net-name", dest="net_name", default=net_name,
                        choices=["DAIN", "DAIN_slowmotion"])
    if time_step is not None:
        ap.add_argument("--time-step", dest="time_step", type=float,
                        default=time_step)
    ap.add_argument("--filter-impl", dest="filter_impl", default=filter_impl,
                    help="filter_interpolate implementation (slab8: exact "
                         "fast path for 8-bit-grid frames; slab: any-f32; "
                         "block/gather: XLA reference paths)")
    ap.add_argument("--compute-dtype", dest="compute_dtype",
                    default="float32", choices=["float32", "bfloat16"],
                    help="conv compute dtype; bfloat16 is the fast-eval "
                         "lane (custom warp/projection ops stay f32-exact; "
                         "accuracy bound in BASELINE.md)")
    ap.add_argument("--depth-impl", dest="depth_impl", default=depth_impl,
                    choices=["chained", "packed"],
                    help="DAIN_slowmotion MegaDepth evaluation: 'packed' "
                         "(phase-packed, ~1.4x faster, exact to conv "
                         "rounding) or the canonical 'chained'")
    ap.add_argument("--steps-impl", dest="steps_impl", default="unroll",
                    choices=["unroll", "scan"],
                    help="DAIN_slowmotion time-step loop: 'scan' traces the "
                         "per-step subgraph once (fixes the 8x+ compile "
                         "blow-up; values identical)")


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """datasetName / datasetPath / batch_size / workers (my_args.py:18-31)."""
    dataset_name: str = "Vimeo_90K_interp"
    dataset_path: str = ""
    batch_size: int = 3
    crop_hw: Tuple[int, int] = (256, 448)
    augment_train: bool = True
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """save_which + padding policy (my_args.py:40; demo_MiddleBury.py:294)."""
    save_which: int = 1            # 0: blended, 1: rectified
    pad_multiple: int = 128
    min_pad: int = 32


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()


__all__ = ["Config", "ModelConfig", "DataConfig", "TrainConfig", "EvalConfig",
           "add_model_flags"]
