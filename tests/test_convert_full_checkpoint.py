"""Full-checkpoint round trip: build a torch module whose attribute names
mirror the reference DAIN (initScaleNets_filter / flownets / rectifyNet /
ctxNet / initOcclusion / initDeconv_field, networks/DAIN.py:41-65) so
``state_dict()`` produces reference-shaped keys, then run the whole pipeline:
``convert_dain_state_dict`` -> ``filtered_partial_load`` -> DAIN forward.
Covers the end-to-end path used for real ``best.pth`` checkpoints."""
import sys
import types
import importlib.util

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from vfidkr_tpu.convert import convert_dain_state_dict  # noqa: E402
from vfidkr_tpu.models import DAIN  # noqa: E402
from vfidkr_tpu.training.checkpoint import filtered_partial_load  # noqa: E402

from test_convert_structural import (  # noqa: E402
    _mononet5_torch,
    _occnet_torch,
    _randomize,
)

pytestmark = [pytest.mark.parity, pytest.mark.slow]

REF = "/root/reference"


def _ref_pwcnet():
    fake = types.ModuleType("corr")

    class _C(tnn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    fake.Correlation = _C
    pkg = types.ModuleType("PWCNet.correlation_package_pytorch1_0")
    pkg.correlation = fake
    sys.modules["PWCNet.correlation_package_pytorch1_0"] = pkg
    sys.modules["PWCNet.correlation_package_pytorch1_0.correlation"] = fake
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    had_np_int = hasattr(np, "int")
    if not had_np_int:
        np.int = int
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_pwcnet_ckpt", f"{REF}/PWCNet/PWCNet.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.PWCDCNet()
    finally:
        torch.Tensor.cuda = orig_cuda
        if not had_np_int:
            del np.int


def _ref_s2df():
    sys.path.insert(0, REF)
    try:
        from S2D_models.S2DF import S2DF_3dense
        return S2DF_3dense()
    finally:
        sys.path.remove(REF)


def _ref_rectify():
    sys.path.insert(0, REF)
    try:
        from Resblock.BasicBlock import MultipleBasicBlock_4
        return MultipleBasicBlock_4(45, 128)
    finally:
        sys.path.remove(REF)


class FakeDAIN(tnn.Module):
    """Attribute names mirror the reference DAIN (networks/DAIN.py:41-65) so
    state_dict() produces reference-shaped keys."""
    def __init__(self):
        super().__init__()
        trunk = _mononet5_torch()
        self.initScaleNets_filter = trunk
        self.initScaleNets_filter1 = tnn.ModuleList(
            [tnn.Conv2d(16, 16, 3, 1, 1), tnn.ReLU(),
             tnn.Conv2d(16, 16, 3, 1, 1)])
        self.initScaleNets_filter2 = tnn.ModuleList(
            [tnn.Conv2d(16, 16, 3, 1, 1), tnn.ReLU(),
             tnn.Conv2d(16, 16, 3, 1, 1)])
        self.initOcclusion = _occnet_torch()
        self.initDeconv_field = tnn.ModuleList(
            [tnn.Conv2d(3, 64, 3, 1, 1), tnn.ReLU(),
             tnn.Conv2d(64, 128, 3, 1, 1), tnn.ReLU(),
             tnn.Conv2d(128, 32, 3, 1, 1)])
        self.ctxNet = _ref_s2df()
        self.rectifyNet = _ref_rectify()
        self.flownets = _ref_pwcnet()


@pytest.mark.slow
def test_full_dain_checkpoint_roundtrip(rng):
    ref = _randomize(FakeDAIN(), scale=0.1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # expected reference key shapes present
    assert "initScaleNets_filter.0.weight" in sd
    assert "flownets.conv1a.0.weight" in sd
    assert "rectifyNet.block1.0.weight" in sd

    converted = convert_dain_state_dict(sd)

    model = DAIN()
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    init_vars = jax.device_get(model.init(jax.random.PRNGKey(0), x, x))
    merged, loaded, skipped = filtered_partial_load(init_vars, converted)
    # every converted tensor must land except the reference's dead deconv2
    # (defined at PWCNet.py:126 but never called in forward -> our flax net
    # never materialises it; reference checkpoints carry it anyway)
    assert all(p[:3] == ("params", "flownets", "deconv2") for p in skipped), \
        f"unexpectedly skipped: {skipped[:5]}"
    assert len(loaded) == 225   # every reference tensor except dead deconv2

    out = model.apply(merged, x, x)
    assert np.isfinite(np.asarray(out["outputs"][1])).all()
    # loaded params actually changed the output vs fresh init
    out0 = model.apply(init_vars, x, x)
    assert float(jnp.abs(out["outputs"][1] - out0["outputs"][1]).max()) > 1e-4


@pytest.mark.slow
def test_inverse_converter_roundtrip(rng):
    """invert_dain_state_dict (flax -> torch layout) must be the exact
    inverse of convert_dain_state_dict: exporting our init params and
    re-converting reproduces them bit-for-bit, and converting a torch
    state_dict then exporting it back reproduces every covered torch key."""
    from vfidkr_tpu.convert import invert_dain_state_dict

    ref = _randomize(FakeDAIN(), scale=0.1)
    ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = DAIN()
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    init_vars = jax.device_get(model.init(jax.random.PRNGKey(0), x, x))

    # flax -> torch -> flax: bit-exact on every exported tensor
    exported, missing = invert_dain_state_dict(init_vars, ref_sd)
    assert len(exported) == 225            # all but the dead deconv2 pair
    assert sorted(missing) == sorted(
        ["flownets.deconv2.weight", "flownets.deconv2.bias"])
    back = convert_dain_state_dict({**ref_sd, **exported})
    n_checked = 0
    for path, leaf in _walk(back):
        src = init_vars
        for k in path:
            if not isinstance(src, dict) or k not in src:
                src = None
                break
            src = src[k]
        if src is None:
            continue                        # dead deconv2
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(src, np.float32),
                                      err_msg="/".join(path))
        n_checked += 1
    assert n_checked == 225

    # torch -> flax -> torch: every covered torch key reproduced bit-exactly
    converted = convert_dain_state_dict(ref_sd)
    re_exported, _ = invert_dain_state_dict(converted, ref_sd)
    for k, v in re_exported.items():
        np.testing.assert_array_equal(v, np.asarray(ref_sd[k], np.float32),
                                      err_msg=k)


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree
