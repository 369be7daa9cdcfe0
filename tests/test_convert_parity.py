"""End-to-end weight-conversion parity: run the *reference* torch modules on
CPU with random weights, convert the state_dicts, and require matching outputs
from our flax modules.  Covers S2DF, the rectifier, the MegaDepth hourglass,
and the full PWC-Net (with the reference's CUDA correlation/warp emulated in
pure torch)."""
import sys
import types
import importlib.util

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vfidkr_tpu import convert as C  # noqa: E402
from vfidkr_tpu.models import (  # noqa: E402
    MegaDepthHourglass,
    MultipleBasicBlock,
    PWCDCNet,
    S2DF,
)

pytestmark = pytest.mark.parity

REF = "/root/reference"


def _state_dict_np(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _randomize(m, seed=0, scale=0.2):
    """Random but tame weights: large activations turn f32 accumulation-order
    noise into large absolute output differences."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_((torch.rand(p.shape, generator=g) - 0.5) * scale)
    return m


def test_s2df_parity(rng):
    sys.path.insert(0, REF)
    try:
        from S2D_models.S2DF import S2DF_3dense
    finally:
        sys.path.remove(REF)
    ref = _randomize(S2DF_3dense()).eval()
    x = rng.rand(1, 3, 32, 48).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)

    params = C.convert_s2df(_state_dict_np(ref))
    got = S2DF(3, True, True).apply({"params": params},
                                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_rectifier_parity(rng):
    sys.path.insert(0, REF)
    try:
        from Resblock.BasicBlock import MultipleBasicBlock_4
    finally:
        sys.path.remove(REF)
    ref = _randomize(MultipleBasicBlock_4(45, 128)).eval()
    x = rng.rand(1, 45, 16, 16).astype(np.float32) * 0.1
    want = ref(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)

    params = C.convert_resblock(_state_dict_np(ref))
    got = MultipleBasicBlock(4, 128).apply({"params": params},
                                           jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_megadepth_parity(rng):
    spec = importlib.util.spec_from_file_location(
        "pds", f"{REF}/MegaDepth/pytorch_DIW_scratch.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.pytorch_DIW_scratch.eval()
    # randomize BN running stats + affine params so conversion is exercised
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.rand(m.running_mean.shape, generator=g) - 0.5)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)

    params, stats = C.convert_megadepth(_state_dict_np(ref))
    got = MegaDepthHourglass().apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


class _TorchCorrelation(torch.nn.Module):
    """Pure-torch stand-in for the reference CUDA Correlation op (same math:
    81 zero-padded shifted channel-mean dot products)."""

    def __init__(self, pad_size=4, kernel_size=1, max_displacement=4,
                 stride1=1, stride2=1, corr_multiply=1):
        super().__init__()
        self.md = max_displacement

    def forward(self, f1, f2):
        md = self.md
        b, c, h, w = f1.shape
        f2p = F.pad(f2, (md, md, md, md))
        outs = []
        for tj in range(-md, md + 1):
            for ti in range(-md, md + 1):
                shifted = f2p[:, :, md + tj:md + tj + h, md + ti:md + ti + w]
                outs.append((f1 * shifted).sum(1) / c)
        return torch.stack(outs, dim=1)


@pytest.mark.slow
def test_pwcnet_parity(rng):
    # the reference PWCNet module imports the CUDA correlation package and
    # allocates its warp grid with .cuda(); emulate both on CPU
    fake = types.ModuleType("PWCNet.correlation_package_pytorch1_0.correlation")
    fake.Correlation = _TorchCorrelation
    pkg = types.ModuleType("PWCNet.correlation_package_pytorch1_0")
    pkg.correlation = fake
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    orig_float_tensor = getattr(torch.cuda, "FloatTensor", None)
    torch.cuda.FloatTensor = torch.FloatTensor   # attr exists but raises on CPU
    had_np_int = hasattr(np, "int")
    if not had_np_int:
        np.int = int    # the reference uses the long-removed np.int alias
    sys.path.insert(0, REF)
    sys.modules["PWCNet.correlation_package_pytorch1_0"] = pkg
    sys.modules["PWCNet.correlation_package_pytorch1_0.correlation"] = fake
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_pwcnet", f"{REF}/PWCNet/PWCNet.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref = mod.PWCDCNet().eval()

        with torch.no_grad():   # tame random weights so activations stay sane
            for p in ref.parameters():
                p.mul_(0.5)

        h, w = 64, 128
        x = rng.rand(1, 6, h, w).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    finally:
        sys.path.remove(REF)
        torch.Tensor.cuda = orig_cuda
        if orig_float_tensor is not None:
            torch.cuda.FloatTensor = orig_float_tensor
        if not had_np_int:
            del np.int

    params = C.convert_pwcnet(_state_dict_np(ref))
    im1 = jnp.asarray(x[:, :3].transpose(0, 2, 3, 1))
    im2 = jnp.asarray(x[:, 3:].transpose(0, 2, 3, 1))
    got = PWCDCNet().apply({"params": params}, im1, im2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
