"""Shared infrastructure for *full-graph* parity tests: load the reference
torch models (networks/DAIN.py, networks/DAIN_slowmotion.py) on CPU with their
CUDA extension modules replaced by vectorized NumPy emulations of the same
kernel math.

The emulations here are fast, vectorized re-statements of the loop oracles in
``tests/golden.py`` (which stay the ground truth for the op-level tests);
``test_emu_matches_golden`` in test_full_graph_parity.py pins them together.

Cited reference semantics:
  - FilterInterpolation ``_ori``: filterinterpolation_cuda_kernel.cu:2692-2823
  - FlowProjection: flowprojection_cuda_kernel.cu:29-234
  - DepthFlowProjection: depthflowprojection_cuda_kernel.cu:29-238
"""

from __future__ import annotations

import contextlib
import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


# ---------------------------------------------------------------------------
# Vectorized NumPy emulations (HWC, flow channels (fx, fy))
# ---------------------------------------------------------------------------

def np_filter_interpolate(image, flow, filt, fs=4):
    """Vectorized filter_interpolate_fwd (golden.py:16-49)."""
    h, w, c = image.shape
    half = fs // 2
    fx = flow[..., 0].astype(np.float32)
    fy = flow[..., 1].astype(np.float32)
    xx = np.arange(w, dtype=np.float32)[None, :]
    yy = np.arange(h, dtype=np.float32)[:, None]
    x2 = xx + fx
    y2 = yy + fy
    valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1)
             & (np.abs(fx) < w / 2.0) & (np.abs(fy) < h / 2.0))
    x2s = np.clip(x2, 0, w - 1)
    y2s = np.clip(y2, 0, h - 1)
    ix = x2s.astype(np.int32)   # trunc == floor for the valid (>=0) range
    iy = y2s.astype(np.int32)
    alpha = x2s - ix
    beta = y2s - iy
    out = np.zeros((h, w, c), np.float32)
    for dj in range(fs):
        wy = beta if dj >= half else 1.0 - beta
        ty = np.clip(iy + 1 - half + dj, 0, h - 1)
        for di in range(fs):
            wx = alpha if di >= half else 1.0 - alpha
            tx = np.clip(ix + 1 - half + di, 0, w - 1)
            wgt = filt[..., dj * fs + di] * wx * wy
            out += image[ty, tx] * wgt[..., None]
    return np.where(valid[..., None], out, image).astype(np.float32)


def _landing_np(flow):
    h, w = flow.shape[:2]
    fx = flow[..., 0].astype(np.float32)
    fy = flow[..., 1].astype(np.float32)
    x2 = np.arange(w, dtype=np.float32)[None, :] + fx
    y2 = np.arange(h, dtype=np.float32)[:, None] + fy
    valid = (x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1)
    ix_l = np.clip(x2, 0, w - 1).astype(np.int32)
    iy_t = np.clip(y2, 0, h - 1).astype(np.int32)
    ix_r = np.minimum(ix_l + 1, w - 1)
    iy_b = np.minimum(iy_t + 1, h - 1)
    return fx, fy, valid, ix_l, ix_r, iy_t, iy_b


def np_fill_holes(cnt, out):
    """Vectorized fill_holes_ref (golden.py:150-189): nearest filled cell in
    each cardinal direction, averaged over the directions that exist."""
    h, w = cnt.shape
    filled = cnt > 0

    def directional(filled, out, axis, reverse):
        if reverse:
            v, e = directional(np.flip(filled, axis), np.flip(out, axis),
                               axis, False)
            return np.flip(v, axis), np.flip(e, axis)
        idx = np.where(filled,
                       np.arange(filled.shape[axis]).reshape(
                           (-1, 1) if axis == 0 else (1, -1)),
                       -1)
        pos = np.maximum.accumulate(idx, axis=axis)
        exists = pos >= 0
        safe = np.clip(pos, 0, None)
        if axis == 0:
            vals = out[safe, np.arange(w)[None, :]]
        else:
            vals = out[np.arange(h)[:, None], safe]
        return vals, exists

    lv, le = directional(filled, out, 1, False)
    rv, re_ = directional(filled, out, 1, True)
    uv, ue = directional(filled, out, 0, False)
    dv, de = directional(filled, out, 0, True)
    num = sum(e[..., None] * v for e, v in
              ((le, lv), (re_, rv), (ue, uv), (de, dv))).astype(np.float32)
    den = sum(e.astype(np.float32) for e in (le, re_, ue, de))
    fill = np.where(den[..., None] > 0, num / np.maximum(den, 1)[..., None], out)
    return np.where(filled[..., None], out, fill).astype(np.float32)


def np_flow_project(flow, fill=False):
    """Vectorized flow_project_fwd (golden.py:116-133)."""
    h, w = flow.shape[:2]
    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = _landing_np(flow)
    acc = np.zeros((h, w, 2), np.float32)
    cnt = np.zeros((h, w), np.float32)
    v = valid.astype(np.float32)
    vals = np.stack([-fx * v, -fy * v], -1)
    for ty, tx in ((iy_t, ix_l), (iy_t, ix_r), (iy_b, ix_l), (iy_b, ix_r)):
        np.add.at(acc, (ty, tx), vals)
        np.add.at(cnt, (ty, tx), v)
    out = np.where(cnt[..., None] > 0,
                   acc / np.maximum(cnt, 1)[..., None], 0.0).astype(np.float32)
    if fill:
        out = np_fill_holes(cnt, out)
    return out, cnt


def np_depth_flow_project(flow, depth_inv, fill=False):
    """Vectorized depth_flow_project_fwd (golden.py:192-211)."""
    h, w = flow.shape[:2]
    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = _landing_np(flow)
    d = depth_inv.astype(np.float32) * valid.astype(np.float32)
    acc = np.zeros((h, w, 2), np.float32)
    cnt = np.zeros((h, w), np.float32)
    vals = np.stack([-fx * d, -fy * d], -1)
    for ty, tx in ((iy_t, ix_l), (iy_t, ix_r), (iy_b, ix_l), (iy_b, ix_r)):
        np.add.at(acc, (ty, tx), vals)
        np.add.at(cnt, (ty, tx), d)
    out = np.where(cnt[..., None] > 0,
                   acc / np.maximum(cnt, 1e-30)[..., None], 0.0).astype(np.float32)
    if fill:
        out = np_fill_holes(cnt, out)
    return out, cnt


# ---------------------------------------------------------------------------
# torch module stubs for the my_package CUDA extensions
# ---------------------------------------------------------------------------

def _make_stub_modules(torch):
    def to_np(t):
        return t.detach().cpu().numpy()

    def per_batch(fn, *tensors):
        outs = [fn(*(to_np(t[b]).transpose(1, 2, 0) for t in tensors))
                for b in range(tensors[0].shape[0])]
        return torch.from_numpy(
            np.stack([o.transpose(2, 0, 1) for o in outs]))

    class FilterInterpolationModule(torch.nn.Module):
        def forward(self, image, flow, filt):
            return per_batch(np_filter_interpolate, image, flow, filt)

    class FlowProjectionModule(torch.nn.Module):
        def __init__(self, requires_grad=True):
            super().__init__()
            self.fill = not requires_grad   # FlowProjectionLayer.py:23

        def forward(self, flow):
            return per_batch(lambda f: np_flow_project(f, self.fill)[0], flow)

    class DepthFlowProjectionModule(torch.nn.Module):
        def __init__(self, requires_grad=True):
            super().__init__()
            self.fill = not requires_grad

        def forward(self, flow, depth_inv):
            outs = []
            for b in range(flow.shape[0]):
                f = to_np(flow[b]).transpose(1, 2, 0)
                d = to_np(depth_inv[b])[0]
                outs.append(np_depth_flow_project(f, d, self.fill)[0]
                            .transpose(2, 0, 1))
            return torch.from_numpy(np.stack(outs))

    return (FilterInterpolationModule, FlowProjectionModule,
            DepthFlowProjectionModule)


class _TorchCorrelation:
    """Pure-torch stand-in for the CUDA Correlation op (81 zero-padded
    shifted channel-mean dot products) — same as test_convert_parity."""

    def __new__(cls, pad_size=4, kernel_size=1, max_displacement=4,
                stride1=1, stride2=1, corr_multiply=1):
        import torch

        class M(torch.nn.Module):
            def forward(self, f1, f2):
                import torch.nn.functional as F
                md = max_displacement
                b, c, h, w = f1.shape
                f2p = F.pad(f2, (md, md, md, md))
                outs = []
                for tj in range(-md, md + 1):
                    for ti in range(-md, md + 1):
                        shifted = f2p[:, :, md + tj:md + tj + h,
                                      md + ti:md + ti + w]
                        outs.append((f1 * shifted).sum(1) / c)
                return torch.stack(outs, dim=1)

        return M()


@contextlib.contextmanager
def reference_env():
    """Context that makes ``networks/DAIN*.py`` importable on CPU torch:
    CUDA extension stubs in sys.modules, torch.cuda shims, np.int alias."""
    import torch

    fi, fp, dfp = _make_stub_modules(torch)

    mp = types.ModuleType("my_package")
    mp_fi = types.ModuleType("my_package.FilterInterpolation")
    mp_fi.FilterInterpolationModule = fi
    mp_fp = types.ModuleType("my_package.FlowProjection")
    mp_fp.FlowProjectionModule = fp
    mp_dfp = types.ModuleType("my_package.DepthFlowProjection")
    mp_dfp.DepthFlowProjectionModule = dfp
    corr = types.ModuleType("PWCNet.correlation_package_pytorch1_0.correlation")
    corr.Correlation = _TorchCorrelation
    corr_pkg = types.ModuleType("PWCNet.correlation_package_pytorch1_0")
    corr_pkg.correlation = corr

    # MegaDepth package stub: HourGlass() -> the raw pytorch_DIW_scratch net
    # (MegaDepth_model.py:11-21 returns model.netG which HG_model.py:18,29
    # sets to that module) — avoids the TrainOptions argparse side effects.
    mega = types.ModuleType("MegaDepth")

    def _hourglass(pretrained=None):
        spec = importlib.util.spec_from_file_location(
            "ref_pds", f"{REF}/MegaDepth/pytorch_DIW_scratch.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.pytorch_DIW_scratch

    mega.HourGlass = _hourglass

    injected = {
        "my_package": mp,
        "my_package.FilterInterpolation": mp_fi,
        "my_package.FlowProjection": mp_fp,
        "my_package.DepthFlowProjection": mp_dfp,
        "PWCNet.correlation_package_pytorch1_0": corr_pkg,
        "PWCNet.correlation_package_pytorch1_0.correlation": corr,
        "MegaDepth": mega,
    }
    saved = {k: sys.modules.get(k) for k in injected}
    sys.modules.update(injected)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    cuda_patch = {
        "current_device": lambda: 0,
        "current_stream": lambda *a, **k: None,
        "stream": lambda s: contextlib.nullcontext(),
        "synchronize": lambda *a, **k: None,
        "FloatTensor": torch.FloatTensor,
    }
    saved_cuda = {k: getattr(torch.cuda, k, None) for k in cuda_patch}
    for k, v in cuda_patch.items():
        setattr(torch.cuda, k, v)

    had_np_int = hasattr(np, "int")
    if not had_np_int:
        np.int = int
    sys.path.insert(0, REF)
    try:
        yield
    finally:
        sys.path.remove(REF)
        torch.Tensor.cuda = orig_cuda
        for k, v in saved_cuda.items():
            if v is None:
                delattr(torch.cuda, k)
            else:
                setattr(torch.cuda, k, v)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        if not had_np_int:
            del np.int


def load_reference_model(name: str, **kwargs):
    """Import networks/<name>.py inside reference_env and construct the model.
    Must be called inside ``with reference_env():``."""
    spec = importlib.util.spec_from_file_location(
        f"ref_{name.lower()}", f"{REF}/networks/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, name)(**kwargs)
