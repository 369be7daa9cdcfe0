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
# torch-DIFFERENTIABLE module stubs (full-graph BACKWARD parity)
# ---------------------------------------------------------------------------

def _make_diff_stub_modules(torch):
    """Differentiable torch emulations of the three CUDA ops, for end-to-end
    gradient comparison against the reference training graph
    (train.py:178-207).

    Gradient fidelity: the reference FilterInterpolation and FlowProjection
    backward kernels are exactly the autodiff of their forwards (see
    vfidkr_tpu/ops/filter_interpolation.py module docstring and
    flow_projection.py), so plain torch autograd through differentiable
    forwards reproduces them.  DepthFlowProjection's depth gradient carries
    the reference's ``(f - out)`` quirk (true autodiff would give
    ``(f + out)``, depthflowprojection_cuda_kernel.cu:312-330), so it is a
    ``torch.autograd.Function`` with that backward written out.
    """

    def landing(flow):                      # flow (B, 2, H, W)
        b, _, h, w = flow.shape
        fx, fy = flow[:, 0], flow[:, 1]
        xx = torch.arange(w, dtype=torch.float32)[None, None, :]
        yy = torch.arange(h, dtype=torch.float32)[None, :, None]
        x2 = xx + fx
        y2 = yy + fy
        valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1))
        ix_l = x2.detach().clamp(0, w - 1).long()
        iy_t = y2.detach().clamp(0, h - 1).long()
        ix_r = (ix_l + 1).clamp(max=w - 1)
        iy_b = (iy_t + 1).clamp(max=h - 1)
        return fx, fy, valid, ix_l, ix_r, iy_t, iy_b

    class FilterInterpolationModule(torch.nn.Module):
        def forward(self, image, flow, filt, fs=4):
            b, c, h, w = image.shape
            half = fs // 2
            fx, fy = flow[:, 0], flow[:, 1]
            xx = torch.arange(w, dtype=torch.float32)[None, None, :]
            yy = torch.arange(h, dtype=torch.float32)[None, :, None]
            x2 = xx + fx
            y2 = yy + fy
            valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1)
                     & (fx.abs() < w / 2.0) & (fy.abs() < h / 2.0))
            x2s = x2.clamp(0, w - 1)
            y2s = y2.clamp(0, h - 1)
            ix = x2s.detach().long()        # trunc == floor on [0, w-1]
            iy = y2s.detach().long()
            alpha = x2s - ix                # grad d(alpha)/d(fx) == 1
            beta = y2s - iy
            img_flat = image.reshape(b, c, h * w)
            out = torch.zeros_like(image)
            for dj in range(fs):
                wy = beta if dj >= half else 1.0 - beta
                ty = (iy + 1 - half + dj).clamp(0, h - 1)
                for di in range(fs):
                    wx = alpha if di >= half else 1.0 - alpha
                    tx = (ix + 1 - half + di).clamp(0, w - 1)
                    lin = (ty * w + tx).reshape(b, 1, h * w).expand(b, c, -1)
                    gathered = img_flat.gather(2, lin).reshape(b, c, h, w)
                    wgt = filt[:, dj * fs + di] * wx * wy
                    out = out + gathered * wgt[:, None]
            # invalid pixels copy the source with NO gradient (:2814-2819;
            # the reference backward skips them)
            return torch.where(valid[:, None], out, image.detach())

    class FlowProjectionModule(torch.nn.Module):
        def __init__(self, requires_grad=True):
            super().__init__()
            # the differentiable stub is the training path; fillhole only
            # runs at inference (FlowProjectionLayer.py:23) and carries no
            # gradient anyway
            self.fill = not requires_grad

        def forward(self, flow):
            b, _, h, w = flow.shape
            fx, fy, valid, ix_l, ix_r, iy_t, iy_b = landing(flow)
            v = valid.float()
            vals = torch.stack([-fx * v, -fy * v], -1).reshape(b, h * w, 2)
            bidx = torch.arange(b)[:, None].expand(b, h * w)
            acc = torch.zeros(b, h * w, 2)
            cnt = torch.zeros(b, h * w)
            for ty, tx in ((iy_t, ix_l), (iy_t, ix_r),
                           (iy_b, ix_l), (iy_b, ix_r)):
                lin = (ty * w + tx).reshape(b, h * w)
                acc = acc.index_put((bidx, lin), vals, accumulate=True)
                cnt = cnt.index_put((bidx, lin), v.reshape(b, h * w),
                                    accumulate=True)
            out = torch.where(cnt[..., None] > 0,
                              acc / cnt.clamp(min=1.0)[..., None],
                              acc.new_zeros(()))
            out = out.reshape(b, h, w, 2).permute(0, 3, 1, 2)
            if self.fill:
                with torch.no_grad():
                    filled = [np_fill_holes(
                        cnt.reshape(b, h, w)[i].numpy(),
                        out[i].detach().permute(1, 2, 0).numpy())
                        for i in range(b)]
                out = torch.from_numpy(
                    np.stack([f.transpose(2, 0, 1) for f in filled]))
            return out

    class _DFPFunction(torch.autograd.Function):
        @staticmethod
        def forward(ctx, flow, depth_inv):
            b, _, h, w = flow.shape
            fx, fy, valid, ix_l, ix_r, iy_t, iy_b = landing(flow)
            d = depth_inv[:, 0] * valid.float()
            vals = torch.stack([-fx * d, -fy * d, d], -1).reshape(b, h * w, 3)
            bidx = torch.arange(b)[:, None].expand(b, h * w)
            accum = torch.zeros(b, h * w, 3)
            for ty, tx in ((iy_t, ix_l), (iy_t, ix_r),
                           (iy_b, ix_l), (iy_b, ix_r)):
                lin = (ty * w + tx).reshape(b, h * w)
                accum = accum.index_put((bidx, lin), vals, accumulate=True)
            acc, cnt = accum[..., :2], accum[..., 2]
            out = torch.where(cnt[..., None] > 0,
                              acc / cnt.clamp(min=1e-30)[..., None],
                              acc.new_zeros(()))
            ctx.save_for_backward(flow, depth_inv,
                                  cnt.reshape(b, h, w),
                                  out.reshape(b, h, w, 2))
            return out.reshape(b, h, w, 2).permute(0, 3, 1, 2).contiguous()

        @staticmethod
        def backward(ctx, g):               # g (B, 2, H, W)
            flow, depth_inv, cnt, out = ctx.saved_tensors
            b, _, h, w = flow.shape
            fx, fy, valid, ix_l, ix_r, iy_t, iy_b = landing(flow)
            validf = valid.float()
            d = depth_inv[:, 0]
            gp = g.permute(0, 2, 3, 1).reshape(b, h * w, 2)
            cnt_f = cnt.reshape(b, h * w).clamp(min=1e-30)
            out_f = out.reshape(b, h * w, 2)
            gfx = torch.zeros(b, h, w)
            gfy = torch.zeros(b, h, w)
            gd = torch.zeros(b, h, w)
            for ty, tx in ((iy_t, ix_l), (iy_t, ix_r),
                           (iy_b, ix_l), (iy_b, ix_r)):
                lin = (ty * w + tx).reshape(b, h * w)
                gn = gp.gather(1, lin[..., None].expand(b, h * w, 2)
                               ).reshape(b, h, w, 2)
                cn = cnt_f.gather(1, lin).reshape(b, h, w)
                on = out_f.gather(1, lin[..., None].expand(b, h * w, 2)
                                  ).reshape(b, h, w, 2)
                gfx = gfx - gn[..., 0] * d / cn
                gfy = gfy - gn[..., 1] * d / cn
                # the reference's (f - out) depth-grad quirk
                # (depthflowprojection_cuda_kernel.cu:312-330)
                gd = gd - (gn[..., 0] / cn) * (fx.detach() - on[..., 0]) \
                        - (gn[..., 1] / cn) * (fy.detach() - on[..., 1])
            gflow = torch.stack([gfx * validf, gfy * validf], dim=1)
            gdepth = (gd * validf)[:, None]
            return gflow, gdepth

    class DepthFlowProjectionModule(torch.nn.Module):
        def __init__(self, requires_grad=True):
            super().__init__()
            self.fill = not requires_grad

        def forward(self, flow, depth_inv):
            out = _DFPFunction.apply(flow, depth_inv)
            if self.fill:
                b, _, h, w = flow.shape
                with torch.no_grad():
                    res = []
                    for i in range(b):
                        o, cnt = np_depth_flow_project(
                            flow[i].detach().permute(1, 2, 0).numpy(),
                            depth_inv[i, 0].detach().numpy(), fill=True)
                        res.append(o.transpose(2, 0, 1))
                out = torch.from_numpy(np.stack(res))
            return out

    return (FilterInterpolationModule, FlowProjectionModule,
            DepthFlowProjectionModule)


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
def reference_env(differentiable=False):
    """Context that makes ``networks/DAIN*.py`` importable on CPU torch:
    CUDA extension stubs in sys.modules, torch.cuda shims, np.int alias.
    ``differentiable=True`` swaps in the autograd-capable op emulations
    (for full-graph backward parity); the default NumPy stubs are faster
    for forward-only tests."""
    import torch

    maker = _make_diff_stub_modules if differentiable else _make_stub_modules
    fi, fp, dfp = maker(torch)

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
