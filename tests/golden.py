"""NumPy golden references: direct loop translations of the reference CUDA
kernel math (cited per function).  Deliberately naive — these are oracles for
the TPU ops, not production code.  All arrays are NHWC / HWC, flow channel
order (fx, fy), float64-free (float32 like the CUDA kernels).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# FilterInterpolation (_ori): filterinterpolation_cuda_kernel.cu:2692-2823
# ---------------------------------------------------------------------------

def filter_interpolate_fwd(image, flow, filt, fs=4):
    h, w, c = image.shape
    out = np.zeros((h, w, c), np.float32)
    half = fs // 2
    for y in range(h):
        for x in range(w):
            fx = np.float32(flow[y, x, 0])
            fy = np.float32(flow[y, x, 1])
            x2 = np.float32(x) + fx
            y2 = np.float32(y) + fy
            if (x2 >= 0 and y2 >= 0 and x2 <= w - 1 and y2 <= h - 1
                    and abs(fx) < w / 2.0 and abs(fy) < h / 2.0):
                ix_l = int(x2) + 1 - half
                iy_t = int(y2) + 1 - half
                alpha = x2 - int(x2)
                beta = y2 - int(y2)
                for ci in range(c):
                    quad = np.zeros((2, 2), np.float32)  # [top/bottom, left/right]
                    for dj in range(fs):
                        fj = iy_t + dj
                        _fj = min(max(0, fj), h - 1)
                        for di in range(fs):
                            fi = ix_l + di
                            _fi = min(max(0, fi), w - 1)
                            contrib = image[_fj, _fi, ci] * filt[y, x, dj * fs + di]
                            quad[int(fj > int(y2)), int(fi > int(x2))] += contrib
                    out[y, x, ci] = ((1 - alpha) * (1 - beta) * quad[0, 0]
                                     + alpha * (1 - beta) * quad[0, 1]
                                     + (1 - alpha) * beta * quad[1, 0]
                                     + alpha * beta * quad[1, 1])
            else:
                out[y, x] = image[y, x]
    return out


def filter_interpolate_bwd(image, flow, filt, grad_out, fs=4):
    """Reference backward (:2827-3125). Returns (g_image, g_flow, g_filt)."""
    h, w, c = image.shape
    gi = np.zeros_like(image, np.float32)
    gf = np.zeros((h, w, 2), np.float32)
    gk = np.zeros_like(filt, np.float32)
    half = fs // 2
    for y in range(h):
        for x in range(w):
            fx = np.float32(flow[y, x, 0])
            fy = np.float32(flow[y, x, 1])
            x2 = np.float32(x) + fx
            y2 = np.float32(y) + fy
            if not (x2 >= 0 and y2 >= 0 and x2 <= w - 1 and y2 <= h - 1
                    and abs(fx) < w / 2.0 and abs(fy) < h / 2.0):
                continue
            ix_l = int(x2) + 1 - half
            iy_t = int(y2) + 1 - half
            alpha = x2 - int(x2)
            beta = y2 - int(y2)
            qw = np.array([[(1 - alpha) * (1 - beta), alpha * (1 - beta)],
                           [(1 - alpha) * beta, alpha * beta]], np.float32)
            bot_x = np.float32(0.0)
            bot_y = np.float32(0.0)
            for ci in range(c):
                g = grad_out[y, x, ci]
                quad = np.zeros((2, 2), np.float32)
                for dj in range(fs):
                    fj = iy_t + dj
                    _fj = min(max(0, fj), h - 1)
                    qy = int(fj > int(y2))
                    for di in range(fs):
                        fi = ix_l + di
                        _fi = min(max(0, fi), w - 1)
                        qx = int(fi > int(x2))
                        kv = filt[y, x, dj * fs + di]
                        iv = image[_fj, _fi, ci]
                        gi[_fj, _fi, ci] += g * qw[qy, qx] * kv
                        gk[y, x, dj * fs + di] += g * qw[qy, qx] * iv
                        quad[qy, qx] += iv * kv
                gamma = 1.0 - beta
                bot_x += g * (gamma * (quad[0, 1] - quad[0, 0])
                              + (1 - gamma) * (quad[1, 1] - quad[1, 0]))
                gamma = 1.0 - alpha
                bot_y += g * (gamma * (quad[1, 0] - quad[0, 0])
                              + (1 - gamma) * (quad[1, 1] - quad[0, 1]))
            gf[y, x, 0] = bot_x
            gf[y, x, 1] = bot_y
    return gi, gf, gk


# ---------------------------------------------------------------------------
# FlowProjection: flowprojection_cuda_kernel.cu
# ---------------------------------------------------------------------------

def _proj_targets(x, y, fx, fy, w, h):
    x2 = np.float32(x) + fx
    y2 = np.float32(y) + fy
    if not (x2 >= 0 and y2 >= 0 and x2 <= w - 1 and y2 <= h - 1):
        return None
    ixl, iyt = int(x2), int(y2)
    ixr, iyb = min(ixl + 1, w - 1), min(iyt + 1, h - 1)
    return [(iyt, ixl), (iyt, ixr), (iyb, ixl), (iyb, ixr)]


def flow_project_fwd(flow, fill=False):
    h, w = flow.shape[:2]
    acc = np.zeros((h, w, 2), np.float32)
    cnt = np.zeros((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            tgts = _proj_targets(x, y, flow[y, x, 0], flow[y, x, 1], w, h)
            if tgts is None:
                continue
            for (ty, tx) in tgts:
                acc[ty, tx, 0] += -flow[y, x, 0]
                acc[ty, tx, 1] += -flow[y, x, 1]
                cnt[ty, tx] += 1.0
    out = np.where(cnt[..., None] > 0, acc / np.maximum(cnt, 1)[..., None], 0.0)
    out = out.astype(np.float32)
    if fill:
        out = fill_holes_ref(cnt, out)
    return out, cnt


def flow_project_bwd(flow, cnt, grad_out):
    h, w = flow.shape[:2]
    gf = np.zeros((h, w, 2), np.float32)
    for y in range(h):
        for x in range(w):
            tgts = _proj_targets(x, y, flow[y, x, 0], flow[y, x, 1], w, h)
            if tgts is None:
                continue
            for (ty, tx) in tgts:
                gf[y, x, 0] += -grad_out[ty, tx, 0] / cnt[ty, tx]
                gf[y, x, 1] += -grad_out[ty, tx, 1] / cnt[ty, tx]
    return gf


def fill_holes_ref(cnt, out):
    """FlowFillhole_kernelfunc (:141-234)."""
    h, w = cnt.shape
    res = out.copy()
    for y in range(h):
        for x in range(w):
            if cnt[y, x] > 0:
                continue
            dirs = []
            xi = x
            while xi - 1 >= 0:
                xi -= 1
                if cnt[y, xi] > 0:
                    dirs.append((y, xi))
                    break
            xi = x
            while xi + 1 <= w - 1:
                xi += 1
                if cnt[y, xi] > 0:
                    dirs.append((y, xi))
                    break
            yi = y
            while yi - 1 >= 0:
                yi -= 1
                if cnt[yi, x] > 0:
                    dirs.append((yi, x))
                    break
            yi = y
            while yi + 1 <= h - 1:
                yi += 1
                if cnt[yi, x] > 0:
                    dirs.append((yi, x))
                    break
            if dirs:
                res[y, x] = np.mean([out[p] for p in dirs], axis=0)
    return res


# ---------------------------------------------------------------------------
# DepthFlowProjection: depthflowprojection_cuda_kernel.cu
# ---------------------------------------------------------------------------

def depth_flow_project_fwd(flow, depth_inv, fill=False):
    h, w = flow.shape[:2]
    acc = np.zeros((h, w, 2), np.float32)
    cnt = np.zeros((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            tgts = _proj_targets(x, y, flow[y, x, 0], flow[y, x, 1], w, h)
            if tgts is None:
                continue
            d = depth_inv[y, x]
            for (ty, tx) in tgts:
                acc[ty, tx, 0] += -flow[y, x, 0] * d
                acc[ty, tx, 1] += -flow[y, x, 1] * d
                cnt[ty, tx] += d
    out = np.where(cnt[..., None] > 0, acc / np.where(cnt == 0, 1, cnt)[..., None], 0.0)
    out = out.astype(np.float32)
    if fill:
        out = fill_holes_ref(cnt, out)
    return out, cnt


def depth_flow_project_bwd(flow, depth_inv, cnt, out, grad_out):
    """Backward kernel :242-340 — note the (f - out) depth-gradient term."""
    h, w = flow.shape[:2]
    gf = np.zeros((h, w, 2), np.float32)
    gd = np.zeros((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            tgts = _proj_targets(x, y, flow[y, x, 0], flow[y, x, 1], w, h)
            if tgts is None:
                continue
            d = depth_inv[y, x]
            for (ty, tx) in tgts:
                for ch, f in ((0, flow[y, x, 0]), (1, flow[y, x, 1])):
                    gf[y, x, ch] += -grad_out[ty, tx, ch] * d / cnt[ty, tx]
                    gd[y, x] += -grad_out[ty, tx, ch] / cnt[ty, tx] * (f - out[ty, tx, ch])
    return gf, gd


# ---------------------------------------------------------------------------
# MinDepthFlowProjection: mindepthflowprojection_cuda_kernel.cu:28-117
# (deterministic tie-break: max source linear index wins)
# ---------------------------------------------------------------------------

def min_depth_flow_project_fwd(flow, depth_inv):
    h, w = flow.shape[:2]
    out = np.zeros((h, w, 2), np.float32)
    best = np.zeros((h, w), np.float32)
    best_src = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            tgts = _proj_targets(x, y, flow[y, x, 0], flow[y, x, 1], w, h)
            if tgts is None:
                continue
            ty, tx = tgts[0]  # TL neighbour only
            d = depth_inv[y, x]
            src = y * w + x
            if d > best[ty, tx] or (d == best[ty, tx] and d > 0 and src > best_src[ty, tx]):
                best[ty, tx] = d
                best_src[ty, tx] = src
                out[ty, tx] = (-flow[y, x, 0], -flow[y, x, 1])
    return out, best


# ---------------------------------------------------------------------------
# Interpolation: interpolation_cuda_kernel.cu:27-99
# ---------------------------------------------------------------------------

def interpolate_bilinear_fwd(image, flow):
    h, w, c = image.shape
    out = np.zeros((h, w, c), np.float32)
    for y in range(h):
        for x in range(w):
            x2 = np.float32(x) + np.float32(flow[y, x, 0])
            y2 = np.float32(y) + np.float32(flow[y, x, 1])
            if x2 >= 0 and y2 >= 0 and x2 < w and y2 < h:
                ixl, iyt = int(x2), int(y2)
                ixr, iyb = min(ixl + 1, w - 1), min(iyt + 1, h - 1)
                a, b = x2 - ixl, y2 - iyt
                out[y, x] = ((1 - a) * (1 - b) * image[iyt, ixl]
                             + a * (1 - b) * image[iyt, ixr]
                             + (1 - a) * b * image[iyb, ixl]
                             + a * b * image[iyb, ixr])
    return out


# ---------------------------------------------------------------------------
# Correlation: correlation_cuda_kernel.cu:74-146 (k=1, s1=s2=1, pad=md)
# ---------------------------------------------------------------------------

def correlation_fwd(f1, f2, md=4):
    h, w, c = f1.shape
    d = 2 * md + 1
    f2p = np.zeros((h + 2 * md, w + 2 * md, c), np.float32)
    f2p[md:md + h, md:md + w] = f2
    out = np.zeros((h, w, d * d), np.float32)
    for tj in range(-md, md + 1):
        for ti in range(-md, md + 1):
            tc = (tj + md) * d + (ti + md)
            shifted = f2p[md + tj:md + tj + h, md + ti:md + ti + w]
            out[..., tc] = (f1 * shifted).sum(-1) / c
    return out


# ---------------------------------------------------------------------------
# SeparableConv / SeparableConvFlow
# ---------------------------------------------------------------------------

def separable_conv_fwd(image, vert, horiz):
    h, w, c = image.shape
    fs = vert.shape[-1]
    ho, wo = h - fs + 1, w - fs + 1
    out = np.zeros((ho, wo, c), np.float32)
    for y in range(ho):
        for x in range(wo):
            for j in range(fs):
                for i in range(fs):
                    out[y, x] += image[y + j, x + i] * vert[y, x, j] * horiz[y, x, i]
    return out


def separable_conv_flow_fwd(vert, horiz):
    ho, wo, fs = vert.shape
    out = np.zeros((ho, wo, 2), np.float32)
    center = (fs - 1) / 2.0
    for y in range(ho):
        for x in range(wo):
            for ch, k in ((0, horiz), (1, vert)):
                s = k[y, x].sum()
                num = (np.arange(fs) * k[y, x]).sum()
                out[y, x, ch] = num / s - center if abs(s) > 0 else -2000.0
    return out


def interpolate_bilinear_bwd(image, flow, grad_out):
    """Interpolation backward kernel (interpolation_cuda_kernel.cu:103-204).
    Returns (g_image, g_flow).  Note the boundary quirk: gamma = iy2_B - y2
    goes negative at clamped borders, but the clamped-tap identities make it
    agree with autodiff of the forward everywhere."""
    h, w, c = image.shape
    gi = np.zeros_like(image, np.float32)
    gf = np.zeros((h, w, 2), np.float32)
    for y in range(h):
        for x in range(w):
            fx = np.float32(flow[y, x, 0])
            fy = np.float32(flow[y, x, 1])
            x2 = np.float32(x) + fx
            y2 = np.float32(y) + fy
            if not (x2 >= 0 and y2 >= 0 and x2 < w and y2 < h):
                continue
            ixl, iyt = int(x2), int(y2)
            ixr, iyb = min(ixl + 1, w - 1), min(iyt + 1, h - 1)
            a, b = x2 - ixl, y2 - iyt
            for ci in range(c):
                g = grad_out[y, x, ci]
                gi[iyt, ixl, ci] += g * (1 - a) * (1 - b)
                gi[iyt, ixr, ci] += g * a * (1 - b)
                gi[iyb, ixl, ci] += g * (1 - a) * b
                gi[iyb, ixr, ci] += g * a * b
            gamma = iyb - y2
            gf[y, x, 0] = sum(
                grad_out[y, x, ci]
                * (gamma * (image[iyt, ixr, ci] - image[iyt, ixl, ci])
                   + (1 - gamma) * (image[iyb, ixr, ci] - image[iyb, ixl, ci]))
                for ci in range(c))
            gamma = ixr - x2
            gf[y, x, 1] = sum(
                grad_out[y, x, ci]
                * (gamma * (image[iyb, ixl, ci] - image[iyt, ixl, ci])
                   + (1 - gamma) * (image[iyb, ixr, ci] - image[iyt, ixr, ci]))
                for ci in range(c))
    return gi, gf


def separable_conv_bwd(image, vert, horiz, grad_out):
    """SeparableConvLayer_gpu_backward_kernelfunc
    (separableconv_cuda_kernel.cu:85-134). Returns (g_image, g_vert, g_horiz)."""
    h, w, c = image.shape
    fs = vert.shape[-1]
    ho, wo = h - fs + 1, w - fs + 1
    gi = np.zeros_like(image, np.float32)
    gv = np.zeros_like(vert, np.float32)
    gh = np.zeros_like(horiz, np.float32)
    for y in range(ho):
        for x in range(wo):
            for ci in range(c):
                g = grad_out[y, x, ci]
                for j in range(fs):
                    for i in range(fs):
                        t1 = image[y + j, x + i, ci]
                        t2 = vert[y, x, j]
                        t3 = horiz[y, x, i]
                        gi[y + j, x + i, ci] += g * t2 * t3
                        gv[y, x, j] += g * t1 * t3
                        gh[y, x, i] += g * t1 * t2
    return gi, gv, gh


def separable_conv_flow_bwd(vert, horiz, grad_flow):
    """SeparableConvFlowLayer_gpu_backward_kernelfunc
    (separableconvflow_cuda_kernel.cu:96-172). Returns (g_vert, g_horiz)."""
    ho, wo, fs = vert.shape
    gv = np.zeros_like(vert, np.float32)
    gh = np.zeros_like(horiz, np.float32)
    for y in range(ho):
        for x in range(wo):
            for k, ch, grad in ((vert, 1, gv), (horiz, 0, gh)):
                s = k[y, x].sum()
                num = (np.arange(fs) * k[y, x]).sum()
                if abs(s) > 0:
                    g = grad_flow[y, x, ch]
                    off = num / (s * s)
                    for j in range(fs):
                        grad[y, x, j] += g * (j / s - off)
    return gv, gh


def filter_interpolate_deformable_fwd(image, flow, filt, offsets, fs=4,
                                      quadrant="static"):
    """Literal translation of the dormant deformable variants:
    FilterInterpolationLayer_gpu_forward_kernelfunc
    (filterinterpolation_cuda_kernel.cu:29-255, quadrant="static") and
    ..._deforconv (:1353-1498, quadrant="deformed"); ``filt=None`` gives
    ..._nofilterwithdeforconv (:2070-2194).  The reference reads deformed
    corners unclamped (UB out of frame); this oracle clamps them like the
    TPU op."""
    h, w, c = image.shape
    half = fs // 2
    out = np.zeros_like(image, np.float32)
    offs = offsets.reshape(h, w, 2, fs, fs)
    for y in range(h):
        for x in range(w):
            fx, fy = float(flow[y, x, 0]), float(flow[y, x, 1])
            x2, y2 = x + fx, y + fy
            if not (0 <= x2 <= w - 1 and 0 <= y2 <= h - 1
                    and abs(fx) < w / 2 and abs(fy) < h / 2):
                out[y, x] = image[y, x]
                continue
            ix_l = int(x2) + 1 - half
            iy_t = int(y2) + 1 - half
            alpha = x2 - int(x2)
            beta = y2 - int(y2)
            quad = np.zeros((2, 2, c), np.float32)   # [qy][qx]
            for dj in range(fs):
                tj = min(max(0, iy_t + dj), h - 1)
                for di in range(fs):
                    ti = min(max(0, ix_l + di), w - 1)
                    frac_y = tj + float(offs[y, x, 0, dj, di])
                    frac_x = ti + float(offs[y, x, 1, dj, di])
                    top, left = int(frac_y), int(frac_x)    # C truncation
                    phi_y, phi_x = frac_y - top, frac_x - left
                    cl = lambda yy, xx: image[min(max(0, yy), h - 1),
                                              min(max(0, xx), w - 1)]
                    bi = ((1 - phi_x) * (1 - phi_y) * cl(top, left)
                          + phi_x * (1 - phi_y) * cl(top, left + 1)
                          + (1 - phi_x) * phi_y * cl(top + 1, left)
                          + phi_x * phi_y * cl(top + 1, left + 1))
                    if filt is not None:
                        bi = bi * float(filt[y, x, dj * fs + di])
                    if quadrant == "static":
                        qy, qx = int(dj >= half), int(di >= half)
                    else:
                        qy = int(frac_y > y2)
                        qx = int(frac_x > x2)
                    quad[qy, qx] += bi
            out[y, x] = ((1 - alpha) * (1 - beta) * quad[0, 0]
                         + alpha * (1 - beta) * quad[0, 1]
                         + (1 - alpha) * beta * quad[1, 0]
                         + alpha * beta * quad[1, 1])
    return out
