"""Adaptive ("deformable kernel region") filter interpolation — the core VFIDKR op.

TPU-native re-design of the reference CUDA op
``my_package/FilterInterpolation/filterinterpolation_cuda_kernel.cu`` (the
active ``_ori`` variant, forward at :2692-2823, backward at :2827-3125).

Semantics (per output pixel ``(y, x)`` with flow ``(fx, fy)``):

* land at ``x2 = x + fx``, ``y2 = y + fy``
* valid iff ``0 <= x2 <= W-1`` and ``0 <= y2 <= H-1`` and ``|fx| < W/2`` and
  ``|fy| < H/2`` (kernel :2736-2737); invalid pixels copy the source pixel
  (:2814-2819) with **no** gradient (the reference backward skips them).
* take the ``fs x fs`` window with top-left ``ix_L = int(x2) + 1 - fs//2``
  (:2738-2741); each tap's image read is clamped to the frame
  (``min(max(0, i), W-1)``) but its filter index is the *unclamped* window
  position (:2752-2758).
* taps are split into four quadrants by integer position vs ``int(x2)`` /
  ``int(y2)``; because the window top-left is anchored at
  ``int(x2) + 1 - fs//2``, a tap at window column ``di`` is in the left
  quadrant iff ``di < fs//2`` — quadrant membership is *static* per window
  position.  The four quadrant sums are blended bilinearly with
  ``alpha = frac(x2)``, ``beta = frac(y2)`` (:2789-2793), which collapses to a
  separable per-tap weight ``wx(di) * wy(dj)``.

Gradient: the reference's hand-written backward (grad→image and grad→filter by
linearity, grad→flow as the quadrant finite-difference
``gamma*(TR-TL) + (1-gamma)*(BR-BL)`` with ``gamma = 1-beta``, :2965-3031) is
*exactly* the autodiff gradient of this forward — ``int(x2)`` carries zero
derivative so only the ``alpha``/``beta`` blend terms differentiate, and those
reproduce the finite-difference formula.  We therefore rely on JAX autodiff,
wrapping the invalid-pixel fallback in ``stop_gradient`` to reproduce the
reference's dropped gradient there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _window_geometry(image, flow, filter_size):
    """Shared landing/window math. Returns (valid, iy_t, ix_l, alpha, beta).

    Inside a ``parallel.spatial.spatial_frame`` (row-sharded inference on a
    halo-extended block) the validity bounds are evaluated in GLOBAL frame
    coordinates, so the out-of-range copy-source fallback triggers exactly
    where the reference's frame bounds would (kernel :2736-2737) — the tap
    clamp needs no change because the halo exchange edge-replicates at the
    global frame edge, which equals the reference's clamped reads."""
    h, w, _ = image.shape
    fs = filter_size
    half = fs // 2

    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xx + fx
    y2 = yy + fy

    from vfidkr_tpu.parallel.spatial import global_row_frame
    frame = global_row_frame(h)
    if frame is None:
        y_lo, y_hi, hg = 0.0, float(h - 1), h
    else:
        row0, hg, _, _ = frame
        y_lo = (-row0).astype(jnp.float32)
        y_hi = (hg - 1 - row0).astype(jnp.float32)

    valid = ((x2 >= 0.0) & (y2 >= y_lo)
             & (x2 <= float(w - 1)) & (y2 <= y_hi)
             & (jnp.abs(fx) < float(w) / 2.0)
             & (jnp.abs(fy) < hg / 2.0))

    x2s = jnp.clip(x2, 0.0, float(w - 1))
    y2s = jnp.clip(jnp.clip(y2, y_lo, y_hi), 0.0, float(h - 1))
    ix = jnp.floor(x2s).astype(jnp.int32)
    iy = jnp.floor(y2s).astype(jnp.int32)
    alpha = x2s - ix.astype(jnp.float32)   # frac(x2); d(alpha)/d(fx) == 1
    beta = y2s - iy.astype(jnp.float32)
    return valid, iy + 1 - half, ix + 1 - half, alpha, beta


def _filter_interpolate_2d_block(image, flow, filt, filter_size):
    """Exact single-gather formulation: one ``lax.gather`` of (fs,fs,C) blocks
    from an edge-padded image (clamped taps == edge-padded reads), then a
    weighted reduction.  16x fewer gather indices than the per-tap version —
    XLA TPU gather cost is dominated by index count.
    """
    h, w, c = image.shape
    fs = filter_size
    half = fs // 2
    pad_lo, pad_hi = half - 1, fs - half

    valid, iy_t, ix_l, alpha, beta = _window_geometry(image, flow, filter_size)
    ipad = jnp.pad(image.astype(jnp.float32),
                   ((pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)), mode="edge")

    starts = jnp.stack([(iy_t + pad_lo).reshape(-1),
                        (ix_l + pad_lo).reshape(-1)], axis=-1)   # (H*W, 2)

    wx = jnp.stack([alpha if di >= half else 1.0 - alpha for di in range(fs)],
                   axis=-1)
    wy = jnp.stack([beta if dj >= half else 1.0 - beta for dj in range(fs)],
                   axis=-1)
    kweights = filt.reshape(h, w, fs, fs)                         # (y,x,dj,di)
    weight = kweights * wy[..., :, None] * wx[..., None, :]       # (y,x,dj,di)
    out = _blocked_gather_reduce(
        ipad, starts, weight.reshape(h * w, fs * fs), fs, c).reshape(h, w, c)

    fallback = jax.lax.stop_gradient(image.astype(jnp.float32))
    return jnp.where(valid[..., None], out, fallback).astype(image.dtype)


def _bandmm_pallas_params(h, w, c):
    """Pick (band, tw) grid parameters for the banded Pallas kernel, or None
    if the shape doesn't fit its contract (tile divisibility, channel count —
    wide context tensors blow the per-tile VMEM slab budget) or there is no
    real TPU (interpret mode is reserved for the dedicated parity tests)."""
    if jax.default_backend() != "tpu":
        return None
    if c > 8 or h % 8 != 0:
        return None
    band = 16 if h % 16 == 0 else 8
    # (tw, rh) with u_slab = tw + 2*rh + 3 == 127 keeps the stage-1 dots on
    # a single 128-wide MXU K-tile (tw=64/rh=30 measured 40% faster than
    # tw=112 with its 179-wide, 2-tile contraction)
    if w % 64 == 0:
        return band, 64, 30
    for tw in (112, 128, 96, 160, 80, 56, 32):
        if w % tw == 0:
            return band, tw, 32
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _filter_interpolate_slab(image, flow, filt, filter_size, band, tw,
                             rh=32, limbs=3):
    """Default TPU path: banded one-hot-matmul Pallas kernel (see
    ops/pallas/filter_bandmm_kernel.py) with a whole-call ``lax.cond``
    fallback to the exact XLA block path when any flow exceeds the slab
    bounds — reference-exact for every input.  Backward runs the banded
    Pallas backward kernel (ops/pallas/filter_bandmm_bwd_kernel.py) under
    the same cond — identical math to filterinterpolation_cuda_kernel.cu
    :2827-3125."""
    from vfidkr_tpu.ops.pallas.filter_bandmm_kernel import (
        _rv_for, filter_bandmm_pallas)
    fs = filter_size
    half = fs // 2
    pad_lo = half - 1
    rv = _rv_for(band)
    s = band + 2 * rv + fs - 1
    u_slab = tw + 2 * rh + fs - 1

    def per_image(image, flow, filt):
        valid, iy_t, ix_l, alpha, beta = _window_geometry(image, flow, fs)
        kw = _combined_weights(filt, alpha, beta, fs)
        return valid, iy_t + pad_lo, ix_l + pad_lo, kw

    valid, base_v, base_u, kw = jax.vmap(per_image)(image, flow, filt)

    b, h, w, c = image.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    bs = base_v + rv - (yy // band) * band
    bu = base_u + rh - (xx // tw) * tw
    in_slab = ((bs >= 0) & (bs <= s - fs) & (bu >= 0) & (bu <= u_slab - fs))
    oversize = jnp.any(valid & ~in_slab)

    img32 = image.astype(jnp.float32)
    # limbs=1 is the "slab8" contract: inputs on the 8-bit grid (k/255,
    # i.e. decoded frames) — x*255 recovers exact small integers that fit
    # ONE bf16 truncation limb (one-hot products <= 2*255 are even, hence
    # bf16-exact), a third of the MXU passes.  The contract is
    # SELF-ENFORCING: any off-grid pixel flips the whole-call cond to the
    # exact block path, same as an oversize flow.  limbs=3 is exact for
    # any f32 (3 truncation limbs reconstruct the field bit-exactly; no
    # 255 scaling, so it matches the block branch bit-for-bit).  (Dynamic
    # limb selection was tried and fails on this toolchain: an XLA cond
    # between two pallas calls and in-kernel pl.when predication both
    # execute the skipped dots; only compile-time structure helps.)
    if limbs == 1:
        s255 = img32 * 255.0
        on_grid = jnp.all((s255 == jnp.round(s255))
                          & (s255 >= 0.0) & (s255 <= 255.0))
        oversize = oversize | ~on_grid

    def fast(args):
        img32, base_v, base_u, kw = args
        if limbs == 1:
            out = filter_bandmm_pallas(img32 * 255.0, base_v, base_u, kw,
                                       band=band, tw=tw, rh=rh, limbs=1)
            return out * (1.0 / 255.0)
        return filter_bandmm_pallas(img32, base_v, base_u, kw,
                                    band=band, tw=tw, rh=rh, limbs=limbs)

    def exact(args):
        img32, base_v, base_u, kw = args
        return _block_from_geometry(img32, base_v, base_u, kw, fs)

    out = jax.lax.cond(oversize, exact, fast,
                       (img32, base_v, base_u, kw))
    fallback = jax.lax.stop_gradient(img32)
    return jnp.where(valid[..., None], out, fallback).astype(image.dtype)


_GATHER_CHUNK = 262144
"""Max indices per blocked ``lax.gather``.  XLA gives the gather's
``(n, fs, fs, c)`` output a ``T(8,128)``-tiled layout with ``c`` on lanes —
a 42x padded allocation at fs=4/c=3 — and large frames then fail to compile
(2x768x1280 crashes the compile helper; a batch-8 Vimeo sweep reports
``Allocation (size=21474836480) would exceed memory``).  Defences: (a) the
per-pixel weighted reduction runs INSIDE each <=256k-index chunk
(``_blocked_gather_reduce``), so the padded blocks buffer stays <=700 MB and
is reused across the unrolled chunks (vmap/scan wrappers around a chunked
gather hang the same compiler — keep the loop in Python); (b) the batch
dimension maps sequentially (``lax.map``) above ``_VMAP_GATHER_PX`` pixels so
batching never multiplies a compiled gather's index count (``_batch_map``)."""

_VMAP_GATHER_PX = 1_500_000


def _batch_map(core, *args):
    """vmap for normal workloads; sequential lax.map when the TOTAL
    (batch x pixels) index count would exceed the compiler's limit under
    vmap (a vmapped gather batches the index vector: 2x768x1280 and
    16x320x512 both crash the compile helper; per-image they compile).
    Gather cost is index-count dominated, so sequencing does not change
    device throughput."""
    b, h, w = args[0].shape[:3]
    if b * h * w > _VMAP_GATHER_PX:
        return jax.lax.map(lambda a: core(*a), args)
    return jax.vmap(core)(*args)


def _blocked_gather_reduce(ipad, starts, kw_flat, fs, c):
    """(n, 2) window starts + (n, fs*fs) weights -> (n, c) weighted window
    sums.  The reduction runs per chunk so the (m, fs, fs, c) blocks
    intermediate never exceeds the chunk size (see ``_GATHER_CHUNK``)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def g(s, k):
        blocks = jax.lax.gather(
            ipad, s, dnums, slice_sizes=(fs, fs, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return jnp.einsum("mk,mkc->mc", k,
                          blocks.reshape(s.shape[0], fs * fs, c),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    n = starts.shape[0]
    if n <= _GATHER_CHUNK:
        return g(starts, kw_flat)
    chunks = [g(starts[i:i + _GATHER_CHUNK], kw_flat[i:i + _GATHER_CHUNK])
              for i in range(0, n, _GATHER_CHUNK)]
    return jnp.concatenate(chunks, axis=0)


def _block_from_geometry(img32, base_v, base_u, kw, fs):
    """The exact blocked-gather valid-branch sum, from precomputed geometry
    (shared with the Pallas path so the lax.cond branches agree bit-for-bit
    on in-bound pixels)."""
    b, h, w, c = img32.shape
    half = fs // 2
    pad_lo, pad_hi = half - 1, fs - half
    ipad = jnp.pad(img32, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)),
                   mode="edge")

    def one(ipad, base_v, base_u, kw):
        starts = jnp.stack([base_v.reshape(-1), base_u.reshape(-1)], axis=-1)
        out = _blocked_gather_reduce(ipad, starts,
                                     kw.reshape(h * w, fs * fs), fs, c)
        return out.reshape(h, w, c)

    return _batch_map(one, ipad, base_v, base_u, kw)


def _ctx_pallas_params(h, w, c):
    """Pick (band, tw, rv, rh, c_chunk) for the big-C lane-gather kernel, or
    None when the shape is outside its contract or there is no real TPU.
    Used for wide-channel warps (DAIN_slowmotion's 196-ch context) where the
    banded one-hot kernel's MXU cost would scale with C."""
    if jax.default_backend() != "tpu":
        return None
    if c <= 8:
        return None
    band = 64 if h % 64 == 0 else (32 if h % 32 == 0 else None)
    if band is None or w % 64 != 0:
        return None
    # rv=26 covers the measured flow envelope (projected slow-motion flows
    # reach ~25 px vertically at t=0.75); larger vertical bounds only cost
    # DMA overlap, not compute (the row loop is bounds-adaptive per chunk)
    return band, 64, 26, 30, 40


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _filter_interpolate_ctx(image, flow, filt, filter_size, band, tw, rv,
                            rh, c_chunk):
    """Big-C TPU path: in-VMEM lane-gather Pallas kernel (see
    ops/pallas/ctx_gather_kernel.py) with a whole-call ``lax.cond`` fallback
    to the exact XLA block path when any flow exceeds the slab bounds.
    Forward matches the block path to f32 rounding (~1 ulp, different
    accumulation order); backward reuses the block formulation."""
    from vfidkr_tpu.ops.pallas.ctx_gather_kernel import _U, ctx_gather_pallas
    fs = filter_size
    pad_lo = fs // 2 - 1
    s = band + 2 * rv + fs - 1

    def per_image(image, flow, filt):
        valid, iy_t, ix_l, alpha, beta = _window_geometry(image, flow, fs)
        kw = _combined_weights(filt, alpha, beta, fs)
        return valid, iy_t + pad_lo, ix_l + pad_lo, kw

    valid, base_v, base_u, kw = jax.vmap(per_image)(image, flow, filt)

    b, h, w, c = image.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    bs = base_v + rv - (yy // band) * band
    bu = base_u + rh - (xx // tw) * tw
    in_slab = ((bs >= 0) & (bs <= s - fs) & (bu >= 0) & (bu <= _U - fs))
    oversize = jnp.any(valid & ~in_slab)

    img32 = image.astype(jnp.float32)

    def fast(args):
        img32, base_v, base_u, kw = args
        return ctx_gather_pallas(img32, base_v, base_u, kw, band=band,
                                 tw=tw, rv=rv, rh=rh, c_chunk=c_chunk)

    def exact(args):
        img32, base_v, base_u, kw = args
        return _block_from_geometry(img32, base_v, base_u, kw, fs)

    out = jax.lax.cond(oversize, exact, fast, (img32, base_v, base_u, kw))
    fallback = jax.lax.stop_gradient(img32)
    return jnp.where(valid[..., None], out, fallback).astype(image.dtype)


def _fi_ctx_fwd(image, flow, filt, filter_size, band, tw, rv, rh, c_chunk):
    return (_filter_interpolate_ctx(image, flow, filt, filter_size, band,
                                    tw, rv, rh, c_chunk),
            (image, flow, filt))


def _fi_ctx_bwd(filter_size, band, tw, rv, rh, c_chunk, res, g):
    image, flow, filt = res
    block = jax.vmap(functools.partial(_filter_interpolate_2d_block,
                                       filter_size=filter_size))
    _, vjp = jax.vjp(block, image, flow, filt)
    return vjp(g)


_filter_interpolate_ctx.defvjp(_fi_ctx_fwd, _fi_ctx_bwd)


def _fi_slab_fwd(image, flow, filt, filter_size, band, tw, rh=32, limbs=3):
    return (_filter_interpolate_slab(image, flow, filt, filter_size, band,
                                     tw, rh, limbs),
            (image, flow, filt))


def _fi_block_vjp(image, flow, filt, filter_size, g):
    """The exact XLA backward (vjp of the blocked-gather formulation) —
    identical math to filterinterpolation_cuda_kernel.cu:2827-3125."""
    block = jax.vmap(functools.partial(_filter_interpolate_2d_block,
                                       filter_size=filter_size))
    _, vjp = jax.vjp(block, image, flow, filt)
    return vjp(g)


def _fi_slab_bwd_fast(image, flow, filt, filter_size, band, tw, rh, g):
    """Banded Pallas backward (ops/pallas/filter_bandmm_bwd_kernel.py):
    grad->image as the transpose banded scatter, grad->flow/filter by
    chaining the kernel's per-tap T = dL/dkw through the elementwise weight
    prep with XLA autodiff (reproducing the reference's quadrant
    finite-difference flow gradient, kernel :2965-3102)."""
    from vfidkr_tpu.ops.pallas.filter_bandmm_bwd_kernel import (
        filter_bandmm_bwd_pallas)
    fs = filter_size
    pad_lo = fs // 2 - 1

    def prep(image, flow, filt):
        valid, iy_t, ix_l, alpha, beta = _window_geometry(image, flow, fs)
        kw = _combined_weights(filt, alpha, beta, fs)
        return kw, (valid, iy_t + pad_lo, ix_l + pad_lo)

    img32 = image.astype(jnp.float32)
    kw, (valid, base_v, base_u) = jax.vmap(
        lambda fl, ft: prep(img32[0], fl, ft))(flow, filt)
    gz = jnp.where(valid[..., None], g.astype(jnp.float32), 0.0)
    gimg, T = filter_bandmm_bwd_pallas(img32, base_v, base_u, kw, gz,
                                       band=band, tw=tw, rh=rh)
    # chain T = dL/dkw through the weight prep (alpha/beta/filter terms)
    _, vjp_prep = jax.vjp(
        lambda fl, ft: jax.vmap(lambda f1, f2: prep(img32[0], f1, f2)[0])(
            fl, ft), flow, filt)
    gflow, gfilt = vjp_prep(T)
    # invalid pixels forward a stop_gradient copy: no image grad either
    gimg = gimg + jnp.where(valid[..., None], 0.0, 0.0)
    return (gimg.astype(image.dtype), gflow.astype(flow.dtype),
            gfilt.astype(filt.dtype))


def _fi_slab_bwd(filter_size, band, tw, rh, limbs, res, g):
    image, flow, filt = res
    fs = filter_size
    pad_lo = fs // 2 - 1

    # measurement switch: force the pre-round-5 XLA backward (blocked-gather
    # vjp) for one-session A/Bs of the banded Pallas backward
    import os
    if os.environ.get("VFIDKR_XLA_BWD"):
        return _fi_block_vjp(image, flow, filt, filter_size, g)

    # recompute the forward's branch flag so the gradient matches the branch
    # that actually ran (oversize flows and — for slab8 — off-grid inputs
    # took the exact XLA path)
    def per_image(image, flow, filt):
        valid, iy_t, ix_l, alpha, beta = _window_geometry(image, flow, fs)
        return valid, iy_t + pad_lo, ix_l + pad_lo

    valid, base_v, base_u = jax.vmap(per_image)(image, flow, filt)
    from vfidkr_tpu.ops.pallas.filter_bandmm_kernel import _rv_for
    rv = _rv_for(band)
    s = band + 2 * rv + fs - 1
    u_slab = tw + 2 * rh + fs - 1
    b, h, w = valid.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    bs = base_v + rv - (yy // band) * band
    bu = base_u + rh - (xx // tw) * tw
    in_slab = ((bs >= 0) & (bs <= s - fs) & (bu >= 0) & (bu <= u_slab - fs))
    oversize = jnp.any(valid & ~in_slab)
    if limbs == 1:
        s255 = image.astype(jnp.float32) * 255.0
        on_grid = jnp.all((s255 == jnp.round(s255))
                          & (s255 >= 0.0) & (s255 <= 255.0))
        oversize = oversize | ~on_grid

    return jax.lax.cond(
        oversize,
        lambda g: _fi_block_vjp(image, flow, filt, filter_size, g),
        lambda g: _fi_slab_bwd_fast(image, flow, filt, filter_size, band,
                                    tw, rh, g),
        g)


_filter_interpolate_slab.defvjp(_fi_slab_fwd, _fi_slab_bwd)


def _combined_weights(filt, alpha, beta, filter_size):
    """Per-tap weight = filter * separable quadrant blend, (H,W,fs*fs),
    row-major (dj*fs + di)."""
    h, w = alpha.shape
    fs = filter_size
    half = fs // 2
    wx = jnp.stack([alpha if di >= half else 1.0 - alpha for di in range(fs)],
                   axis=-1)
    wy = jnp.stack([beta if dj >= half else 1.0 - beta for dj in range(fs)],
                   axis=-1)
    kweights = filt.reshape(h, w, fs, fs)               # (y,x,dj,di)
    return (kweights * wy[..., :, None] * wx[..., None, :]).reshape(
        h, w, fs * fs)


def _filter_interpolate_2d(image: jax.Array, flow: jax.Array, filt: jax.Array,
                           filter_size: int) -> jax.Array:
    """Single-image core. image (H,W,C), flow (H,W,2) as (fx,fy), filt (H,W,fs*fs)."""
    h, w, c = image.shape
    fs = filter_size
    half = fs // 2

    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)

    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xx + fx
    y2 = yy + fy

    valid = ((x2 >= 0.0) & (y2 >= 0.0)
             & (x2 <= float(w - 1)) & (y2 <= float(h - 1))
             & (jnp.abs(fx) < float(w) / 2.0) & (jnp.abs(fy) < float(h) / 2.0))

    # Safe coordinates for the (masked-out) invalid pixels.  For valid pixels
    # x2 in [0, W-1] so clip is the identity and int() truncation == floor.
    x2s = jnp.clip(x2, 0.0, float(w - 1))
    y2s = jnp.clip(y2, 0.0, float(h - 1))
    ix = jnp.floor(x2s).astype(jnp.int32)
    iy = jnp.floor(y2s).astype(jnp.int32)
    alpha = x2s - ix.astype(jnp.float32)   # frac(x2); d(alpha)/d(fx) == 1
    beta = y2s - iy.astype(jnp.float32)

    ix_l = ix + 1 - half                   # unclamped window top-left
    iy_t = iy + 1 - half

    image_flat = image.reshape(h * w, c)
    out = jnp.zeros((h, w, c), dtype=jnp.float32)
    for dj in range(fs):
        # row quadrant weight: top rows (dj < half) get (1-beta), bottom beta
        wy = beta if dj >= half else (1.0 - beta)
        tap_y = jnp.clip(iy_t + dj, 0, h - 1)
        for di in range(fs):
            wx = alpha if di >= half else (1.0 - alpha)
            tap_x = jnp.clip(ix_l + di, 0, w - 1)
            lin = (tap_y * w + tap_x).reshape(-1)
            gathered = jnp.take(image_flat, lin, axis=0).reshape(h, w, c)
            weight = filt[..., dj * fs + di] * wx * wy
            out = out + gathered * weight[..., None]

    fallback = jax.lax.stop_gradient(image.astype(jnp.float32))
    return jnp.where(valid[..., None], out, fallback).astype(image.dtype)


def _deformable_core(image, flow, filt, offsets, filter_size, quadrant):
    """Shared math of the three deformable variants (see
    filter_interpolate_deformable).  image (H,W,C), flow (H,W,2), filt
    (H,W,fs*fs) or None, offsets (H,W,2*fs*fs) with the first fs*fs channels
    the per-tap Y offsets and the next fs*fs the X offsets (reference
    channel layout, filterinterpolation_cuda_kernel.cu:100-101)."""
    h, w, c = image.shape
    fs = filter_size
    half = fs // 2

    valid, iy_t, ix_l, alpha, beta = _window_geometry(image, flow, fs)
    x2 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + flow[..., 0]
    y2 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + flow[..., 1]

    # deformed per-tap sample positions: clamped tap + learned offset
    # (reference :94-101; the filter INDEX stays the unclamped tap)
    dj_g = jnp.arange(fs, dtype=jnp.int32)
    di_g = jnp.arange(fs, dtype=jnp.int32)
    tap_y = jnp.clip(iy_t[..., None, None] + dj_g[:, None], 0, h - 1)
    tap_x = jnp.clip(ix_l[..., None, None] + di_g[None, :], 0, w - 1)
    off = offsets.reshape(h, w, 2, fs, fs)
    frac_y = tap_y.astype(jnp.float32) + off[:, :, 0]          # (h,w,fs,fs)
    frac_x = tap_x.astype(jnp.float32) + off[:, :, 1]

    # reference uses C int() truncation (toward zero) on the possibly
    # negative deformed coords; the corner reads are UNCLAMPED there (UB for
    # out-of-frame offsets) — we clamp the corners to the frame (the only
    # defined-behaviour choice; joint clamp + edge pad == per-corner clamp)
    top = jax.lax.stop_gradient(jnp.trunc(frac_y))
    left = jax.lax.stop_gradient(jnp.trunc(frac_x))
    phi_y = frac_y - top
    phi_x = frac_x - left

    ipad = jnp.pad(image.astype(jnp.float32), ((1, 1), (1, 1), (0, 0)),
                   mode="edge")
    ys = jnp.clip(top.astype(jnp.int32), -1, h - 1) + 1
    xs = jnp.clip(left.astype(jnp.int32), -1, w - 1) + 1
    starts = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    corners = jax.lax.gather(
        ipad, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS).reshape(
            h, w, fs, fs, 2, 2, c)

    w_tl = ((1 - phi_x) * (1 - phi_y))[..., None]
    w_tr = (phi_x * (1 - phi_y))[..., None]
    w_bl = ((1 - phi_x) * phi_y)[..., None]
    w_br = (phi_x * phi_y)[..., None]
    bi = (w_tl * corners[..., 0, 0, :] + w_tr * corners[..., 0, 1, :]
          + w_bl * corners[..., 1, 0, :] + w_br * corners[..., 1, 1, :])

    if filt is not None:
        bi = bi * filt.reshape(h, w, fs, fs)[..., None]

    if quadrant == "static":
        # quadrant membership by tap position (gpu_forward :91-?: loop
        # bounds split at int(x2)/int(y2) == di/dj < half)
        wx = jnp.stack([alpha if di >= half else 1.0 - alpha
                        for di in range(fs)], axis=-1)
        wy = jnp.stack([beta if dj >= half else 1.0 - beta
                        for dj in range(fs)], axis=-1)
        qw = (wy[..., :, None] * wx[..., None, :])[..., None]
    else:
        # quadrant by the DEFORMED position vs the landing point
        # (_deforconv :1441-1470: fracX <= x2, fracY <= y2)
        qx = jnp.where(frac_x <= x2[..., None, None], 1.0 - alpha[..., None, None],
                       alpha[..., None, None])
        qy = jnp.where(frac_y <= y2[..., None, None], 1.0 - beta[..., None, None],
                       beta[..., None, None])
        qw = (qx * qy)[..., None]

    out = jnp.sum(qw * bi, axis=(2, 3))
    fallback = jax.lax.stop_gradient(image.astype(jnp.float32))
    return jnp.where(valid[..., None], out, fallback).astype(image.dtype)


@functools.partial(jax.jit, static_argnames=("filter_size", "quadrant"))
def filter_interpolate_deformable(image: jax.Array, flow: jax.Array,
                                  filt: jax.Array, offsets: jax.Array,
                                  filter_size: int = 4,
                                  quadrant: str = "static") -> jax.Array:
    """Deformable-tap filter interpolation — the compiled-but-dormant
    variants of the op the paper is named after.

    ``quadrant="static"``  == ``FilterInterpolationLayer_gpu_forward``
    (filterinterpolation_cuda_kernel.cu:29-255): each 4x4 tap reads a
    bilinear sample at (clamped tap + learned offset); quadrant membership
    is by tap position, exactly as the active ``_ori`` variant.

    ``quadrant="deformed"`` == ``..._gpu_forward_kernelfunc_deforconv``
    (:1353-1498): same samples, but each tap joins the TL/TR/BL/BR quadrant
    by its DEFORMED position vs the landing point (fracX <= x2, fracY <= y2).

    Args:
      image:   (B, H, W, C).
      flow:    (B, H, W, 2) (fx, fy).
      filt:    (B, H, W, fs*fs) per-tap kernel.
      offsets: (B, H, W, 2*fs*fs) — first fs*fs channels per-tap Y offsets,
               next fs*fs X offsets (reference layout).

    Gradients (image/flow/filter/offset) come from autodiff, which
    reproduces the reference backward (:1580-2067): int() truncations and
    quadrant comparisons carry no derivative; offset grads flow through the
    bilinear phase weights (the ``BiInput`` terms), flow grads through
    alpha/beta.  The reference reads out-of-frame deformed corners
    unclamped (undefined behaviour); we clamp them to the frame.
    """
    core = functools.partial(_deformable_core, filter_size=filter_size,
                             quadrant=quadrant)
    return jax.vmap(core)(image, flow, filt, offsets)


@functools.partial(jax.jit, static_argnames=("filter_size",))
def filter_interpolate_nofilter_deformable(image: jax.Array, flow: jax.Array,
                                           offsets: jax.Array,
                                           filter_size: int = 4) -> jax.Array:
    """``..._gpu_forward_kernelfunc_nofilterwithdeforconv`` (:2070-2194):
    the deformed-quadrant variant without the per-tap filter weights
    (inputs: image, flow, offsets only)."""
    core = functools.partial(_deformable_core, filt=None,
                             filter_size=filter_size, quadrant="deformed")
    return jax.vmap(lambda im, fl, of: core(im, fl, offsets=of))(
        image, flow, offsets)


@functools.partial(jax.jit, static_argnames=("filter_size", "impl"))
def filter_interpolate(image: jax.Array, flow: jax.Array, filt: jax.Array,
                       filter_size: int = 4, impl: str = "gather") -> jax.Array:
    """Warp ``image`` by ``flow`` while convolving with a per-pixel adaptive kernel.

    Args:
      image: ``(B, H, W, C)`` source frame (any float dtype).
      flow:  ``(B, H, W, 2)`` flow in pixels, channel order ``(fx, fy)``.
      filt:  ``(B, H, W, filter_size**2)`` learned per-pixel kernel, row-major
             window order (``dj * fs + di``).
      filter_size: window size (reference always uses 4).
      impl: "slab" (default TPU path: banded one-hot Pallas kernel, exact
            for any f32 via 3 bf16 truncation limbs, lax.cond fallback),
            "slab8" (single-limb variant, exact for 8-bit-grid k/255
            frames — the eval drivers' input contract), "block" (exact,
            one blocked lax.gather), or "gather" (exact, per-tap gathers —
            the oracle).  (A round-1 approximate "separable" MXU
            formulation was removed in round 5: every shipped path is
            reference-exact.)

    Returns:
      ``(B, H, W, C)`` warped frame.  Matches
      ``FilterInterpolationLayer_gpu_forward_kernelfunc_ori`` bit-for-bit in
      f32, including its out-of-range copy-source fallback; gradients match
      the reference backward kernel (see module docstring).
    """
    if impl in ("slab", "slab8"):
        # Pallas only on real TPU (params resolve None off-TPU): interpret
        # mode is reserved for the dedicated parity tests, which call
        # _filter_interpolate_slab / _filter_interpolate_ctx directly.
        # "slab8" = single-limb fast path, exact ONLY for inputs on the
        # 8-bit grid (k/255 decoded frames) — the eval drivers' input
        # contract.  Wide-channel warps (c > 8, e.g. the 196-ch slow-motion
        # context) dispatch to the lane-gather kernel, whose cost per
        # channel octet is constant.
        params = _bandmm_pallas_params(*image.shape[1:])
        if params is None and image.shape[-1] > 8 and filter_size == 4:
            # the lane-gather kernel hardcodes the reference fs=4 window
            cparams = _ctx_pallas_params(*image.shape[1:])
            if cparams is not None:
                return _filter_interpolate_ctx(image, flow, filt,
                                               filter_size, *cparams)
        if params is None:      # shape outside the kernel contract / no TPU
            impl = "block"
        else:
            return _filter_interpolate_slab(image, flow, filt, filter_size,
                                            *params,
                                            1 if impl == "slab8" else 3)
    fn = {
        "gather": _filter_interpolate_2d,
        "block": _filter_interpolate_2d_block,
    }[impl]
    core = functools.partial(fn, filter_size=filter_size)
    return _batch_map(core, image, flow, filt)
