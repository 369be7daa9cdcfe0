"""Flow projection ops: scatter a flow field from the input-frame timeline onto
the target-time pixel grid.

TPU-native re-designs of three reference CUDA ops:

* ``flow_project``            — ``my_package/FlowProjection/flowprojection_cuda_kernel.cu``
  (forward :29-93, averaging :95-137, fill-hole :141-234, backward :237-301)
* ``depth_flow_project``      — ``my_package/DepthFlowProjection/depthflowprojection_cuda_kernel.cu``
  (forward :29-143, backward :242-340)
* ``min_depth_flow_project``  — ``my_package/MinDepthFlowProjection/mindepthflowprojection_cuda_kernel.cu``
  (z-buffer forward :28-117)

The CUDA versions resolve concurrent scatters with ``atomicAdd`` (or, for the
min-depth variant, an intentionally racy compare-and-overwrite).  On TPU we use
JAX's deterministic ``.at[].add`` / ``.at[].max`` scatters — same math, no
races.

Semantics of ``flow_project`` (per source pixel ``(y, x)`` with flow
``(fx, fy)``): land at ``x2 = x+fx, y2 = y+fy``; if inside the frame
(``0 <= x2 <= W-1``, ``0 <= y2 <= H-1``) scatter ``-fx, -fy`` *unweighted* into
the four integer neighbours ``(int(x2)|int(x2)+1, int(y2)|int(y2)+1)`` (each
clamped to the frame — at borders the same cell receives multiple
contributions, reproduced here) and bump a per-cell count; afterwards divide by
count where count > 0.  Holes (count == 0) stay 0, or are filled at inference
with the nearest-filled-neighbour average in the four cardinal directions
(``fill_holes``).

Gradients: for ``flow_project`` JAX autodiff of this construction reproduces
the reference backward exactly (``d fx = -sum_n g_x[n] / count[n]`` over the 4
scattered cells).  ``depth_flow_project`` uses a ``custom_vjp`` because the
reference's depth gradient (backward kernel :312-340) uses
``-(g/count) * (f - out)`` where true autodiff would give
``-(g/count) * (f + out)``; we replicate the reference formula exactly so
training dynamics match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _landing(flow):
    """Landing coords + validity for a (H,W,2) flow. Returns f32/ int32 maps.

    Inside a ``parallel.spatial.spatial_frame`` (row-sharded inference on a
    halo-extended local block) the validity bounds and the row clamp are
    evaluated in GLOBAL frame coordinates, and phantom rows outside the
    global frame (the first/last shard's edge-replicated halo) are masked as
    scatter sources — making the projection frame-exact under sharding, not
    just in the interior."""
    h, w = flow.shape[:2]
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xx + fx
    y2 = yy + fy

    from vfidkr_tpu.parallel.spatial import global_row_frame
    frame = global_row_frame(h)
    if frame is None:
        y_lo, y_hi = 0.0, float(h - 1)
        src_ok = True
    else:
        row0, hg, _, _ = frame
        # global frame bounds, expressed in local row coordinates
        y_lo = (-row0).astype(jnp.float32)
        y_hi = (hg - 1 - row0).astype(jnp.float32)
        yg = yy + row0.astype(jnp.float32)
        src_ok = (yg >= 0.0) & (yg <= float(hg - 1))

    valid = ((x2 >= 0.0) & (y2 >= y_lo)
             & (x2 <= float(w - 1)) & (y2 <= y_hi) & src_ok)
    ix_l = jnp.clip(jnp.floor(x2), 0.0, float(w - 1)).astype(jnp.int32)
    # global clamp first (frame semantics), then a local safety clip (binds
    # only for flows beyond the halo contract)
    iy_t = jnp.clip(jnp.clip(jnp.floor(y2), y_lo, y_hi),
                    0.0, float(h - 1)).astype(jnp.int32)
    ix_r = jnp.minimum(ix_l + 1, w - 1)
    iy_b = jnp.minimum(jnp.minimum(
        iy_t + 1, jnp.asarray(y_hi, jnp.float32).astype(jnp.int32)), h - 1)
    return fx, fy, valid, ix_l, ix_r, iy_t, iy_b


def _four_neighbour_lin(ix_l, ix_r, iy_t, iy_b, w):
    """Linearised indices of the 4 scatter targets, each (H*W,)."""
    return [
        (iy_t * w + ix_l).reshape(-1),
        (iy_t * w + ix_r).reshape(-1),
        (iy_b * w + ix_l).reshape(-1),
        (iy_b * w + ix_r).reshape(-1),
    ]


def _band_scatter_params(h, w, c):
    """(band, tw, rh) grid parameters for the banded Pallas scatter, or None
    if the shape doesn't fit its contract or there is no real TPU (interpret
    mode is reserved for the dedicated parity tests — too slow for model
    graphs on CPU).  tw=64/rh=31 keeps the strip width u_slab = tw+2*rh+2 at
    exactly one 128-lane tile (measured ~30% faster than tw=112/rh=32)."""
    if jax.default_backend() != "tpu":
        return None
    if c > 8 or h % 8 != 0:
        return None
    band = 32 if h % 32 == 0 else (16 if h % 16 == 0 else 8)
    if w % 64 == 0:
        return band, 64, 31
    for tw in (112, 128, 96, 160, 80, 56, 32):
        if w % tw == 0:
            return band, tw, 32
    return None


def _oversize_pred(iy_t, ix_l, vals, band, tw, rh):
    """True iff any contributing pixel lands beyond the banded kernel's
    (rv, rh) slab bounds (invalid pixels carry zeroed vals and clamped
    indices — they must not trigger the slow path)."""
    from vfidkr_tpu.ops.pallas.projection_band_kernel import _bounds
    b, h, w = iy_t.shape
    rv, _ = _bounds(band, tw, rh)
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    contributes = jnp.any(vals != 0.0, axis=-1)
    return jnp.any(contributes & ((jnp.abs(iy_t - yy) > rv - 1)
                                  | (jnp.abs(ix_l - xx) > rh - 1)))


def _scatter4_cond(iy_t, iy_b, ix_l, ix_r, vals, band, tw, rh=32, post=None,
                   int_channels=0):
    """Banded Pallas scatter (5x fewer MACs than the whole-grid one-hot
    einsum — see ops/pallas/projection_band_kernel.py) with a whole-call
    lax.cond fallback to the XLA path when any contributing pixel lands
    beyond the (rv, rh) slab bounds.

    ``post`` (accum -> out) runs INSIDE both cond branches: an
    associative-scan (hole fill) consuming a conditional's output schedules
    pathologically on this TPU toolchain (+7 ms at 448x256 measured), so
    downstream work must live in the branches."""
    from vfidkr_tpu.ops.pallas.projection_band_kernel import (
        scatter4_band_pallas)
    post = post if post is not None else (lambda acc: acc)
    oversize = _oversize_pred(iy_t, ix_l, vals, band, tw, rh)

    def fast(args):
        return post(scatter4_band_pallas(*args, band=band, tw=tw, rh=rh,
                                         int_channels=int_channels))

    def exact(args):
        iy_t, iy_b, ix_l, ix_r, vals = args
        return post(jax.vmap(_scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals))

    return jax.lax.cond(oversize, exact, fast,
                        (iy_t, iy_b, ix_l, ix_r, vals))


def _scatter4_banded(iy_t, iy_b, ix_l, ix_r, vals, band, tw, rh=32):
    return _scatter4_cond(iy_t, iy_b, ix_l, ix_r, vals, band, tw, rh)


def _scatter4_transpose(iy_t, iy_b, ix_l, ix_r, g, row_chunk=32):
    """VJP of the 4-neighbour scatter w.r.t. vals: per-pixel sum of ``g`` over
    its 4 target cells, as dense chunked matmuls (gather-free)."""
    h, w = iy_t.shape
    c = g.shape[-1]
    g2 = g.reshape(h, w * c).astype(jnp.float32)
    outs = []
    for s in range(0, h, row_chunk):
        e = min(s + row_chunk, h)
        pc = (e - s) * w
        vv = jax.lax.broadcasted_iota(jnp.int32, (pc, h), 1)
        iyt = iy_t[s:e].reshape(pc, 1)
        iyb = iy_b[s:e].reshape(pc, 1)
        a = (vv == iyt).astype(jnp.float32) + (vv == iyb).astype(jnp.float32)
        uu = jax.lax.broadcasted_iota(jnp.int32, (pc, w), 1)
        ixl = ix_l[s:e].reshape(pc, 1)
        ixr = ix_r[s:e].reshape(pc, 1)
        b = (uu == ixl).astype(jnp.float32) + (uu == ixr).astype(jnp.float32)
        t1 = jnp.matmul(a, g2,
                        precision=jax.lax.Precision.HIGH).reshape(pc, w, c)
        outs.append(jnp.einsum("pu,puc->pc", b, t1,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGH))
    return jnp.concatenate(outs, 0).reshape(h, w, c)


@jax.custom_vjp
def _scatter4(iy_t, iy_b, ix_l, ix_r, vals):
    """Batched 4-neighbour scatter-add ((B,H,W) indices, (B,H,W,C) vals) with
    a gather-free VJP.  Dispatches to the Pallas MXU kernel on TPU, else the
    XLA chunked one-hot einsum.  Batch is handled inside the kernel as a grid
    dimension (vmap over pallas_call would vectorise the body and blow VMEM).
    """
    params = _band_scatter_params(iy_t.shape[1], iy_t.shape[2],
                                  vals.shape[-1])
    if params is not None:
        return _scatter4_banded(iy_t, iy_b, ix_l, ix_r, vals, *params)
    return jax.vmap(_scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals)


def _scatter4_fwd(iy_t, iy_b, ix_l, ix_r, vals):
    return _scatter4(iy_t, iy_b, ix_l, ix_r, vals), (iy_t, iy_b, ix_l, ix_r)


def _scatter4_bwd(res, g):
    import numpy as _np
    iy_t, iy_b, ix_l, ix_r = res
    zero_int = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    b, h, w = iy_t.shape
    import os
    params = _band_scatter_params(h, w, g.shape[-1])
    if os.environ.get("VFIDKR_XLA_BWD"):   # A/B switch, see filter op
        params = None
    if params is None:
        dvals = jax.vmap(_scatter4_transpose)(iy_t, iy_b, ix_l, ix_r, g)
    else:
        # banded Pallas gather (the scatter's transpose) with a whole-call
        # cond to the XLA transpose when ANY pixel's target leaves the slab
        # (the transpose reads for every pixel, contributing or not, so its
        # predicate is over all pixels — stricter than the forward's)
        from vfidkr_tpu.ops.pallas.projection_band_kernel import (
            _bounds, scatter4_bwd_pallas)
        band, tw, rh = params
        rv, _ = _bounds(band, tw, rh)
        yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
        oversize = jnp.any((jnp.abs(iy_t - yy) > rv - 1)
                           | (jnp.abs(ix_l - xx) > rh - 1))
        dvals = jax.lax.cond(
            oversize,
            lambda g: jax.vmap(_scatter4_transpose)(iy_t, iy_b, ix_l, ix_r,
                                                    g),
            lambda g: scatter4_bwd_pallas(g.astype(jnp.float32), iy_t, iy_b,
                                          ix_l, ix_r, band=band, tw=tw,
                                          rh=rh),
            g)
    return (zero_int(iy_t), zero_int(iy_b), zero_int(ix_l), zero_int(ix_r),
            dvals)


_scatter4.defvjp(_scatter4_fwd, _scatter4_bwd)


def _scatter4_onehot(iy_t, iy_b, ix_l, ix_r, vals, row_chunk=32):
    """Scatter ``vals[y,x,c]`` into the 4 neighbour cells — as dense one-hot
    contractions on the MXU instead of a scatter HLO (TPU scatters serialise).

    ``A[y,x,v] = 1{v==iy_t} + 1{v==iy_b}`` (2 where they coincide at the
    border — reproducing the reference's double atomicAdd), ``B`` likewise
    over columns; the result is ``sum_{y,x} A*B*vals -> (v,u,c)``, accumulated
    over row chunks to bound the intermediate.  The einsum transpose gives the
    backward as a dense gather-free contraction too.  (A bf16 hi/lo-split
    variant measured no faster on v5e — the cost is not matmul passes.)
    """
    h, w = iy_t.shape
    c = vals.shape[-1]
    acc = jnp.zeros((h, w, c), jnp.float32)
    for s in range(0, h, row_chunk):
        e = min(s + row_chunk, h)
        vv = jax.lax.broadcasted_iota(jnp.int32, (e - s, w, h), 2)
        a = ((vv == iy_t[s:e, :, None]).astype(jnp.float32)
             + (vv == iy_b[s:e, :, None]).astype(jnp.float32))
        uu = jax.lax.broadcasted_iota(jnp.int32, (e - s, w, w), 2)
        b = ((uu == ix_l[s:e, :, None]).astype(jnp.float32)
             + (uu == ix_r[s:e, :, None]).astype(jnp.float32))
        acc = acc + jnp.einsum("yxv,yxu,yxc->vuc", a, b, vals[s:e],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGH)
    return acc


def _last_valid_scan2(vals, filled, axis):
    """Inclusive 'last valid value' scans along ``axis``, BOTH directions in
    one batched associative scan (forward + flipped stacked on a leading
    axis; the filled mask stays 1-channel and broadcasts in the combine).
    Gather-free: a log-depth associative scan on TPU.

    Returns ((fwd_vals, fwd_exists), (rev_vals, rev_exists))."""
    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    flip = lambda x: jnp.flip(x, axis)
    v2 = jnp.stack([vals, flip(vals)])
    f2 = jnp.stack([filled, flip(filled)])
    v, f = jax.lax.associative_scan(combine, (v2, f2), axis=axis + 1)
    return (v[0], f[0]), (flip(v[1]), flip(f[1]))


def fill_holes(count: jax.Array, out: jax.Array) -> jax.Array:
    """Fill hole cells (count <= 0) with the mean of the nearest filled cell in
    each of the 4 cardinal directions (left/right/up/down).

    Jittable reformulation of the sequential directional search in
    ``FlowFillhole_kernelfunc`` (flowprojection_cuda_kernel.cu:141-234): the
    per-pixel while-loops become "last filled value" associative scans along
    rows and columns — no gathers, no scatters.

    Args:
      count: (H, W) scatter hit count.
      out:   (H, W, 2) averaged projected flow (holes are 0).
    """
    filled = (count > 0.0)[..., None]

    from vfidkr_tpu.parallel.spatial import current_spatial_frame
    ctx = current_spatial_frame()
    if ctx is None:
        (left_v, left_e), (right_v, right_e) = _last_valid_scan2(out, filled, 1)
        (up_v, up_e), (down_v, down_e) = _last_valid_scan2(out, filled, 0)
    else:
        # Row-sharded EXACT fill (the reference's search is frame-global,
        # flowprojection_cuda_kernel.cu:141-234).  Halo-band cells hold
        # partial scatter sums (sources beyond the block are missing), so
        # the vertical scans run over INTERIOR cells only and the
        # cross-shard state is carried by all-gathered per-shard interior
        # summaries combined in shard order over ICI.  Horizontal scans see
        # full rows and need no fix.  Halo-band OUTPUT rows are not exact
        # (they are cropped by the shard wrapper).
        axis, halo = ctx
        h_ext = count.shape[0]
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        rr = jax.lax.broadcasted_iota(jnp.int32, filled.shape, 0)
        interior = (rr >= halo) & (rr < h_ext - halo)
        filled_i = filled & interior

        (left_v, left_e), (right_v, right_e) = _last_valid_scan2(
            out, filled, 1)
        (up_v, up_e), (down_v, down_e) = _last_valid_scan2(out, filled_i, 0)

        def carried(v, e, summary_row, use_mask_fn, order):
            sv = jax.lax.all_gather(v[summary_row], axis)      # (n, W, C)
            se = jax.lax.all_gather(e[summary_row], axis)      # (n, W, 1)
            cv = jnp.zeros_like(v[0])
            ce = jnp.zeros_like(e[0])
            for j in order:
                use = use_mask_fn(j) & se[j]
                cv = jnp.where(use, sv[j], cv)
                ce = ce | use
            return jnp.where(e, v, cv), e | ce

        up_v, up_e = carried(up_v, up_e, h_ext - halo - 1,
                             lambda j: j < idx, range(n))
        down_v, down_e = carried(down_v, down_e, halo,
                                 lambda j: j > idx, range(n - 1, -1, -1))

    exists = [e.astype(out.dtype) for e in (left_e, right_e, up_e, down_e)]
    vals = [left_v, right_v, up_v, down_v]

    num = sum(e * v for e, v in zip(exists, vals))
    den = sum(exists)
    filled_val = jnp.where(den > 0, num / jnp.maximum(den, 1.0), out)
    return jnp.where(filled, out, filled_val)


# ---------------------------------------------------------------------------
# FlowProjection
# ---------------------------------------------------------------------------

def _scatter_prep(flow):
    """Per-image landing/vals prep (vmapped around the batched scatter)."""
    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = _landing(flow)
    validf = valid.astype(jnp.float32)
    vals = jnp.stack([-fx * validf, -fy * validf, validf], axis=-1)
    return iy_t, iy_b, ix_l, ix_r, vals


def fill_holes_batched(count: jax.Array, out: jax.Array) -> jax.Array:
    """Batched hole fill: the in-VMEM Pallas doubling-scan kernel when the
    field fits (see ops/pallas/fillhole_kernel.py; ~6x faster than the XLA
    associative scans at 448x256), else the XLA scans."""
    from vfidkr_tpu.ops.pallas.fillhole_kernel import (
        fill_holes_fits, fill_holes_pallas)
    from vfidkr_tpu.parallel.spatial import current_spatial_frame
    b, h, w = count.shape
    if (jax.default_backend() == "tpu" and fill_holes_fits(h, w)
            and current_spatial_frame() is None):
        # the in-VMEM kernel is block-local; row-sharded fills need the
        # cross-shard scan path in fill_holes
        return fill_holes_pallas(count, out)
    return jax.vmap(fill_holes)(count, out)


def _finalize_batched(acc, cnt, do_fill, dtype):
    out = jnp.where(cnt[..., None] > 0,
                    acc / jnp.maximum(cnt, 1.0)[..., None], 0.0)
    if do_fill:
        out = fill_holes_batched(jax.lax.stop_gradient(cnt),
                                 jax.lax.stop_gradient(out))
    return out.astype(dtype)


def _finalize(acc, cnt, do_fill, dtype):
    out = jnp.where(cnt[..., None] > 0, acc / jnp.maximum(cnt, 1.0)[..., None], 0.0)
    if do_fill:
        out = fill_holes(jax.lax.stop_gradient(cnt), jax.lax.stop_gradient(out))
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("hole_fill",))
def flow_project(flow: jax.Array, hole_fill: bool = False) -> jax.Array:
    """Project a (B,H,W,2) flow field F(0→1)·t onto the target-time grid.

    ``hole_fill`` mirrors the reference's inference-only behaviour
    (``FlowProjectionLayer.py:23``: fillhole = not requires_grad).
    """
    iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(_scatter_prep)(flow)
    params = _band_scatter_params(*iy_t.shape[1:], vals.shape[-1])
    if hole_fill and params is not None:
        # inference path (fill stops gradients anyway): run average + hole
        # fill INSIDE the cond branches — see _scatter4_cond on why
        post = lambda acc: _finalize_batched(acc[..., :2], acc[..., 2],
                                             hole_fill, flow.dtype)
        # the trailing count channel is {0,1} — single-limb exact
        return _scatter4_cond(iy_t, iy_b, ix_l, ix_r, vals, *params,
                              post=post, int_channels=1)
    accum = _scatter4(iy_t, iy_b, ix_l, ix_r, vals)
    return _finalize_batched(accum[..., :2], accum[..., 2], hole_fill,
                             flow.dtype)


# ---------------------------------------------------------------------------
# DepthFlowProjection (depth-weighted average, custom reference-exact VJP)
# ---------------------------------------------------------------------------

def _depth_prep(flow, depth_inv):
    """Per-image landing/vals prep for the depth-weighted scatter."""
    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = _landing(flow)
    d = depth_inv.astype(jnp.float32) * valid.astype(jnp.float32)
    vals = jnp.stack([-fx * d, -fy * d, d], axis=-1)
    return iy_t, iy_b, ix_l, ix_r, vals


def _depth_flow_project_fwd(flow, depth_inv, hole_fill):
    """Batched forward. Returns (final, out_unfilled, cnt); depth_inv
    (B,H,W) positive.  The average + optional hole fill run inside the
    banded scatter's lax.cond branches (see _scatter4_cond)."""
    iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(_depth_prep)(flow, depth_inv)

    def post(accum):
        acc, cnt = accum[..., :2], accum[..., 2]
        out = jnp.where(cnt[..., None] > 0,
                        acc / jnp.maximum(cnt, 1e-30)[..., None], 0.0)
        final = fill_holes_batched(cnt, out) if hole_fill else out
        return final, out, cnt

    params = _band_scatter_params(*iy_t.shape[1:], vals.shape[-1])
    if params is not None:
        return _scatter4_cond(iy_t, iy_b, ix_l, ix_r, vals, *params,
                              post=post)
    return post(_scatter4(iy_t, iy_b, ix_l, ix_r, vals))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _depth_flow_project_core(flow, depth_inv, hole_fill):
    final, _, _ = _depth_flow_project_fwd(flow, depth_inv, hole_fill)
    return final.astype(flow.dtype)


def _dfp_fwd(flow, depth_inv, hole_fill):
    final, out, cnt = _depth_flow_project_fwd(flow, depth_inv, hole_fill)
    res = (flow, depth_inv, cnt, out)
    return final.astype(flow.dtype), res


def _dfp_bwd_2d(flow, depth_inv, cnt, out, g):
    """Reference-exact per-image backward (see _dfp_bwd).

    grad_flow[p]  = -sum_n g[n] * d_p / cnt[n]            (4 neighbour cells n)
    grad_depth[p] = -sum_n sum_xy g_xy[n] / cnt[n] * (f_xy_p - out_xy[n])

    Note the reference's ``(f - out)`` term — true autodiff of the forward
    would give ``(f + out)``; we replicate the reference formula.  Hole-filled
    cells never receive gradient in the reference (fillhole only runs at
    inference), matching this VJP which ignores the fill.
    """
    h, w = flow.shape[:2]
    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = _landing(flow)
    validf = valid.astype(jnp.float32)
    d = depth_inv.astype(jnp.float32)

    g = g.reshape(h * w, 2)
    cnt_flat = jnp.maximum(cnt.reshape(-1), 1e-30)
    out_flat = out.reshape(h * w, 2)

    gfx = jnp.zeros((h, w), jnp.float32)
    gfy = jnp.zeros((h, w), jnp.float32)
    gd = jnp.zeros((h, w), jnp.float32)
    for lin in _four_neighbour_lin(ix_l, ix_r, iy_t, iy_b, w):
        gn = jnp.take(g, lin, axis=0).reshape(h, w, 2)
        cn = jnp.take(cnt_flat, lin, axis=0).reshape(h, w)
        on = jnp.take(out_flat, lin, axis=0).reshape(h, w, 2)
        gfx = gfx - gn[..., 0] * d / cn
        gfy = gfy - gn[..., 1] * d / cn
        gd = gd - (gn[..., 0] / cn) * (fx - on[..., 0]) \
                - (gn[..., 1] / cn) * (fy - on[..., 1])

    gflow = jnp.stack([gfx * validf, gfy * validf], axis=-1).astype(flow.dtype)
    gdepth = (gd * validf).astype(depth_inv.dtype)
    return gflow, gdepth


def _gather4_batched(field, iy_t, iy_b, ix_l, ix_r):
    """Per-source-pixel sum of ``field`` over the 4 neighbour cells.
    Dispatches to the banded Pallas gather on TPU (whole-call cond to the
    take-based path when any pixel's target leaves the slab); XLA takes
    otherwise."""
    b, h, w, c = field.shape

    def takes(field):
        def one(field, iy_t, iy_b, ix_l, ix_r):
            f2 = field.reshape(h * w, c)
            acc = jnp.zeros((h, w, c), jnp.float32)
            for lin in _four_neighbour_lin(ix_l, ix_r, iy_t, iy_b, w):
                acc = acc + jnp.take(f2, lin, axis=0).reshape(h, w, c)
            return acc
        return jax.vmap(one)(field, iy_t, iy_b, ix_l, ix_r)

    import os
    params = _band_scatter_params(h, w, c)
    if params is None or os.environ.get("VFIDKR_XLA_BWD"):
        return takes(field)
    from vfidkr_tpu.ops.pallas.projection_band_kernel import (
        _bounds, scatter4_bwd_pallas)
    band, tw, rh = params
    rv, _ = _bounds(band, tw, rh)
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    oversize = jnp.any((jnp.abs(iy_t - yy) > rv - 1)
                       | (jnp.abs(ix_l - xx) > rh - 1))
    return jax.lax.cond(
        oversize, takes,
        lambda f: scatter4_bwd_pallas(f, iy_t, iy_b, ix_l, ix_r,
                                      band=band, tw=tw, rh=rh),
        field)


def _dfp_bwd(hole_fill, res, g):
    """Batched reference-exact backward
    (depthflowprojection_cuda_kernel.cu:242-340):

    grad_flow[p]  = -sum_n g[n] * d_p / cnt[n]            (4 neighbour cells)
    grad_depth[p] = -sum_n sum_xy g_xy[n] / cnt[n] * (f_xy_p - out_xy[n])

    Note the reference's ``(f - out)`` term — true autodiff of the forward
    would give ``(f + out)``; we replicate the reference formula.  Hole-filled
    cells never receive gradient in the reference (fillhole only runs at
    inference), matching this VJP which ignores the fill.

    Every term is a 4-neighbour sum of a per-CELL field, so the whole
    backward is ONE 4-neighbour gather of the 3-channel field
    ``[g_x/cnt, g_y/cnt, (g_x*out_x + g_y*out_y)/cnt]`` followed by
    elementwise combination (replaces 12 per-neighbour ``jnp.take`` gathers;
    on TPU the gather runs as the banded Pallas kernel)."""
    flow, depth_inv, cnt, out = res
    g = g.astype(jnp.float32)
    cn = jnp.maximum(cnt, 1e-30)[..., None]
    a = g / cn                                           # (B, H, W, 2)
    field = jnp.concatenate(
        [a, jnp.sum(a * out, axis=-1, keepdims=True)], axis=-1)

    def per_image(flow):
        return _landing(flow)

    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = jax.vmap(per_image)(flow)
    s = _gather4_batched(field, iy_t, iy_b, ix_l, ix_r)  # (B, H, W, 3)

    validf = valid.astype(jnp.float32)
    d = depth_inv.astype(jnp.float32)
    gfx = -s[..., 0] * d * validf
    gfy = -s[..., 1] * d * validf
    gd = -(s[..., 0] * fx + s[..., 1] * fy - s[..., 2]) * validf
    gflow = jnp.stack([gfx, gfy], axis=-1).astype(flow.dtype)
    return gflow, gd.astype(depth_inv.dtype)


_depth_flow_project_core.defvjp(_dfp_fwd, _dfp_bwd)


@functools.partial(jax.jit, static_argnames=("hole_fill",))
def depth_flow_project(flow: jax.Array, depth_inv: jax.Array,
                       hole_fill: bool = False) -> jax.Array:
    """Depth-weighted flow projection: closer pixels (larger inverse depth)
    dominate the average.  flow (B,H,W,2), depth_inv (B,H,W) or (B,H,W,1).
    """
    if depth_inv.ndim == flow.ndim:
        depth_inv = depth_inv[..., 0]
    return _depth_flow_project_core(flow, depth_inv, hole_fill)


# ---------------------------------------------------------------------------
# MinDepthFlowProjection (z-buffer on the top-left neighbour only)
# ---------------------------------------------------------------------------

def _min_depth_flow_project_2d(flow, depth_inv, do_fill):
    h, w = flow.shape[:2]
    fx, fy, valid, ix_l, ix_r, iy_t, iy_b = _landing(flow)
    d = depth_inv.astype(jnp.float32) * valid.astype(jnp.float32)

    lin_tl = (iy_t * w + ix_l).reshape(-1)
    dflat = d.reshape(-1)

    # pass 1: max weight per TL cell (the reference updates only the TL
    # neighbour; its racy compare-and-overwrite becomes a deterministic
    # scatter-max here)
    dmax = jnp.zeros((h * w,), jnp.float32).at[lin_tl].max(dflat)

    # pass 2: deterministic winner among ties — highest linear source index
    src = jax.lax.broadcasted_iota(jnp.int32, (h * w,), 0)
    is_best = (dflat > 0) & (dflat >= jnp.take(dmax, lin_tl))
    winner = jnp.full((h * w,), -1, jnp.int32).at[lin_tl].max(
        jnp.where(is_best, src, -1))

    has = winner >= 0
    wsafe = jnp.clip(winner, 0)
    neg_flow = jnp.stack([-fx.reshape(-1), -fy.reshape(-1)], axis=-1)
    out = jnp.where(has[:, None], jnp.take(neg_flow, wsafe, axis=0), 0.0)
    out = out.reshape(h, w, 2)
    cnt = dmax.reshape(h, w)
    if do_fill:
        out = fill_holes(cnt, out)
    return out.astype(flow.dtype)


@functools.partial(jax.jit, static_argnames=("hole_fill",))
def min_depth_flow_project(flow: jax.Array, depth_inv: jax.Array,
                           hole_fill: bool = False) -> jax.Array:
    """Z-buffer flow projection: each target cell keeps the flow of its
    closest (max inverse-depth) contributor.  Legacy op (not used by the
    active models; reference builds it and tests it in test_module.py).
    """
    if depth_inv.ndim == flow.ndim:
        depth_inv = depth_inv[..., 0]
    return jax.vmap(functools.partial(_min_depth_flow_project_2d, do_fill=hole_fill))(
        flow, depth_inv)
