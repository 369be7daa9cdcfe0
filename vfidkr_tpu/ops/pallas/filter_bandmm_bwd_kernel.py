"""Pallas TPU kernel: banded BACKWARD of the filter-interpolation op.

The round-4 training profile showed the train step dominated by the op
backwards: ``filter_interpolate``'s VJP re-ran the XLA blocked-gather path
under ``jax.vjp`` (a gather recompute + a gather-transpose **scatter HLO**
for grad→image — TPU scatters serialise).  This kernel computes the whole
custom VJP with the same banded one-hot-matmul structure as the forward
(ops/pallas/filter_bandmm_kernel.py), at roughly 2x the forward's MXU work:

Given the forward ``out[p, c] = sum_t kw[p, t] * img[tap(p, t), c]`` (taps =
the fs x fs window at (base_v, base_u), reference
``filterinterpolation_cuda_kernel.cu:2827-3125``), and the cotangent
``g[p, c]`` (pre-zeroed at invalid pixels — their forward is a
``stop_gradient`` copy), per (batch, column tile, row band):

* **T = grad→kw** ``T[p, t] = sum_c g[p, c] * img[tap(p, t), c]``:
  stage 1 re-runs the forward's horizontal one-hot dots
  ``slab_limb (s, u_slab) x onehot_di (u_slab, P) -> (s, P)``; stage 2
  extracts each vertical tap with a per-dj masked sublane reduce and
  multiplies by ``g`` on the VPU.  The caller chains T through the
  (elementwise, XLA-autodiff) weight prep ``kw = filt * wx(alpha) *
  wy(beta)`` to get grad→filter and grad→flow — reproducing the reference's
  quadrant finite-difference flow gradient exactly (see
  ops/filter_interpolation.py module docstring).
* **grad→image** ``gimg[q, c] = sum_{p,t: tap(p,t)=q} kw[p,t] * g[p,c]``:
  the transpose scatter as banded MXU dots — for each tap column di, a
  row-multihot carrying the exact-f32 per-tap values
  ``wv = kw[p, dj*fs+di] * g[p, c]`` (computed f32 on the VPU, split into
  bf16 truncation limbs in-kernel; the fs row targets are distinct so each
  matrix element holds at most one value) is dotted with the plain column
  one-hot: ``rowW_limb (s, P) x colhot (P, u_slab) -> (s, u_slab)`` slabs,
  accumulated into per-(batch, column-tile, row-group) strips resident in
  VMEM across the band revisits (same grouping as
  ops/pallas/projection_band_kernel.py).  The caller overlap-adds the
  strips and folds the edge-padding margins (the VJP of the forward's
  ``mode="edge"`` pad).

MXU cost: fs * C * (limbs_img + limbs_g) dots per tile — with both limb
counts 3 (exact for any f32 image and cotangent) that is exactly 2x the
forward kernel's dot count.

Exactness contract: identical to the forward kernel — callers use the SAME
(band, tw, rh) geometry and the same whole-call oversize ``lax.cond``, so
one flag covers fwd and bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfidkr_tpu.ops.pallas.filter_bandmm_kernel import _S, _FS, _rv_for


def _make_bwd_kernel(p: int, u_slab: int, c: int, limbs_img: int,
                     limbs_g: int, s: int, group: int, band: int):
    fs = _FS

    def kernel(slab_ref, bul_ref, bs_ref, kw_ref, g_ref, t_out_ref,
               strip_ref):
        i = pl.program_id(2)

        @pl.when(i % group == 0)
        def _():
            strip_ref[:] = jnp.zeros_like(strip_ref)

        def trunc(x):
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(x, jnp.uint32)
                & jnp.uint32(0xFFFF0000), jnp.float32)

        def limbs_of(x, n):
            if n == 1:
                return [x.astype(jnp.bfloat16)]
            l0 = trunc(x)
            r1 = x - l0
            if n == 2:
                return [l0.astype(jnp.bfloat16), r1.astype(jnp.bfloat16)]
            t1 = trunc(r1)
            return [l0.astype(jnp.bfloat16), t1.astype(jnp.bfloat16),
                    (r1 - t1).astype(jnp.bfloat16)]

        # full _S sublane rows (s <= _S; rows >= s never match a tap row —
        # bs <= s - fs — so they contribute exact zeros)
        bul = bul_ref[0, 0, 0, 0]                    # (P,) int32 on lanes
        bs = bs_ref[0, 0, 0, 0]
        uiota_sp = jax.lax.broadcasted_iota(jnp.int32, (u_slab, p), 0)
        uiota_ps = jax.lax.broadcasted_iota(jnp.int32, (p, u_slab), 1)
        riota = jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)

        slab = [slab_ref[0, 0, 0, cc] for cc in range(c)]
        slab_l = [limbs_of(x, limbs_img) for x in slab]
        g = [g_ref[0, 0, 0, cc] for cc in range(c)]   # (P,) f32

        r0 = (i % group) * band
        for di in range(fs):
            onehot_sp = (uiota_sp == bul[None, :] + di).astype(jnp.bfloat16)
            colhot_ps = (uiota_ps == bul[:, None] + di).astype(jnp.bfloat16)
            for cc in range(c):
                # ---- T stage 1: column select (MXU), exact via limbs
                t = None
                for lv in slab_l[cc]:
                    d = jax.lax.dot_general(
                        lv, onehot_sp, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)       # (s, P)
                    t = d if t is None else t + d
                # ---- grad image: weighted row-multihot x column one-hot
                wv = [kw_ref[0, 0, 0, dj * fs + di] * g[cc]       # (P,) f32
                      for dj in range(fs)]
                wv_l = [limbs_of(v, limbs_g) for v in wv]
                gacc = None
                for l in range(limbs_g):
                    roww = jnp.zeros((s, p), jnp.float32)
                    for dj in range(fs):
                        roww = jnp.where(riota == bs[None, :] + dj,
                                         wv_l[dj][l].astype(jnp.float32)
                                         [None, :], roww)
                    d = jax.lax.dot_general(
                        roww.astype(jnp.bfloat16), colhot_ps,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (s, u_slab)
                    gacc = d if gacc is None else gacc + d
                strip_ref[0, 0, 0, cc, pl.ds(r0, s), :] += gacc
                # ---- T stage 2: per-dj vertical tap extraction (VPU)
                for dj in range(fs):
                    tap = jnp.sum(jnp.where(riota == bs[None, :] + dj, t,
                                            0.0), axis=0)        # (P,)
                    idx = dj * fs + di
                    if cc == 0:
                        t_out_ref[0, 0, 0, idx] = g[cc] * tap
                    else:
                        t_out_ref[0, 0, 0, idx] += g[cc] * tap

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("band", "tw", "rh", "limbs_img",
                                    "limbs_g", "group"))
def filter_bandmm_bwd_pallas(image, base_v, base_u, kw, g,
                             band: int = 8, tw: int = 64, rh: int = 30,
                             limbs_img: int = 3, limbs_g: int = 3,
                             group: int = 16):
    """Banded filter-interpolation backward (valid-branch only).

    Args:
      image:  (B, H, W, C) f32 source frames (as in the forward).
      base_v: (B, H, W) int32 window top row, clamp-padded coords.
      base_u: (B, H, W) int32 window left col, clamp-padded coords.
      kw:     (B, H, W, fs*fs) f32 combined per-tap weights.
      g:      (B, H, W, C) f32 cotangent, ZEROED at invalid pixels.
      band/tw/rh: the forward kernel's geometry — same exactness bounds.
      limbs_img / limbs_g: bf16 truncation limbs for the image (T path) and
        for the kw*g scatter values (3 = exact for any f32).

    Returns:
      (grad_image, T): grad_image (B, H, W, C) f32 — the transpose scatter
      incl. the edge-pad fold; T (B, H, W, fs*fs) f32 = dL/d kw per tap.
    """
    b, h, w, c = image.shape
    fs = _FS
    rv = _rv_for(band)
    s = band + 2 * rv + fs - 1
    assert h % band == 0 and w % tw == 0, (h, w, band, tw)
    nb, nj = h // band, w // tw
    u_slab = tw + 2 * rh + fs - 1
    p = band * tw

    group = min(group, nb)
    while nb % group:
        group -= 1
    ng = nb // group
    hp_g = group * band + (_S - band)

    pad_lo, pad_hi = fs // 2 - 1, fs - fs // 2
    icf = image.transpose(0, 3, 1, 2)
    ipad = jnp.pad(icf, ((0, 0), (0, 0),
                         (rv + pad_lo, rv + pad_hi + (_S - s)),
                         (rh + pad_lo, rh + pad_hi)), mode="edge")
    rows = jnp.stack([jax.lax.dynamic_slice_in_dim(ipad, b0 * band, _S,
                                                   axis=2)
                      for b0 in range(nb)], axis=1)
    slabs = jnp.stack([jax.lax.dynamic_slice_in_dim(rows, j * tw, u_slab,
                                                    axis=4)
                       for j in range(nj)], axis=2)   # (B,nb,nj,C,_S,u)

    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    bs = jnp.clip(base_v + rv - (yy // band) * band, 0, s - fs)
    bul = jnp.clip(base_u + rh - (xx // tw) * tw, 0, u_slab - fs)

    def tile_px(x, k):
        return (x.reshape(b, nb, band, nj, tw, k)
                .transpose(0, 1, 3, 5, 2, 4).reshape(b, nb, nj, k, p))

    bs_t = tile_px(bs[..., None], 1)
    bul_t = tile_px(bul[..., None], 1)
    kw_t = tile_px(kw, fs * fs)
    g_t = tile_px(g.astype(jnp.float32), c)

    # grid (b, nj, nb): row bands innermost so each (batch, col-tile) strip
    # accumulates in VMEM across its group's bands
    px_spec = lambda k: pl.BlockSpec((1, 1, 1, k, p),
                                     lambda bi, j, i: (bi, i, j, 0, 0),
                                     memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, 1, 1, c, _S, u_slab),
                             lambda bi, j, i: (bi, i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    t_spec = px_spec(fs * fs)
    strip_spec = pl.BlockSpec((1, 1, 1, c, hp_g, u_slab),
                              lambda bi, j, i: (bi, j, i // group, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    t_tiles, strips = pl.pallas_call(
        _make_bwd_kernel(p, u_slab, c, limbs_img, limbs_g, _S, group, band),
        grid=(b, nj, nb),
        in_specs=[slab_spec, px_spec(1), px_spec(1), px_spec(fs * fs),
                  px_spec(c)],
        out_specs=(t_spec, strip_spec),
        out_shape=(jax.ShapeDtypeStruct((b, nb, nj, fs * fs, p), jnp.float32),
                   jax.ShapeDtypeStruct((b, nj, ng, c, hp_g, u_slab),
                                        jnp.float32)),
        interpret=jax.default_backend() == "cpu",
    )(slabs, bul_t, bs_t, kw_t, g_t)

    T = (t_tiles.reshape(b, nb, nj, fs * fs, band, tw)
         .transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, fs * fs))

    # overlap-add the strips into the padded-grad frame, then fold the
    # edge-pad margins (VJP of the forward's mode="edge" pad)
    # ipad's row extent incl. the (_S - s) sublane-pad tail (strip rows
    # beyond each band's s tap rows are exact zeros but must fit the add)
    hp = h + 2 * rv + fs - 1 + (_S - s)
    wp = w + 2 * rh + fs - 1
    gip = jnp.zeros((b, c, hp, wp), jnp.float32)
    for gi in range(ng):
        for j in range(nj):
            r0 = gi * group * band
            gip = gip.at[:, :, r0:r0 + hp_g, j * tw:j * tw + u_slab].add(
                strips[:, j, gi])

    # edge-pad fold (VJP of mode="edge"): rows first at full width, then
    # cols — separable padding makes the order immaterial and the corners
    # correct.  Tap rows span [0, h + fs - 2] in clamp-padded coords (row 0
    # = the replicated row above the frame; the last pad_hi rows replicate
    # the bottom row).
    core = gip[:, :, rv:rv + h + fs - 1, rh:rh + w + fs - 1]
    rows = core[:, :, pad_lo:pad_lo + h, :]
    rows = rows.at[:, :, 0, :].add(jnp.sum(core[:, :, :pad_lo, :], axis=2))
    rows = rows.at[:, :, h - 1, :].add(
        jnp.sum(core[:, :, pad_lo + h:, :], axis=2))
    gimg = rows[:, :, :, pad_lo:pad_lo + w]
    gimg = gimg.at[:, :, :, 0].add(jnp.sum(rows[:, :, :, :pad_lo], axis=3))
    gimg = gimg.at[:, :, :, w - 1].add(
        jnp.sum(rows[:, :, :, pad_lo + w:], axis=3))
    return gimg.transpose(0, 2, 3, 1), T
