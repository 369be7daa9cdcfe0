"""Pallas TPU kernel: big-C (context) filter interpolation via in-VMEM lane
gathers — the round-3 fast path for DAIN_slowmotion's 196-channel context
warps (reference ``networks/DAIN_slowmotion.py:311-321`` driving
``filterinterpolation_cuda_kernel.cu:2692-2823`` on the context tensor).

Why not the banded one-hot-matmul kernel (filter_bandmm_kernel.py): MXU
one-hot selects cost ``slab_rows x slab_cols`` MACs per (tap, channel, limb)
— linear in C — and lose to gathers beyond ~8 channels (measured round 2).
This kernel replaces both tap selects with VPU ``dynamic_gather``s whose cost
per 8-channel octet is constant:

* **channels ride the sublane dim** (8 per vreg), pixels the lane dim;
* the **horizontal tap select** is a lane gather: for slab row ``r``,
  channel octet ``t = slab[r, oct]`` is a per-sublane 128-entry table and
  ``take_along_axis(t, bul + di, axis=1)`` selects each pixel's tap column
  for all 8 channels at once;
* the **vertical tap select is folded into the weights**: the per-pixel
  combined weight for slab row ``r`` and tap column ``di`` is looked up by a
  *sublane* gather from an 8-row table ``[0, kw(dj=0..3, di), 0, 0, 0]``
  indexed with ``clip(r - bs, -1, 4) + 1`` — rows outside the pixel's 4-row
  window select the zero rows, so no masking ladder over slab rows is
  needed;
* the row loop runs over **per-chunk dynamic bounds** (scalar-read from
  SMEM), so cost scales with the tile's actual vertical flow spread, not
  the static bound; with ``bounds="quad"`` (round-5 default) the bounds are
  up to 4 disjoint intervals swept from per-32-px quarter ranges, so a
  motion boundary's two flow clusters don't force iteration over the dead
  rows between them.

Mosaic constraints honoured (empirically mapped round 3, tools/ubench_pallas
E7): ``dynamic_gather`` along sublanes requires the table to fit ONE vreg on
the gather dim (8 rows f32) — hence the 8-row weight tables; along lanes the
table is one vreg wide (128) — hence ``u = 128`` column slabs; ``x`` and
``idx`` must share the same 2D shape.  A gather+FMA pair with independent
accumulators costs ~3.9 cycles (E7d); a serial accumulator chain is ~17x
slower (FMA latency), hence the per-(di, octet) accumulator fan-out.

Source slabs are DMA'd manually (``pltpu.make_async_copy``) from a
``(B, nj, Hp, C, 128)`` array of padded, channel-interleaved column windows
in HBM, double-buffered across column tiles — BlockSpec index maps cannot
express overlapping row windows, and DMA slices on the lane dim must start
at 128-multiples (Mosaic "tile index divisible by the tiling"), so the
overlapping 128-wide column windows are materialised once per image in XLA
(~1.75x the image; XLA CSEs the build across a model's repeated warps of
the same context tensor) and the kernel slices only untiled dims.

Exactness: every selected tap is the unmodified f32 source value (gathers do
no arithmetic), so the kernel is exact for ANY f32 input wherever the flow
respects the slab bounds (|base_v − y| ≤ rv, −rh−1 ≤ base_u − x ≤ rh+1);
accumulation order differs from the XLA block path so results match to f32
rounding (~1 ulp), not bit-for-bit.  The caller enforces reference parity
with a whole-call ``lax.cond`` to the exact block path on out-of-bound
flows, mirroring filter_bandmm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FS = 4      # filter size (reference always 4)
_U = 128     # slab columns per tile == lane-gather table width (one vreg)
_PC = 128    # pixels per chunk (one vreg of lanes)


def _geometry(band: int, tw: int, rv: int, rh: int):
    s = band + 2 * rv + _FS - 1
    s8 = (s + 7) // 8 * 8
    assert tw + 2 * rh + _FS - 1 <= _U, (tw, rh)
    return s, s8


def _make_kernel(nj: int, nchunk: int, s8: int, c_chunk: int, band: int,
                 tw: int):
    noct = c_chunk // 8

    def kernel(rb_ref, img_hbm, ints_ref, kw_ref, out_ref, slab, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        ci = pl.program_id(2)
        j = pl.program_id(3)

        def dma(jj, slot):
            return pltpu.make_async_copy(
                img_hbm.at[bi, jj, pl.ds(ti * band, s8),
                           pl.ds(ci * c_chunk, c_chunk), :],
                slab.at[slot], sem.at[slot])

        # cross-grid-step double buffering: scratch persists across steps
        # (j is the innermost grid dim); each step waits on its own slot and
        # prefetches j+1 into the other.  At j == 0 (incl. after a ci/ti
        # wrap) the slab is fetched synchronously.
        slot = jax.lax.rem(j, 2)

        @pl.when(j == 0)
        def _():
            dma(j, slot).start()

        @pl.when(j + 1 < nj)
        def _():
            dma(j + 1, 1 - slot).start()

        dma(j, slot).wait()

        for ch in range(nchunk):
            px = slice(ch * _PC, (ch + 1) * _PC)
            bs = jnp.broadcast_to(ints_ref[0, 0, 0, 0:1, px], (8, _PC))
            kwc = kw_ref[0, 0, 0, :, px]                     # (16, PC)
            zero1 = jnp.zeros((1, _PC), jnp.float32)
            zero3 = jnp.zeros((3, _PC), jnp.float32)
            tables = [jnp.concatenate(
                [zero1, kwc[di:di + 1], kwc[4 + di:5 + di],
                 kwc[8 + di:9 + di], kwc[12 + di:13 + di], zero3],
                axis=0) for di in range(_FS)]                # 4x (8, PC)
            idx_g = [jnp.broadcast_to(ints_ref[0, 0, 0, 1:2, px] + di,
                                      (8, _PC)) for di in range(_FS)]

            niv = rb_ref.shape[-1] // (2 * nchunk)   # intervals per chunk

            def body(r, accs, bs=bs, tables=tables, idx_g=idx_g):
                idx_w = jnp.clip(r - bs, -1, _FS) + 1        # (8, PC)
                w = [jnp.take_along_axis(tables[di], idx_w, axis=0)
                     for di in range(_FS)]
                out = []
                for oc in range(noct):          # one table load per (r, oc)
                    t = slab[slot, r, oc * 8:(oc + 1) * 8, :]
                    row = []
                    for di in range(_FS):
                        g = jnp.take_along_axis(t, idx_g[di], axis=1)
                        row.append(accs[oc][di] + w[di] * g)
                    out.append(tuple(row))
                return tuple(out)

            z = jnp.zeros((8, _PC), jnp.float32)
            accs = tuple(tuple(z for _ in range(_FS))
                         for _ in range(noct))
            # chained fori_loops over the chunk's disjoint row intervals
            # (gap-skip: rows between flow clusters are never touched);
            # merged-empty intervals have lo == hi and cost one loop setup
            for k in range(niv):
                r_lo = rb_ref[bi, ti, j, 2 * niv * ch + 2 * k]
                r_hi = rb_ref[bi, ti, j, 2 * niv * ch + 2 * k + 1]
                accs = jax.lax.fori_loop(r_lo, r_hi, body, accs)

            for oc in range(noct):
                total = ((accs[oc][0] + accs[oc][1])
                         + (accs[oc][2] + accs[oc][3]))
                out_ref[0, 0, 0, oc * 8:(oc + 1) * 8, px] = total

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("band", "tw", "rv", "rh", "c_chunk",
                                    "bounds"))
def ctx_gather_pallas(image, base_v, base_u, kw, band: int = 64,
                      tw: int = 64, rv: int = 20, rh: int = 30,
                      c_chunk: int = 40, bounds: str = "quad"):
    """Big-C banded filter-interpolation forward (valid-branch weighted sums
    only; the caller applies the out-of-range fallback and the flow-bound
    cond — see ops/filter_interpolation.py).

    Args:
      image:  (B, H, W, C) f32 source frames (any C; cost ~C/8 gathers per
              pixel-tap).
      base_v: (B, H, W) int32 window top row in clamp-padded coords
              (iy_t + pad_lo, in [0, H-1]).
      base_u: (B, H, W) int32 window left col in clamp-padded coords.
      kw:     (B, H, W, fs*fs) f32 combined per-tap weights (filter x
              quadrant blend), row-major (dj*fs + di).
      band:   output rows per grid step (H % band == 0).
      tw:     output cols per column tile (W % tw == 0); the slab holds
              tw + 2*rh + 3 <= 128 source columns.
      rv/rh:  vertical/horizontal flow bounds in pixels; out-of-bound pixels
              get the clamped-slab approximation (callers cond to the exact
              path).
      c_chunk: channels per grid step (multiple of 8; C padded up to a
              multiple of it).
      bounds: row-loop bound granularity — "chunk": one [min, max+fs)
              interval per 128-px chunk (round-3 behaviour); "quad"
              (default): <= 4 disjoint intervals merged from per-32-px
              quarter bounds, skipping dead rows between flow clusters
              (exact either way; identical iteration count on smooth flows).

    Returns:
      (B, H, W, C) f32 weighted window sums.
    """
    b, h, w, c = image.shape
    fs = _FS
    assert h % band == 0 and w % tw == 0, (h, w, band, tw)
    assert c_chunk % 8 == 0
    s, s8 = _geometry(band, tw, rv, rh)
    nb, nj = h // band, w // tw
    p = band * tw
    nchunk = p // _PC
    c_pad = (c + c_chunk - 1) // c_chunk * c_chunk
    nc = c_pad // c_chunk

    pad_lo, pad_hi = fs // 2 - 1, fs - fs // 2
    # channel-INTERLEAVED padded image (B, Hp, C, Wp): the slab DMA slices
    # (rows, channels, cols) without any transpose; channels land on
    # sublanes, slab columns on lanes.
    ihcw = image.astype(jnp.float32).transpose(0, 1, 3, 2)    # (B, H, C, W)
    if c_pad != c:
        ihcw = jnp.pad(ihcw, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
    u = tw + 2 * rh + fs - 1
    ipad = jnp.pad(ihcw, ((0, 0),
                          (rv + pad_lo, rv + pad_hi + (s8 - s)),
                          (0, 0),
                          (rh + pad_lo, rh + pad_hi + (_U - u))),
                   mode="edge")                               # (B, Hp, Cp, Wp)
    # overlapping 128-wide column windows, j on an untiled dim (see module
    # docstring: lane-dim DMA slices must be 128-aligned)
    iwin = jnp.stack([jax.lax.dynamic_slice_in_dim(ipad, j * tw, _U, axis=3)
                      for j in range(nj)], axis=1)        # (B, nj, Hp, Cp, U)

    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    bs = jnp.clip(base_v + rv - (yy // band) * band, 0, s - fs)
    bul = jnp.clip(base_u + rh - (xx // tw) * tw, 0, _U - fs)

    def tile_px(x, k, dtype):
        return (x.reshape(b, nb, band, nj, tw, k)
                .transpose(0, 1, 3, 5, 2, 4).reshape(b, nb, nj, k, p)
                .astype(dtype))

    ints = jnp.concatenate([tile_px(bs[..., None], 1, jnp.int32),
                            tile_px(bul[..., None], 1, jnp.int32)], axis=3)
    kw_t = tile_px(kw, fs * fs, jnp.float32)

    bs_ch = ints[:, :, :, 0].reshape(b, nb, nj, nchunk, _PC)
    if bounds == "chunk":
        rb = jnp.stack([bs_ch.min(-1), bs_ch.max(-1) + fs], axis=-1)
        rb = rb.reshape(b, nb, nj, 2 * nchunk).astype(jnp.int32)
    elif bounds == "quad":
        # gap-skip bounds: per-quarter (32-px lane groups — for tw=64 the
        # 2x2 row/column-half quadrants) [lo, hi) ranges, sorted and swept
        # into <= 4 disjoint intervals per chunk.  A motion boundary of
        # either orientation splits the chunk's pixels into flow clusters;
        # the row loop then skips the dead rows between them.  On smooth
        # flows the quarters' ranges overlap and merge back into one
        # interval — same iteration count as "chunk".
        q = bs_ch.reshape(b, nb, nj, nchunk, 4, _PC // 4)
        lo, hi = q.min(-1), q.max(-1) + fs            # (..., nchunk, 4)
        order = jnp.argsort(lo, axis=-1)
        lo = jnp.take_along_axis(lo, order, axis=-1)
        hi = jnp.take_along_axis(hi, order, axis=-1)
        cm = jax.lax.associative_scan(jnp.maximum, hi, axis=-1)   # cummax
        brk = jnp.concatenate([jnp.ones_like(lo[..., :1], bool),
                               lo[..., 1:] > cm[..., :-1]], axis=-1)
        seg = jnp.cumsum(brk, axis=-1) - 1            # segment id, in [0, 3]
        onek = seg[..., None] == jnp.arange(4)        # (..., 4 q, 4 k)
        lo_k = jnp.sum(jnp.where(brk[..., None] & onek, lo[..., None], 0),
                       axis=-2)
        hi_k = jnp.max(jnp.where(onek, cm[..., None], 0), axis=-2)
        # absent segments get lo_k == hi_k == 0: an empty interval the
        # kernel's fori_loop skips at one loop-setup's cost
        rb = jnp.stack([lo_k, hi_k], axis=-1)
        rb = rb.reshape(b, nb, nj, 8 * nchunk).astype(jnp.int32)
    else:
        raise ValueError(f"bounds={bounds!r}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb, nc, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, 2, p),
                         lambda bi, i, ci, j, rb: (bi, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, fs * fs, p),
                         lambda bi, i, ci, j, rb: (bi, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, c_chunk, p),
                               lambda bi, i, ci, j, rb: (bi, i, j, ci, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, s8, c_chunk, _U), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        _make_kernel(nj, nchunk, s8, c_chunk, band, tw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nb, nj, c_pad, p), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(rb, iwin, ints, kw_t)

    out = (out.reshape(b, nb, nj, c_pad, band, tw)
           .transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, c_pad))
    return out[..., :c]
