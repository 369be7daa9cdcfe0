"""Pallas TPU kernel: banded one-hot-matmul filter interpolation (the round-2
speed-of-light path for the VFIDKR core op).

Replaces the per-pixel (4,4,C) gather of ``filter_interpolate`` (reference
``filterinterpolation_cuda_kernel.cu:2692-2823``) with, per (8-row band,
column tile):

* **stage 1 (MXU)**: the horizontal tap select as one-hot bf16 matmuls —
  ``slab (s, u_slab) x onehot (u_slab, P) -> t (s, P)`` — one dot per
  (tap column di, channel, bf16 limb).  One-hot contractions have exactly
  one nonzero term per output element, so Mosaic's bf16 accumulation quirk
  (see projection_kernel.py) cannot bite: each result is a single bf16 limb,
  exact in f32.  Three truncation limbs reconstruct the f32 source exactly.
* **stage 2 (VPU)**: the vertical tap select as a masked ladder over the s
  sublane-resident candidate rows, folding the combined filter x
  quadrant-blend weights; a cross-sublane reduce produces the output.

Everything pixel-indexed lives with **pixels on the lane dimension** — (k, P)
blocks — which avoids the 128-lane padding that blows scoped VMEM for
(P, 1)/(P, 16) operands, and lets the source slabs stay untransposed.

Exactness contract: bit-equal to the "block"/"gather" paths whenever every
pixel's window stays inside its slab — |base_v - y| <= rv and
|base_u - x| <= rh (flow bounds in pixels).  The caller enforces strict
reference parity with a whole-call ``lax.cond`` fallback to the XLA block
path when any flow exceeds the bounds (rare at Vimeo/MiddleBury motion
scales).

Mosaic constraints honoured (empirical notes from ops/pallas/*):
* batch/band/tile are grid dims — never vmap a pallas_call;
* operands arrive pre-shaped from XLA — in-kernel reshapes that move
  lanes<->sublanes don't lower;
* no dynamic lane indexing — the dynamic row window is materialised by XLA
  into per-(band, tile) slabs, and both tap selects are static-shape
  iota-compare ladders / one-hot dots;
* only DEFAULT/HIGHEST dot precision exist in-kernel; we need neither
  (one-hot selects are exact at DEFAULT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = 128          # slab rows per band (sublane-tile multiple)
_FS = 4           # filter size (reference always 4)


def _rv_for(band: int) -> int:
    """Vertical flow bound implied by band size at s=128 slab rows."""
    return (_S - band - _FS + 1) // 2


def _make_kernel(p: int, u_slab: int, c: int, limbs: int, s: int):
    fs = _FS

    def kernel(slab_ref, bul_ref, bs_ref, kw_ref, out_ref, acc_ref):
        def trunc(x):
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(x, jnp.uint32)
                & jnp.uint32(0xFFFF0000), jnp.float32)

        bul = bul_ref[0, 0, 0]                       # (1, P) int32
        bs = bs_ref[0, 0, 0]                         # (1, P) int32
        uiota = jax.lax.broadcasted_iota(jnp.int32, (u_slab, p), 0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)

        def selects(di):
            onehot = (uiota == bul + di).astype(jnp.bfloat16)
            w2 = jnp.zeros((s, p), jnp.float32)
            for dj in range(fs):
                w2 = w2 + jnp.where(riota == bs + dj,
                                    kw_ref[0, 0, 0, dj * fs + di][None, :],
                                    0.0)
            return onehot, w2

        def accumulate(limb_of, init):
            for di in range(fs):
                onehot, w2 = selects(di)
                for cc in range(c):
                    t = None
                    for lv in limb_of(cc):
                        d = jax.lax.dot_general(
                            lv, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (s, P)
                        t = d if t is None else t + d
                    contrib = jnp.sum(w2 * t, axis=0)
                    if init and di == 0:
                        acc_ref[cc] = contrib
                    else:
                        acc_ref[cc] += contrib

        # limb split happens IN-KERNEL from one f32 slab: materialising the
        # residual limbs' window arrays in XLA costs ~1 ms/limb even when
        # the dots are skipped
        slab = [slab_ref[0, 0, 0, cc] for cc in range(c)]
        l0 = [trunc(x) for x in slab]
        accumulate(lambda cc: [l0[cc].astype(jnp.bfloat16)], init=True)

        if limbs > 1:
            # NOTE: a runtime skip of the residual limbs was tried (pl.when
            # on a flag, and an XLA cond between kernel variants) — both
            # execute the "skipped" dots on this toolchain; the 8-bit fast
            # path is therefore the STATIC limbs=1 variant ("slab8").
            def resid_limbs(cc):
                r1 = slab[cc] - l0[cc]
                if limbs == 2:
                    return [r1.astype(jnp.bfloat16)]
                t1 = trunc(r1)
                return [t1.astype(jnp.bfloat16),
                        (r1 - t1).astype(jnp.bfloat16)]
            accumulate(resid_limbs, init=False)

        for cc in range(c):
            out_ref[0, 0, 0, cc] = acc_ref[cc]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("band", "tw", "rh", "limbs"))
def filter_bandmm_pallas(image, base_v, base_u, kw,
                         band: int = 8, tw: int = 112, rh: int = 32,
                         limbs: int = 3):
    """Banded filter-interpolation forward (valid-branch weighted sums only;
    the caller applies the out-of-range fallback and the flow-bound cond).

    Args:
      image:  (B, H, W, C) f32 source frames.
      base_v: (B, H, W) int32 window top row in clamp-padded coords
              (iy_t + pad_lo, in [0, H-1]).
      base_u: (B, H, W) int32 window left col in clamp-padded coords.
      kw:     (B, H, W, fs*fs) f32 combined per-tap weights (filter x
              quadrant blend), row-major (dj*fs + di).
      band:   output rows per grid step (s = band + 2*rv + fs - 1 <= 128).
      tw:     output cols per grid step (must divide W).
      rh:     horizontal flow bound; u_slab = tw + 2*rh + fs - 1.
      limbs:  bf16 truncation limbs of the input field computed in-kernel
              (3 = exact for any f32; 1 = exact ONLY when the field holds
              small even-product integers — the "slab8" contract, where
              the caller passes the 255-scaled frame — at a third of the
              MXU passes).

    Returns:
      (B, H, W, C) f32 weighted window sums, exact wherever
      |base_v - y| <= rv and |base_u - x| <= rh (prep clamps; out-of-bound
      pixels get the clamped-window approximation — callers cond to the
      exact path).
    """
    b, h, w, c = image.shape
    fs = _FS
    rv = _rv_for(band)
    s = band + 2 * rv + fs - 1            # 127 for band=8; sublanes pad to _S
    assert h % band == 0 and w % tw == 0, (h, w, band, tw)
    assert limbs in (1, 2, 3)
    nb, nj = h // band, w // tw
    u_slab = tw + 2 * rh + fs - 1
    p = band * tw

    pad_lo, pad_hi = fs // 2 - 1, fs - fs // 2
    # channel-first BEFORE padding/windowing so the slabs come out
    # (..., c, s, u_slab) with no large transposes
    icf = image.transpose(0, 3, 1, 2)                # (B, C, H, W)
    ipad = jnp.pad(icf, ((0, 0), (0, 0),
                         (rv + pad_lo, rv + pad_hi + (_S - s)),
                         (rh + pad_lo, rh + pad_hi)), mode="edge")

    # per-(band, tile) f32 slabs (B, nb, nj, c, _S, u_slab) — ONE window
    # array; the bf16 truncation limbs are computed in-kernel (materialising
    # residual-limb windows in XLA costs ~1 ms/limb even when skipped)
    rows = jnp.stack([jax.lax.dynamic_slice_in_dim(ipad, b0 * band, _S,
                                                   axis=2)
                      for b0 in range(nb)], axis=1)       # (B,nb,C,_S,Wp)
    slabs = jnp.stack([jax.lax.dynamic_slice_in_dim(rows, j * tw, u_slab,
                                                    axis=4)
                       for j in range(nj)], axis=2)       # (B,nb,nj,C,_S,u)

    # per-pixel local coords / weights, pixels on lanes: (B, nb, nj, k, P)
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    bs = jnp.clip(base_v + rv - (yy // band) * band, 0, s - fs)
    bul = jnp.clip(base_u + rh - (xx // tw) * tw, 0, u_slab - fs)

    def tile_px(x, k):
        # (B, H, W, k) -> (B, nb, nj, k, P) with P = band*tw pixels on lanes
        return (x.reshape(b, nb, band, nj, tw, k)
                .transpose(0, 1, 3, 5, 2, 4).reshape(b, nb, nj, k, p))

    bs_t = tile_px(bs[..., None], 1)
    bul_t = tile_px(bul[..., None], 1)
    kw_t = tile_px(kw, fs * fs)

    px_spec = lambda k: pl.BlockSpec((1, 1, 1, k, p),
                                     lambda bi, i, j: (bi, i, j, 0, 0),
                                     memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, 1, 1, c, _S, u_slab),
                             lambda bi, i, j: (bi, i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_kernel(p, u_slab, c, limbs, _S),
        grid=(b, nb, nj),
        in_specs=[slab_spec, px_spec(1), px_spec(1), px_spec(fs * fs)],
        out_specs=px_spec(c),
        out_shape=jax.ShapeDtypeStruct((b, nb, nj, c, p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, p), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(slabs, bul_t, bs_t, kw_t)

    return (out.reshape(b, nb, nj, c, band, tw)
            .transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, c))
