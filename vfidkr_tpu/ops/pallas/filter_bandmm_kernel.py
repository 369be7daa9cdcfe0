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

    def kernel(l0_ref, l1_ref, l2_ref, bul_ref, bs_ref, kw_ref, out_ref):
        limb_refs = (l0_ref, l1_ref, l2_ref)[:limbs]

        bul = bul_ref[0, 0, 0]                       # (1, P) int32
        bs = bs_ref[0, 0, 0]                         # (1, P) int32
        uiota = jax.lax.broadcasted_iota(jnp.int32, (u_slab, p), 0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)

        acc = [jnp.zeros((1, p), jnp.float32) for _ in range(c)]
        for di in range(fs):
            onehot = (uiota == bul + di).astype(jnp.bfloat16)
            # vertical select weights for this tap column, (s, P)
            w2 = jnp.zeros((s, p), jnp.float32)
            for dj in range(fs):
                w2 = w2 + jnp.where(riota == bs + dj,
                                    kw_ref[0, 0, 0, dj * fs + di][None, :],
                                    0.0)
            for cc in range(c):
                t = jax.lax.dot_general(
                    limb_refs[0][0, 0, 0, cc], onehot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (s, P)
                for l in range(1, limbs):
                    t = t + jax.lax.dot_general(
                        limb_refs[l][0, 0, 0, cc], onehot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                acc[cc] = acc[cc] + jnp.sum(w2 * t, axis=0, keepdims=True)

        for cc in range(c):
            out_ref[0, 0, 0, cc] = acc[cc][0]

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
      limbs:  bf16 truncation limbs (3 = exact f32).

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
    assert limbs in (2, 3)
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

    # f32 -> exact bf16 truncation limbs (bitmask truncation, NOT a bf16
    # convert round-trip: XLA elides f32->bf16->f32 pairs under jit)
    def trunc(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)

    lim = []
    resid = ipad
    for k in range(limbs):
        t = trunc(resid) if k < limbs - 1 else resid
        lim.append(t.astype(jnp.bfloat16))
        resid = resid - t

    # per-(band, tile) slabs: (B, nb, nj, c, _S, u_slab)
    def slabs_of(x):
        rows = jnp.stack([jax.lax.dynamic_slice_in_dim(x, b0 * band, _S,
                                                       axis=2)
                          for b0 in range(nb)], axis=1)   # (B,nb,C,_S,Wp)
        return jnp.stack([jax.lax.dynamic_slice_in_dim(rows, j * tw, u_slab,
                                                       axis=4)
                          for j in range(nj)], axis=2)    # (B,nb,nj,C,_S,u)

    slabs = [slabs_of(x) for x in lim]
    while len(slabs) < 3:
        slabs.append(slabs[0][..., :1, :1, :1])           # unused dummy

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
    dummy_spec = pl.BlockSpec((1, 1, 1, 1, 1, 1),
                              lambda bi, i, j: (bi, i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_kernel(p, u_slab, c, limbs, _S),
        grid=(b, nb, nj),
        in_specs=[slab_spec,
                  slab_spec if limbs >= 2 else dummy_spec,
                  slab_spec if limbs >= 3 else dummy_spec,
                  px_spec(1), px_spec(1), px_spec(fs * fs)],
        out_specs=px_spec(c),
        out_shape=jax.ShapeDtypeStruct((b, nb, nj, c, p), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(slabs[0], slabs[1], slabs[2], bul_t, bs_t, kw_t)

    return (out.reshape(b, nb, nj, c, band, tw)
            .transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, c))
