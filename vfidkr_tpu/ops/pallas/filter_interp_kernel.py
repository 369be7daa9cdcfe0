"""Pallas TPU kernel: fused deformable-kernel-region filter interpolation.

Forward of ``filter_interpolate`` (see ops/filter_interpolation.py for the
semantics) with the padded source image resident in VMEM and one dynamic
(fs,fs,C) block read per output pixel.  XLA's gather HLO costs ~70 cycles per
index on v5e; this kernel replaces it with direct VMEM addressing.

The kernel computes only the valid-branch weighted sum (the caller pre-folds
filter x quadrant-blend weights and applies the out-of-range fallback);
gradients come from a custom_vjp in the caller whose backward reuses the XLA
'block' formulation (identical math).

Batch is a grid dimension — do NOT jax.vmap this call.

VMEM budget: the padded image (Hp, Wp, C) must fit alongside row blocks of
weights — fine for RGB frames up to ~1024x1792; larger frames or wide
context tensors (196 ch) use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8   # output rows per grid step (sublane-aligned block)


def _make_kernel(w: int, fs: int, c: int):
    def kernel(base_v_ref, base_u_ref, ipad_ref, wts_ref, out_ref):
        def body(i, _):
            r = i // w
            x = i % w
            sv = base_v_ref[0, r, x]
            su = base_u_ref[0, r, x]
            block = ipad_ref[0, pl.ds(sv, fs), pl.ds(su, fs), :]   # (fs,fs,C)
            wts = wts_ref[0, r, x, :].reshape(fs, fs)               # (dj,di)
            out_ref[0, r, x, :] = jnp.sum(block * wts[..., None], axis=(0, 1))
            return ()

        jax.lax.fori_loop(0, _ROWS * w, body, ())

    return kernel


@functools.partial(jax.jit, static_argnames=("fs",))
def filter_gather_pallas(ipad, base_v, base_u, weights, fs: int = 4):
    """ipad: (B, Hp, Wp, C) edge-padded images; base_v/base_u: (B, H, W) int32
    window top-left in padded coords; weights: (B, H, W, fs*fs) combined
    per-tap weights (filter * quadrant blend), row-major (dj*fs+di).
    Returns (B, H, W, C) weighted window sums."""
    b, h, w = base_v.shape
    _, hp, wp, c = ipad.shape
    assert h % _ROWS == 0, "H must be a multiple of 8"
    row_i32 = pl.BlockSpec((1, _ROWS, w), lambda bi, i: (bi, i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(w, fs, c),
        grid=(b, h // _ROWS),
        in_specs=[row_i32, row_i32,
                  pl.BlockSpec((1, hp, wp, c), lambda bi, i: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _ROWS, w, fs * fs),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _ROWS, w, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
    )(base_v, base_u, ipad, weights)
