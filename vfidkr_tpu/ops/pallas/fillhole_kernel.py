"""Pallas TPU kernel: 4-direction nearest-filled hole fill for flow
projection (``FlowFillhole_kernelfunc``, flowprojection_cuda_kernel.cu
:141-234).

The XLA formulation (4 ``lax.associative_scan`` passes) streams the field
through HBM at every doubling step (~1.9 ms at 2x448x256).  Here the whole
field lives in VMEM and the four "last filled value" scans run as in-register
Hillis-Steele doublings — static lane shifts for the horizontal directions,
static sublane shifts for the vertical ones.

Semantics identical to ``fill_holes``: hole cells (count <= 0) take the mean
of the nearest filled cell in each of the 4 cardinal directions; filled
cells pass through.

Batch is a grid dimension — never vmap a pallas_call.  Shapes whose field
exceeds the VMEM budget fall back to the XLA scans (caller dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, k, axis, reverse):
    """Shift ``x`` by k along ``axis`` — toward higher indices normally
    (bringing values from lower indices), toward lower indices when
    ``reverse`` — zero-padding the vacated edge.  Static slices only (no
    flips: lax.rev support in Mosaic is uncertain; direction-aware shifts
    express both scan directions)."""
    h, w = x.shape
    if axis == 1:
        pad = jnp.zeros((h, k), x.dtype)
        if reverse:
            return jnp.concatenate([x[:, k:], pad], axis=1)
        return jnp.concatenate([pad, x[:, :w - k]], axis=1)
    pad = jnp.zeros((k, w), x.dtype)
    if reverse:
        return jnp.concatenate([x[k:, :], pad], axis=0)
    return jnp.concatenate([pad, x[:h - k, :]], axis=0)


def _scan_dir(vx, vy, f, axis, reverse, n):
    """Inclusive 'nearest filled value' scan along ``axis`` via doubling."""
    k = 1
    while k < n:
        sx = _shift(vx, k, axis, reverse)
        sy = _shift(vy, k, axis, reverse)
        sf = _shift(f, k, axis, reverse)
        keep = f > 0.0
        vx = jnp.where(keep, vx, sx)
        vy = jnp.where(keep, vy, sy)
        f = jnp.maximum(f, sf)
        k *= 2
    return vx, vy, f


def _make_kernel(h: int, w: int):
    def kernel(cnt_ref, vx_ref, vy_ref, ox_ref, oy_ref):
        cnt = cnt_ref[0]
        vx = vx_ref[0]
        vy = vy_ref[0]
        filled = (cnt > 0.0).astype(jnp.float32)

        num_x = jnp.zeros((h, w), jnp.float32)
        num_y = jnp.zeros((h, w), jnp.float32)
        den = jnp.zeros((h, w), jnp.float32)
        for axis, n in ((1, w), (0, h)):
            for reverse in (False, True):
                sx, sy, sf = _scan_dir(vx, vy, filled, axis, reverse, n)
                num_x = num_x + sf * sx
                num_y = num_y + sf * sy
                den = den + sf

        den_safe = jnp.maximum(den, 1.0)
        fx = jnp.where(den > 0.0, num_x / den_safe, vx)
        fy = jnp.where(den > 0.0, num_y / den_safe, vy)
        keep = filled > 0.0
        ox_ref[0] = jnp.where(keep, vx, fx)
        oy_ref[0] = jnp.where(keep, vy, fy)

    return kernel


@jax.jit
def fill_holes_pallas(count, out):
    """Batched hole fill. count (B,H,W) f32, out (B,H,W,2) f32 ->
    (B,H,W,2)."""
    b, h, w = count.shape
    img_spec = pl.BlockSpec((1, h, w), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    ox, oy = pl.pallas_call(
        _make_kernel(h, w),
        grid=(b,),
        in_specs=[img_spec, img_spec, img_spec],
        out_specs=[img_spec, img_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)] * 2,
        interpret=jax.default_backend() == "cpu",
    )(count.astype(jnp.float32),
      out[..., 0].astype(jnp.float32), out[..., 1].astype(jnp.float32))
    return jnp.stack([ox, oy], axis=-1).astype(out.dtype)


def fill_holes_fits(h: int, w: int) -> bool:
    """VMEM budget check: the kernel keeps ~10 (H, W) f32 working arrays."""
    return h * w * 4 * 12 < 12 * 1024 * 1024
