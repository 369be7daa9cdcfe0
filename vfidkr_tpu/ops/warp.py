"""Backward-warp (bilinear resampling) ops.

Two families in the reference:

* ``interpolate_bilinear`` — the legacy DAIN warp ops
  ``my_package/Interpolation/interpolation_cuda_kernel.cu:27-99`` and the
  channel-generic ``my_package/InterpolationCh`` (identical math): sample the
  source at ``(x+fx, y+fy)``; valid iff ``0 <= x2 < W`` and ``0 <= y2 < H``
  (note: *exclusive* upper bound, unlike FilterInterpolation); the two
  neighbour taps are clamped to the frame; out-of-range output is 0.

* ``pwc_warp`` — PWC-Net's feature warping (``PWCNet/PWCNet.py:159-199``):
  torch ``grid_sample`` with a grid normalised align-corners-style
  (``2*v/(W-1)-1``) but sampled with torch>=1.3's default
  ``align_corners=False``, zero padding.  The composite coordinate transform
  is ``gx = (x+fx) * W/(W-1) - 0.5``.  A validity mask (grid-sampled ones,
  thresholded at 0.9999) zeroes fade-out borders; the threshold makes the mask
  piecewise constant so it carries no gradient (replicated with
  ``stop_gradient``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _grid(h, w):
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    return xx, yy


def _bilinear_gather_clamped(image, gx, gy):
    """Bilinear sample with taps clamped to the frame. image (H,W,C)."""
    h, w, c = image.shape
    x0 = jnp.clip(jnp.floor(gx), 0.0, float(w - 1)).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(gy), 0.0, float(h - 1)).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    a = gx - x0.astype(jnp.float32)
    b = gy - y0.astype(jnp.float32)

    flat = image.reshape(h * w, c)

    def take(yi, xi):
        return jnp.take(flat, (yi * w + xi).reshape(-1), axis=0).reshape(h, w, c)

    return ((1 - a) * (1 - b))[..., None] * take(y0, x0) \
         + (a * (1 - b))[..., None] * take(y0, x1) \
         + ((1 - a) * b)[..., None] * take(y1, x0) \
         + (a * b)[..., None] * take(y1, x1)


def _interpolate_2d(image, flow):
    h, w, _ = image.shape
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xx, yy = _grid(h, w)
    x2 = xx + fx
    y2 = yy + fy
    valid = (x2 >= 0.0) & (y2 >= 0.0) & (x2 < float(w)) & (y2 < float(h))
    x2s = jnp.clip(x2, 0.0, float(w - 1))
    y2s = jnp.clip(y2, 0.0, float(h - 1))
    out = _bilinear_gather_clamped(image.astype(jnp.float32), x2s, y2s)
    return jnp.where(valid[..., None], out, 0.0).astype(image.dtype)


@jax.jit
def interpolate_bilinear(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Plain backward-warp of (B,H,W,C) by (B,H,W,2); out-of-range -> 0.

    Equivalent of the reference Interpolation / InterpolationCh CUDA ops.
    """
    return jax.vmap(_interpolate_2d)(image, flow)


def _bilinear_gather_zeros(image, gx, gy):
    """Bilinear sample with zero padding (torch grid_sample padding_mode=zeros)."""
    h, w, c = image.shape
    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    a = gx - x0f
    b = gy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = image.reshape(h * w, c)

    def take(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        lin = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).reshape(-1)
        v = jnp.take(flat, lin, axis=0).reshape(h, w, c)
        return jnp.where(inb[..., None], v, 0.0)

    return ((1 - a) * (1 - b))[..., None] * take(y0, x0) \
         + (a * (1 - b))[..., None] * take(y0, x0 + 1) \
         + ((1 - a) * b)[..., None] * take(y0 + 1, x0) \
         + (a * b)[..., None] * take(y0 + 1, x0 + 1)


def _pwc_warp_2d(image, flow):
    """TPU formulation: the 4 per-tap gathers + 4 mask gathers of a naive
    grid_sample become ONE blocked (2,2,C) ``lax.gather`` (XLA TPU gather
    cost is dominated by index count) and a gather-free mask — the
    grid-sampled-ones mask is algebraically the sum of the in-bounds tap
    weights.  Same products/sums as the per-tap version, bit-equal."""
    h, w, c = image.shape
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xx, yy = _grid(h, w)
    # align_corners-style normalisation sampled with align_corners=False:
    gx = (xx + fx) * (float(w) / float(max(w - 1, 1))) - 0.5
    gy = (yy + fy) * (float(h) / float(max(h - 1, 1))) - 0.5

    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    a = gx - x0f
    b = gy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def inb(yi, xi):
        return ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
                & (yi <= h - 1)).astype(jnp.float32)

    w00 = (1 - a) * (1 - b) * inb(y0, x0)
    w01 = a * (1 - b) * inb(y0, x0 + 1)
    w10 = (1 - a) * b * inb(y0 + 1, x0)
    w11 = a * b * inb(y0 + 1, x0 + 1)
    mask = jnp.where(w00 + w01 + w10 + w11 < 0.9999, 0.0, 1.0)

    # per-tap takes fuse better into the surrounding graph than a blocked
    # gather here (measured: blocked warp is faster standalone but slows the
    # full PWC decode); clamped reads are safe — OOB taps carry zero weight.
    flat = image.astype(jnp.float32).reshape(h * w, c)

    def take(yi, xi):
        lin = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).reshape(-1)
        return jnp.take(flat, lin, axis=0).reshape(h, w, c)

    out = (w00[..., None] * take(y0, x0)
           + w01[..., None] * take(y0, x0 + 1)
           + w10[..., None] * take(y0 + 1, x0)
           + w11[..., None] * take(y0 + 1, x0 + 1))
    return (out * jax.lax.stop_gradient(mask)[..., None]).astype(image.dtype)


@jax.jit
def pwc_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """PWC-Net feature warp with fade-out validity mask (PWCNet.py:159-199)."""
    return jax.vmap(_pwc_warp_2d)(image, flow)
