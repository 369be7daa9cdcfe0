"""SepConv-family ops (legacy DAIN lineage; built and unit-tested by the
reference but unused by the active models).

* ``separable_conv`` — ``my_package/SeparableConv/separableconv_cuda_kernel.cu:40-80``:
  ``out[y,x,c] = sum_{j,i} in[y+j, x+i, c] * vert[y,x,j] * horiz[y,x,i]``
  over the *valid* domain only: the filters (and the output) live on the
  ``(H-fs+1, W-fs+1)`` grid (shape checks in separableconv_cuda.cc:26-29).

* ``separable_conv_flow`` — ``my_package/SeparableConvFlow/separableconvflow_cuda_kernel.cu:40-92``:
  converts the two 1-D kernels into an expected flow vector,
  ``flow_y = sum_j j*vert[j] / sum_j vert[j] - (fs-1)/2`` (same for x with
  horiz), emitting a ``-2000`` sentinel where the weights sum to exactly 0.

Both are separable static-slice reductions — no gathers; XLA fuses them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def separable_conv(image: jax.Array, vert: jax.Array, horiz: jax.Array) -> jax.Array:
    """image (B,H,W,C); vert/horiz (B,Ho,Wo,fs) with Ho=H-fs+1, Wo=W-fs+1.

    Returns (B,Ho,Wo,C).
    """
    b, h, w, c = image.shape
    fs = vert.shape[-1]
    ho, wo = h - fs + 1, w - fs + 1
    image = image.astype(jnp.float32)
    out = jnp.zeros((b, ho, wo, c), jnp.float32)
    for j in range(fs):
        row = jnp.zeros((b, ho, wo, c), jnp.float32)
        for i in range(fs):
            patch = jax.lax.dynamic_slice(image, (0, j, i, 0), (b, ho, wo, c))
            row = row + patch * horiz[..., i][..., None]
        out = out + row * vert[..., j][..., None]
    return out


@jax.jit
def separable_conv_flow(vert: jax.Array, horiz: jax.Array) -> jax.Array:
    """vert/horiz (B,Ho,Wo,fs) -> flow (B,Ho,Wo,2) in (fx,fy) order."""
    fs = vert.shape[-1]
    taps = jnp.arange(fs, dtype=jnp.float32)
    center = (float(fs) - 1.0) / 2.0

    def expected(kernels):
        s = jnp.sum(kernels, axis=-1)
        num = jnp.sum(kernels * taps, axis=-1)
        val = num / jnp.where(s == 0.0, 1.0, s) - center
        return jnp.where(jnp.abs(s) > 0.0, val, -2000.0)

    return jnp.stack([expected(horiz), expected(vert)], axis=-1)
