"""Cost-volume correlation for PWC-Net.

Equivalent of ``PWCNet/correlation_package_pytorch1_0/correlation_cuda_kernel.cu``
(forward :74-146).  For each displacement ``(ti, tj)`` with ``|ti|,|tj| <= md``
the output channel ``tc = (tj+md)*(2md+1) + (ti+md)`` holds the channel-mean
dot product ``mean_c f1[y, x, c] * f2[y+tj, x+ti, c]`` with ``f2`` zero-padded
by ``md`` (the CUDA op materialises NHWC zero-padded copies in its
``channels_first`` kernel :47-70; normalisation is ``kernel_size**2 * C`` with
``kernel_size == 1`` in the only configuration used, PWCNet.py:72).

On TPU the 81 shifted products are static slices of one padded tensor —
XLA fuses the multiply/reduce chain; no scatter/gather needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_displacement",))
def correlation_cost_volume(f1: jax.Array, f2: jax.Array,
                            max_displacement: int = 4) -> jax.Array:
    """(B,H,W,C) x (B,H,W,C) -> (B,H,W,(2md+1)**2) cost volume."""
    md = max_displacement
    b, h, w, c = f1.shape
    f1 = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32),
                  ((0, 0), (md, md), (md, md), (0, 0)))
    slices = []
    for tj in range(-md, md + 1):
        for ti in range(-md, md + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, md + tj, md + ti, 0), (b, h, w, c))
            slices.append(jnp.sum(f1 * shifted, axis=-1))
    out = jnp.stack(slices, axis=-1) / float(c)
    return out
