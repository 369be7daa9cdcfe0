"""Cost-volume correlation for PWC-Net.

Equivalent of ``PWCNet/correlation_package_pytorch1_0/correlation_cuda_kernel.cu``
(forward :74-146).  For each displacement ``(ti, tj)`` with ``|ti|,|tj| <= md``
the output channel ``tc = (tj+md)*(2md+1) + (ti+md)`` holds the channel-mean
dot product ``mean_c f1[y, x, c] * f2[y+tj, x+ti, c]`` with ``f2`` zero-padded
by ``md`` (the CUDA op materialises NHWC zero-padded copies in its
``channels_first`` kernel :47-70; normalisation is ``kernel_size**2 * C`` with
``kernel_size == 1`` in the only configuration used, PWCNet.py:72).

Two formulations, selected by ``impl``:

* ``"slices"`` (default): 81 shifted slice-multiply-reduce chains — XLA
  fuses each into one elementwise+reduce op over contiguous data.
* ``"banded"``: per vertical shift ``tj`` one ``(W, C) x (C, W+2md)`` MXU
  dot per (image, row) computes every horizontal displacement at once, and
  the 2md+1 in-band diagonals are extracted with a pad/reshape (no gather)
  — ~10 ops instead of 81.

Measured (tools/ubench_fusion.py, v5e, full bidirectional PWC pass
@448x256): slices 3.11 ms vs banded 3.26 ms/pair — the fewer-but-heavier
banded ops LOSE slightly (the in-band diagonal extraction's transposes and
the wasted off-band MACs outweigh the launch savings), so slices stays the
default and banded is kept for comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corr_slices(f1, f2p, md):
    b, h, w, c = f1.shape
    slices = []
    for tj in range(-md, md + 1):
        for ti in range(-md, md + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, md + tj, md + ti, 0), (b, h, w, c))
            slices.append(jnp.sum(f1 * shifted, axis=-1))
    return jnp.stack(slices, axis=-1)


def _corr_banded(f1, f2p, md):
    b, h, w, c = f1.shape
    n = 2 * md + 1
    wp = w + 2 * md
    # (b, h, n, wp, c): row tj of f2 for every vertical displacement
    rows = jnp.stack([jax.lax.dynamic_slice_in_dim(f2p, tj, h, axis=1)
                      for tj in range(n)], axis=2)
    # full (w, wp) products per (image, row, tj); contraction over channels
    full = jnp.einsum("bhxc,bhtuc->bhtxu", f1, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    # in-band diagonals without a gather: flatten (x, u), pad w, re-view as
    # (w, wp+1) — row x then starts at u == x, so columns 0..n-1 are the
    # ti-diagonals
    flat = full.reshape(b, h, n, w * wp)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, 0), (0, w)))
    diags = flat.reshape(b, h, n, w, wp + 1)[..., :n]     # (b,h,tj,x,ti)
    return diags.transpose(0, 1, 3, 2, 4).reshape(b, h, w, n * n)


@functools.partial(jax.jit, static_argnames=("max_displacement", "impl"))
def correlation_cost_volume(f1: jax.Array, f2: jax.Array,
                            max_displacement: int = 4,
                            impl: str = "slices") -> jax.Array:
    """(B,H,W,C) x (B,H,W,C) -> (B,H,W,(2md+1)**2) cost volume.

    Channel layout matches the reference: ``tc = (tj+md)*(2md+1)+(ti+md)``.
    """
    md = max_displacement
    b, h, w, c = f1.shape
    f1 = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32),
                  ((0, 0), (md, md), (md, md), (0, 0)))
    fn = {"banded": _corr_banded, "slices": _corr_slices}[impl]
    return fn(f1, f2p, md) / float(c)
