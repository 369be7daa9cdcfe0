"""Banded Pallas scatter (flow projection fast path) parity vs the XLA
one-hot einsum — interpret mode on CPU.

Reference math: flowprojection_cuda_kernel.cu:29-137 (atomicAdd scatter +
average); the banded kernel additionally must reproduce the border
double-add and respect the (rv, rh) slab-bound lax.cond contract.
"""
import numpy as np
import jax
import jax.numpy as jnp

import vfidkr_tpu.ops.flow_projection as P
from vfidkr_tpu.ops.pallas.projection_band_kernel import scatter4_band_pallas


def _flow(rng, b=1, h=16, w=32, scale=5.0):
    return jnp.asarray(
        (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 2 * scale)


def test_banded_scatter_matches_einsum(rng):
    flow = _flow(rng, b=2)
    iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(P._scatter_prep)(flow)
    want = jax.vmap(P._scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals)
    got = scatter4_band_pallas(iy_t, iy_b, ix_l, ix_r, vals,
                               band=16, tw=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_banded_scatter_border_double_add(rng):
    """Landing beyond the last row/col clamps both neighbours to the same
    cell — the reference double-adds (flowprojection_cuda_kernel.cu:63-89)."""
    b, h, w = 1, 16, 32
    flow = jnp.zeros((b, h, w, 2), jnp.float32).at[0, :, :, 1].set(2.25)
    iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(P._scatter_prep)(flow)
    want = jax.vmap(P._scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals)
    got = scatter4_band_pallas(iy_t, iy_b, ix_l, ix_r, vals,
                               band=16, tw=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flow_project_hole_fill_cond_paths(rng):
    """hole_fill routes through the pipeline-inside-cond structure; both the
    in-bounds (pallas) and oversize (einsum) branches must agree with the
    plain XLA composition."""
    import functools
    flow = _flow(rng, b=1, h=16, w=224)       # tw=112 -> 2 column tiles
    for oversize in (False, True):
        f = flow
        if oversize:                           # leaves tile 0's slab
            f = f.at[0, 3, 111].set(jnp.asarray([40.0, 1.0]))
        got = P.flow_project(f, hole_fill=True)
        iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(P._scatter_prep)(f)
        accum = jax.vmap(P._scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals)
        fin = functools.partial(P._finalize, do_fill=True, dtype=f.dtype)
        want = jax.vmap(fin)(accum[..., :2], accum[..., 2])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_depth_flow_project_banded_matches_reference_golden(rng):
    """depth_flow_project now routes through the banded cond pipeline at
    fitting shapes; check against the existing golden oracle path (plain
    _scatter4 + average)."""
    b, h, w = 1, 16, 32
    flow = _flow(rng, b=b)
    depth_inv = jnp.asarray(rng.rand(b, h, w).astype(np.float32) + 0.1)
    got = P.depth_flow_project(flow, depth_inv, hole_fill=True)

    iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(P._depth_prep)(flow, depth_inv)
    accum = jax.vmap(P._scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals)
    acc, cnt = accum[..., :2], accum[..., 2]
    out = jnp.where(cnt[..., None] > 0,
                    acc / jnp.maximum(cnt, 1e-30)[..., None], 0.0)
    want = jax.vmap(P.fill_holes)(cnt, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
