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
from vfidkr_tpu.ops.pallas.fillhole_kernel import fill_holes_pallas
from vfidkr_tpu.ops.pallas.projection_band_kernel import scatter4_band_pallas


def test_fill_holes_kernel_matches_scans(rng):
    """The in-VMEM doubling-scan hole-fill kernel vs the XLA associative
    scans (which are themselves golden-tested vs the CUDA fill)."""
    b, h, w = 2, 16, 32
    cnt = (rng.rand(b, h, w) > 0.7).astype(np.float32) \
        * (1.0 + rng.rand(b, h, w)).astype(np.float32)
    out = (rng.randn(b, h, w, 2).astype(np.float32)
           * (cnt[..., None] > 0))
    want = jax.vmap(P.fill_holes)(jnp.asarray(cnt), jnp.asarray(out))
    got = fill_holes_pallas(jnp.asarray(cnt), jnp.asarray(out))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # degenerate: nothing filled anywhere (same (2,16,32) shape as above so
    # the traced/compiled kernel is reused — fresh shapes cost ~4 s of
    # retrace on the 1-CPU test host)
    z = jnp.zeros((b, h, w))
    assert float(jnp.abs(fill_holes_pallas(z, jnp.zeros((b, h, w, 2)))).max()) == 0.0


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


def test_scatter4_cond_pipeline_paths(rng):
    """The pipeline-inside-cond structure (average + hole fill in both
    branches): the in-bounds (pallas) and oversize (einsum) branches must
    agree with the plain XLA composition.  (The public flow_project only
    takes this path on TPU; here the internals run in interpret mode.)"""
    import functools
    flow = _flow(rng, b=1, h=8, w=64)          # tw=32 -> 2 column tiles
    for oversize in (False, True):
        f = flow
        if oversize:                           # leaves tile 0's slab (>rh-1)
            f = f.at[0, 3, 31].set(jnp.asarray([40.0, 1.0]))
        iy_t, iy_b, ix_l, ix_r, vals = jax.vmap(P._scatter_prep)(f)
        post = lambda acc: P._finalize_batched(acc[..., :2], acc[..., 2],
                                               True, f.dtype)
        got = P._scatter4_cond(iy_t, iy_b, ix_l, ix_r, vals, 8, 32,
                               post=post)
        accum = jax.vmap(P._scatter4_onehot)(iy_t, iy_b, ix_l, ix_r, vals)
        fin = functools.partial(P._finalize, do_fill=True, dtype=f.dtype)
        want = jax.vmap(fin)(accum[..., :2], accum[..., 2])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_depth_flow_project_matches_reference_golden(rng):
    """depth_flow_project through the public API (XLA path on CPU, banded
    cond pipeline on TPU) vs the golden composition."""
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


def test_scatter4_bwd_kernel_matches_transpose(rng):
    """scatter4_bwd_pallas (banded 4-neighbour gather, the scatter's VJP)
    vs the XLA chunked one-hot transpose."""
    from vfidkr_tpu.ops.pallas.projection_band_kernel import (
        scatter4_bwd_pallas)
    flow = _flow(rng, b=2)
    iy_t, iy_b, ix_l, ix_r, _ = jax.vmap(P._scatter_prep)(flow)
    g = jnp.asarray(rng.randn(2, 16, 32, 3).astype(np.float32))
    want = jax.vmap(P._scatter4_transpose)(iy_t, iy_b, ix_l, ix_r, g)
    got = scatter4_bwd_pallas(g, iy_t, iy_b, ix_l, ix_r, band=16, tw=32,
                              rh=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_flow_project_grads_unchanged(rng):
    """End-to-end flow_project gradient (train mode) stays on the golden
    path regardless of the VJP dispatch (CPU: XLA transpose)."""
    flow = _flow(rng, b=2)
    def f(fl):
        return jnp.sum(P.flow_project(fl, hole_fill=False) ** 2)
    g = jax.grad(f)(flow)
    assert np.all(np.isfinite(np.asarray(g)))
