"""FlowProjection / DepthFlowProjection / MinDepthFlowProjection parity."""
import numpy as np
import jax
import jax.numpy as jnp

from vfidkr_tpu.ops import (
    depth_flow_project,
    flow_project,
    min_depth_flow_project,
)
import golden


def _flow(rng, h=10, w=12, scale=3.0):
    return ((rng.rand(h, w, 2) - 0.5) * 2 * scale).astype(np.float32)


def test_flow_project_forward(rng):
    flow = _flow(rng)
    want, _ = golden.flow_project_fwd(flow)
    got = np.asarray(flow_project(flow[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flow_project_border_double_count(rng):
    """Landings past the last row/col clamp both neighbours to the same cell —
    the cell must receive the contribution twice (atomicAdd semantics)."""
    h, w = 6, 6
    flow = np.zeros((h, w, 2), np.float32)
    flow[0, 0] = (w - 1.5, h - 1.5)   # lands at (4.5, 4.5): 4 distinct cells
    flow[1, 1] = (w - 2.0, h - 2.0)   # lands exactly at (5.0, 5.0): corner cell x4
    want, wcnt = golden.flow_project_fwd(flow)
    got = np.asarray(flow_project(flow[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert wcnt[h - 1, w - 1] >= 4


def test_flow_project_fill_holes(rng):
    flow = _flow(rng, scale=4.0)
    want, _ = golden.flow_project_fwd(flow, fill=True)
    got = np.asarray(flow_project(flow[None], hole_fill=True))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flow_project_backward(rng):
    flow = _flow(rng)
    _, cnt = golden.flow_project_fwd(flow)
    g = rng.rand(*flow.shape).astype(np.float32)
    want = golden.flow_project_bwd(flow, cnt, g)

    _, vjp = jax.vjp(lambda f: flow_project(f[None])[0], jnp.asarray(flow))
    got = np.asarray(vjp(jnp.asarray(g))[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_depth_flow_project_forward(rng):
    flow = _flow(rng)
    depth = (rng.rand(*flow.shape[:2]) + 0.1).astype(np.float32)
    want, _ = golden.depth_flow_project_fwd(flow, depth)
    got = np.asarray(depth_flow_project(flow[None], depth[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_depth_flow_project_backward_reference_quirk(rng):
    """The reference depth gradient uses (f - out); verify our custom_vjp
    reproduces it (it is NOT the autodiff gradient)."""
    flow = _flow(rng)
    depth = (rng.rand(*flow.shape[:2]) + 0.1).astype(np.float32)
    out, cnt = golden.depth_flow_project_fwd(flow, depth)
    g = rng.rand(*flow.shape).astype(np.float32)
    want_gf, want_gd = golden.depth_flow_project_bwd(flow, depth, cnt, out, g)

    _, vjp = jax.vjp(lambda f, d: depth_flow_project(f[None], d[None])[0],
                     jnp.asarray(flow), jnp.asarray(depth))
    got_gf, got_gd = (np.asarray(t) for t in vjp(jnp.asarray(g)))
    np.testing.assert_allclose(got_gf, want_gf, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_gd, want_gd, rtol=1e-4, atol=1e-5)


def test_min_depth_flow_project_forward(rng):
    flow = _flow(rng)
    depth = (rng.rand(*flow.shape[:2]) + 0.1).astype(np.float32)
    want, wbest = golden.min_depth_flow_project_fwd(flow, depth)
    got = np.asarray(min_depth_flow_project(flow[None], depth[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
