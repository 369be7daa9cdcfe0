"""Big-C lane-gather Pallas path (the TPU dispatch for wide-channel warps,
e.g. DAIN_slowmotion's 196-ch context — DAIN_slowmotion.py:311-321) parity vs
the gather oracle — interpret mode on CPU (tests/conftest.py forces
JAX_PLATFORMS=cpu; the public impl="slab" string dispatches to "block"
off-TPU, so the kernel internals are invoked directly here).

Covers VERDICT round-2 item 1: interpret-mode parity for the big-C context
warp kernel, its flow-bound lax.cond fallback, and the custom-vjp backward
(the context image gradient is live in training even though flow/filter are
detached — DAIN_slowmotion.py:311-321 detaches only its inputs, and ctxNet
is trainable).
"""
import numpy as np
import jax
import jax.numpy as jnp

from vfidkr_tpu.ops import filter_interpolate
from vfidkr_tpu.ops.filter_interpolation import (
    _ctx_pallas_params,
    _filter_interpolate_ctx,
)


def _case(rng, b=1, h=32, w=64, c=12, flow_scale=6.0):
    image = rng.rand(b, h, w, c).astype(np.float32)
    flow = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 2 * flow_scale
    filt = rng.rand(b, h, w, 16).astype(np.float32)
    return jnp.asarray(image), jnp.asarray(flow), jnp.asarray(filt)


def _ctx(image, flow, filt, band=16, tw=32, rv=10, rh=14, c_chunk=8):
    return _filter_interpolate_ctx(image, flow, filt, 4, band, tw, rv, rh,
                                   c_chunk)


def test_ctx_matches_oracle(rng):
    image, flow, filt = _case(rng, b=2)
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _ctx(image, flow, filt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ctx_channel_padding(rng):
    """C not a multiple of c_chunk exercises the zero-channel padding."""
    image, flow, filt = _case(rng, c=13)
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _ctx(image, flow, filt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ctx_oversize_flow_conds_to_exact_path(rng):
    """Flows beyond the (rv, rh) slab bounds must trigger the whole-call
    lax.cond fallback and stay reference-exact (incl. the out-of-range
    copy-source fallback)."""
    image, flow, filt = _case(rng)
    flow = flow.at[0, 3, 20].set(jnp.asarray([25.0, 1.0]))    # > rh=14
    flow = flow.at[0, 8, 8].set(jnp.asarray([500.0, 0.0]))    # invalid: copy
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _ctx(image, flow, filt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ctx_backward_matches_block(rng):
    image, flow, filt = _case(rng)

    def grads(fn):
        def f(im, fl, ke):
            return jnp.sum(fn(im, fl, ke) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(image, flow, filt)

    ctx_g = grads(lambda im, fl, ke: _ctx(im, fl, ke))
    block_g = grads(lambda im, fl, ke: filter_interpolate(im, fl, ke,
                                                          impl="block"))
    for a, b_, name in zip(ctx_g, block_g, ("image", "flow", "filt")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_ctx_param_selection():
    if jax.default_backend() == "tpu":     # params only resolve on TPU
        assert _ctx_pallas_params(256, 448, 196) is not None
        assert _ctx_pallas_params(256, 448, 3) is None       # bandmm regime
        assert _ctx_pallas_params(250, 448, 196) is None     # h % band
    else:
        assert _ctx_pallas_params(256, 448, 196) is None


def test_ctx_bounds_quad_gap_skip_exact(rng):
    """Motion-boundary flows make the per-quarter row ranges disjoint: the
    "quad" gap-skip bounds (round-5 default; measured 29.4 -> 17.1 ms on a
    vertical split @v5e, tools/ubench_ctx_bounds.py) must stay bit-identical
    to the round-3 single-interval "chunk" bounds — the skipped rows carry
    zero weight for every pixel, so both modes sum the same taps."""
    from vfidkr_tpu.ops.pallas.ctx_gather_kernel import ctx_gather_pallas

    b, h, w, c = 1, 32, 64, 12
    image = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    kw = jnp.asarray(rng.rand(b, h, w, 16), jnp.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for fy in (np.where(xx < w // 2, 8.0, -8.0),      # vertical boundary
               np.where(yy < h // 2, 8.0, -8.0),      # horizontal boundary
               (rng.rand(h, w) * 16 - 8)):            # per-pixel random
        base_v = np.clip(np.floor(yy + fy).astype(np.int32), -4, h + 4)
        base_u = np.clip(np.floor(xx + 0 * fy).astype(np.int32), -4, w + 4)
        bv = jnp.asarray(base_v[None], jnp.int32)
        bu = jnp.asarray(base_u[None], jnp.int32)
        kws = dict(band=16, tw=32, rv=10, rh=14, c_chunk=8)
        want = ctx_gather_pallas(image, bv, bu, kw, bounds="chunk", **kws)
        got = ctx_gather_pallas(image, bv, bu, kw, bounds="quad", **kws)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
