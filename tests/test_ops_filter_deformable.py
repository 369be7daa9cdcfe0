"""Deformable FilterInterpolation variants (the compiled-but-dormant
capability of the op the paper is named after) vs the NumPy golden
translation of the CUDA kernels:

* gpu_forward          (filterinterpolation_cuda_kernel.cu:29-255)
* _deforconv           (:1353-1498)
* _nofilterwithdeforconv (:2070-2194)

plus the grad->offset path (backward :1580-2067: autodiff of the forward —
int truncations / quadrant comparisons carry no derivative, offset grads
flow through the bilinear phases)."""
import numpy as np
import jax
import jax.numpy as jnp

import golden
from vfidkr_tpu.ops import (
    filter_interpolate_deformable,
    filter_interpolate_nofilter_deformable,
)


def _case(rng, h=9, w=11, c=3, fs=4, flow_scale=3.0, off_scale=1.5):
    image = rng.rand(h, w, c).astype(np.float32)
    flow = (rng.rand(h, w, 2).astype(np.float32) - 0.5) * 2 * flow_scale
    filt = rng.rand(h, w, fs * fs).astype(np.float32)
    offsets = (rng.rand(h, w, 2 * fs * fs).astype(np.float32) - 0.5) \
        * 2 * off_scale
    return image, flow, filt, offsets


def test_deformable_static_quadrants_matches_golden(rng):
    image, flow, filt, offsets = _case(rng)
    want = golden.filter_interpolate_deformable_fwd(
        image, flow, filt, offsets, quadrant="static")
    got = np.asarray(filter_interpolate_deformable(
        image[None], flow[None], filt[None], offsets[None],
        quadrant="static"))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_deformable_deformed_quadrants_matches_golden(rng):
    image, flow, filt, offsets = _case(rng)
    want = golden.filter_interpolate_deformable_fwd(
        image, flow, filt, offsets, quadrant="deformed")
    got = np.asarray(filter_interpolate_deformable(
        image[None], flow[None], filt[None], offsets[None],
        quadrant="deformed"))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nofilter_deformable_matches_golden(rng):
    image, flow, _, offsets = _case(rng)
    want = golden.filter_interpolate_deformable_fwd(
        image, flow, None, offsets, quadrant="deformed")
    got = np.asarray(filter_interpolate_nofilter_deformable(
        image[None], flow[None], offsets[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_zero_offsets_interior_matches_ori(rng):
    """With zero offsets and interior windows (away from clamps), the static
    variant must reduce to the active _ori op."""
    from vfidkr_tpu.ops import filter_interpolate
    image, flow, filt, _ = _case(rng, h=12, w=14, flow_scale=2.0)
    offsets = np.zeros((12, 14, 32), np.float32)
    ori = np.asarray(filter_interpolate(image[None], flow[None],
                                        filt[None]))[0]
    got = np.asarray(filter_interpolate_deformable(
        image[None], flow[None], filt[None], offsets[None]))[0]
    # interior only: at clamped windows the deformed bilinear (phi=0 at the
    # clamped tap) still reads tap+1, unlike _ori's pure clamp
    np.testing.assert_allclose(got[3:-3, 3:-3], ori[3:-3, 3:-3],
                               rtol=1e-5, atol=1e-5)


def test_deformable_offset_gradients_flow(rng):
    """grad->offset (reference backward STEP 4, :1790-1860): finite,
    nonzero, and zero where the pixel is invalid."""
    image, flow, filt, offsets = _case(rng)
    flow[2, 3] = (1000.0, 0.0)   # invalid pixel -> copy, no grads

    def loss(off):
        out = filter_interpolate_deformable(
            jnp.asarray(image)[None], jnp.asarray(flow)[None],
            jnp.asarray(filt)[None], off[None])
        return jnp.sum(out ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(offsets)))
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0
    assert np.abs(g[2, 3]).max() == 0.0


def test_deformable_offset_gradient_finite_difference(rng):
    """Autodiff offset gradient vs central finite differences at a few
    coordinates (validates the bilinear-phase derivative path)."""
    image, flow, filt, offsets = _case(rng, flow_scale=1.5, off_scale=0.8)

    def f(off):
        return float(jnp.sum(filter_interpolate_deformable(
            jnp.asarray(image)[None], jnp.asarray(flow)[None],
            jnp.asarray(filt)[None], jnp.asarray(off)[None]) ** 2))

    g = np.asarray(jax.grad(lambda o: jnp.sum(filter_interpolate_deformable(
        jnp.asarray(image)[None], jnp.asarray(flow)[None],
        jnp.asarray(filt)[None], o[None]) ** 2))(jnp.asarray(offsets)))

    eps = 1e-3
    rng2 = np.random.RandomState(1)
    for _ in range(6):
        y, x = rng2.randint(1, 8), rng2.randint(1, 10)
        ch = rng2.randint(0, 32)
        o1, o2 = offsets.copy(), offsets.copy()
        o1[y, x, ch] -= eps
        o2[y, x, ch] += eps
        fd = (f(o2) - f(o1)) / (2 * eps)
        np.testing.assert_allclose(g[y, x, ch], fd, rtol=5e-2, atol=5e-3)
