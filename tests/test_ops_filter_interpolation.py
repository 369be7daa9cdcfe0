"""FilterInterpolation op: forward + backward parity vs the NumPy golden
translation of filterinterpolation_cuda_kernel.cu (_ori variant)."""
import numpy as np
import jax
import jax.numpy as jnp

from vfidkr_tpu.ops import filter_interpolate
import golden


def _random_case(rng, h=9, w=11, c=3, fs=4, flow_scale=3.0):
    image = rng.rand(h, w, c).astype(np.float32)
    flow = (rng.rand(h, w, 2).astype(np.float32) - 0.5) * 2 * flow_scale
    filt = rng.rand(h, w, fs * fs).astype(np.float32)
    return image, flow, filt


def test_forward_matches_golden(rng):
    image, flow, filt = _random_case(rng)
    want = golden.filter_interpolate_fwd(image, flow, filt)
    got = np.asarray(filter_interpolate(image[None], flow[None], filt[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_out_of_range_copies_source(rng):
    image, flow, filt = _random_case(rng)
    flow[2, 3] = (100.0, 100.0)   # lands outside and |f| >= dims/2
    flow[4, 4] = (-50.0, 0.0)
    got = np.asarray(filter_interpolate(image[None], flow[None], filt[None]))[0]
    np.testing.assert_allclose(got[2, 3], image[2, 3], rtol=1e-6)
    np.testing.assert_allclose(got[4, 4], image[4, 4], rtol=1e-6)


def test_forward_integer_flow(rng):
    """Integer landing points exercise the alpha==0/beta==0 quadrant edges."""
    image, _, filt = _random_case(rng)
    flow = np.zeros_like(image[..., :2])
    flow[...] = (1.0, -2.0)
    want = golden.filter_interpolate_fwd(image, flow, filt)
    got = np.asarray(filter_interpolate(image[None], flow[None], filt[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_backward_matches_reference_kernel(rng):
    image, flow, filt = _random_case(rng)
    g = rng.rand(*image.shape).astype(np.float32)

    def f(im, fl, ke):
        return filter_interpolate(im[None], fl[None], ke[None])[0]

    _, vjp = jax.vjp(f, jnp.asarray(image), jnp.asarray(flow), jnp.asarray(filt))
    gi, gf, gk = (np.asarray(t) for t in vjp(jnp.asarray(g)))

    want_gi, want_gf, want_gk = golden.filter_interpolate_bwd(image, flow, filt, g)
    np.testing.assert_allclose(gi, want_gi, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gk, want_gk, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gf, want_gf, rtol=1e-4, atol=1e-4)


def test_backward_invalid_pixels_get_no_gradient(rng):
    image, flow, filt = _random_case(rng)
    flow[:] = 1000.0   # everything out of range -> forward is a copy

    def loss(im, fl, ke):
        return jnp.sum(filter_interpolate(im[None], fl[None], ke[None]) ** 2)

    gi, gf, gk = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(image), jnp.asarray(flow), jnp.asarray(filt))
    # the reference backward skips invalid pixels entirely: no grads anywhere
    assert float(jnp.abs(gi).max()) == 0.0
    assert float(jnp.abs(gf).max()) == 0.0
    assert float(jnp.abs(gk).max()) == 0.0


def test_vmap_batch(rng):
    b = 2
    images = rng.rand(b, 7, 8, 3).astype(np.float32)
    flows = (rng.rand(b, 7, 8, 2).astype(np.float32) - 0.5) * 4
    filts = rng.rand(b, 7, 8, 16).astype(np.float32)
    got = np.asarray(filter_interpolate(images, flows, filts))
    for i in range(b):
        want = golden.filter_interpolate_fwd(images[i], flows[i], filts[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_large_frame_chunked_paths_match(rng, monkeypatch):
    """The big-frame defences (chunked blocked gather + sequential batch
    map, ops/filter_interpolation.py _GATHER_CHUNK notes) must be
    value-identical to the plain paths.  Shrink the thresholds so a small
    case exercises chunking, lax.map batching, and the padded last chunk."""
    import vfidkr_tpu.ops.filter_interpolation as F

    b, h, w = 3, 9, 11
    images = rng.rand(b, h, w, 3).astype(np.float32)
    flows = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 4
    filts = rng.rand(b, h, w, 16).astype(np.float32)

    plain = {impl: np.asarray(filter_interpolate(images, flows, filts,
                                                 impl=impl))
             for impl in ("block", "gather")}

    monkeypatch.setattr(F, "_GATHER_CHUNK", 32)     # 99 px -> 4 chunks
    monkeypatch.setattr(F, "_VMAP_GATHER_PX", 10)   # force lax.map batching
    # filter_interpolate is module-level jitted; identical shapes/statics
    # would hit the jit cache and never re-trace through the monkeypatched
    # thresholds (round-3 advisor: the assertions below were vacuous).
    jax.clear_caches()
    for impl in ("block", "gather"):
        got = np.asarray(filter_interpolate(images, flows, filts, impl=impl))
        np.testing.assert_array_equal(got, plain[impl])

    # gradients flow through the chunked path too
    def loss(im):
        return jnp.sum(filter_interpolate(im, flows, filts, impl="block"))
    g = jax.grad(loss)(jnp.asarray(images))
    assert np.all(np.isfinite(np.asarray(g)))
