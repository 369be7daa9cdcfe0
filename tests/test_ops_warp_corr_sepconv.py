"""Interpolation warp, PWC grid-sample warp, correlation, sepconv parity."""
import numpy as np
import pytest
import jax.numpy as jnp

from vfidkr_tpu.ops import (
    correlation_cost_volume,
    interpolate_bilinear,
    pwc_warp,
    separable_conv,
    separable_conv_flow,
)
import golden


def test_interpolate_bilinear_forward(rng):
    image = rng.rand(8, 10, 3).astype(np.float32)
    flow = ((rng.rand(8, 10, 2) - 0.5) * 6).astype(np.float32)
    want = golden.interpolate_bilinear_fwd(image, flow)
    got = np.asarray(interpolate_bilinear(image[None], flow[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["slices", "banded"])
def test_correlation_forward(rng, impl):
    f1 = rng.rand(6, 7, 5).astype(np.float32)
    f2 = rng.rand(6, 7, 5).astype(np.float32)
    want = golden.correlation_fwd(f1, f2, md=4)
    got = np.asarray(correlation_cost_volume(f1[None], f2[None], impl=impl))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_correlation_channel_order(rng):
    """tc = (tj+md)*(2md+1) + (ti+md): a pure x-shift of f2 must peak at the
    matching ti channel on row tj=0."""
    h, w, c = 10, 12, 4
    f1 = rng.rand(h, w, c).astype(np.float32)
    f2 = np.zeros_like(f1)
    f2[:, :-2] = f1[:, 2:]          # f2(x) = f1(x+2) -> best match at ti=+2? no:
    # corr(ti) = f1(x) . f2(x+ti); f2(x+ti) = f1(x+ti+2) -> peak at ti = -2
    got = np.asarray(correlation_cost_volume(f1[None], f2[None]))[0]
    interior = got[:, 4:-4, :]
    peak = interior.mean(axis=(0, 1)).argmax()
    md, d = 4, 9
    assert peak == (0 + md) * d + (-2 + md)


@pytest.mark.parity
def test_pwc_warp_matches_torch_grid_sample(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    h, w, c = 12, 16, 5
    image = rng.rand(h, w, c).astype(np.float32)
    flow = ((rng.rand(h, w, 2) - 0.5) * 5).astype(np.float32)

    # reference warp (PWCNet.py:159-199) on torch CPU
    x = torch.from_numpy(image.transpose(2, 0, 1))[None]
    flo = torch.from_numpy(flow.transpose(2, 0, 1))[None]
    xx = torch.arange(w).view(1, -1).repeat(h, 1).float()
    yy = torch.arange(h).view(-1, 1).repeat(1, w).float()
    grid = torch.stack([xx, yy])[None] + flo
    grid[:, 0] = 2.0 * grid[:, 0] / max(w - 1, 1) - 1.0
    grid[:, 1] = 2.0 * grid[:, 1] / max(h - 1, 1) - 1.0
    grid = grid.permute(0, 2, 3, 1)
    out = F.grid_sample(x, grid, align_corners=False)
    mask = F.grid_sample(torch.ones_like(x), grid, align_corners=False)
    mask = (mask >= 0.9999).float()
    want = (out * mask)[0].numpy().transpose(1, 2, 0)

    got = np.asarray(pwc_warp(image[None], flow[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_separable_conv_forward(rng):
    image = rng.rand(9, 11, 3).astype(np.float32)
    fs = 4
    ho, wo = 9 - fs + 1, 11 - fs + 1
    vert = rng.rand(ho, wo, fs).astype(np.float32)
    horiz = rng.rand(ho, wo, fs).astype(np.float32)
    want = golden.separable_conv_fwd(image, vert, horiz)
    got = np.asarray(separable_conv(image[None], vert[None], horiz[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_separable_conv_flow_forward(rng):
    fs, ho, wo = 4, 6, 7
    vert = rng.rand(ho, wo, fs).astype(np.float32)
    horiz = rng.rand(ho, wo, fs).astype(np.float32)
    vert[2, 3] = 0.0   # zero-sum -> -2000 sentinel
    want = golden.separable_conv_flow_fwd(vert, horiz)
    got = np.asarray(separable_conv_flow(vert[None], horiz[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_interpolate_bilinear_backward(rng):
    """Autodiff of our forward must reproduce the reference backward kernel
    (interpolation_cuda_kernel.cu:103-204), including the clamped-border
    gamma behaviour."""
    import jax

    image = rng.rand(8, 10, 3).astype(np.float32)
    flow = ((rng.rand(8, 10, 2) - 0.5) * 6).astype(np.float32)
    flow[0, 0] = (8.7, 6.5)     # lands in the clamped bottom-right corner
    flow[7, 9] = (-9.2, -6.8)   # lands near the top-left corner
    g = rng.rand(8, 10, 3).astype(np.float32)

    _, vjp = jax.vjp(lambda a, b: interpolate_bilinear(a[None], b[None])[0],
                     jnp.asarray(image), jnp.asarray(flow))
    gi, gf = (np.asarray(t) for t in vjp(jnp.asarray(g)))
    want_gi, want_gf = golden.interpolate_bilinear_bwd(image, flow, g)
    np.testing.assert_allclose(gi, want_gi, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gf, want_gf, rtol=1e-4, atol=1e-4)


def test_separable_conv_backward(rng):
    """Autodiff must reproduce the reference backward
    (separableconv_cuda_kernel.cu:85-134)."""
    import jax

    image = rng.rand(9, 11, 3).astype(np.float32)
    fs = 4
    ho, wo = 9 - fs + 1, 11 - fs + 1
    vert = rng.rand(ho, wo, fs).astype(np.float32)
    horiz = rng.rand(ho, wo, fs).astype(np.float32)
    g = rng.rand(ho, wo, 3).astype(np.float32)

    _, vjp = jax.vjp(
        lambda a, v, h: separable_conv(a[None], v[None], h[None])[0],
        jnp.asarray(image), jnp.asarray(vert), jnp.asarray(horiz))
    gi, gv, gh = (np.asarray(t) for t in vjp(jnp.asarray(g)))
    want = golden.separable_conv_bwd(image, vert, horiz, g)
    for got, w_ in zip((gi, gv, gh), want):
        np.testing.assert_allclose(got, w_, rtol=1e-4, atol=1e-5)


def test_separable_conv_flow_backward(rng):
    """Autodiff must reproduce the reference backward incl. the zero-sum
    skip (separableconvflow_cuda_kernel.cu:96-172)."""
    import jax

    fs, ho, wo = 4, 6, 7
    vert = rng.rand(ho, wo, fs).astype(np.float32)
    horiz = rng.rand(ho, wo, fs).astype(np.float32)
    vert[2, 3] = 0.0    # zero-sum row: sentinel output, zero gradient
    g = rng.rand(ho, wo, 2).astype(np.float32)

    _, vjp = jax.vjp(lambda v, h: separable_conv_flow(v[None], h[None])[0],
                     jnp.asarray(vert), jnp.asarray(horiz))
    gv, gh = (np.asarray(t) for t in vjp(jnp.asarray(g)))
    want_gv, want_gh = golden.separable_conv_flow_bwd(vert, horiz, g)
    np.testing.assert_allclose(gv, want_gv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gh, want_gh, rtol=1e-4, atol=1e-5)
