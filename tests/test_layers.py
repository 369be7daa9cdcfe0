"""Layer primitives vs torch CPU (padding/stride/transposed-conv/resize parity)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfidkr_tpu.models import layers

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.parity


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_conv_stride2_matches_torch(rng):
    x = rng.rand(2, 9, 11, 5).astype(np.float32)
    w = rng.rand(3, 3, 5, 8).astype(np.float32)   # HWIO
    b = rng.rand(8).astype(np.float32)

    mod = layers.Conv(8, 3, 2, 1)
    out = mod.apply({"params": {"Conv_0": {"kernel": jnp.asarray(w),
                                           "bias": jnp.asarray(b)}}},
                    jnp.asarray(x))
    want = F.conv2d(_nchw(x), torch.from_numpy(w.transpose(3, 2, 0, 1)),
                    torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out), _nhwc(want), rtol=1e-4, atol=1e-5)


def test_conv_dilation_matches_torch(rng):
    x = rng.rand(1, 16, 16, 4).astype(np.float32)
    w = rng.rand(3, 3, 4, 6).astype(np.float32)
    mod = layers.Conv(6, 3, 1, 8, dilation=8, use_bias=False)
    out = mod.apply({"params": {"Conv_0": {"kernel": jnp.asarray(w)}}},
                    jnp.asarray(x))
    want = F.conv2d(_nchw(x), torch.from_numpy(w.transpose(3, 2, 0, 1)),
                    padding=8, dilation=8)
    np.testing.assert_allclose(np.asarray(out), _nhwc(want), rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch(rng):
    x = rng.rand(2, 7, 9, 4).astype(np.float32)
    w = rng.rand(4, 4, 4, 6).astype(np.float32)   # HWIO, I=in
    b = rng.rand(6).astype(np.float32)
    mod = layers.ConvTranspose(6, 4, 2, 1)
    out = mod.apply({"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                    jnp.asarray(x))
    # torch ConvTranspose2d weight is (in, out, kh, kw)
    tw = torch.from_numpy(w.transpose(2, 3, 0, 1))
    want = F.conv_transpose2d(_nchw(x), tw, torch.from_numpy(b),
                              stride=2, padding=1)
    assert out.shape == (2, 14, 18, 6)
    np.testing.assert_allclose(np.asarray(out), _nhwc(want), rtol=1e-4, atol=1e-5)


def test_upsample_bilinear_matches_torch(rng):
    for factor in (2, 4):
        x = rng.rand(1, 6, 7, 3).astype(np.float32)
        got = np.asarray(layers.upsample_bilinear(jnp.asarray(x), factor))
        want = F.interpolate(_nchw(x), scale_factor=factor, mode="bilinear",
                             align_corners=False)
        np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


def test_upsample_bilinear_align_corners_matches_torch(rng):
    x = rng.rand(1, 5, 6, 3).astype(np.float32)
    got = np.asarray(layers.upsample_bilinear_align_corners(jnp.asarray(x), 2))
    want = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                         align_corners=True)
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


def test_pools_match_torch(rng):
    x = rng.rand(1, 8, 10, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layers.max_pool_2x2(jnp.asarray(x))),
        _nhwc(F.max_pool2d(_nchw(x), 2)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(layers.avg_pool_2x2(jnp.asarray(x))),
        _nhwc(F.avg_pool2d(_nchw(x), 2)), rtol=1e-6)


def test_replication_pad_matches_torch(rng):
    x = rng.rand(1, 5, 6, 2).astype(np.float32)
    got = np.asarray(layers.replication_pad(jnp.asarray(x), (3, 4, 1, 2)))
    want = F.pad(_nchw(x), (3, 4, 1, 2), mode="replicate")
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-6)


def test_max_pool_2x2_backward_matches_torch_ties(rng):
    """max_pool_2x2's backward (select_and_scatter first-max routing) must
    match the reference torch MaxPool2d backward EXACTLY — including on tied
    windows, which are common after ReLU (zeros).  Quantized inputs force
    many ties.  (A hand-built elementwise first-max VJP measured neutral on
    v5e, round 5 — the stock reduce_window lowering stays.)"""
    import torch

    for x in (rng.rand(2, 8, 10, 3).astype(np.float32),
              np.round(rng.rand(2, 8, 10, 3).astype(np.float32) * 3) / 3,
              np.zeros((1, 4, 4, 2), np.float32)):
        g = rng.rand(*(x.shape[0], x.shape[1] // 2, x.shape[2] // 2,
                       x.shape[3])).astype(np.float32)

        def loss(xx):
            return jnp.sum(layers.max_pool_2x2(xx) * jnp.asarray(g))

        got = np.asarray(jax.grad(loss)(jnp.asarray(x)))

        xt = _nchw(x).requires_grad_(True)
        out = F.max_pool2d(xt, 2)
        out.backward(_nchw(g))
        want = _nhwc(xt.grad)
        np.testing.assert_array_equal(got, want)

        # and against the reduce_window formulation jax lowers nn.max_pool to
        def loss_rw(xx):
            import flax.linen as nn
            return jnp.sum(nn.max_pool(xx, (2, 2), strides=(2, 2))
                           * jnp.asarray(g))

        want_rw = np.asarray(jax.grad(loss_rw)(jnp.asarray(x)))
        np.testing.assert_array_equal(got, want_rw)
