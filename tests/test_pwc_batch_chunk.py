"""PWC batch_chunk parity: chunked bidirectional == single fused call.

``batch_chunk`` caps PWC's internal conv batch (the measured v5e tiling
cliff sits between internal batch 4 and 8, BASELINE.md "Batch scaling");
per-sample conv math is independent, so results must match to conv
rounding.  Reference analog: networks/DAIN.py:196-202 runs each pair's two
directions separately (i.e. internal batch 2) — chunking reproduces the
fused path's values while restoring that small-batch conv shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfidkr_tpu.models.pwcnet import PWCDCNet


@pytest.mark.parametrize("b", [3, 4])
def test_chunked_bidirectional_matches_fused(b):
    rng = np.random.RandomState(0)
    i0 = jnp.asarray(rng.rand(b, 64, 128, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(b, 64, 128, 3), jnp.float32)

    base = PWCDCNet()
    params = jax.jit(base.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")

    fwd0, bwd0 = jax.jit(
        lambda p, a, c: base.apply(p, a, c, method="bidirectional"))(
            params, i0, i2)
    chunked = PWCDCNet(batch_chunk=4)
    fwd1, bwd1 = jax.jit(
        lambda p, a, c: chunked.apply(p, a, c, method="bidirectional"))(
            params, i0, i2)

    assert fwd1.shape == fwd0.shape and bwd1.shape == bwd0.shape
    np.testing.assert_allclose(fwd1, fwd0, rtol=0, atol=2e-5)
    np.testing.assert_allclose(bwd1, bwd0, rtol=0, atol=2e-5)


def test_chunk_noop_below_threshold():
    # internal batch 2*b <= chunk must take the single fused path and be
    # bit-identical (same graph).
    rng = np.random.RandomState(1)
    i0 = jnp.asarray(rng.rand(2, 64, 128, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(2, 64, 128, 3), jnp.float32)
    base = PWCDCNet()
    params = jax.jit(base.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")
    f0, b0 = base.apply(params, i0, i2, method="bidirectional")
    f1, b1 = PWCDCNet(batch_chunk=4).apply(
        params, i0, i2, method="bidirectional")
    assert np.array_equal(np.asarray(f0), np.asarray(f1))
    assert np.array_equal(np.asarray(b0), np.asarray(b1))
