"""Fused Pallas rectifier trunk parity (ops/pallas/rectify_kernel.py).

The bf16 eval lane can evaluate the rectifier's 3 residual blocks
(reference ``Resblock/BasicBlock.py:50-93``) as ONE Pallas kernel
(models/resblock.py impl="fused").  These tests run the kernel in
interpret mode on CPU (conftest forces the cpu backend) and assert:

* the fused module output matches the chained module on the SAME params
  to bf16-conv rounding (the kernel reproduces the bf16-lane conv
  semantics: bf16 operands, f32 accumulation, bf16 activation casts);
* impl="auto" in the f32 default lane stays on the chained path
  bit-exactly (off-TPU / f32 the fused kernel must never engage);
* the applicability gate accepts the production shapes and rejects
  wrong channel counts, indivisible heights, and VMEM-oversize frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfidkr_tpu.models.layers import conv_compute_dtype
from vfidkr_tpu.models.resblock import MultipleBasicBlock
from vfidkr_tpu.ops.pallas.rectify_kernel import (fused_resblocks,
                                                  fused_resblocks_ok)


def _init_params(rng, shape):
    m = MultipleBasicBlock(4, 128, impl="chained")
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    return m, x, m.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize("shape", [(2, 16, 24, 45), (1, 24, 16, 45)])
def test_fused_matches_chained(rng, shape):
    m_ch, x, params = _init_params(rng, shape)
    m_f = MultipleBasicBlock(4, 128, impl="fused")

    y_ref = m_ch.apply(params, x)                       # f32 chained
    with conv_compute_dtype(jnp.bfloat16):
        y_b16 = m_ch.apply(params, x)                   # bf16-lane chained
        y_fus = m_f.apply(params, x)

    # fused vs bf16 chained: same math, but the kernel adds residuals in
    # the f32 accumulator while the chained lane adds them post-cast in
    # bf16 — ReLU boundaries amplify that rounding on a few elements, so
    # the bound is scale-aware (outputs here are O(10)).
    scale = float(np.abs(np.asarray(y_ref)).max())
    np.testing.assert_allclose(np.asarray(y_fus, np.float32),
                               np.asarray(y_b16, np.float32),
                               rtol=0.05, atol=0.03 * scale)
    # fused vs the f32 truth: bounded by bf16 conv rounding over 8 convs
    np.testing.assert_allclose(np.asarray(y_fus, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.1, atol=0.05 * scale)


def test_auto_is_chained_in_f32(rng):
    m_ch, x, params = _init_params(rng, (1, 16, 24, 45))
    m_auto = MultipleBasicBlock(4, 128, impl="auto")
    y_auto = m_auto.apply(params, x)
    y_ch = m_ch.apply(params, x)
    assert jnp.array_equal(y_auto, y_ch)                # bit-exact: same path


def test_fused_kernel_direct(rng):
    """fused_resblocks vs a straight-line jnp conv chain in bf16."""
    b, h, w = 1, 16, 24
    x = jnp.asarray(rng.randn(b, h, w, 128) * 0.5, jnp.bfloat16)
    w6 = jnp.asarray(rng.randn(6, 3, 3, 128, 128) * 0.05, jnp.bfloat16)

    def conv(inp, ker):
        return jax.lax.conv_general_dilated(
            inp, ker, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    ref = x
    for k in range(3):
        t = jnp.maximum(conv(ref, w6[2 * k]), 0).astype(jnp.bfloat16)
        ref = jnp.maximum(conv(t, w6[2 * k + 1])
                          + ref.astype(jnp.float32), 0).astype(jnp.bfloat16)

    out = fused_resblocks(x, w6)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.02)


def test_fused_ok_gate():
    assert fused_resblocks_ok((2, 256, 448, 128))       # headline shape
    assert fused_resblocks_ok((1, 16, 24, 128))
    assert not fused_resblocks_ok((1, 16, 24, 64))      # wrong channels
    assert not fused_resblocks_ok((1, 17, 24, 128))     # H % rchunk != 0
    assert not fused_resblocks_ok((1, 2048, 2048, 128))  # VMEM oversize
    assert not fused_resblocks_ok((16, 24, 128))        # rank


def test_fused_impl_falls_back_under_autodiff():
    """impl="fused" inside a differentiated graph must take the chained path
    (the Pallas trunk is forward-only); gradients flow and are finite."""
    m = MultipleBasicBlock(4, 128, impl="fused")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 24, 8), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss, argnums=1)(params, x)
    assert np.all(np.isfinite(np.asarray(g)))
