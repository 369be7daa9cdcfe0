"""Rectification (residual refinement) network — flax re-design of
``Resblock/BasicBlock.py:50-93`` (``MultipleBasicBlock_4``).

7x7 conv (bias) + ReLU -> 3 residual BasicBlocks (bias-free, no norm)
-> 3x3 conv to 3 channels.  Init: normal(0, sqrt(2/(k*k*out_ch))) (:72-78).

``impl`` selects how the 3 residual blocks evaluate:

* ``"chained"`` — one module call per conv (reference-shaped; the only
  differentiable path, used for training and the f32 parity lane);
* ``"fused"`` — the whole 6-conv residual trunk runs as ONE Pallas kernel
  with every intermediate resident in VMEM
  (ops/pallas/rectify_kernel.py; bf16 tap-dot convs with f32
  accumulation, i.e. the bf16 eval-lane conv semantics — forward-only);
* ``"auto"`` (default) — ``fused`` exactly when the surrounding
  ``conv_compute_dtype`` context is bf16, the shape passes the kernel's
  VMEM gate, and the backend is TPU; ``chained`` otherwise (so the f32
  default and all training paths are untouched).

The fused path reads the SAME parameters the chained path creates
(``block{i}/conv{1,2}/Conv_0/kernel`` — the converter-visible tree is
unchanged); init always runs chained so the tree exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vfidkr_tpu.models.layers import Conv, _compute_dt, msra_normal_torch
from vfidkr_tpu.models.s2df import ResBasicBlock
from vfidkr_tpu.ops.pallas.rectify_kernel import (fused_resblocks,
                                                  fused_resblocks_ok)


def _under_autodiff(x) -> bool:
    """True when ``x`` carries an active JVP/linearize trace (jax.grad /
    jax.vjp / jax.linearize), unwrapping nested tracer levels.  The fused
    Pallas trunk is forward-only (manual DMA, no VJP), so differentiated
    graphs must take the chained path."""
    from jax._src.interpreters import ad as _ad
    ad_tracers = tuple(
        t for t in (getattr(_ad, "JVPTracer", None),
                    getattr(_ad, "LinearizeTracer", None)) if t is not None)
    seen = 0
    while isinstance(x, jax.core.Tracer) and seen < 16:
        if isinstance(x, ad_tracers):
            return True
        x = getattr(x, "primal", None)
        seen += 1
    return False


class MultipleBasicBlock(nn.Module):
    num_blocks: int = 4
    intermediate: int = 128
    impl: str = "auto"   # "chained" | "fused" | "auto" (see module doc)

    def _fusable(self, h) -> bool:
        if self.impl == "chained" or self.is_initializing():
            return False
        if _under_autodiff(h):
            # training graph: the fused kernel has no VJP — always chain
            # (even for impl="fused"; silently correct beats an opaque
            # Pallas AD error)
            return False
        if self.num_blocks != 4 or self.intermediate != 128 \
                or not fused_resblocks_ok(h.shape):
            return False
        if self.impl == "fused":
            return True
        return (_compute_dt() == jnp.bfloat16
                and jax.default_backend() == "tpu")

    @nn.compact
    def __call__(self, x):
        h = Conv(self.intermediate, 7, 1, 3, kernel_init=msra_normal_torch,
                 name="block1_conv")(x)
        h = nn.relu(h)
        if self._fusable(h):
            p = self.variables["params"]
            w6 = jnp.stack([p[f"block{i}"][f"conv{j}"]["Conv_0"]["kernel"]
                            for i in (2, 3, 4) for j in (1, 2)])
            h = fused_resblocks(h.astype(jnp.bfloat16), w6)
        else:
            for i in range(2, self.num_blocks + 1):
                h = ResBasicBlock(self.intermediate, 1, name=f"block{i}")(h)
        return Conv(3, 3, 1, 1, kernel_init=msra_normal_torch,
                    name="block5_conv")(h)


def multiple_basic_block_4(intermediate: int = 128) -> MultipleBasicBlock:
    return MultipleBasicBlock(num_blocks=4, intermediate=intermediate)
