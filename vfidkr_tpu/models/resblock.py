"""Rectification (residual refinement) network — flax re-design of
``Resblock/BasicBlock.py:50-93`` (``MultipleBasicBlock_4``).

7x7 conv (bias) + ReLU -> 3 residual BasicBlocks (bias-free, no norm)
-> 3x3 conv to 3 channels.  Init: normal(0, sqrt(2/(k*k*out_ch))) (:72-78).
"""

from __future__ import annotations

import flax.linen as nn

from vfidkr_tpu.models.layers import Conv, msra_normal_torch
from vfidkr_tpu.models.s2df import ResBasicBlock


class MultipleBasicBlock(nn.Module):
    num_blocks: int = 4
    intermediate: int = 128

    @nn.compact
    def __call__(self, x):
        h = Conv(self.intermediate, 7, 1, 3, kernel_init=msra_normal_torch,
                 name="block1_conv")(x)
        h = nn.relu(h)
        for i in range(2, self.num_blocks + 1):
            h = ResBasicBlock(self.intermediate, 1, name=f"block{i}")(h)
        return Conv(3, 3, 1, 1, kernel_init=msra_normal_torch,
                    name="block5_conv")(h)


def multiple_basic_block_4(intermediate: int = 128) -> MultipleBasicBlock:
    return MultipleBasicBlock(num_blocks=4, intermediate=intermediate)
