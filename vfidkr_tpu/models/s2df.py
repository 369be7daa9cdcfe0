"""S2DF sparse-to-dense context feature extractor — flax re-design of
``S2D_models/S2DF.py:97-222`` (active factory: ``S2DF_3dense``, :214-216).

7x7 conv to 64 ch + ReLU, then up to 3 bias-free residual BasicBlocks with
dilations 4/8/16 (no norm layers — BN is commented out in the reference),
returning the concat of [raw RGB, feat1, feat2, feat3] = 195 channels.
Init: normal(0, sqrt(2/(k*k*out_ch))) (:116-119).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vfidkr_tpu.models.layers import Conv, msra_normal_torch


class ResBasicBlock(nn.Module):
    """Residual block of S2DF.py:26-55 / Resblock/BasicBlock.py:11-49:
    conv3x3(dilated) -> ReLU -> conv3x3 -> +residual -> ReLU, bias-free."""
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.dilation
        out = Conv(self.features, 3, 1, pad, self.dilation, use_bias=False,
                   kernel_init=msra_normal_torch, name="conv1")(x)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, 1, use_bias=False,
                   kernel_init=msra_normal_torch, name="conv2")(out)
        return nn.relu(out + x)


class S2DF(nn.Module):
    num_blocks: int = 3
    dense: bool = True
    dilation: bool = True

    @nn.compact
    def __call__(self, x):
        feats = [x]
        h = Conv(64, 7, 1, 3, use_bias=False, kernel_init=msra_normal_torch,
                 name="block1_conv")(x)
        h = nn.relu(h)
        nb = self.num_blocks
        if (nb > 1 and self.dense) or nb == 1:
            feats.append(h)
        dils = [4, 8, 16]
        for i in range(2, nb + 1):
            h = ResBasicBlock(64, dils[i - 2] if self.dilation else 1,
                              name=f"block{i}")(h)
            if (nb > i and self.dense) or nb == i:
                feats.append(h)
        return jnp.concatenate(feats, axis=-1)


def s2df_3dense() -> S2DF:
    return S2DF(num_blocks=3, dense=True, dilation=True)
