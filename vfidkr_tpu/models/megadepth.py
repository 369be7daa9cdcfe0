"""MegaDepth single-image log-depth hourglass — flax re-design of
``MegaDepth/pytorch_DIW_scratch.py:33-764`` (the ``pytorch_DIW_scratch``
Torch7-converted inception hourglass) and its ``HourGlass`` wrapper
(``MegaDepth_model.py:11-21``, ``models/HG_model.py:10-47``).

The reference defines the net as one 760-line literal tree of nested
Sequential/ConcatTable/Concat/CAddTable containers.  Here the architecture
lives in ``megadepth_spec.json`` (extracted by
``tools/extract_megadepth_spec.py`` via AST analysis of the reference file)
and this module interprets it: a 7x7 conv to 128 ch + BN + ReLU stem, a
recursive hourglass of inception cells (parallel 1x1/3x3/5x5/7x7/11x11
branches of 32->16 ch concatenated), MaxPool/AvgPool downsampling,
nearest-neighbour upsampling, skip additions, and a final 3x3 conv to one
log-depth channel.

It is the only net in the system with BatchNorm (mostly affine=False,
``BatchNorm2d(32, 1e-05, 0.1, False)``); running statistics live in the
``batch_stats`` collection.  Parameter names are the node paths of a
deterministic spec traversal, which the torch-checkpoint converter mirrors.
"""

from __future__ import annotations

import json
import pathlib

import flax.linen as nn
import jax.numpy as jnp

from vfidkr_tpu.models.layers import (
    Conv,
    avg_pool_2x2,
    max_pool_2x2,
    upsample_nearest,
)

_SPEC = json.loads(
    (pathlib.Path(__file__).parent / "megadepth_spec.json").read_text())


class MegaDepthHourglass(nn.Module):
    """Input (B,H,W,3) RGB in [0,1] (H,W divisible by 128 in practice);
    output (B,H,W,1) log-depth."""
    train_bn: bool = False   # True: use batch statistics + update running stats

    @nn.compact
    def __call__(self, x):
        out = self._run(_SPEC, x, "n")
        return out

    def _run(self, node, x, path):
        t = node["type"]
        if t == "seq":
            for i, child in enumerate(node["children"]):
                x = self._run(child, x, f"{path}_{i}")
            return x
        if t == "conv":
            kh, kw = node["k"]
            sh, sw = node["s"]
            ph, pw = node["p"]
            return nn.Conv(node["out"], (kh, kw), strides=(sh, sw),
                           padding=((ph, ph), (pw, pw)), use_bias=True,
                           name=path)(x)
        if t == "bn":
            return nn.BatchNorm(use_running_average=not self.train_bn,
                                momentum=0.9, epsilon=1e-5,
                                use_scale=node["affine"],
                                use_bias=node["affine"], name=path)(x)
        if t == "relu":
            return nn.relu(x)
        if t == "maxpool":
            return max_pool_2x2(x)
        if t == "avgpool":
            return avg_pool_2x2(x)
        if t == "upnearest":
            return upsample_nearest(x, 2)
        if t == "concat_table":
            # nn.ConcatTable: apply each branch to the same input -> list
            return [self._run(c, x, f"{path}_{i}")
                    for i, c in enumerate(node["children"])]
        if t == "concat":
            outs = [self._run(c, x, f"{path}_{i}")
                    for i, c in enumerate(node["children"])]
            return jnp.concatenate(outs, axis=-1)
        if t == "add":
            # nn.CAddTable: reduce the incoming branch list by addition
            assert isinstance(x, (list, tuple)) and not node["children"]
            total = x[0]
            for y in x[1:]:
                total = total + y
            return total
        raise ValueError(f"unknown spec node {t}")


def depth_inv_from_log_depth(log_depth):
    """DAIN_slowmotion.py:143: depth_inv = 1e-6 + 1/exp(log_depth)."""
    return 1e-6 + jnp.exp(-log_depth)
