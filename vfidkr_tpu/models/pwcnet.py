"""PWC-DC optical-flow network (Sun et al. 2018) — flax re-design of
``PWCNet/PWCNet.py:41-335`` (the active ``PWCDCNet`` class).

Architecture (all numbers per reference):
- 6-level siamese conv pyramid 16/32/64/96/128/196 ch, each level
  ``conv(s=2) -> conv -> conv`` with LeakyReLU(0.1) (:53-70);
- per level from coarse to fine: cost volume (81 ch, md=4) over the
  (warped) other-image features -> LeakyReLU -> DenseNet block of 5 convs
  (128/128/96/64/32 with concat growth) -> 2-ch flow prediction -> 4x4/s2
  deconv upsampling of flow and of a 2-ch feature projection (:80-127);
- the coarser flow warps the other image's features with level-specific
  scaling x0.625/1.25/2.5/5.0 (:244,266,282,299);
- a 7-conv dilated context network refines the finest flow (:128-134,315-320);
- output flow2 is at **1/4 input resolution** (:322).

Init: kaiming-normal fan_in on every conv/deconv, zero bias (:136-140).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from vfidkr_tpu.models.layers import (
    Conv,
    ConvTranspose,
    kaiming_normal_torch,
    leaky_relu,
)
from vfidkr_tpu.ops import correlation_cost_volume, pwc_warp


class ConvLReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x=None, pieces=None):
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 self.dilation, kernel_init=kaiming_normal_torch,
                 name="conv")(x, pieces=pieces)
        return leaky_relu(x, 0.1)


class PredictFlow(nn.Module):
    @nn.compact
    def __call__(self, x=None, pieces=None):
        return Conv(2, 3, 1, 1, kernel_init=kaiming_normal_torch,
                    name="conv")(x, pieces=pieces)


class Deconv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x=None, pieces=None):
        return ConvTranspose(self.features, 4, 2, 1,
                             kernel_init=kaiming_normal_torch,
                             name="deconv")(x, pieces=pieces)


class PWCDCNet(nn.Module):
    """Input: two (B,H,W,3) frames; output: flow at (B,H/4,W/4,2), scaled by
    1/20 of true pixel flow (callers multiply by div_flow=20)."""
    md: int = 4
    corr_impl: str = "slices"   # cost-volume formulation (ops/correlation.py)
    # Dense-block evaluation: "concat" materialises the reference's growing
    # concat buffers (PWCNet.py:111-127); "split" keeps the pieces separate
    # and evaluates every consumer conv with split weights (layers.Conv
    # ``pieces``) — identical MACs, no concat copies, f32-rounding-identical.
    # Measured (v5e, bidirectional pair 448x256): split 3.01 ms vs concat
    # 3.08 ms — XLA already fuses most concat copies, so split stays
    # opt-in (its f32 reassociation shifts final flows ~3e-3 at random
    # init via warp-position amplification).
    dense_impl: str = "concat"
    # Batch-cliff workaround (VERDICT r3 item 2 / tools/ubench_batch.py):
    # the bidirectional pass scales linearly up to INTERNAL batch 4
    # (3.04 ms/pair) but regresses 1.8x per item at internal batch 8 (XLA
    # picks a worse conv tiling past the cliff).  ``batch_chunk`` caps the
    # internal batch per conv call: pairs are evaluated in groups of
    # batch_chunk//2 and the flows concatenated — identical per-sample math
    # (conv samples are independent; only f32 tiling-order rounding can
    # differ).  None = single fused call (reference-shaped).
    batch_chunk: int | None = None

    def setup(self):
        cl = ConvLReLU
        self.conv1a, self.conv1aa, self.conv1b = cl(16, stride=2), cl(16), cl(16)
        self.conv2a, self.conv2aa, self.conv2b = cl(32, stride=2), cl(32), cl(32)
        self.conv3a, self.conv3aa, self.conv3b = cl(64, stride=2), cl(64), cl(64)
        self.conv4a, self.conv4aa, self.conv4b = cl(96, stride=2), cl(96), cl(96)
        self.conv5a, self.conv5aa, self.conv5b = cl(128, stride=2), cl(128), cl(128)
        self.conv6aa, self.conv6a, self.conv6b = cl(196, stride=2), cl(196), cl(196)

        for lvl in (6, 5, 4, 3, 2):
            setattr(self, f"conv{lvl}_0", cl(128))
            setattr(self, f"conv{lvl}_1", cl(128))
            setattr(self, f"conv{lvl}_2", cl(96))
            setattr(self, f"conv{lvl}_3", cl(64))
            setattr(self, f"conv{lvl}_4", cl(32))
            setattr(self, f"predict_flow{lvl}", PredictFlow())
            setattr(self, f"deconv{lvl}", Deconv(2))
            if lvl > 2:
                setattr(self, f"upfeat{lvl}", Deconv(2))

        self.dc_conv1 = cl(128, dilation=1, padding=1)
        self.dc_conv2 = cl(128, dilation=2, padding=2)
        self.dc_conv3 = cl(128, dilation=4, padding=4)
        self.dc_conv4 = cl(96, dilation=8, padding=8)
        self.dc_conv5 = cl(64, dilation=16, padding=16)
        self.dc_conv6 = cl(32, dilation=1, padding=1)
        self.dc_conv7 = PredictFlow()

    def _pyramid(self, im):
        c1 = self.conv1b(self.conv1aa(self.conv1a(im)))
        c2 = self.conv2b(self.conv2aa(self.conv2a(c1)))
        c3 = self.conv3b(self.conv3aa(self.conv3a(c2)))
        c4 = self.conv4b(self.conv4aa(self.conv4a(c3)))
        c5 = self.conv5b(self.conv5aa(self.conv5a(c4)))
        c6 = self.conv6b(self.conv6a(self.conv6aa(c5)))
        return c1, c2, c3, c4, c5, c6

    def _corr(self, a, b):
        return leaky_relu(
            correlation_cost_volume(a, b, self.md, impl=self.corr_impl), 0.1)

    def _dense(self, lvl, xs):
        """DenseNet block on a pieces list (newest first, matching the
        reference's ``concat([conv(x), x])`` channel order)."""
        if self.dense_impl == "concat":
            x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
            for i in range(5):
                x = jnp.concatenate(
                    [getattr(self, f"conv{lvl}_{i}")(x), x], axis=-1)
            return [x]
        for i in range(5):
            xs = [getattr(self, f"conv{lvl}_{i}")(pieces=xs)] + xs
        return xs

    @staticmethod
    def _apply_x(mod, xs):
        return mod(xs[0]) if len(xs) == 1 else mod(pieces=xs)

    def __call__(self, im1, im2, output_more: bool = False):
        return self._decode(self._pyramid(im1), self._pyramid(im2),
                            output_more)

    def pyramid_only(self, im1, im2):
        """Profiling probe: the batched siamese pyramid pass alone (the
        MXU-bound part of ``bidirectional``; the rest is the decode)."""
        return self._pyramid(jnp.concatenate([im1, im2], axis=0))

    def decode_upto(self, im1, im2, upto: int = 2):
        """Profiling probe: pyramid + decode stopped after level ``upto``
        (6 = coarsest only, 2 = everything incl. the context net).  Timing
        differences between consecutive ``upto`` values attribute decode
        cost per level."""
        b = im1.shape[0]
        pyr = self._pyramid(jnp.concatenate([im1, im2], axis=0))
        p1 = tuple(c[:b] for c in pyr)
        p2 = tuple(c[b:] for c in pyr)
        fwd = tuple(jnp.concatenate([a, c], axis=0) for a, c in zip(p1, p2))
        bwd = tuple(jnp.concatenate([c, a], axis=0) for a, c in zip(p1, p2))
        return self._decode(fwd, bwd, False, stop_level=upto)

    def bidirectional(self, im1, im2):
        """Both flow directions with the siamese pyramids computed once
        (the reference runs two full passes, networks/DAIN.py:196-202; the
        pyramid convs are identical work and shared here — exact same
        outputs).

        TPU note: the pyramid runs ONE batched pass over both frames, and
        both decode directions run as ONE batch-2b decode pass — per-sample
        conv math is unchanged, but the op count halves (the decoder is
        launch-bound at the coarse pyramid levels)."""
        b = im1.shape[0]
        if self.batch_chunk is not None and 2 * b > self.batch_chunk:
            pc = max(1, self.batch_chunk // 2)   # pairs per chunk
            outs = [self.bidirectional(im1[i:i + pc], im2[i:i + pc])
                    for i in range(0, b, pc)]
            return (jnp.concatenate([o[0] for o in outs], axis=0),
                    jnp.concatenate([o[1] for o in outs], axis=0))
        pyr = self._pyramid(jnp.concatenate([im1, im2], axis=0))
        p1 = tuple(c[:b] for c in pyr)
        p2 = tuple(c[b:] for c in pyr)
        fwd_src = tuple(jnp.concatenate([a, c], axis=0)
                        for a, c in zip(p1, p2))
        bwd_src = tuple(jnp.concatenate([c, a], axis=0)
                        for a, c in zip(p1, p2))
        flow = self._decode(fwd_src, bwd_src, False)
        return flow[:b], flow[b:]

    def _decode(self, pyr1, pyr2, output_more: bool = False,
                stop_level: int = 2):
        c11, c12, c13, c14, c15, c16 = pyr1
        c21, c22, c23, c24, c25, c26 = pyr2

        xs = self._dense(6, [self._corr(c16, c26)])
        flow6 = self._apply_x(self.predict_flow6, xs)
        if stop_level >= 6:
            return flow6
        up_flow6 = self.deconv6(flow6)
        up_feat6 = self._apply_x(self.upfeat6, xs)

        warp5 = pwc_warp(c25, up_flow6 * 0.625)
        xs = self._dense(5, [self._corr(c15, warp5), c15, up_flow6, up_feat6])
        flow5 = self._apply_x(self.predict_flow5, xs)
        if stop_level >= 5:
            return flow5
        up_flow5 = self.deconv5(flow5)
        up_feat5 = self._apply_x(self.upfeat5, xs)

        warp4 = pwc_warp(c24, up_flow5 * 1.25)
        xs = self._dense(4, [self._corr(c14, warp4), c14, up_flow5, up_feat5])
        flow4 = self._apply_x(self.predict_flow4, xs)
        if stop_level >= 4:
            return flow4
        up_flow4 = self.deconv4(flow4)
        up_feat4 = self._apply_x(self.upfeat4, xs)

        warp3 = pwc_warp(c23, up_flow4 * 2.5)
        xs = self._dense(3, [self._corr(c13, warp3), c13, up_flow4, up_feat4])
        flow3 = self._apply_x(self.predict_flow3, xs)
        if stop_level >= 3:
            return flow3
        up_flow3 = self.deconv3(flow3)
        up_feat3 = self._apply_x(self.upfeat3, xs)

        warp2 = pwc_warp(c22, up_flow3 * 5.0)
        if stop_level == -1:          # profiling probe: + warp2 only
            return warp2[..., :2]
        corr2 = self._corr(c12, warp2)
        if stop_level == -2:          # probe: + corr2
            return corr2[..., :2]
        xs = self._dense(2, [corr2, c12, up_flow3, up_feat3])
        if stop_level == -3:          # probe: + dense2
            return xs[0][..., :2]
        flow2 = self._apply_x(self.predict_flow2, xs)

        ctx = self._apply_x(self.dc_conv1, xs)
        ctx = self.dc_conv4(self.dc_conv3(self.dc_conv2(ctx)))
        flow2 = flow2 + self.dc_conv7(self.dc_conv6(self.dc_conv5(ctx)))

        if output_more:
            return [flow2, flow3, flow4, flow5, flow6]
        return flow2
