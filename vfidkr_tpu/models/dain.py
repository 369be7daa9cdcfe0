"""Top-level VFIDKR models — flax re-designs of ``networks/DAIN.py:23-294``
(active paper model, t=0.5) and ``networks/DAIN_slowmotion.py:16-202``
(full original-DAIN pipeline with depth + context at arbitrary time_step).

Pipeline (DAIN.forward, :101-294):
  1. kernel prediction: MonoNet5 trunk on concat(I0,I2) + two branch heads
     -> per-pixel 4x4 kernels for each direction (:185-188);
  2. bidirectional flow: two PWC-Net passes with swapped concat order, each
     scaled by div_flow(20) * t and bilinearly x4-upsampled (:194-202,296-311);
  3. flow projection onto target time (FlowProjection; hole-filled at
     inference only) (:215-220);
  4. FilterInterpolation of both frames, averaged (:238,560-573);
  5. residual rectification on the 45-ch concat
     [out, ref0, ref2, off0, off1, filt0, filt1] (:264-271).

DAIN_slowmotion differences (:127-183): MegaDepth log-depth drives
DepthFlowProjection; S2DF context (195 ch) + detached log-depth (1 ch) are
warped per time step with detached flow/kernels; fusion is time-weighted
``ref0*(1-t) + ref2*t``; rectifier input is 437 ch.

The reference constructs OccNet / DeconvField / (in DAIN) ctxNet without
calling them (:44-50) — their parameters exist in checkpoints, so they are
instantiated here too for checkpoint interop; ``mutable=False`` keeps them
free at runtime (flax only executes called submodules, but setup-declared
modules still appear in the param tree via their first call — we call them
lazily under ``init_unused``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfidkr_tpu.models.layers import conv_compute_dtype, upsample_bilinear
from vfidkr_tpu.models.megadepth import MegaDepthHourglass, depth_inv_from_log_depth
from vfidkr_tpu.models.mononet import BranchHead, DeconvField, MonoNet5, OccNet
from vfidkr_tpu.models.phasepack import unpack2
from vfidkr_tpu.models.pwcnet import PWCDCNet
from vfidkr_tpu.models.resblock import MultipleBasicBlock
from vfidkr_tpu.models.s2df import S2DF
from vfidkr_tpu.ops import depth_flow_project, filter_interpolate, flow_project


class DAIN(nn.Module):
    """Active paper model. t is asserted to 0.5 in the reference (:36)."""
    channel: int = 3
    filter_size: int = 4
    timestep: float = 0.5
    init_unused: bool = True   # instantiate OccNet/DeconvField/ctxNet params
    filter_impl: str = "slab"    # filter_interpolate impl: banded one-hot
                                 # Pallas kernel w/ exact lax.cond fallback
                                 # (~4x faster than "block" on v5e; see
                                 # ops/pallas/filter_bandmm_kernel.py)
    compute_dtype: str = "float32"   # fast-eval lane: "bfloat16" runs the
                                     # kernel-estimation trunk/heads and the
                                     # rectifier convs in bf16.  PWC-Net and
                                     # all ops STAY f32: per-stage v5e
                                     # measurement (tools/ubench_bf16.py)
                                     # shows bf16 1.32x on MonoNet and 1.06x
                                     # on the rectifier but 0.87x (a LOSS) on
                                     # PWC and ~1.0x on MegaDepth, so the
                                     # lane applies bf16 only where it wins.
    corr_impl: str = "slices"    # PWC cost-volume formulation
    dense_impl: str = "concat"   # PWC decode dense-block evaluation
                                 # ("split" = split-weight, no concat
                                 # buffers; see models/pwcnet.py)
    pwc_batch_chunk: int | None = 4   # cap PWC's internal conv batch
                                 # (pairs run in groups of chunk//2; see
                                 # PWCDCNet.batch_chunk).  Measured fix for
                                 # the internal-batch-8 conv-tiling cliff:
                                 # B=4 headline 11.89 -> 9.31 ms/frame
                                 # (tools/ubench_pwc_chunk.py); a no-op
                                 # (bit-identical graph) at B <= 2.
    kernel_impl: str = "chained"  # MonoNet5/head evaluation.  "packed" /
                                  # "packed_trunk" run the small-channel
                                  # convs phase-packed (models/phasepack.py;
                                  # exact to f32 rounding) — a 2x win in
                                  # isolation but MEASURED NEUTRAL-TO-WORSE
                                  # inside the full DAIN graph on v5e
                                  # (chained 8.93 / packed_trunk 8.86 /
                                  # packed 10.42 ms @448x256), so the
                                  # default stays chained.
    rect_impl: str = "auto"       # rectifier residual-trunk evaluation
                                  # ("chained" | "fused" | "auto"); "auto"
                                  # runs the fused Pallas trunk exactly when
                                  # the bf16 eval lane is active on TPU (see
                                  # models/resblock.py).

    def setup(self):
        assert self.timestep == 0.5, "DAIN supports t=0.5 only (DAIN.py:36)"
        fs2 = self.filter_size ** 2
        trunk_impl = "packed" if self.kernel_impl.startswith("packed") else \
            self.kernel_impl
        head_impl = "packed" if self.kernel_impl == "packed" else "chained"
        self.filter_net = MonoNet5(impl=trunk_impl)
        self.filter_head1 = BranchHead(fs2, impl=head_impl)
        self.filter_head2 = BranchHead(fs2, impl=head_impl)
        self.rectify_net = MultipleBasicBlock(4, 128, impl=self.rect_impl)
        self.flownets = PWCDCNet(corr_impl=self.corr_impl,
                                 dense_impl=self.dense_impl,
                                 batch_chunk=self.pwc_batch_chunk)
        self.div_flow = 20.0
        if self.init_unused:
            self.occ_net = OccNet()
            self.deconv_field = DeconvField(2 * fs2)
            self.ctx_net = S2DF(3, True, True)

    def _touch_unused(self, i0):
        # Materialise vestigial parameter trees during init only (checkpoint
        # interop with reference ablation weights); zero runtime cost.
        if self.init_unused and self.is_initializing():
            self.occ_net(jnp.concatenate([i0, i0], axis=-1))
            self.deconv_field(i0)
            self.ctx_net(i0)

    def __call__(self, i0, i2, train: bool = False):
        """i0, i2: (B,H,W,3) with H,W divisible by 128 (reference pads eval
        inputs to 128 multiples, demo_MiddleBury.py:294-312; U-Net needs /32,
        PWC-Net /64).

        Returns dict with cur_output, rectified, offsets, filters.

        TPU notes (all exact): PWC pyramids are shared between directions;
        the direction-paired projection/interpolation calls are batched into
        single ops to amortise their fixed kernel cost.
        """
        self._touch_unused(i0)
        b = i0.shape[0]
        cat = jnp.concatenate([i0, i2], axis=-1)

        with conv_compute_dtype(self.compute_dtype):
            trunk = self.filter_net(cat)
            if self.kernel_impl == "packed_trunk":
                trunk = unpack2(trunk)
            filt0 = self.filter_head1(trunk).astype(jnp.float32)
            filt1 = self.filter_head2(trunk).astype(jnp.float32)
            if self.kernel_impl == "packed":
                filt0, filt1 = unpack2(filt0), unpack2(filt1)

        # PWC always runs f32: bf16 convs measured 0.87x HERE (the pyramid's
        # small-channel convs and the warp/corr casts lose more than the MXU
        # saves — tools/ubench_bf16.py), and f32 flows keep the one-hot
        # projection/interpolation paths at full precision.
        raw_fwd, raw_bwd = self.flownets.bidirectional(i0, i2)

        t = self.timestep
        flows4 = upsample_bilinear(
            jnp.concatenate([raw_fwd, raw_bwd], axis=0) * (self.div_flow * t),
            4)

        hole_fill = not train   # FlowProjectionLayer.py:23
        offs = flow_project(flows4, hole_fill=hole_fill)
        off0, off1 = offs[:b], offs[b:]

        refs = filter_interpolate(
            jnp.concatenate([i0, i2], axis=0),
            offs,
            jnp.concatenate([filt0, filt1], axis=0),
            self.filter_size, impl=self.filter_impl)
        ref0, ref2 = refs[:b], refs[b:]
        cur_output = ref0 / 2.0 + ref2 / 2.0

        rectify_input = jnp.concatenate(
            [cur_output, ref0, ref2, off0, off1, filt0, filt1], axis=-1)
        with conv_compute_dtype(self.compute_dtype):
            rectified = (self.rectify_net(rectify_input).astype(jnp.float32)
                         + cur_output)

        return {
            "outputs": [cur_output, rectified],
            "offsets": [off0, off1],
            "filters": [filt0, filt1],
        }


class DAINSlowMotion(nn.Module):
    """DAIN_slowmotion: depth-aware projection + warped context, N = 1/t - 1
    intermediate frames (networks/DAIN_slowmotion.py)."""
    channel: int = 3
    filter_size: int = 4
    timestep: float = 0.5
    train_bn: bool = False
    filter_impl: str = "slab"    # frames use the banded Pallas kernel; the
                                 # 196-ch context warps dispatch to the
                                 # big-C lane-gather kernel (exact any-f32,
                                 # ops/pallas/ctx_gather_kernel.py)
    compute_dtype: str = "float32"   # fast-eval lane: bf16 convs for the
                                     # trunk/heads, ctx net and rectifier;
                                     # PWC and MegaDepth stay f32 (bf16
                                     # measured 0.87x / ~1.0x there — see
                                     # DAIN.compute_dtype)
    corr_impl: str = "slices"    # PWC cost-volume formulation
    dense_impl: str = "concat"   # PWC decode dense-block evaluation
    pwc_batch_chunk: int | None = 4   # see DAIN.pwc_batch_chunk
    kernel_impl: str = "chained"  # MonoNet5/head evaluation (see DAIN;
                                  # packed measured a loss in-graph)
    depth_fuse_s2_max_hw: int = 0   # MegaDepth inception stage-2 fusion
                                    # (measured a loss at every threshold)
    depth_impl: str = "chained"  # "packed": phase-packed hourglass eval
                                 # (models/phasepack.py general-k; eval-only,
                                 # pre-pack kernels with prepack_megadepth)
    rect_impl: str = "auto"      # rectifier residual-trunk evaluation (see
                                 # DAIN.rect_impl / models/resblock.py)
    steps_impl: str = "unroll"   # "scan": nn.scan over the time steps — the
                                 # step subgraph is traced/compiled ONCE
                                 # instead of num_frames times, which fixes
                                 # the 8x XLA-compile blow-up (the unrolled
                                 # packed 8x graph exceeded a 10-min compile
                                 # window, BASELINE.md).  Unlike the
                                 # measured-dead step BATCHING, scan keeps
                                 # every oversize lax.cond per-step at
                                 # runtime, so adaptivity (and values) are
                                 # identical to the unrolled loop.

    def setup(self):
        fs2 = self.filter_size ** 2
        self.num_frames = int(round(1.0 / self.timestep)) - 1
        trunk_impl = "packed" if self.kernel_impl.startswith("packed") else \
            self.kernel_impl
        head_impl = "packed" if self.kernel_impl == "packed" else "chained"
        self.filter_net = MonoNet5(impl=trunk_impl)
        self.filter_head1 = BranchHead(fs2, impl=head_impl)
        self.filter_head2 = BranchHead(fs2, impl=head_impl)
        self.ctx_net = S2DF(3, True, True)
        self.depth_net = MegaDepthHourglass(
            train_bn=self.train_bn,
            fuse_stage2_max_hw=self.depth_fuse_s2_max_hw,
            packed=self.depth_impl == "packed")
        # 3*3 + 2*1 + 2*2 + 2*16 + 2*196 = 437 input channels (:38)
        self.rectify_net = MultipleBasicBlock(4, 128, impl=self.rect_impl)
        self.flownets = PWCDCNet(corr_impl=self.corr_impl,
                                 dense_impl=self.dense_impl,
                                 batch_chunk=self.pwc_batch_chunk)
        self.div_flow = 20.0

    def __call__(self, i0, i2, train: bool = False):
        time_offsets = [k * self.timestep for k in range(1, 1 + self.num_frames)]

        log_depth = self.depth_net(jnp.concatenate([i0, i2], axis=0))
        b = i0.shape[0]
        log_d0, log_d2 = log_depth[:b], log_depth[b:]
        depth_inv0 = depth_inv_from_log_depth(log_d0)[..., 0]
        depth_inv2 = depth_inv_from_log_depth(log_d2)[..., 0]

        with conv_compute_dtype(self.compute_dtype):
            ctx0 = jnp.concatenate(
                [self.ctx_net(i0).astype(jnp.float32),
                 jax.lax.stop_gradient(log_d0)], axis=-1)
            ctx2 = jnp.concatenate(
                [self.ctx_net(i2).astype(jnp.float32),
                 jax.lax.stop_gradient(log_d2)], axis=-1)

            cat = jnp.concatenate([i0, i2], axis=-1)
            trunk = self.filter_net(cat)
            if self.kernel_impl == "packed_trunk":
                trunk = unpack2(trunk)
            filt0 = self.filter_head1(trunk).astype(jnp.float32)
            filt1 = self.filter_head2(trunk).astype(jnp.float32)
            if self.kernel_impl == "packed":
                filt0, filt1 = unpack2(filt0), unpack2(filt1)

        # PWC always f32 (bf16 measured a loss here; see DAIN.__call__)
        raw_fwd, raw_bwd = self.flownets.bidirectional(i0, i2)
        hole_fill = not train

        # The time steps are independent given the shared flows/kernels/
        # contexts, but KEEP the reference-shaped per-step loop (
        # DAIN_slowmotion.py:167-183): device ablations show step
        # batching loses both ways — the projection/warp ops carry
        # whole-call oversize lax.conds, and batching steps conds EVERY
        # step to the slow exact path as soon as one step's flows leave the
        # slab bounds (240 -> 600 ms/pair at 8x random-init); batching just
        # the rectify convs adds a cross-step 437-ch input concat whose HBM
        # traffic eats the launch savings (4x: 114.4 -> 116.1 ms/pair).
        ctx_pair = jnp.concatenate([ctx0, ctx2], axis=0)
        filt_pair = jnp.concatenate([filt0, filt1], axis=0)
        frame_pair = jnp.concatenate([i0, i2], axis=0)
        depth_inv_pair = jnp.concatenate([depth_inv0, depth_inv2], axis=0)

        # Per-step scaled + x4-upsampled bidirectional flows, computed with
        # PYTHON-float time constants in both modes (a traced t here would
        # block XLA constant folding and perturb flow values at the 1e-6
        # level, which the 7-conv rectifier amplifies ~1000x at random init
        # — measured; keeping the scaling outside the scan keeps scan and
        # unroll bit-identical).
        f01s = [upsample_bilinear(raw_fwd * (self.div_flow * t), 4)
                for t in time_offsets]
        f10s = [upsample_bilinear(raw_bwd * (self.div_flow * tr), 4)
                for tr in time_offsets[::-1]]

        def synth_step(mdl, f01, f10, t):
            """One time step (DAIN_slowmotion.py:167-183); ``t`` may be a
            Python float (unroll) or a traced scalar (scan)."""
            # direction-paired projection + warps: batching the two
            # directions into single op calls amortises fixed kernel costs
            # (same trick as DAIN.__call__)
            offs = depth_flow_project(jnp.concatenate([f01, f10], axis=0),
                                      depth_inv_pair, hole_fill=hole_fill)
            off0, off1 = offs[:b], offs[b:]

            # context warp with detached flow/kernels (:311-321); the big-C
            # dispatch in filter_interpolate routes the 196-ch tensors to
            # the lane-gather Pallas kernel on TPU
            ctx_w = filter_interpolate(
                ctx_pair, jax.lax.stop_gradient(offs),
                jax.lax.stop_gradient(filt_pair), mdl.filter_size,
                impl=mdl.filter_impl)
            ctx0_w, ctx2_w = ctx_w[:b], ctx_w[b:]

            refs = filter_interpolate(frame_pair, offs, filt_pair,
                                      mdl.filter_size,
                                      impl=mdl.filter_impl)
            ref0, ref2 = refs[:b], refs[b:]
            out = ref0 * (1.0 - t) + ref2 * t    # time-weighted fusion (:335)

            rectify_input = jnp.concatenate(
                [out, ref0, ref2, off0, off1, filt0, filt1, ctx0_w, ctx2_w],
                axis=-1)
            with conv_compute_dtype(mdl.compute_dtype):
                rect = (mdl.rectify_net(rectify_input).astype(jnp.float32)
                        + out)
            return out, rect, off0, off1

        if self.steps_impl == "scan" and not self.is_initializing():
            # one traced step for ALL time offsets; params broadcast.  (Init
            # still takes the unrolled path below so the param tree is
            # created identically in both modes.)
            ts = jnp.asarray(time_offsets, jnp.float32)
            scanned = nn.scan(
                lambda mdl, carry, xs: (carry,
                                        synth_step(mdl, xs[0], xs[1], xs[2])),
                variable_broadcast=["params", "batch_stats"],
                split_rngs={"params": False})
            _, ys = scanned(self, (),
                            (jnp.stack(f01s), jnp.stack(f10s), ts))
            outs_s, rects_s, off0_s, off1_s = ys
            outputs = [outs_s[k] for k in range(self.num_frames)]
            rectified_outputs = [rects_s[k] for k in range(self.num_frames)]
            last_offsets = [off0_s[-1], off1_s[-1]]
        else:
            outputs, rectified_outputs = [], []
            last_offsets = None
            for k, t in enumerate(time_offsets):
                out, rect, off0, off1 = synth_step(
                    self, f01s[k], f10s[k], t)
                outputs.append(out)
                rectified_outputs.append(rect)
                last_offsets = [off0, off1]

        return {
            "outputs": [outputs, rectified_outputs],
            "offsets": last_offsets,
            "filters": [filt0, filt1],
        }
