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
import jax
import jax.numpy as jnp

from vfidkr_tpu.models.layers import (
    Conv,
    avg_pool_2x2,
    max_pool_2x2,
    upsample_nearest,
)

_SPEC = json.loads(
    (pathlib.Path(__file__).parent / "megadepth_spec.json").read_text())

_DN = ("NHWC", "HWIO", "NHWC")


class _ConvP(nn.Module):
    """Parameter-compatible stand-in for ``nn.Conv``: declares the identical
    ``{kernel, bias}`` params (same name path, shapes, and initializers, so
    checkpoints/converters/random inits are unchanged) but returns them for
    fused evaluation instead of running the conv."""
    features: int
    in_features: int
    kh: int
    kw: int

    @nn.compact
    def __call__(self):
        if not self.is_initializing() and self.has_variable("params",
                                                            "kernel"):
            # apply-time read WITHOUT the initializer shape check, so the
            # packed path may feed pre-packed kernels (prepack_megadepth)
            return (self.get_variable("params", "kernel"),
                    self.get_variable("params", "bias"))
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kh, self.kw, self.in_features,
                             self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class _BNStats(nn.Module):
    """Parameter/stat-compatible stand-in for ``nn.BatchNorm`` (same
    ``batch_stats/{mean,var}`` and, when affine, ``params/{scale,bias}``
    (C,) entries) that returns the vectors for packed evaluation."""
    ch: int
    affine: bool

    @nn.compact
    def __call__(self):
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.ch,))
            bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        else:
            scale = bias = None
        return mean.value, var.value, scale, bias


def _match_inception(node):
    """Match the hourglass's inception cell: a Concat whose branches are
    ``[1x1 conv, bn, relu]`` optionally followed by ``[kxk conv (pad k//2),
    bn, relu]``, with the two-stage branches contiguous and uniform.
    Returns the per-branch (conv1, bn1, conv2|None, bn2|None) specs, or
    None when the shape doesn't match (evaluated generically then)."""
    branches = []
    for child in node["children"]:
        if child["type"] != "seq":
            return None
        ch = child["children"]
        kinds = [g["type"] for g in ch]
        if kinds == ["conv", "bn", "relu"]:
            c1, b1 = ch[0], ch[1]
            c2 = b2 = None
        elif kinds == ["conv", "bn", "relu", "conv", "bn", "relu"]:
            c1, b1, c2, b2 = ch[0], ch[1], ch[3], ch[4]
            k = c2["k"]
            if (k[0] != k[1] or tuple(c2["s"]) != (1, 1)
                    or tuple(c2["p"]) != (k[0] // 2, k[1] // 2)):
                return None
        else:
            return None
        if tuple(c1["k"]) != (1, 1) or tuple(c1["s"]) != (1, 1) \
                or tuple(c1["p"]) != (0, 0):
            return None
        branches.append((c1, b1, c2, b2))
    s2 = [i for i, b in enumerate(branches) if b[2] is not None]
    if s2:
        if s2 != list(range(s2[0], s2[0] + len(s2))):
            return None
        if (len({branches[i][0]["out"] for i in s2}) != 1
                or len({branches[i][2]["out"] for i in s2}) != 1):
            return None
    return branches


class MegaDepthHourglass(nn.Module):
    """Input (B,H,W,3) RGB in [0,1] (H,W divisible by 128 in practice);
    output (B,H,W,1) log-depth.

    TPU evaluation can fuse each inception cell's parallel branches (exactly
    — parameters and math are unchanged): with ``fuse_stage1`` the branch
    1x1 convs run as ONE conv on the shared input (MAC-neutral), and at
    spatial sizes below ``fuse_stage2_max_hw`` the 3x3/5x5/7x7(/11x11)
    second convs run as ONE grouped conv with kernels zero-padded to the
    largest size (extra MACs multiply zeros).  The reference evaluates the
    same cells as ~8 separate module calls (pytorch_DIW_scratch.py
    Lambda/Concat containers).

    Device ablation (tools/ubench_fusion.py, v5e, batch-2 pair @448x256):
    BOTH fusions are losses — no fusion 16.35 ms, stage-1 17.63, stage-1 +
    stage-2@512 17.74, @2048 18.84, @8192 23.48.  The hourglass is not
    launch-bound on this toolchain: XLA's native per-branch convs beat the
    concat-kernel reformulations (stage 2 additionally pays padded-kernel
    MACs and a poor grouped-conv lowering).  Both default OFF and are kept
    for re-evaluation on other shapes/toolchains."""
    train_bn: bool = False   # True: use batch statistics + update running stats
    fuse_stage1: bool = False
    fuse_stage2_max_hw: int = 0
    # Phase-packed evaluation (models/phasepack.py general-k machinery):
    # every conv/bn/relu/concat/add runs in the 2x2 space-to-depth domain
    # (4x the channels at quarter the pixels), with relayouts only at pool/
    # upsample scale transitions.  Fixes the hourglass's ~19% MXU
    # efficiency: the inception branch convs emit 16/32 channels and waste
    # 7/8 of every 128-lane MXU N-tile; packed they emit 64/128
    # (tools/ubench_megapack.py: isolated 11x11 32->16 @448x256 is 9.1x
    # faster packed-core).  Parameter tree is IDENTICAL to the unpacked
    # mode; pre-pack kernels at load time with ``prepack_megadepth`` to
    # keep kernel transforms out of the per-call graph.  Eval only
    # (running BN stats; packed batch-stat reduction would differ) —
    # requires ``train_bn=False``.
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        if self.packed:
            assert not self.train_bn, "packed mode is eval-only (running BN)"
            from vfidkr_tpu.models.phasepack import pack2, unpack2
            return unpack2(self._run_packed(_SPEC, pack2(x), "n"))
        out = self._run(_SPEC, x, "n")
        return out

    def _bn(self, node, path):
        return nn.BatchNorm(use_running_average=not self.train_bn,
                            momentum=0.9, epsilon=1e-5,
                            use_scale=node["affine"],
                            use_bias=node["affine"], name=path)

    def _run_inception(self, branches, x, path):
        cin = x.shape[-1]
        if self.fuse_stage1:
            kb = [(_ConvP(c1["out"], cin, 1, 1, name=f"{path}_{i}_0")())
                  for i, (c1, _, _, _) in enumerate(branches)]
            y = jax.lax.conv_general_dilated(
                x, jnp.concatenate([k for k, _ in kb], axis=-1), (1, 1),
                "VALID",
                dimension_numbers=_DN) + jnp.concatenate([b for _, b in kb])
            stage1 = []
            off = 0
            for c1, _, _, _ in branches:
                stage1.append(y[..., off:off + c1["out"]])
                off += c1["out"]
        else:
            stage1 = [nn.Conv(c1["out"], (1, 1), use_bias=True,
                              name=f"{path}_{i}_0")(x)
                      for i, (c1, _, _, _) in enumerate(branches)]

        outs = [nn.relu(self._bn(b1, f"{path}_{i}_1")(sl))
                for i, ((_, b1, _, _), sl) in enumerate(zip(branches,
                                                            stage1))]

        s2 = [i for i, b in enumerate(branches) if b[2] is not None]
        h, w = x.shape[1], x.shape[2]
        if s2 and h * w <= self.fuse_stage2_max_hw:
            kmax = max(branches[i][2]["k"][0] for i in s2)
            k2s, b2s = [], []
            for i in s2:
                c2 = branches[i][2]
                k, b = _ConvP(c2["out"], branches[i][0]["out"],
                              c2["k"][0], c2["k"][1],
                              name=f"{path}_{i}_3")()
                pad = (kmax - c2["k"][0]) // 2
                k2s.append(jnp.pad(k, ((pad, pad), (pad, pad),
                                       (0, 0), (0, 0))))
                b2s.append(b)
            xin = jnp.concatenate([outs[i] for i in s2], axis=-1)
            y2 = jax.lax.conv_general_dilated(
                xin, jnp.concatenate(k2s, axis=-1), (1, 1),
                [(kmax // 2, kmax // 2)] * 2, dimension_numbers=_DN,
                feature_group_count=len(s2)) + jnp.concatenate(b2s)
            co = branches[s2[0]][2]["out"]
            for j, i in enumerate(s2):
                sl = y2[..., j * co:(j + 1) * co]
                outs[i] = nn.relu(self._bn(branches[i][3],
                                           f"{path}_{i}_4")(sl))
        elif s2:
            for i in s2:
                c2, b2 = branches[i][2], branches[i][3]
                kh, kw_ = c2["k"]
                sl = nn.Conv(c2["out"], (kh, kw_), strides=(1, 1),
                             padding=((kh // 2, kh // 2), (kw_ // 2, kw_ // 2)),
                             use_bias=True, name=f"{path}_{i}_3")(outs[i])
                outs[i] = nn.relu(self._bn(b2, f"{path}_{i}_4")(sl))
        return jnp.concatenate(outs, axis=-1)

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
            return self._bn(node, path)(x)
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
            branches = _match_inception(node)
            if branches is not None:
                return self._run_inception(branches, x, path)
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


    def _run_packed(self, node, xp, path):
        """Packed-domain mirror of ``_run``: same spec traversal, same
        param/stat names (conv params via _ConvP readers, BN via _BNStats),
        evaluated with the phasepack general-k machinery."""
        from vfidkr_tpu.models import phasepack as pk
        t = node["type"]
        if t == "seq":
            for i, child in enumerate(node["children"]):
                xp = self._run_packed(child, xp, f"{path}_{i}")
            return xp
        if t == "conv":
            kh, kw = node["k"]
            assert kh == kw and tuple(node["s"]) == (1, 1) \
                and tuple(node["p"]) == (kh // 2, kw // 2), node
            kernel, bias = _ConvP(node["out"], node["in"], kh, kw,
                                  name=path)()
            return pk.packed_conv_k(xp, kernel, bias, kh)
        if t == "bn":
            c = node["ch"]
            mean, var, scale, bias = _BNStats(c, node["affine"],
                                              name=path)()
            tile = lambda v: jnp.concatenate([v] * 4)
            y = (xp - tile(mean)) * jax.lax.rsqrt(tile(var) + 1e-5)
            if scale is not None:
                y = y * tile(scale) + tile(bias)
            return y
        if t == "relu":
            return nn.relu(xp)
        if t == "maxpool":
            return pk.pack2(pk.packed_maxpool(xp))
        if t == "avgpool":
            return pk.pack2(pk.packed_avgpool(xp))
        if t == "upnearest":
            return pk.packed_upnearest(xp)
        if t == "concat_table":
            return [self._run_packed(c, xp, f"{path}_{i}")
                    for i, c in enumerate(node["children"])]
        if t == "concat":
            outs = [self._run_packed(c, xp, f"{path}_{i}")
                    for i, c in enumerate(node["children"])]
            return pk.packed_concat(outs)
        if t == "add":
            assert isinstance(xp, (list, tuple)) and not node["children"]
            total = xp[0]
            for y in xp[1:]:
                total = total + y
            return total
        raise ValueError(f"unknown spec node {t}")


def prepack_megadepth(depth_scope):
    """Pre-pack every conv kernel in a MegaDepthHourglass params subtree
    (``params[...]["depth_net"]``) for ``packed=True`` evaluation: (k,k,
    Cin,Cout) -> (kp,kp,4Cin,4Cout) and bias (Cout,) -> (4Cout,).  Done
    once at load time so the per-call graphs carry no kernel transforms
    (~0.05 ms each otherwise).  BN scopes ({scale, bias} only) pass
    through untouched."""
    from vfidkr_tpu.models.phasepack import pack_kernel_k

    def walk(node):
        if not isinstance(node, dict):
            return node
        if set(node.keys()) == {"kernel", "bias"} \
                and getattr(node["kernel"], "ndim", 0) == 4:
            return {"kernel": pack_kernel_k(node["kernel"]),
                    "bias": jnp.concatenate([node["bias"]] * 4)}
        return {k: walk(v) for k, v in node.items()}

    return walk(depth_scope)


def depth_inv_from_log_depth(log_depth):
    """DAIN_slowmotion.py:143: depth_inv = 1e-6 + 1/exp(log_depth)."""
    return 1e-6 + jnp.exp(-log_depth)
