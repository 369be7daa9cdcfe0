"""Phase-packed (space-to-depth) conv evaluation — the TPU answer to
small-channel convolutions at high resolution.

The MXU contracts (M, K) x (K, N) tiles with N padded to 128 lanes: a 3x3
conv producing 16 channels at 448x256 wastes 7/8 of every MXU pass (and K
= 9*C_in pads too).  MonoNet5's full- and half-resolution stages (16/32 ch),
the branch heads, predict_flow (2 ch) and the rectifier's final conv (3 ch)
all sit in this regime — measured ~10x off conv speed-of-light (BASELINE.md
round-3 notes).

The fix: evaluate in a 2x2 phase-packed domain.  ``pack2`` folds each 2x2
pixel block into 4x the channels at quarter the pixels; a stride-1 SAME 3x3
conv becomes ONE 2x2-cell conv over (4*C_in -> 4*C_out) whose kernel is a
zero-structured rearrangement of the original (derivation below) — N grows
4x (killing lane padding), K grows 16/9 (the zero slots), pixels shrink 4x:
net effective-MAC win up to 4x/1.78 = 2.25x for N <= 32, plus fewer, larger
MXU ops.  The math is EXACT: every output value is the same sum of the same
products (modulo f32 reassociation inside the contraction, which conv
lowering never specified anyway).

Derivation: for output pixel (2Y+ry, 2X+rx) the 3x3 tap (dy, dx) reads
input pixel 2(Y + cy') + qy with cell offset cy' in {0, 1} over the window
rows {Y-1+ry, Y+ry} and phase qy = (ry+dy) mod 2, i.e. dy = 2cy' - 2 + ry +
qy (and likewise x).  dy outside [-1, 1] means that (cy', qy) slot is zero.
The 2x2-cell conv runs with cell padding (1, 1) (zeros == SAME), giving an
(H2+1, W2+1) map from which output phase (ry, rx) is the (ry, rx)-offset
H2 x W2 slice of its channel block.

These helpers mirror the reference layers they replace bit-for-bit at the
tensor level: ``packed_maxpool`` == nn.MaxPool2d(2) (max over the 4 phases),
``packed_upsample2`` == models.layers.upsample_bilinear(x, 2) (same fixed
phase blends, same edge clamp, same op order).

MEASURED OUTCOME (v5e, 448x256, feedback-scan timing): in ISOLATION the
packed MonoNet5+heads with pre-packed kernels win 2.145 -> 1.11 ms; inside
the FULL DAIN graph the packed heads LOSE (~8.9 -> 10.2 ms/frame — the
unpacked-layout filters feed filter_interpolate + the 45-ch rectify concat,
and the re-layouts XLA inserts outweigh the MXU win), while packed-trunk-
only is neutral (8.86 vs 8.93 ms, within tunnel noise).  DAIN's
``kernel_impl`` therefore defaults to "chained"; "packed"/"packed_trunk"
stay available for standalone kernel-prediction use and as the measured
record."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfidkr_tpu.models.layers import _compute_dt, xavier_uniform_torch


def pack2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel block q = qy*2 + qx holds
    phase (qy, qx) of each 2x2 pixel block."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unpack2(xp: jax.Array) -> jax.Array:
    """Inverse of ``pack2``: (B, H2, W2, 4C) -> (B, 2*H2, 2*W2, C)."""
    b, h2, w2, c4 = xp.shape
    c = c4 // 4
    x = xp.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def pack_kernel3(kernel: jax.Array) -> jax.Array:
    """Rearrange a (3, 3, Cin, Cout) SAME-conv kernel into the equivalent
    (2, 2, 4*Cin, 4*Cout) phase-packed cell kernel (zeros in the ~44% of
    slots whose (cell, phase) pair falls outside the 3x3 window)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    # pad tap indices to [-1 .. 3] so invalid (cy', phase) combos hit zeros
    wp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
    # dy + 1 (+1 pad offset) for (cy', qy, ry); same table serves x
    idx = jnp.asarray([[[2 * cy + ry + qy for ry in (0, 1)]
                        for qy in (0, 1)] for cy in (0, 1)], jnp.int32)
    a = jnp.take(wp, idx.reshape(-1), axis=0).reshape(
        2, 2, 2, 5, cin, cout)                       # (cy,qy,ry, kx, c, c')
    b = jnp.take(a, idx.reshape(-1), axis=3).reshape(
        2, 2, 2, 2, 2, 2, cin, cout)                 # (cy,qy,ry, cx,qx,rx, c,c')
    kp = b.transpose(0, 3, 1, 4, 6, 2, 5, 7)         # (cy,cx, qy,qx,c, ry,rx,c')
    return kp.reshape(2, 2, 4 * cin, 4 * cout)


def packed_conv3(xp: jax.Array, kernel: jax.Array,
                 bias: jax.Array | None) -> jax.Array:
    """Phase-packed equivalent of Conv(k=3, s=1, p=1): ``xp`` is a packed
    (B, H2, W2, 4*Cin) map, ``kernel``/``bias`` either the ORIGINAL
    (3,3,Cin,Cout) parameters (transform traced in-graph) or their
    pre-packed (2,2,4Cin,4Cout)/(4Cout,) forms from ``prepack_params``
    (transform done once, outside the graph — the in-graph pad/take/
    transpose chains cost ~0.05 ms each on v5e and defeat the win).
    Returns the packed (B, H2, W2, 4*Cout) output."""
    h2, w2 = xp.shape[1], xp.shape[2]
    if kernel.shape[0] == 3:
        cout = kernel.shape[3]
        kp = pack_kernel3(kernel)
        if bias is not None:
            bias = jnp.concatenate([bias] * 4)
    else:                          # already packed (2, 2, 4Cin, 4Cout)
        cout = kernel.shape[3] // 4
        kp = kernel
    dt = _compute_dt()
    if dt is not None:
        xp = xp.astype(dt)
        kp = kp.astype(dt)
    u = jax.lax.conv_general_dilated(
        xp, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B, H2+1, W2+1, 4Cout)
    blocks = [u[:, ry:ry + h2, rx:rx + w2, (2 * ry + rx) * cout:
               (2 * ry + rx + 1) * cout]
              for ry in (0, 1) for rx in (0, 1)]
    out = jnp.concatenate(blocks, axis=-1)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def geometry_k(k: int):
    """Packed-cell geometry for an odd k (SAME, stride 1): with
    r = (k-1)/2, the cell kernel is kp x kp with cell padding (pp, kp-pp)
    and output phase ry reads the extended map at row offset ``off(ry)``
    (ry when r is odd, 0 when even).  Derivation: tap dy decomposes as
    dy = 2*(off(ry) - pp + cy) + qy - ry with cy in [0, kp).  kp values:
    k=1:1, 3:2, 5:3, 7:4, 11:6 — MAC ratio 4*kp^2/k^2 = 4.0/1.78/1.44/
    1.31/1.19, against an N-utilisation gain of 4x for thin-cout convs
    (see tools/ubench_megapack.py for the v5e measurements: 11x11 32->16
    @448x256 is 9.1x faster packed)."""
    r = (k - 1) // 2
    if r == 0:
        return 0, 0, 1
    pp = -(-r // 2)
    kp = ((1 + r) // 2) - ((1 - r) // 2) + 1
    return r, pp, kp


def _off_phase(ry: int, r: int) -> int:
    return ry if r % 2 == 1 else 0


def pack_kernel_k(kernel: jax.Array) -> jax.Array:
    """General-k analogue of ``pack_kernel3``: (k,k,Cin,Cout) ->
    (kp,kp,4Cin,4Cout) phase-packed cell kernel, any odd k, traceable."""
    import numpy as np
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    r, pp, kp = geometry_k(k)
    # dy = 2*(off(ry) - pp + cy) + qy - ry; index = plo + r + dy into the
    # zero-padded tap axis (out-of-window slots land in the zeros)
    dys = np.array([[[2 * (_off_phase(ry, r) - pp + cy) + qy - ry
                      for ry in (0, 1)] for qy in (0, 1)]
                    for cy in range(kp)], np.int64)      # (kp, 2, 2)
    plo = max(0, -(int(dys.min()) + r))
    phi = max(0, int(dys.max()) - r)
    idx = jnp.asarray(plo + r + dys, jnp.int32)
    wp = jnp.pad(kernel, ((plo, phi), (plo, phi), (0, 0), (0, 0)))
    a = jnp.take(wp, idx.reshape(-1), axis=0).reshape(
        kp, 2, 2, k + plo + phi, cin, cout)              # (cy,qy,ry, kx,c,c')
    b = jnp.take(a, idx.reshape(-1), axis=3).reshape(
        kp, 2, 2, kp, 2, 2, cin, cout)                   # (cy,qy,ry, cx,qx,rx)
    out = b.transpose(0, 3, 1, 4, 6, 2, 5, 7)            # (cy,cx,qy,qx,c,ry,rx,c')
    return out.reshape(kp, kp, 4 * cin, 4 * cout)


def packed_conv_k(xp: jax.Array, kernel: jax.Array, bias,
                  k: int) -> jax.Array:
    """Phase-packed Conv(k, s=1, p=k//2) on a packed (B,H2,W2,4Cin) map.
    ``kernel``/``bias`` are either the ORIGINAL (k,k,Cin,Cout)/(Cout,)
    params (packing traced in-graph — test path) or pre-packed
    (kp,kp,4Cin,4Cout)/(4Cout,) from ``prepack_megadepth`` (load-time path;
    ~0.05 ms of in-graph transform per conv otherwise)."""
    h2, w2 = xp.shape[1], xp.shape[2]
    r, pp, kp = geometry_k(k)
    if kernel.shape[2] * 4 == xp.shape[3]:    # original (k,k,Cin,Cout)
        cout = kernel.shape[3]
        kpk = pack_kernel_k(kernel)
        if bias is not None:
            bias = jnp.concatenate([bias] * 4)
    else:                           # already packed
        cout = kernel.shape[3] // 4
        kpk = kernel
    dt = _compute_dt()
    if dt is not None:
        xp = xp.astype(dt)
        kpk = kpk.astype(dt)
    ext = jax.lax.conv_general_dilated(
        xp, kpk, (1, 1), ((pp, kp - pp), (pp, kp - pp)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    blocks = []
    for ry in (0, 1):
        oy = _off_phase(ry, r)
        for rx in (0, 1):
            ox = _off_phase(rx, r)
            q = 2 * ry + rx
            blocks.append(ext[:, oy:oy + h2, ox:ox + w2,
                              q * cout:(q + 1) * cout])
    out = jnp.concatenate(blocks, axis=-1)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def packed_concat(parts) -> jax.Array:
    """Channel concat in the packed domain: q-major blocks interleave, so
    the packed concat reads one q-slice per part per phase (one pass over
    the data, same as an unpacked concat)."""
    slices = []
    for q in range(4):
        for p in parts:
            c = p.shape[-1] // 4
            slices.append(p[..., q * c:(q + 1) * c])
    return jnp.concatenate(slices, axis=-1)


def packed_avgpool(xp: jax.Array) -> jax.Array:
    """nn.avg_pool(2,2) of the unpacked map == mean over the 4 phase
    blocks; returns the UNPACKED half-resolution result."""
    b, h2, w2, c4 = xp.shape
    c = c4 // 4
    return jnp.mean(xp.reshape(b, h2, w2, 4, c), axis=3)


def packed_upnearest(xp: jax.Array) -> jax.Array:
    """pack2(UpsamplingNearest2d(unpacked(xp))): every output phase of the
    doubled map equals the source pixel, so the packed result is the
    unpacked map tiled across the 4 phase blocks."""
    u = unpack2(xp)
    return jnp.concatenate([u] * 4, axis=-1)


def packed_maxpool(xp: jax.Array) -> jax.Array:
    """nn.max_pool(2,2) of the unpacked map == max over the 4 phase blocks;
    returns the UNPACKED half-resolution result (B, H2, W2, C)."""
    b, h2, w2, c4 = xp.shape
    c = c4 // 4
    return jnp.max(xp.reshape(b, h2, w2, 4, c), axis=3)


def packed_upsample2(x: jax.Array) -> jax.Array:
    """pack2(upsample_bilinear(x, 2)) computed directly in packed form —
    identical fixed phase blends (0.75/0.25), edge clamp, and H-then-W
    composition as layers._up_axis_phases, so values match bit-for-bit."""
    def shift(v, axis, k):
        n = v.shape[axis]
        if k < 0:
            lo = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
            body = jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)
            return jnp.concatenate([lo, body], axis=axis)
        hi = jax.lax.slice_in_dim(v, n - 1, n, axis=axis)
        body = jax.lax.slice_in_dim(v, 1, n, axis=axis)
        return jnp.concatenate([body, hi], axis=axis)

    ys = [x * 0.75 + shift(x, 1, -1) * 0.25,
          x * 0.75 + shift(x, 1, +1) * 0.25]
    blocks = []
    for ry in (0, 1):
        for k in (-1, +1):
            blocks.append(ys[ry] * 0.75 + shift(ys[ry], 2, k) * 0.25)
    return jnp.concatenate(blocks, axis=-1)


class _NNConvParams(nn.Module):
    """Innermost param scope mirroring flax ``nn.Conv`` ({kernel, bias})."""
    features: int
    in_features: int
    kernel_size: int = 3
    kernel_init: Callable = xavier_uniform_torch

    @nn.compact
    def __call__(self):
        if self.is_initializing() or not self.has_variable("params", "kernel"):
            k = self.param("kernel", self.kernel_init,
                           (self.kernel_size, self.kernel_size,
                            self.in_features, self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            return k, b
        # apply-time read WITHOUT the initializer shape check, so callers
        # may feed pre-packed (2,2,4Cin,4Cout) kernels (prepack_params)
        return (self.get_variable("params", "kernel"),
                self.get_variable("params", "bias"))


class ConvParams(nn.Module):
    """Parameter-compatible stand-in for ``models.layers.Conv``: declares the
    identical param tree (``<name>/Conv_0/{kernel, bias}`` — layers.Conv
    wraps an anonymous nn.Conv) but returns the params for packed evaluation
    instead of running the conv."""
    features: int
    in_features: int
    kernel_size: int = 3
    kernel_init: Callable = xavier_uniform_torch

    @nn.compact
    def __call__(self):
        return _NNConvParams(self.features, self.in_features,
                             self.kernel_size, self.kernel_init,
                             name="Conv_0")()


class ConvReLUParams(nn.Module):
    """Param scope matching mononet.ConvReLU (child Conv named "conv")."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return ConvParams(self.features, self.in_features, name="conv")()


# MonoNet5 stages the packed path evaluates with packed_conv3 (the rest stay
# canonical chained convs), and the sibling set that identifies a MonoNet5
# param scope during prepacking.
MONONET_PACKED_STAGES = ("in_conv", "down1", "down2", "up4", "up5")
_MONONET_SIBLINGS = {"in_conv", "mid", "down1", "down5", "up1", "up5"}


def prepack_params(params):
    """Rewrite a params pytree so every conv the phase-packed evaluation
    reads holds its PRE-packed (2,2,4Cin,4Cout) kernel / (4Cout,) bias —
    done once at load time by inference drivers, so the per-call graphs
    contain no kernel-transform ops.  MonoNet5 scopes are identified by
    their stage-name siblings; BranchHead scopes by their DAIN scope names
    (``filter_head*`` — NOT by {conv1, conv2} children, which the rectifier
    and S2DF BasicBlocks share while staying chained).  Use with
    ``impl='packed'`` modules (apply-time params are not shape-checked by
    flax); training keeps canonical params."""
    def pack_conv_scope(scope):
        k = scope["Conv_0"]["kernel"]
        b = scope["Conv_0"]["bias"]
        if k.shape[0] == 3:
            scope = dict(scope)
            scope["Conv_0"] = {"kernel": pack_kernel3(k),
                               "bias": jnp.concatenate([b] * 4)}
        return scope

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        keys = set(node.keys())
        if _MONONET_SIBLINGS <= keys:
            out = {}
            for stage, child in node.items():
                if stage in MONONET_PACKED_STAGES:
                    out[stage] = dict(child, conv=pack_conv_scope(child["conv"]))
                else:
                    out[stage] = walk(child, stage)
            return out
        # "params"/"" match standalone BranchHead trees (tests/ubenches);
        # inside a model only the filter_head* scopes qualify.
        if (keys == {"conv1", "conv2"}
                and (name.startswith("filter_head") or name in ("", "params"))):
            return {child_name: pack_conv_scope(child)
                    for child_name, child in node.items()}
        return {child_name: walk(child, child_name)
                for child_name, child in node.items()}

    return jax.tree_util.tree_map(
        lambda x: x, walk(params if isinstance(params, dict)
                          else dict(params)))
