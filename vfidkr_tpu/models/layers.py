"""Layer primitives with exact torch semantics, NHWC, flax.linen.

The reference stacks plain ``nn.Conv2d``/``nn.ConvTranspose2d``/pool/upsample
layers (PWCNet/PWCNet.py:27-37, networks/DAIN.py:576-711).  XLA's ``SAME``
padding is asymmetric for strided convs, so every conv here uses explicit
torch-style symmetric padding; the transposed conv reproduces torch's
``ConvTranspose2d(k, s, p)`` as a fractionally-strided conv with flipped
kernels and ``k-1-p`` padding.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Trace-time conv compute dtype (ROADMAP round-2 item 3): inside a
# ``conv_compute_dtype(jnp.bfloat16)`` context every Conv/ConvTranspose casts
# its input and kernel to bf16 and produces bf16 activations (params stay
# f32 in storage; downstream layers keep the low precision until a caller
# casts back).  ~30% conv speedup on v5e (HBM-bound stacks).  Default off —
# reference parity is f32.
_CONV_COMPUTE_DTYPE: Optional[jnp.dtype] = None


@contextlib.contextmanager
def conv_compute_dtype(dt):
    """Context manager: set the conv computation dtype for modules traced
    inside (None/f32 = exact reference math)."""
    global _CONV_COMPUTE_DTYPE
    prev = _CONV_COMPUTE_DTYPE
    _CONV_COMPUTE_DTYPE = None if dt in (None, jnp.float32, "float32") else jnp.dtype(dt)
    try:
        yield
    finally:
        _CONV_COMPUTE_DTYPE = prev


def _compute_dt():
    return _CONV_COMPUTE_DTYPE


def kaiming_normal_torch(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_in'): N(0, sqrt(2/fan_in)), HWIO shape."""
    fan_in = shape[0] * shape[1] * shape[2]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def xavier_uniform_torch(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ on an HWIO conv kernel."""
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -a, a)


def msra_normal_torch(key, shape, dtype=jnp.float32):
    """normal(0, sqrt(2/n)) with n = k*k*out_channels — the hand-rolled init
    of S2DF.py:116-119 and Resblock/BasicBlock.py:24-27."""
    n = shape[0] * shape[1] * shape[3]
    std = (2.0 / n) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class Conv(nn.Module):
    """nn.Conv2d equivalent: explicit symmetric padding, optional dilation.

    Params live under ``conv/{kernel,bias}`` with nn.Conv's naming and HWIO
    layout (the converter depends on both).

    ``pieces``: when a sequence of arrays is passed instead of ``x``, the
    conv is evaluated as ``sum_i conv(piece_i, kernel[:, :, off_i:off_i+c_i])``
    — mathematically the conv of ``concat(pieces, -1)`` but without ever
    materialising the concat buffer (the PWC decode dense blocks re-read
    growing concats; split-weight evaluation removes those copies).  Summation
    order differs from the fused contraction, so results match to f32
    rounding, not bit-for-bit.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform_torch

    @nn.compact
    def __call__(self, x=None, pieces: Optional[Sequence] = None):
        inner = _ConvParams(
            features=self.features, kernel_size=self.kernel_size,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            use_bias=self.use_bias, kernel_init=self.kernel_init,
            name="Conv_0")      # param path identical to the former nn.Conv
        return inner(x, pieces)


class _ConvParams(nn.Module):
    """Explicit conv core owning ``kernel``/``bias`` (nn.Conv names/layout)."""
    features: int
    kernel_size: int
    stride: int
    padding: int
    dilation: int
    use_bias: bool
    kernel_init: Callable

    @nn.compact
    def __call__(self, x=None, pieces: Optional[Sequence] = None):
        in_ch = (sum(p.shape[-1] for p in pieces) if pieces is not None
                 else x.shape[-1])
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dt = _compute_dt()
        if dt is not None:
            kernel = kernel.astype(dt)
        p = self.padding

        def one(inp, ker):
            if dt is not None:
                inp = inp.astype(dt)
            return jax.lax.conv_general_dilated(
                inp, ker,
                window_strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if pieces is not None:
            off, y = 0, None
            for piece in pieces:
                c = piece.shape[-1]
                part = one(piece, kernel[:, :, off:off + c, :])
                y = part if y is None else y + part
                off += c
        else:
            y = one(x, kernel)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d(k, s, p) equivalent (PWCNet deconv: k=4,s=2,p=1).

    Implemented as conv_general_dilated with lhs_dilation=s, padding k-1-p and
    spatially-flipped kernels, which is exactly torch's transposed conv.
    Kernel param stored HWIO with I=in features (torch stores (in,out,k,k);
    the converter transposes accordingly).
    """
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform_torch

    @nn.compact
    def __call__(self, x=None, pieces: Optional[Sequence] = None):
        in_ch = (sum(p.shape[-1] for p in pieces) if pieces is not None
                 else x.shape[-1])
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_ch, self.features))
        flipped = kernel[::-1, ::-1]
        dt = _compute_dt()
        if dt is not None:
            flipped = flipped.astype(dt)
        pad = k - 1 - self.padding

        def one(inp, ker):
            if dt is not None:
                inp = inp.astype(dt)
            return jax.lax.conv_general_dilated(
                inp, ker,
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if pieces is not None:      # split-weight evaluation (see Conv)
            off, y = 0, None
            for piece in pieces:
                c = piece.shape[-1]
                part = one(piece, flipped[:, :, off:off + c, :])
                y = part if y is None else y + part
                off += c
        else:
            y = one(x, flipped)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def max_pool_2x2(x):
    """Torch ``nn.MaxPool2d(2)``.  The reduce_window VJP (select_and_scatter,
    first-max tie routing) matches the torch backward exactly — pinned incl.
    ties in tests/test_layers.py; a hand-built elementwise first-max VJP
    measured NEUTRAL on v5e (tools/ubench_trainstep.py mononet_bwd_rw,
    round 5), so the stock lowering stays."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avg_pool_2x2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def leaky_relu(x, negative_slope=0.1):
    return jnp.where(x >= 0, x, x * negative_slope)


def _up_axis_phases(x, axis, factor):
    """Integer-factor bilinear upsample along one axis via the fixed phase
    weights of half-pixel-center resampling (align_corners=False): each
    output phase p reads source i + (2p + 1 - factor) / (2*factor) — a fixed
    2-tap blend.  Pure elementwise + reshape; ~5x faster than
    jax.image.resize for thin-channel tensors (2-ch flows waste 126/128
    lanes in the gather-based resize)."""
    n = x.shape[axis]

    def shift(k):          # x[i+k] with edge clamp
        lo = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        hi = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        if k < 0:
            body = jax.lax.slice_in_dim(x, 0, n + k, axis=axis)
            return jnp.concatenate([lo] * (-k) + [body], axis=axis)
        if k > 0:
            body = jax.lax.slice_in_dim(x, k, n, axis=axis)
            return jnp.concatenate([body] + [hi] * k, axis=axis)
        return x

    phases = []
    for p in range(factor):
        # source coordinate offset from i: (2p + 1 - factor) / (2*factor)
        off = (2 * p + 1 - factor) / (2.0 * factor)
        k = -1 if off < 0 else (1 if off > 0 else 0)
        frac = abs(off)
        phases.append(x * (1.0 - frac) + shift(k) * frac)
    y = jnp.stack(phases, axis=axis + 1)        # (..., n, factor, ...)
    new_shape = list(x.shape)
    new_shape[axis] = n * factor
    return y.reshape(new_shape)


def upsample_bilinear(x, factor: int):
    """nn.Upsample(scale_factor=f, mode='bilinear', align_corners=False).

    jax.image.resize('linear') uses half-pixel centers == align_corners=False;
    integer factors use the equivalent phase-decomposed fast path.
    """
    b, h, w, c = x.shape
    if factor >= 1 and int(factor) == factor:
        return _up_axis_phases(_up_axis_phases(x, 1, factor), 2, factor)
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="linear")


def upsample_bilinear_align_corners(x, factor: int):
    """nn.Upsample(..., align_corners=True) — used only by the (vestigial)
    OccNet path (networks/DAIN.py:682,706)."""
    b, h, w, c = x.shape
    ho, wo = h * factor, w * factor

    def coords(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)

    gy = coords(ho, h)
    gx = coords(wo, w)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (gy - y0)[None, :, None, None]
    wx = (gx - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def upsample_nearest(x, factor: int):
    """nn.UpsamplingNearest2d (MegaDepth hourglass)."""
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def replication_pad(x, pads: Tuple[int, int, int, int]):
    """nn.ReplicationPad2d((left, right, top, bottom)) on NHWC."""
    l, r, t, b = pads
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
