"""Pallas TPU kernel: fused rectifier residual trunk (bf16 eval lane).

The rectifier (reference ``Resblock/BasicBlock.py:50-93``,
models/resblock.py) spends most of its time in 3 residual blocks = 6
chained 3x3 128->128 convs.  In the bf16 fast-eval lane XLA evaluates them
as 6 separate conv ops with every intermediate round-tripping HBM.  This
kernel keeps the whole chain resident in VMEM and evaluates each conv as 9
shifted tap-dots on the MXU (bf16 operands, f32 accumulation — exactly the
XLA bf16-conv semantics; the probe measured bit-equal outputs and 1.34x
the XLA conv throughput, tools/ubench_rectfuse.py).

Layout (CLAUDE.md Mosaic findings):

* grid = (batch,); the whole (H, W, 128) activation lives in VMEM with ONE
  zero guard row top and bottom, so every row tap is an unclamped
  ``pl.ds`` load and the conv's zero padding costs nothing;
* input/output ride ``pl.ANY`` (HBM) with manual ``make_async_copy`` — as
  VMEM pipeline blocks the whole-image operands would be double-buffered
  (2x29.6 MB in + 2x29.4 MB out blew the scoped-vmem budget);
* f32 accumulation happens per 32-row chunk ((32*W, 128) = 7.3 MB at
  W=448; a whole-image f32 accumulator would be 58 MB);
* column taps are static concat-shifts on the sublane dim; the two
  activation buffers ping-pong (conv2 writes in-place over its residual
  input: chunk i reads its residual rows before overwriting them, and its
  taps come from the other buffer, so there is no hazard).

Applicability gate (``fused_resblocks_ok``): C == 128, H divisible by the
row chunk, and the two (H+2, W, 128) bf16 buffers + the accumulator within
the 100 MB scoped-vmem budget — 448x256 (the headline shape) fits; larger
frames fall back to the XLA conv chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 128
_VMEM_BUDGET = 100 * 1024 * 1024


def _rchunk_for(h: int) -> int:
    for r in (32, 16, 8):
        if h % r == 0:
            return r
    return 0


def fused_resblocks_ok(shape) -> bool:
    """True when (B, H, W, C) can run the fused kernel."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if c != _C or _rchunk_for(h) == 0:
        return False
    rchunk = _rchunk_for(h)
    bufs = 2 * (h + 2) * w * _C * 2          # two bf16 activation buffers
    acc = rchunk * w * _C * 4                # f32 chunk accumulator
    taps = 3 * rchunk * w * _C * 2           # shifted tap temporaries
    weights = 2 * 6 * 9 * _C * _C * 2        # double-buffered weight block
    return bufs + acc + taps + weights < int(_VMEM_BUDGET * 0.8)


def _tapdot_chunk(load_rows, r0, w9, rchunk, width):
    """f32 (rchunk*width, C) accumulator for image rows [r0, r0+rchunk) of
    a 3x3 SAME conv.  load_rows(start) reads (rchunk, width, C) bf16 from a
    row-padded buffer (zero guard rows at 0 and H+1; image row r lives at
    index r+1); w9: (9, C, C) bf16 taps in (dy, dx) row-major order."""
    acc = jnp.zeros((rchunk * width, _C), jnp.float32)
    for dy in (-1, 0, 1):
        rows = load_rows(r0 + dy + 1)
        for dx in (-1, 0, 1):
            if dx == 0:
                tap = rows
            elif dx == 1:
                tap = jnp.concatenate(
                    [rows[:, 1:, :],
                     jnp.zeros((rchunk, 1, _C), rows.dtype)], axis=1)
            else:
                tap = jnp.concatenate(
                    [jnp.zeros((rchunk, 1, _C), rows.dtype),
                     rows[:, :-1, :]], axis=1)
            acc = acc + jax.lax.dot_general(
                tap.reshape(rchunk * width, _C), w9[(dy + 1) * 3 + (dx + 1)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _make_kernel(h: int, width: int, rchunk: int):
    nchunk = h // rchunk

    def kernel(x_hbm, w_ref, o_hbm, xbuf, tbuf, sem):
        b = pl.program_id(0)
        w = w_ref[...]                              # (6, 9, C, C)
        cin = pltpu.make_async_copy(x_hbm.at[b], xbuf, sem.at[0])
        cin.start()
        zrow = jnp.zeros((1, width, _C), jnp.bfloat16)
        tbuf[0:1] = zrow
        tbuf[h + 1:h + 2] = zrow
        cin.wait()

        def conv_into(src, dst, wi, res):
            """dst interior <- relu(conv3x3(src) [+ res interior])."""
            def body(i, _):
                acc = _tapdot_chunk(
                    lambda s: src[pl.ds(s, rchunk)], i * rchunk, w[wi],
                    rchunk, width)
                if res is not None:
                    acc = acc + res[pl.ds(i * rchunk + 1, rchunk)].reshape(
                        rchunk * width, _C).astype(jnp.float32)
                dst[pl.ds(i * rchunk + 1, rchunk)] = jnp.maximum(
                    acc, 0.0).astype(jnp.bfloat16).reshape(
                        rchunk, width, _C)
                return ()
            jax.lax.fori_loop(0, nchunk, body, ())

        for k in range(3):
            conv_into(xbuf, tbuf, 2 * k, None)
            conv_into(tbuf, xbuf, 2 * k + 1, xbuf)

        cout = pltpu.make_async_copy(xbuf.at[pl.ds(1, h)], o_hbm.at[b],
                                     sem.at[1])
        cout.start()
        cout.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=())
def fused_resblocks(x, w6):
    """relu(conv2(relu(conv1(.)))+.) x3 on (B, H, W, 128) bf16.

    ``w6``: (6, 3, 3, 128, 128) bf16 HWIO kernels, blocks' conv1/conv2
    interleaved.  Caller must check ``fused_resblocks_ok(x.shape)``.
    Semantics match the XLA bf16 conv chain (bf16 operands, f32
    accumulation, bf16 activation casts) to conv-reduction rounding.
    """
    b, h, width, c = x.shape
    assert c == _C, x.shape
    rchunk = _rchunk_for(h)
    assert rchunk, (h, "fused_resblocks_ok not checked")
    xpad = jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (1, 1), (0, 0), (0, 0)))
    w69 = w6.astype(jnp.bfloat16).reshape(6, 9, _C, _C)
    return pl.pallas_call(
        _make_kernel(h, width, rchunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 9, _C, _C), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((h + 2, width, _C), jnp.bfloat16),
                        pltpu.VMEM((h + 2, width, _C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=jax.default_backend() == "cpu",
    )(xpad, w69)
