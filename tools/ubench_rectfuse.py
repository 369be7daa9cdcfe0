#!/usr/bin/env python
"""Timeboxed fused-rectifier probe (VERDICT r3 item 7; ROADMAP lever 1).

The rectifier (Resblock/BasicBlock.py:50-93 -> models/resblock.py) is 7x7 +
6x conv3x3(128->128) + 3x3->3.  A Pallas fusion can only win if its conv
formulation (9 shifted tap-dots on the MXU, bf16 operands / f32 accum —
the bf16 eval-lane semantics) at least matches XLA's conv throughput;
inter-conv HBM savings alone are worth only ~0.2 ms (5 bf16 intermediates
x 29 MB r+w at 819 GB/s).  Decision gate, measured on device:

  conv1  one 3x3 128->128 tap-dot Pallas conv   vs  XLA bf16 conv
  res3   3 fused residual blocks (6 convs+relu) vs  XLA bf16 chain

If conv1 is not >=1.2x XLA, the fused rectifier cannot win and goes to the
measured-dead-ends list (like the PWC decode fusions, BASELINE.md).

Kernel layout notes (CLAUDE.md Mosaic findings): whole image per grid step
(grid = batch), activations bf16 in VMEM with ONE zero guard row top and
bottom (row taps become unclamped dynamic_slices — the conv's zero padding
lives in the guard rows), f32 accumulation over row chunks of 32 (a
whole-image f32 accumulator would be 58 MB), column taps as static
concat-shifts on the sublane dim.

Usage: python tools/ubench_rectfuse.py [conv1 res3 ...]
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

H, W, C, B = 256, 448, 128, 2
RCHUNK = 32          # rows per in-kernel accumulation chunk


def _tapdot_chunk(jnp, jax, load_rows, r0, w9):
    """f32 (RCHUNK*W, C) accumulator for image rows [r0, r0+RCHUNK) of a
    3x3 SAME conv.  load_rows(start) reads (RCHUNK, W, C) bf16 from a
    row-padded buffer with zero guard rows at 0 and H+1 (image row r lives
    at index r+1); w9: (9, C, C) bf16 taps."""
    acc = jnp.zeros((RCHUNK * W, C), jnp.float32)
    for dy in (-1, 0, 1):
        rows = load_rows(r0 + dy + 1)
        for dx in (-1, 0, 1):
            if dx == 0:
                tap = rows
            elif dx == 1:
                tap = jnp.concatenate(
                    [rows[:, 1:, :], jnp.zeros((RCHUNK, 1, C), rows.dtype)],
                    axis=1)
            else:
                tap = jnp.concatenate(
                    [jnp.zeros((RCHUNK, 1, C), rows.dtype), rows[:, :-1, :]],
                    axis=1)
            acc = acc + jax.lax.dot_general(
                tap.reshape(RCHUNK * W, C), w9[(dy + 1) * 3 + (dx + 1)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def make_conv1():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 64                       # rows per grid tile
    ntiles = H // R

    def kernel(x_ref, w_ref, o_ref):
        w9 = w_ref[...]
        for i in range(R // RCHUNK):
            acc = _tapdot_chunk(
                jnp, jax, lambda s: x_ref[0, 0, pl.ds(s, RCHUNK)],
                i * RCHUNK, w9)
            o_ref[0, 0, pl.ds(i * RCHUNK, RCHUNK)] = jnp.maximum(
                acc, 0.0).astype(jnp.bfloat16).reshape(RCHUNK, W, C)

    @jax.jit
    def conv1(x, w9):                    # x (B,H,W,C) bf16, w9 (9,C,C) bf16
        xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        xwin = jnp.stack([xpad[:, t * R:t * R + R + 2] for t in
                          range(ntiles)], axis=1)   # (B,ntiles,R+2,W,C)
        out = pl.pallas_call(
            kernel,
            grid=(x.shape[0], ntiles),
            in_specs=[
                pl.BlockSpec((1, 1, R + 2, W, C),
                             lambda b, t: (b, t, 0, 0, 0)),
                pl.BlockSpec((9, C, C), lambda b, t: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, R, W, C),
                                   lambda b, t: (b, t, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (x.shape[0], ntiles, R, W, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xwin, w9)
        return out.reshape(x.shape)

    return conv1


def make_res3():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunk = H // RCHUNK

    def kernel(x_hbm, w_ref, o_hbm, xbuf, tbuf, sem):
        b = pl.program_id(0)
        w = w_ref[...]                      # (6, 9, C, C)
        cin = pltpu.make_async_copy(x_hbm.at[b], xbuf, sem.at[0])
        cin.start()
        zrow = jnp.zeros((1, W, C), jnp.bfloat16)
        tbuf[0:1] = zrow
        tbuf[H + 1:H + 2] = zrow
        cin.wait()

        def conv_into(src, dst, wi, res):
            """dst interior <- relu(conv3x3(src) [+ res interior])."""
            def body(i, _):
                acc = _tapdot_chunk(jnp, jax,
                                    lambda s: src[pl.ds(s, RCHUNK)],
                                    i * RCHUNK, w[wi])
                if res is not None:
                    acc = acc + res[pl.ds(i * RCHUNK + 1, RCHUNK)].reshape(
                        RCHUNK * W, C).astype(jnp.float32)
                dst[pl.ds(i * RCHUNK + 1, RCHUNK)] = jnp.maximum(
                    acc, 0.0).astype(jnp.bfloat16).reshape(RCHUNK, W, C)
                return ()
            jax.lax.fori_loop(0, nchunk, body, ())

        for k in range(3):
            # t = relu(conv(x)); x = relu(conv(t) + x).  In-place on xbuf is
            # safe: chunk i's residual read covers exactly the rows it then
            # overwrites (read-before-write within the chunk); taps come
            # from tbuf.  Guard rows stay zero (writes are interior-only).
            conv_into(xbuf, tbuf, 2 * k, None)
            conv_into(tbuf, xbuf, 2 * k + 1, xbuf)

        cout = pltpu.make_async_copy(xbuf.at[pl.ds(1, H)], o_hbm.at[b],
                                     sem.at[1])
        cout.start()
        cout.wait()

    @jax.jit
    def res3(x, w69):                  # x (B,H,W,C) bf16, w69 (6,9,C,C) bf16
        xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((6, 9, C, C), lambda b: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((H + 2, W, C), jnp.bfloat16),
                            pltpu.VMEM((H + 2, W, C), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xpad, w69)

    return res3


def _xla_conv(x, w, relu=True):
    import jax
    import jax.numpy as jnp
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def probe_module():
    """Production module A/B: MultipleBasicBlock impl=chained vs fused under
    the bf16 lane (the only lane the fused path serves)."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.layers import conv_compute_dtype
    from vfidkr_tpu.models.resblock import MultipleBasicBlock
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 45), jnp.float32)
    params = jax.jit(MultipleBasicBlock(4, 128, impl="chained").init)(
        jax.random.PRNGKey(0), x)
    jax.block_until_ready(params)
    out, vals = {}, {}
    for impl in ("chained", "fused"):
        model = MultipleBasicBlock(4, 128, impl=impl)

        def step(x):
            with conv_compute_dtype("bfloat16"):
                y = model.apply(params, x)
            red = jnp.mean(y)
            return x * jnp.float32(0.999) + 1e-3 * red
        vals[impl] = np.asarray(model.apply(params, x), np.float32)
        out[impl] = device_time_slope(jax.jit(step), x, n1=40, n2=160)
    err = float(np.max(np.abs(vals["chained"] - vals["fused"])))
    print(json.dumps({"probe": "module",
                      "chained_ms": round(out["chained"] * 1e3, 3),
                      "fused_ms": round(out["fused"] * 1e3, 3),
                      "speedup": round(out["chained"] / out["fused"], 3),
                      "maxerr_f32ctx": err}), flush=True)


def probe_dain():
    """Full bf16-lane DAIN headline with the rectifier chained vs fused
    (rect_impl auto dispatches fused on TPU+bf16), one session."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    q = lambda a: np.round(a * 255.0).astype(np.float32) / 255.0
    i0 = jnp.asarray(q(rng.rand(1, H, W, 3)), jnp.float32)
    i2 = jnp.asarray(q(rng.rand(1, H, W, 3)), jnp.float32)
    res = {}
    for impl in ("chained", "auto"):
        model = DAIN(filter_impl="slab8", compute_dtype="bfloat16",
                     rect_impl=impl)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
        jax.block_until_ready(params)

        def step(x):
            out = model.apply(params, x, i2)["outputs"][1]
            return jnp.where(jnp.isfinite(jnp.sum(out)),
                             jnp.roll(x, 7, axis=2), x)
        res[impl] = device_time_slope(jax.jit(step), i0, n1=30, n2=150)
    print(json.dumps({"probe": "dain_bf16_headline",
                      "chained_ms": round(res["chained"] * 1e3, 3),
                      "fused_ms": round(res["auto"] * 1e3, 3),
                      "fused_fps": round(1.0 / res["auto"], 2),
                      "speedup": round(res["chained"] / res["auto"], 3)},
                     ), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils import enable_persistent_cache
    from vfidkr_tpu.utils.profiling import device_time_slope

    enable_persistent_cache()
    which = sys.argv[1:] or ["conv1", "res3"]
    if "module" in which:
        probe_module()
    if "dain" in which:
        probe_dain()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    w_hwio = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    w9 = w_hwio.reshape(9, C, C)

    if "conv1" in which:
        def xla_step(x):
            return _xla_conv(x, w_hwio) * jnp.bfloat16(0.999)
        t_x = device_time_slope(jax.jit(xla_step), x, n1=40, n2=160)

        conv1 = make_conv1()
        ref = np.asarray(_xla_conv(x, w_hwio), np.float32)
        got = np.asarray(conv1(x, w9), np.float32)
        err = float(np.max(np.abs(ref - got)))

        def pl_step(x):
            return conv1(x, w9) * jnp.bfloat16(0.999)
        t_p = device_time_slope(jax.jit(pl_step), x, n1=40, n2=160)
        print(json.dumps({"probe": "conv1",
                          "xla_ms": round(t_x * 1e3, 3),
                          "pallas_ms": round(t_p * 1e3, 3),
                          "speedup": round(t_x / t_p, 3),
                          "maxerr": err}), flush=True)

    if "res3" in which:
        w6 = jnp.asarray(rng.randn(6, 3, 3, C, C) * 0.05, jnp.bfloat16)

        def xla_res3(x):
            h = x
            for k in range(3):
                t = _xla_conv(h, w6[2 * k])
                h2 = jax.lax.conv_general_dilated(
                    t, w6[2 * k + 1], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                h = jnp.maximum(h2 + h.astype(jnp.float32), 0.0).astype(
                    jnp.bfloat16)
            return h

        def xla_step(x):
            return xla_res3(x) * jnp.bfloat16(0.999)
        t_x = device_time_slope(jax.jit(xla_step), x, n1=20, n2=80)

        res3 = make_res3()
        w69 = w6.reshape(6, 9, C, C)
        ref = np.asarray(xla_res3(x), np.float32)
        got = np.asarray(res3(x, w69), np.float32)
        err = float(np.max(np.abs(ref - got)))

        def pl_step(x):
            return res3(x, w69) * jnp.bfloat16(0.999)
        t_p = device_time_slope(jax.jit(pl_step), x, n1=20, n2=80)
        print(json.dumps({"probe": "res3",
                          "xla_ms": round(t_x * 1e3, 3),
                          "pallas_ms": round(t_p * 1e3, 3),
                          "speedup": round(t_x / t_p, 3),
                          "maxerr": err}), flush=True)


if __name__ == "__main__":
    main()
