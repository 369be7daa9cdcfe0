#!/usr/bin/env python
"""Mosaic/TPU micro-benchmarks for the round-2 kernel designs (docs/ROADMAP.md).

Answers, empirically on the real chip:
  E1  in-kernel dot precision: does a DEFAULT-precision f32 dot accumulate in
      f32 (MXU native) when fed bf16-exact values?  Same for bf16 inputs.
      -> decides whether the projection kernel can use 2-pass hi/lo splits
         instead of the 6-pass HIGHEST dot.
  E2  take_along_axis lane-shuffle throughput on (rows, 128) tiles
      -> stage-1 cost of the bounded-slab filter_interpolate kernel.
  E3  compare+select row-ladder throughput
      -> stage-2 cost of the same kernel.

Run: python tools/ubench_pallas.py [e1|e2|e3|all]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def device_time(fn, x0, iters=30):
    @jax.jit
    def many(x):
        def body(x, _):
            return fn(x), ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(jnp.stack([jnp.sum(l) for l in jax.tree_util.tree_leaves(x)]))

    jax.device_get(many(x0))
    t0 = time.perf_counter()
    jax.device_get(many(x0))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# E1: in-kernel dot accumulation precision
# ---------------------------------------------------------------------------

def e1_dot_precision():
    """One-hot-style dot: A (P, H) 0/1-valued, V (P, C) values; out = A^T? ...
    we use out[h, c] = sum_p A[p, h] * V[p, c] — the projection kernel shape.
    Values are constructed bf16-exact; the true sum needs f32 accumulation
    (many same-magnitude adds -> bf16 running sum loses low bits).
    """
    P, H, C = 4096, 256, 8
    rng = np.random.RandomState(0)
    # bf16-exact values: random sign * (1 + k/256) * 2^e, k in [0,256) -> 8
    # mantissa bits, exactly bf16
    mant = rng.randint(0, 256, size=(P, C)).astype(np.float32)
    vals = (1.0 + mant / 256.0) * np.sign(rng.rand(P, C) - 0.3)
    a = (rng.rand(P, H) < 0.02).astype(np.float32)  # sparse one-hot-ish
    ref = a.astype(np.float64).T @ vals.astype(np.float64)

    results = {}

    def make_dot(in_dtype, precision):
        def kernel(a_ref, v_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:].astype(in_dtype), v_ref[:].astype(in_dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)

        @jax.jit
        def run(a, v):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((H, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, v)
        return run

    cases = {
        "f32xf32_DEFAULT": (jnp.float32, jax.lax.Precision.DEFAULT),
        "f32xf32_HIGHEST": (jnp.float32, jax.lax.Precision.HIGHEST),
        "bf16xbf16_DEFAULT": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    }
    for name, (dt, prec) in cases.items():
        try:
            out = np.asarray(make_dot(dt, prec)(jnp.asarray(a), jnp.asarray(vals)))
            err = np.abs(out - ref).max()
            results[name] = err
            print(f"E1 {name:22s} max_abs_err = {err:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"E1 {name:22s} FAILED: {type(e).__name__}: {e}")

    # hi/lo split f32 values (each part bf16-exact) at DEFAULT
    vals_f = vals + rng.rand(P, C).astype(np.float32) * 1e-3  # full f32 entropy
    ref_f = a.astype(np.float64).T @ vals_f.astype(np.float64)
    hi = vals_f.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    lo = vals_f - hi
    run = make_dot(jnp.float32, jax.lax.Precision.DEFAULT)
    out = np.asarray(run(jnp.asarray(a), jnp.asarray(hi))) + \
        np.asarray(run(jnp.asarray(a), jnp.asarray(lo)))
    err = np.abs(out - ref_f).max() / np.abs(ref_f).max()
    print(f"E1 {'hi/lo f32 DEFAULT':22s} rel_err     = {err:.3e}")
    return results


# ---------------------------------------------------------------------------
# E2: take_along_axis throughput
# ---------------------------------------------------------------------------

def e2_taa(rows=384, reps=32):
    """reps lane-shuffles of an (rows, 128) f32 tile, chained (anti-fusion)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(rows, 128), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 128, size=(rows, 128)), jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        acc = x_ref[:]
        for _ in range(reps):
            acc = jnp.take_along_axis(acc, i_ref[:], axis=1) + 1.0
        o_ref[:] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    try:
        dt = device_time(run, x)
        per = dt / reps
        print(f"E2 TAA ({rows},128) f32: {per*1e6:.2f} us/shuffle "
              f"({per/rows*1e9:.2f} ns/row, total {dt*1e3:.3f} ms for {reps})")
    except Exception as e:  # noqa: BLE001
        print(f"E2 TAA FAILED: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# E3: compare+select ladder throughput
# ---------------------------------------------------------------------------

def e3_ladder(s=128, reps=8):
    """Row-select ladder: for each of `reps` rounds, compute
    sum_r (riota == base + round) * data[r, :] over an (s, 128) tile —
    the stage-2 pattern (4 of these per (oy, di))."""
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(s, 128), jnp.float32)
    base = jnp.asarray(rng.randint(0, s - reps, size=(1, 128)), jnp.int32)

    def kernel(d_ref, b_ref, o_ref):
        riota = jax.lax.broadcasted_iota(jnp.int32, (s, 128), 0)
        acc = jnp.zeros((1, 128), jnp.float32)
        d = d_ref[:]
        b = b_ref[:]
        for k in range(reps):
            m = (riota == b + k).astype(jnp.float32)
            acc = acc + jnp.sum(m * d, axis=0, keepdims=True)
        o_ref[:] = d + acc * 1e-6

    @jax.jit
    def run(d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, base)

    try:
        dt = device_time(run, data)
        per = dt / reps
        print(f"E3 ladder ({s},128): {per*1e6:.2f} us per masked-reduce "
              f"(total {dt*1e3:.3f} ms for {reps})")
    except Exception as e:  # noqa: BLE001
        print(f"E3 ladder FAILED: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# E4: band-matmul throughput (the filter_interpolate bandmm stage-1 shape)
# ---------------------------------------------------------------------------

def e4_bandmm(p=3584, ws=452, n=228, reps=8):
    """bf16 (P, Ws) @ (Ws, N) dots with f32 accumulation, chained."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(p, ws), jnp.bfloat16)
    b = jnp.asarray(rng.rand(ws, n), jnp.bfloat16)

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((p, n), jnp.float32)
        for _ in range(reps):
            acc = acc + jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    @jax.jit
    def run(a):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((p, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        # feedback: keep the timed dot on the critical path of the scan
        return a + (out[:, :1] * 1e-6).astype(jnp.bfloat16)

    try:
        dt = device_time(run, a)
        per = dt / reps
        mac = p * ws * n
        print(f"E4 bandmm ({p},{ws})@({ws},{n}) bf16: {per*1e6:.1f} us/dot "
              f"= {mac/per/1e12:.1f} TMAC/s")
    except Exception as e:  # noqa: BLE001
        print(f"E4 bandmm FAILED: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# E5: pallas_call fixed overhead (near-empty kernel)
# ---------------------------------------------------------------------------

def e5_overhead():
    x = jnp.ones((8, 128), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    dt = device_time(run, x)
    print(f"E5 empty pallas_call: {dt*1e6:.1f} us/call")

    @jax.jit
    def run_xla(x):
        return x + 1.0

    dt = device_time(run_xla, x)
    print(f"E5 empty XLA op:      {dt*1e6:.1f} us/call")


def e6_overhead_shape():
    """Is the ~1.2ms 'per-iteration' cost a per-scan-step cost or a fixed
    per-device_get cost?  Compare iters=30 vs 300 and scan vs unrolled."""
    x = jnp.ones((8, 128), jnp.float32)

    for iters in (30, 300):
        @jax.jit
        def many(x, n=iters):
            def body(x, _):
                return x + 1.0, ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(x)

        jax.device_get(many(x))
        t0 = time.perf_counter()
        jax.device_get(many(x))
        total = time.perf_counter() - t0
        print(f"E6 scan     iters={iters:4d}: total {total*1e3:8.2f} ms "
              f"({total/iters*1e6:.1f} us/iter)")

    for iters in (30, 300):
        @jax.jit
        def many_u(x, n=iters):
            def body(x, _):
                return x + 1.0, ()
            x, _ = jax.lax.scan(body, x, None, length=n, unroll=n)
            return jnp.sum(x)

        jax.device_get(many_u(x))
        t0 = time.perf_counter()
        jax.device_get(many_u(x))
        total = time.perf_counter() - t0
        print(f"E6 unrolled iters={iters:4d}: total {total*1e3:8.2f} ms "
              f"({total/iters*1e6:.1f} us/iter)")



# ---------------------------------------------------------------------------
# E7: in-kernel dynamic_gather characterisation (big-C context-warp design)
# ---------------------------------------------------------------------------

def _e7_time_pair(make_run, x, r1=16, r2=256):
    """Per-op cost via two unroll depths (cancels kernel-launch overhead)."""
    run1, run2 = make_run(r1), make_run(r2)
    t1 = device_time(run1, x, iters=20)
    t2 = device_time(run2, x, iters=20)
    return (t2 - t1) / (r2 - r1)


def e7_row_gather():
    """Mosaic dynamic_gather constraints + throughput.

    Finding (r3): gather along SUBLANES (take_along_axis axis=0) requires the
    table to fit one vreg along the gather dim (<=8 rows f32) — "Multiple
    source vregs along gather dimension" otherwise.  Gather along LANES
    (axis=1, table <=128 lanes, per-sublane independent tables) is the usable
    primitive; this measures its per-vreg cost with launch overhead cancelled
    by differencing two unroll depths.
    """
    rng = np.random.RandomState(0)

    for rows in (8, 64, 512):
        x = jnp.asarray(rng.rand(rows, 128), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 128, size=(rows, 128)), jnp.int32)

        def make_run(reps, rows=rows, idx=idx):
            def kernel(x_ref, i_ref, o_ref):
                acc = x_ref[:]
                for _ in range(reps):
                    acc = jnp.take_along_axis(acc, i_ref[:], axis=1) + 1.0
                o_ref[:] = acc

            @jax.jit
            def run(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x, idx)
            return run

        try:
            per = _e7_time_pair(make_run, x)
            nv = rows // 8
            print(f"E7a lane-gather ({rows:4d},128) f32: {per*1e9:9.1f} ns/op "
                  f"({per/nv*1e9:7.2f} ns/vreg, {per/(rows*128)*1e9:6.3f} ns/elt)")
        except Exception as e:  # noqa: BLE001
            print(f"E7a ({rows},128) FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")

    # --- B: sublane gather (axis=0), 8-row table (the one legal case).
    x = jnp.asarray(rng.rand(8, 128), jnp.float32)
    idxb = jnp.asarray(rng.randint(0, 8, size=(8, 128)), jnp.int32)

    def make_run_b(reps):
        def kernel(x_ref, i_ref, o_ref):
            acc = x_ref[:]
            for _ in range(reps):
                acc = jnp.take_along_axis(acc, i_ref[:], axis=0) + 1.0
            o_ref[:] = acc

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idxb)
        return run

    try:
        per = _e7_time_pair(make_run_b, x)
        print(f"E7b sublane-gather (8,128): {per*1e9:9.1f} ns/op")
    except Exception as e:  # noqa: BLE001
        print(f"E7b FAILED: {type(e).__name__}: {str(e).splitlines()[0][:120]}")

    # --- C: the ctx-kernel inner loop — fixed tables (slab rows), fixed idx,
    # gather + weighted FMA per (row, tap): the real instruction mix.
    s = 32
    tab = jnp.asarray(rng.rand(s, 8, 128), jnp.float32)
    idxc = jnp.asarray(rng.randint(0, 128, size=(8, 128)), jnp.int32)
    w = jnp.asarray(rng.rand(s, 8, 128), jnp.float32)

    def make_run_c(reps):
        nloop = max(1, reps // (s * 4))

        def kernel(tab_ref, i_ref, w_ref, o_ref):
            acc = jnp.zeros((8, 128), jnp.float32)
            for _ in range(nloop):
                for r in range(s):
                    t = tab_ref[r]
                    ww = w_ref[r]
                    for _ in range(4):
                        g = jnp.take_along_axis(t, i_ref[:], axis=1)
                        acc = acc + ww * g
            o_ref[:] = tab_ref[:] + acc[None]

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((s, 8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idxc, w)
        return run

    try:
        # reps here counts gather+FMA pairs (s*4 per sweep)
        per = _e7_time_pair(make_run_c, tab, r1=s * 4, r2=s * 4 * 8)
        print(f"E7c gather+FMA pair (reused table): {per*1e9:9.1f} ns/pair")
    except Exception as e:  # noqa: BLE001
        print(f"E7c FAILED: {type(e).__name__}: {str(e).splitlines()[0][:120]}")



def e7d_parallel():
    """E7d: the real ctx-kernel inner mix — distinct idx per tap (no CSE),
    4 independent accumulators (hide FMA latency), distinct tables per slab
    row.  Outer fori_loop scales the kernel into the ms range so the
    tunnel's ms-scale timing noise cancels in the slope."""
    rng = np.random.RandomState(1)
    s = 32
    tab = jnp.asarray(rng.rand(s, 8, 128), jnp.float32)
    idx4 = jnp.asarray(rng.randint(0, 125, size=(4, 8, 128)), jnp.int32)
    w = jnp.asarray(rng.rand(s, 4, 8, 128), jnp.float32)

    def make_run(nloop):
        def kernel(tab_ref, i_ref, w_ref, o_ref):
            def body(n, accs):
                a0, a1, a2, a3 = accs
                bump = n.astype(jnp.float32)
                for r in range(s):
                    t = tab_ref[r] + bump       # defeat cross-iter CSE
                    g0 = jnp.take_along_axis(t, i_ref[0], axis=1)
                    g1 = jnp.take_along_axis(t, i_ref[1], axis=1)
                    g2 = jnp.take_along_axis(t, i_ref[2], axis=1)
                    g3 = jnp.take_along_axis(t, i_ref[3], axis=1)
                    a0 = a0 + w_ref[r, 0] * g0
                    a1 = a1 + w_ref[r, 1] * g1
                    a2 = a2 + w_ref[r, 2] * g2
                    a3 = a3 + w_ref[r, 3] * g3
                return (a0, a1, a2, a3)

            z = jnp.zeros((8, 128), jnp.float32)
            a0, a1, a2, a3 = jax.lax.fori_loop(0, nloop, body, (z, z, z, z))
            o_ref[:] = tab_ref[:] + ((a0 + a1) + (a2 + a3))[None]

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((s, 8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx4, w)
        return run

    n1, n2 = 200, 1600
    t1 = device_time(make_run(n1), tab, iters=10)
    t2 = device_time(make_run(n2), tab, iters=10)
    per = (t2 - t1) / ((n2 - n1) * s * 4)
    print(f"E7d gather+FMA pair (4 accs, distinct idx): {per*1e9:9.2f} ns/pair"
          f"  ({per*0.94e9:6.1f} cyc @940MHz)  [t1={t1*1e3:.2f}ms t2={t2*1e3:.2f}ms]")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("e1", "all"):
        e1_dot_precision()
    if which in ("e2", "all"):
        e2_taa()
    if which in ("e3", "all"):
        e3_ladder()
    if which in ("e4", "all"):
        e4_bandmm(reps=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    if which in ("e5", "all"):
        e5_overhead()
    if which in ("e7",):
        e7_row_gather()
        e7d_parallel()
    if which == "e7d":
        e7d_parallel()
    if which == "e6":
        e6_overhead_shape()
