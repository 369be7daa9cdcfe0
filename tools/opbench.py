#!/usr/bin/env python
"""Per-op TPU benchmarks with the fixed-cost-free slope timer.

Usage: python tools/opbench.py [fi|proj|all]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from vfidkr_tpu.utils.profiling import device_time_slope


def bench_filter_interpolate(h=256, w=448, b=2, c=3):
    from vfidkr_tpu.ops.filter_interpolation import filter_interpolate
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    flow = jnp.asarray((rng.rand(b, h, w, 2) - 0.5) * 20, jnp.float32)
    filt = jnp.asarray(rng.rand(b, h, w, 16), jnp.float32)

    for impl in sys.argv[2:] or ("block", "slab", "slab8"):
        fn = lambda im: filter_interpolate(im, flow, filt, impl=impl)
        dt = device_time_slope(fn, img)
        print(f"filter_interpolate[{impl:8s}] B={b} {h}x{w}x{c}: "
              f"{dt*1e3:.3f} ms/call ({dt/b*1e3:.3f} ms/image)")
        out_ref = filter_interpolate(img, flow, filt, impl="block")
        out = filter_interpolate(img, flow, filt, impl=impl)
        err = float(jnp.abs(out - out_ref).max())
        print(f"  max |err| vs block on TPU: {err:.2e}")


def bench_projection(h=256, w=448, b=2):
    from vfidkr_tpu.ops.flow_projection import flow_project
    rng = np.random.RandomState(0)
    flow = jnp.asarray((rng.rand(b, h, w, 2) - 0.5) * 20, jnp.float32)

    fn = lambda f: flow_project(f, hole_fill=True) * 0.99 + f * 0.01
    dt = device_time_slope(fn, flow)
    print(f"flow_project+fill B={b} {h}x{w}: {dt*1e3:.3f} ms/call")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("fi", "all"):
        bench_filter_interpolate()
    if which in ("proj", "all"):
        bench_projection()
