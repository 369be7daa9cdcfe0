#!/usr/bin/env python
"""Headline benchmark: interpolated frames/sec/chip, DAIN mid-frame synthesis
at 448x256 (the BASELINE.md north-star config) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 100 (the >=1e2 frames/sec/chip target from
BASELINE.json; the reference repo publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()   # steady-state timing is unaffected; repeat
                                # invocations skip the ~40 s compile

    model = DAIN(filter_impl="slab8")   # eval config: 8-bit-grid frames
    rng = np.random.RandomState(0)
    h, w = 256, 448
    # 8-bit-grid frames (k/255) — what real decoded inputs are; the filter
    # kernel's exact single-limb fast branch keys on this
    q = lambda x: np.round(x * 255.0).astype(np.float32) / 255.0
    i0 = jnp.asarray(q(rng.rand(1, h, w, 3)), jnp.float32)
    i2 = jnp.asarray(q(rng.rand(1, h, w, 3)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
    jax.block_until_ready(params)

    # honest device timing: a feedback scan (output chained into the next
    # input, so nothing is loop-invariant) reduced to a scalar that is
    # device_get'ed — block_until_ready alone can return before execution
    # completes on tunnelled TPU runtimes.  iters must be large enough to
    # amortise the fixed ~35-40 ms device_get round trip (ubench E5/E6).
    iters = 150

    @jax.jit
    def many(x):
        def body(x, _):
            out = model.apply(params, x, i2)["outputs"][1]
            # feedback: the next input must DEPEND on this output (so the
            # scan iterations stay sequential and nothing is loop-invariant)
            # while staying on the 8-bit grid — the deployed contract: every
            # real input is a freshly decoded 8-bit frame, and the slab8
            # fast path self-enforces it.  Device-side requantisation
            # (round(x*255)/255) does NOT reproduce host k/255 values under
            # XLA's excess-precision division, so feed a rolled copy of the
            # on-grid input through a data-dependent select instead.
            nxt = jnp.where(jnp.isfinite(jnp.sum(out)),
                            jnp.roll(x, 7, axis=2), x)
            return nxt, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(x)

    jax.device_get(many(i0))          # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(many(i0))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "dain_interp_frames_per_sec_per_chip_448x256",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 3),
    }))


def slowmotion_line():
    """Optional second line (``python bench.py --slowmotion``): the
    DAIN_slowmotion 4x streamed-clip config (BASELINE.json config list;
    colab_interpolate.py is the reference protocol).  Measured via the same
    feedback-scan device timing; see tools/bench_matrix.py for the full
    config matrix."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAINSlowMotion
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    h, w = 256, 448
    q = lambda x: np.round(x * 255.0).astype(np.float32) / 255.0
    i0 = jnp.asarray(q(rng.rand(1, h, w, 3)), jnp.float32)
    i2 = jnp.asarray(q(rng.rand(1, h, w, 3)), jnp.float32)
    model = DAINSlowMotion(timestep=0.25)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
    jax.block_until_ready(params)

    def step(x):
        outs = model.apply(params, x, i2)["outputs"][1]
        s = sum(jnp.sum(o) for o in outs)
        return jnp.where(jnp.isfinite(s), jnp.roll(x, 7, axis=2), x)

    dt = device_time_slope(jax.jit(step), i0, n1=5, n2=20)
    print(json.dumps({
        "metric": "dain_slowmotion_4x_interp_frames_per_sec_448x256",
        "value": round(3.0 / dt, 2),
        "unit": "frames/s",
        "vs_baseline": round((3.0 / dt) / 100.0, 3),
    }))


if __name__ == "__main__":
    import sys
    main()
    if "--slowmotion" in sys.argv:
        slowmotion_line()
