#!/usr/bin/env python
"""PWC batch_chunk A/B (VERDICT r3 item 2 fix attempt).

tools/ubench_batch.py localised the B=4 headline regression to PWC-Net:
linear scaling up to INTERNAL batch 4, 1.8x per item at internal batch 8
(XLA conv-tiling cliff).  ``PWCDCNet.batch_chunk`` caps the internal conv
batch by running pairs in groups of chunk//2.  This measures, in ONE
session, per driver batch b in {1, 2, 4}:

  pwc/none    bidirectional, single fused internal-2b call
  pwc/chunk4  bidirectional, internal batch capped at 4
  dain/none   full DAIN headline model, fused PWC
  dain/chunk4 full DAIN, pwc_batch_chunk=4

Usage: python tools/ubench_pwc_chunk.py [pwc|dain ...]
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

H, W = 256, 448
BATCHES = (1, 2, 4)
CHUNKS = (None, 4)


def _q8(x):
    return np.round(x * 255.0) / 255.0


def bench_pwc():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0_1 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    params = jax.jit(PWCDCNet().init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0_1, i0_1, method="bidirectional")
    for chunk in CHUNKS:
        model = PWCDCNet(batch_chunk=chunk)
        for b in BATCHES:
            i0 = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)
            i2 = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)

            def step(x):
                f, w = model.apply(params, x, i2, method="bidirectional")
                red = jnp.mean(f) + jnp.mean(w)
                return x * 0.999 + red * 1e-4

            t = device_time_slope(jax.jit(step), i0, n1=20, n2=80)
            print(json.dumps({
                "probe": "pwc", "chunk": chunk, "b": b,
                "ms": round(t * 1e3, 3),
                "ms_per_pair": round(t / b * 1e3, 3)}), flush=True)


def bench_dain():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0_1 = jnp.asarray(_q8(rng.rand(1, H, W, 3)), jnp.float32)
    base = DAIN(filter_impl="slab8")
    params = jax.jit(base.init)(jax.random.PRNGKey(0), i0_1, i0_1)
    for chunk in CHUNKS:
        model = DAIN(filter_impl="slab8", pwc_batch_chunk=chunk)
        for b in BATCHES:
            i0 = jnp.asarray(_q8(rng.rand(b, H, W, 3)), jnp.float32)
            i2 = jnp.asarray(_q8(rng.rand(b, H, W, 3)), jnp.float32)

            def step(x):
                out = model.apply(params, x, i2)["outputs"][1]
                nxt = jnp.where(jnp.isfinite(jnp.sum(out)),
                                jnp.roll(x, 7, axis=2), x)
                return nxt

            t = device_time_slope(jax.jit(step), i0, n1=10, n2=40)
            print(json.dumps({
                "probe": "dain", "chunk": chunk, "b": b,
                "ms": round(t * 1e3, 3),
                "ms_per_frame": round(t / b * 1e3, 3)}), flush=True)


def main():
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    which = sys.argv[1:] or ["pwc", "dain"]
    if "pwc" in which:
        bench_pwc()
    if "dain" in which:
        bench_dain()


if __name__ == "__main__":
    main()
