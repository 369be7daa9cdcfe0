#!/usr/bin/env python
"""Device ablation for the phase-packed MonoNet5 evaluation: chained vs
packed (kernel transform traced per call) vs packed with kernels pre-packed
OUTSIDE the graph (the driver-side prepack plan).

Usage: python tools/ubench_phasepack.py   (one TPU process at a time)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.mononet import BranchHead, MonoNet5
    from vfidkr_tpu.models import phasepack as pp
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 256, 448, 6), jnp.float32)

    def run(tag, fn, x0):
        t = device_time_slope(jax.jit(fn), x0, n1=20, n2=80)
        print(json.dumps({"metric": f"mononet_heads_{tag}_ms",
                          "value": round(t * 1e3, 3)}), flush=True)

    m0, h0a, h0b = (MonoNet5(impl="chained"), BranchHead(16, impl="chained"),
                    BranchHead(16, impl="chained"))
    p = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
    t0 = m0.apply(p, x)
    pa = jax.jit(h0a.init)(jax.random.PRNGKey(1), t0)
    pb = jax.jit(h0b.init)(jax.random.PRNGKey(2), t0)
    jax.block_until_ready((p, pa, pb))

    def chained(x):
        t = m0.apply(p, x)
        f = h0a.apply(pa, t) + h0b.apply(pb, t)
        return x + 1e-3 * jnp.concatenate([f[..., :3]] * 2, -1)

    run("chained", chained, x)

    mp = MonoNet5(impl="packed")
    hpa, hpb = BranchHead(16, impl="packed"), BranchHead(16, impl="packed")

    def packed(x):
        t = mp.apply(p, x)
        f = pp.unpack2(hpa.apply(pa, t) + hpb.apply(pb, t))
        return x + 1e-3 * jnp.concatenate([f[..., :3]] * 2, -1)

    run("packed_traced", packed, x)

    # driver-side prepack: transform each 3x3 conv kernel ONCE outside jit
    pre_p = pp.prepack_params(p)
    pre_a = pp.prepack_params(pa)
    pre_b = pp.prepack_params(pb)
    jax.block_until_ready((pre_p, pre_a, pre_b))
    mq = MonoNet5(impl="packed")
    hqa, hqb = (BranchHead(16, impl="packed"),
                BranchHead(16, impl="packed"))

    def prepacked(x):
        t = mq.apply(pre_p, x)
        f = pp.unpack2(hqa.apply(pre_a, t) + hqb.apply(pre_b, t))
        return x + 1e-3 * jnp.concatenate([f[..., :3]] * 2, -1)

    run("prepacked", prepacked, x)


if __name__ == "__main__":
    main()
