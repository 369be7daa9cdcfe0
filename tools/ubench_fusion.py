#!/usr/bin/env python
"""Device ablations for the two round-3 XLA-level reformulations that were
committed during a TPU tunnel outage without device validation:

  megadepth  MegaDepth hourglass forward with the inception stage-2
             grouped-conv fusion at different ``fuse_stage2_max_hw``
             thresholds (0 disables it; stage-1 1x1 fusion is always on —
             it is MAC-neutral).  The grouped conv zero-pads 3x3/5x5
             kernels to the cell's largest (up to 11x11), trading MACs for
             launches — only a win where the level is launch-bound.
  corr       PWC-Net bidirectional pass with the banded-matmul cost volume
             vs the 81-slice naive formulation (ops/correlation.py).

Usage: python tools/ubench_fusion.py [megadepth] [corr]
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def _frames(rng, b, h, w):
    import jax.numpy as jnp
    x = np.round(rng.rand(b, h, w, 3) * 255.0) / 255.0
    return jnp.asarray(x, jnp.float32)


def ab_megadepth():
    import jax
    from vfidkr_tpu.models.megadepth import MegaDepthHourglass
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = _frames(rng, 2, 256, 448)
    cases = [("s1_off_s2_off", dict(fuse_stage1=False, fuse_stage2_max_hw=0)),
             ("s1_on_s2_off", dict(fuse_stage1=True, fuse_stage2_max_hw=0)),
             ("s1_on_s2_512", dict(fuse_stage1=True, fuse_stage2_max_hw=512)),
             ("s1_on_s2_2048", dict(fuse_stage1=True,
                                    fuse_stage2_max_hw=2048)),
             ("s1_on_s2_8192", dict(fuse_stage1=True,
                                    fuse_stage2_max_hw=8192))]
    for tag, kw in cases:
        model = MegaDepthHourglass(**kw)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        jax.block_until_ready(params)

        def step(x, model=model, params=params):
            return x + 1e-6 * model.apply(params, x)

        t = device_time_slope(jax.jit(step), x, n1=20, n2=80)
        print(json.dumps({"metric": f"megadepth_fuse_{tag}",
                          "value": round(t * 1e3, 3), "unit": "ms/pair"}),
              flush=True)


def ab_corr():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0, i2 = _frames(rng, 1, 256, 448), _frames(rng, 1, 256, 448)
    for impl in ("banded", "slices"):
        model = PWCDCNet(corr_impl=impl)
        params = jax.jit(model.init, static_argnames=("method",))(
            jax.random.PRNGKey(0), i0, i2, method="bidirectional")
        jax.block_until_ready(params)

        def step(x, model=model, params=params):
            f, b = model.apply(params, x, i2, method="bidirectional")
            return x + 1e-3 * jnp.pad(
                jnp.concatenate([f, b], axis=-1),
                ((0, 0), (0, x.shape[1] - f.shape[1]),
                 (0, x.shape[2] - f.shape[2]), (0, 0)))[..., :3]

        t = device_time_slope(jax.jit(step), i0, n1=20, n2=80)
        print(json.dumps({"metric": f"pwc_bidirectional_corr_{impl}",
                          "value": round(t * 1e3, 3), "unit": "ms/pair"}),
              flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["megadepth", "corr"]
    for n in names:
        {"megadepth": ab_megadepth, "corr": ab_corr}[n]()
