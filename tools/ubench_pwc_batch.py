#!/usr/bin/env python
"""PWC batch-scaling attribution (VERDICT r3 item 2, follow-up to
tools/ubench_batch.py which measured the bidirectional PWC pass per-item
1.8x SLOWER at driver batch 4 than at batch 1 — the dominant source of the
headline B>1 regression).

Times the pyramid alone and the decode stopped after each level
(models/pwcnet.py profiling probes) at driver batches 1 and 4 (internal
batch 2b), so consecutive differences attribute the regression to a level
or to the extractor.

Usage: python tools/ubench_pwc_batch.py [b ...]   (default: 1 4)
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

H, W = 256, 448

# probe name -> (method, kwargs)
PROBES = [
    ("pyramid", "pyramid_only", {}),
    ("upto6", "decode_upto", {"upto": 6}),
    ("upto5", "decode_upto", {"upto": 5}),
    ("upto4", "decode_upto", {"upto": 4}),
    ("upto3", "decode_upto", {"upto": 3}),
    ("warp2", "decode_upto", {"upto": -1}),
    ("corr2", "decode_upto", {"upto": -2}),
    ("dense2", "decode_upto", {"upto": -3}),
    ("full", "decode_upto", {"upto": 2}),
]


def main():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils import enable_persistent_cache
    from vfidkr_tpu.utils.profiling import device_time_slope

    enable_persistent_cache()
    batches = [int(a) for a in sys.argv[1:]] or [1, 4]
    rng = np.random.RandomState(0)
    model = PWCDCNet()
    i0_1 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    params = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0_1, i0_1, method="bidirectional")
    jax.block_until_ready(params)

    for name, method, kw in PROBES:
        row = {"probe": name}
        for b in batches:
            i0 = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)
            i2 = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)

            def step(x):
                y = model.apply(params, x, i2, method=method, **kw)
                red = (sum(jnp.mean(v) for v in y) if isinstance(y, tuple)
                       else jnp.mean(y))
                return x * 0.999 + red * 1e-4

            try:
                t = device_time_slope(jax.jit(step), i0, n1=20, n2=80)
                row[f"b{b}_ms"] = round(t * 1e3, 3)
                row[f"b{b}_ms_per_b"] = round(t / b * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                row[f"b{b}_err"] = f"{type(e).__name__}: {str(e)[:120]}"
        if all(f"b{b}_ms" in row for b in batches) and len(batches) >= 2:
            b0, b1 = batches[0], batches[-1]
            row["ratio_per_item"] = round(
                row[f"b{b1}_ms_per_b"] / row[f"b{b0}_ms_per_b"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
