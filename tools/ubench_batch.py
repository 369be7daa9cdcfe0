#!/usr/bin/env python
"""Per-stage batch-scaling diagnosis (VERDICT r3 item 2): the headline DAIN
per-frame time regresses from ~8.7 ms at B=1 to ~11.8 ms at B=4
(bench_matrix 'batch' config) even though every Pallas kernel carries batch
as a grid dimension.  This tool slope-times each stage at the batch it sees
inside the graph for driver batches 1/2/4, so the regressing stage is
attributable:

  mononet    MonoNet5 trunk + both heads  on (b, H, W, 6)
  pwc        bidirectional PWC            on (b, H, W, 3) pairs
  project    flow_project + hole fill     on (2b, H, W, 2)
  filter     filter_interpolate slab8     on (2b, H, W, 3)
  rectify    MultipleBasicBlock_4         on (b, H, W, 45)
  dain       the full model               on (b, H, W, 3) pairs

Usage: python tools/ubench_batch.py [stage ...]  (default: all)
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

BATCHES = (1, 2, 4)
H, W = 256, 448


def _q8(x):
    return np.round(x * 255.0) / 255.0


def stage_mononet(b):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.mononet import BranchHead, MonoNet5
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, H, W, 6), jnp.float32)
    trunk = MonoNet5()
    h1, h2 = BranchHead(16), BranchHead(16)
    pt = jax.jit(trunk.init)(jax.random.PRNGKey(0), x)
    t0 = trunk.apply(pt, x)
    p1 = jax.jit(h1.init)(jax.random.PRNGKey(1), t0)
    p2 = jax.jit(h2.init)(jax.random.PRNGKey(2), t0)

    def step(x):
        t = trunk.apply(pt, x)
        f = jnp.concatenate([h1.apply(p1, t), h2.apply(p2, t)], axis=-1)
        red = jnp.mean(f, axis=(1, 2, 3), keepdims=True)
        return x * 0.999 + 1e-3 * red[..., :1]

    return device_time_slope(jax.jit(step), x, n1=20, n2=80)


def stage_pwc(b):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)
    model = PWCDCNet()
    params = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")

    def step(x):
        f, bk = model.apply(params, x, i2, method="bidirectional")
        fb = jnp.concatenate([f, bk], axis=-1)
        return x * 0.999 + 1e-4 * jnp.pad(
            fb, ((0, 0), (0, x.shape[1] - f.shape[1]),
                 (0, x.shape[2] - f.shape[2]), (0, 0)))[..., :3]

    return device_time_slope(jax.jit(step), i0, n1=20, n2=80)


def stage_project(b):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops import flow_project
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    flow = jnp.asarray((rng.rand(2 * b, H, W, 2) - 0.5) * 20, jnp.float32)

    def step(f):
        return flow_project(f, hole_fill=True) * 0.99 + f * 0.01

    return device_time_slope(jax.jit(step), flow, n1=20, n2=80)


def stage_filter(b):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops import filter_interpolate
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    img = jnp.asarray(_q8(rng.rand(2 * b, H, W, 3)), jnp.float32)
    flow = jnp.asarray((rng.rand(2 * b, H, W, 2) - 0.5) * 20, jnp.float32)
    filt = jnp.asarray(rng.rand(2 * b, H, W, 16), jnp.float32)

    def step(im):
        out = filter_interpolate(im, flow, filt, impl="slab8")
        return jnp.where(jnp.isfinite(jnp.sum(out)),
                         jnp.roll(im, 7, axis=2), im)

    return device_time_slope(jax.jit(step), img, n1=20, n2=80)


def stage_rectify(b):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.resblock import MultipleBasicBlock
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, H, W, 45), jnp.float32)
    model = MultipleBasicBlock(4, 128)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def step(x):
        y = model.apply(params, x)
        red = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        return x * 0.999 + 1e-3 * red[..., :1]

    return device_time_slope(jax.jit(step), x, n1=20, n2=80)


def stage_dain(b):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(_q8(rng.rand(b, H, W, 3)), jnp.float32)
    i2 = jnp.asarray(_q8(rng.rand(b, H, W, 3)), jnp.float32)
    model = DAIN(filter_impl="slab8")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)

    def step(x):
        out = model.apply(params, x, i2)["outputs"][1]
        return jnp.where(jnp.isfinite(jnp.sum(out)),
                         jnp.roll(x, 7, axis=2), x)

    return device_time_slope(jax.jit(step), i0, n1=10, n2=40)


STAGES = {
    "mononet": stage_mononet,
    "pwc": stage_pwc,
    "project": stage_project,
    "filter": stage_filter,
    "rectify": stage_rectify,
    "dain": stage_dain,
}


def main():
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        row = {"stage": name}
        try:
            for b in BATCHES:
                t = STAGES[name](b)
                row[f"b{b}_ms"] = round(t * 1e3, 3)
                row[f"b{b}_ms_per_b"] = round(t / b * 1e3, 3)
            row["b4_vs_b1_per_item"] = round(
                row["b4_ms_per_b"] / row["b1_ms_per_b"], 3)
        except Exception as e:  # noqa: BLE001
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
