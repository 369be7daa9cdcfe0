#!/usr/bin/env python
"""Per-stage f32-vs-bf16 conv-lane timing (VERDICT r3 item 1).

The round-2 isolated probe (single 3x3 128->128 conv @448x256: 0.54 ms f32 /
0.37 ms bf16) predicted a 10-30% win from running the conv stacks in bf16,
but the full-graph headline measured NEUTRAL-to-worse (bench_matrix
headline vs headline_bf16).  This tool times each conv stage in-situ
(MonoNet5+heads, rectifier, PWC bidirectional, S2DF, MegaDepth) under both
compute dtypes with the slope timer, so the discrepancy is attributable.

Usage: python tools/ubench_bf16.py [stage ...]   (default: all)
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def _time_mod(make_model, make_input, feedback=None, n1=20, n2=80):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.layers import conv_compute_dtype
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = make_input(rng)
    model = make_model()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(params)
    out = {}
    for dt in ("float32", "bfloat16"):
        def step(x):
            with conv_compute_dtype(dt):
                y = model.apply(params, x)
            if feedback is not None:
                return feedback(x, y)
            y = jnp.asarray(y, jnp.float32)
            red = jnp.mean(y, axis=tuple(range(1, y.ndim)), keepdims=True)
            return x * 0.999 + 1e-3 * jnp.reshape(
                red[:x.shape[0]], (-1,) + (1,) * (x.ndim - 1))
        out[dt] = device_time_slope(jax.jit(step), x, n1=n1, n2=n2)
    return out


def stage_mononet():
    from vfidkr_tpu.models.mononet import MonoNet5
    return _time_mod(lambda: MonoNet5(),
                     lambda r: np.asarray(r.rand(2, 256, 448, 6), np.float32))


def stage_rectifier():
    from vfidkr_tpu.models.resblock import MultipleBasicBlock
    return _time_mod(
        lambda: MultipleBasicBlock(4, 128),
        lambda r: np.asarray(r.rand(1, 256, 448, 45), np.float32))


def stage_pwc():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.layers import conv_compute_dtype
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(rng.rand(1, 256, 448, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 256, 448, 3), jnp.float32)
    model = PWCDCNet()
    params = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")
    jax.block_until_ready(params)
    out = {}
    for dt in ("float32", "bfloat16"):
        def step(x):
            with conv_compute_dtype(dt):
                f, b = model.apply(params, x, i2, method="bidirectional")
            fb = jnp.concatenate([f, b], axis=-1).astype(jnp.float32)
            return x * 0.999 + 1e-4 * jnp.pad(
                fb, ((0, 0), (0, x.shape[1] - f.shape[1]),
                     (0, x.shape[2] - f.shape[2]), (0, 0)))[..., :3]
        out[dt] = device_time_slope(jax.jit(step), i0, n1=20, n2=80)
    return out


def stage_s2df():
    from vfidkr_tpu.models.s2df import S2DF
    return _time_mod(lambda: S2DF(3, True, True),
                     lambda r: np.asarray(r.rand(2, 256, 448, 3), np.float32))


def stage_megadepth():
    from vfidkr_tpu.models.megadepth import MegaDepthHourglass
    return _time_mod(
        lambda: MegaDepthHourglass(),
        lambda r: np.asarray(r.rand(2, 256, 448, 3), np.float32))


STAGES = {
    "mononet": stage_mononet,
    "rectifier": stage_rectifier,
    "pwc": stage_pwc,
    "s2df": stage_s2df,
    "megadepth": stage_megadepth,
}


def main():
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        try:
            t = STAGES[name]()
            print(json.dumps({
                "stage": name,
                "f32_ms": round(t["float32"] * 1e3, 3),
                "bf16_ms": round(t["bfloat16"] * 1e3, 3),
                "speedup": round(t["float32"] / t["bfloat16"], 3)}),
                flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": name, "error":
                              f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
