#!/usr/bin/env python
"""Full benchmark matrix — measured (slope-timer) device times for every
driver config in BASELINE.json, not just the headline DAIN@448x256 that
bench.py reports (VERDICT r2 item 2).

Configs (reference analogues):
  depth      MegaDepth hourglass depth forward, one frame pair
             (DAIN_slowmotion.py:128-130 runs it as a batch-2 call)
  pwc        PWC-Net bidirectional flow on a single pair (PWCNet.py:209-320)
  middlebury full DAIN mid-frame synthesis at the padded MiddleBury shape
             704x512 (demo_MiddleBury.py:294-312 pads to 128-multiples)
  slowmotion DAIN_slowmotion 4x (t=0.25, 3 frames/pair) and 8x (t=0.125,
             7 frames/pair) at 448x256 (colab_interpolate.py config)
  hd         DAIN at 1280x768 (≥720p; the reference's Colab OOM wall is
             720p on 16 GB — Colab_DAIN.ipynb)
  train      DAIN training step (fwd+bwd+Adamax update) at batch 3,
             448x256 f32 (train.py:178-207 protocol)

Usage: python tools/bench_matrix.py [config ...]   (default: all)
Each config prints one JSON line; run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def _frames(rng, b, h, w, q8=True):
    import jax.numpy as jnp
    x = rng.rand(b, h, w, 3)
    if q8:
        x = np.round(x * 255.0) / 255.0
    return jnp.asarray(x, jnp.float32)


def bench_depth():
    import jax
    from vfidkr_tpu.models.megadepth import MegaDepthHourglass
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = _frames(rng, 2, 256, 448)      # both frames as one batch-2 call
    model = MegaDepthHourglass()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(params)

    def step(x):
        d = model.apply(params, x)
        return x + 1e-6 * d            # feedback keeps iterations sequential

    t = device_time_slope(jax.jit(step), x, n1=20, n2=80)
    return {"metric": "megadepth_depth_forward_pair_ms_448x256",
            "value": round(t * 1e3, 3), "unit": "ms/pair"}


def bench_pwc():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = _frames(rng, 1, 256, 448)
    i2 = _frames(rng, 1, 256, 448)
    model = PWCDCNet()
    params = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")
    jax.block_until_ready(params)

    def step(x):
        f, b = model.apply(params, x, i2, method="bidirectional")
        return x + 1e-3 * jnp.pad(
            jnp.concatenate([f, b], axis=-1),
            ((0, 0), (0, x.shape[1] - f.shape[1]),
             (0, x.shape[2] - f.shape[2]), (0, 0)))[..., :3]

    t = device_time_slope(jax.jit(step), i0, n1=20, n2=80)
    return {"metric": "pwc_bidirectional_flow_pair_ms_448x256",
            "value": round(t * 1e3, 3), "unit": "ms/pair"}


def _dain_pair_time(h, w, n1=10, n2=40):
    import jax
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0, i2 = _frames(rng, 1, h, w), _frames(rng, 1, h, w)
    model = DAIN(filter_impl="slab8")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
    jax.block_until_ready(params)

    import jax.numpy as jnp

    def step(x):
        out = model.apply(params, x, i2)["outputs"][1]
        return jnp.where(jnp.isfinite(jnp.sum(out)),
                         jnp.roll(x, 7, axis=2), x)

    return device_time_slope(jax.jit(step), i0, n1=n1, n2=n2)


def bench_middlebury():
    t = _dain_pair_time(512, 704)
    return {"metric": "dain_middlebury_pair_ms_704x512",
            "value": round(t * 1e3, 3), "unit": "ms/pair"}


def bench_hd():
    t = _dain_pair_time(768, 1280, n1=5, n2=20)
    return {"metric": "dain_hd_pair_ms_1280x768",
            "value": round(t * 1e3, 3), "unit": "ms/pair",
            "note": "≥720p on one chip; reference OOMs at 720p on 16GB"}


def bench_slowmotion(timestep, depth_impl="chained"):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAINSlowMotion
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    h, w = 256, 448
    i0, i2 = _frames(rng, 1, h, w), _frames(rng, 1, h, w)
    model = DAINSlowMotion(timestep=timestep, depth_impl=depth_impl)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
    jax.block_until_ready(params)
    if depth_impl == "packed":
        from vfidkr_tpu.models.megadepth import prepack_megadepth
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["depth_net"] = jax.device_get(jax.jit(
            prepack_megadepth)(params["params"]["depth_net"]))
    nf = int(round(1.0 / timestep)) - 1

    def step(x):
        outs = model.apply(params, x, i2)["outputs"][1]
        s = sum(jnp.sum(o) for o in outs)
        return jnp.where(jnp.isfinite(s), jnp.roll(x, 7, axis=2), x)

    t = device_time_slope(jax.jit(step), i0, n1=5, n2=20)
    mult = int(round(1.0 / timestep))
    suffix = "" if depth_impl == "chained" else f"_{depth_impl}depth"
    return {"metric": f"dain_slowmotion_{mult}x_pair_ms_448x256{suffix}",
            "value": round(t * 1e3, 3), "unit": "ms/pair",
            "frames_per_sec": round(nf / t, 2)}


def bench_train():
    import jax
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.training import TrainConfig, create_train_state, train_step
    from vfidkr_tpu.utils.profiling import device_time_slope

    cfg = TrainConfig()
    rng = np.random.RandomState(0)
    b, h, w = 3, 256, 448
    model = DAIN()
    batch = {"x0": _frames(rng, b, h, w, q8=False),
             "y": _frames(rng, b, h, w, q8=False),
             "x1": _frames(rng, b, h, w, q8=False)}
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
    jax.block_until_ready(state.params)

    # feedback through the evolving optimizer state: carry the full train
    # state so every scan iteration is a real, sequential optimizer step
    def step(state):
        new_state, _ = train_step(model, tx, state, batch, cfg)
        return new_state

    t = device_time_slope(jax.jit(step), state, n1=3, n2=12)
    return {"metric": "dain_train_step_ms_b3_448x256",
            "value": round(t * 1e3, 3), "unit": "ms/step",
            "steps_per_sec": round(1.0 / t, 2)}


def bench_vimeo_sweep():
    """End-to-end Vimeo test-split sweep (apps/eval_vimeo.py, the
    demo_test_ourdata.py protocol): fps INCLUDING host IO and metric
    computation.  Uses the synthetic-motion dataset (no real Vimeo-90K
    ships in this environment)."""
    import os
    import subprocess

    root = "/tmp/vimeo_syn_512"
    if not os.path.isdir(root):
        subprocess.run([sys.executable, "tools/make_synthetic_vimeo.py",
                        "--out", root, "--n", "512"], check=True)
    out = subprocess.run(
        [sys.executable, "apps/eval_vimeo.py", "--dataset-path", root,
         "--batch-size", "8"],
        check=True, capture_output=True, text=True).stdout
    res = json.loads(out.strip().splitlines()[-1])
    return {"metric": "vimeo_sweep_pairs_per_sec_e2e",
            "value": round(res["pairs_per_sec"], 3),
            "unit": "pairs/s (incl. host IO + PSNR/SSIM, batch 8, 64 pairs)",
            "avg_psnr": round(res["avg_psnr"], 3)}


CONFIGS = {
    "depth": bench_depth,
    "pwc": bench_pwc,
    "middlebury": bench_middlebury,
    "hd": bench_hd,
    "slowmotion4x": lambda: bench_slowmotion(0.25),
    "slowmotion8x": lambda: bench_slowmotion(0.125),
    "slowmotion4xp": lambda: bench_slowmotion(0.25, depth_impl="packed"),
    "slowmotion8xp": lambda: bench_slowmotion(0.125, depth_impl="packed"),
    "train": bench_train,
    "vimeo": bench_vimeo_sweep,
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        try:
            print(json.dumps(CONFIGS[name]()), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": name, "error":
                              f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
