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
  headline / headline_bf16
             the bench.py north-star config (DAIN mid-frame @448x256,
             ms/frame + fps) at f32 and with compute_dtype="bfloat16"
             (the fast-eval lane: convs in bf16, ops stay f32)
  bf16acc    accuracy bound of the bf16 lane vs f32 on synthetic-motion
             8-bit-grid frames with a known ground-truth middle frame
  hd1080     DAIN at full 1920x1088 on one chip
  batch      B=1/2/4 per-frame scaling of the headline config

Usage: python tools/bench_matrix.py [--out FILE] [config ...] (default: all)
Each config prints one JSON line; ``--out`` additionally records every row
into FILE as a JSON array stamped with the commit + session time, so the
matrix is machine-readable (VERDICT r3 item 3) and single-session (the
tunnel shifts ~10-20% between sessions, so only same-session rows compare).
Run ONE TPU process at a time.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

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


def _dain_pair_time(h, w, n1=10, n2=40, b=1, compute_dtype="float32"):
    import jax
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0, i2 = _frames(rng, b, h, w), _frames(rng, b, h, w)
    model = DAIN(filter_impl="slab8", compute_dtype=compute_dtype)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
    jax.block_until_ready(params)

    import jax.numpy as jnp

    def step(x):
        out = model.apply(params, x, i2)["outputs"][1]
        return jnp.where(jnp.isfinite(jnp.sum(out)),
                         jnp.roll(x, 7, axis=2), x)

    return device_time_slope(jax.jit(step), i0, n1=n1, n2=n2)


def bench_headline(compute_dtype="float32"):
    t = _dain_pair_time(256, 448, n1=30, n2=150,
                        compute_dtype=compute_dtype)
    suffix = "" if compute_dtype == "float32" else "_bf16"
    return {"metric": f"dain_headline_ms_per_frame_448x256{suffix}",
            "value": round(t * 1e3, 3), "unit": "ms/frame",
            "fps": round(1.0 / t, 2), "compute_dtype": compute_dtype}


def bench_batch_scaling():
    """B=1/2/4 per-frame scaling of the headline config (VERDICT r3 item 2:
    the B>1 per-frame regression)."""
    rows = {}
    for b in (1, 2, 4):
        t = _dain_pair_time(256, 448, n1=10, n2=40, b=b)
        rows[f"b{b}_ms_per_frame"] = round(t / b * 1e3, 3)
    return {"metric": "dain_batch_scaling_ms_per_frame_448x256",
            "value": rows["b4_ms_per_frame"], "unit": "ms/frame @B=4",
            **rows}


def bench_bf16_accuracy():
    """Accuracy bound of the bf16 fast-eval lane: max |bf16 - f32| model
    output deviation and the PSNR-vs-ground-truth delta, on synthetic-motion
    8-bit-grid frames (textured rigid translation; exact middle = half
    shift — the tools/make_synthetic_vimeo.py construction)."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.utils.metrics import psnr

    rng = np.random.RandomState(0)
    h, w = 256, 448
    # textured field, rigid shift by 8 px total -> gt middle = 4 px shift
    base = rng.rand(h, w + 16, 3)
    base = (base + np.roll(base, 3, 0) + np.roll(base, 7, 1)) / 3.0
    base = np.round(base * 255.0) / 255.0
    i0 = jnp.asarray(base[None, :, 0:w, :], jnp.float32)
    i2 = jnp.asarray(base[None, :, 8:w + 8, :], jnp.float32)
    gt = jnp.asarray(base[None, :, 4:w + 4, :], jnp.float32)

    outs = {}
    for dt in ("float32", "bfloat16"):
        model = DAIN(filter_impl="slab8", compute_dtype=dt)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), i0, i2)
        if _CKPT:   # trained weights (orbax train-state dir, params subtree)
            import orbax.checkpoint as ocp
            ck = ocp.PyTreeCheckpointer().restore(_CKPT)
            from vfidkr_tpu.training.checkpoint import filtered_partial_load
            src = ck.get("params", ck)
            params, loaded, _ = filtered_partial_load(
                jax.device_get(params), {"params": src})
            assert len(loaded) > 200, "checkpoint restore found few tensors"
        else:
            # tame raw random init x0.5 (the full-graph parity tests'
            # policy): untamed init explodes through the 7-conv rectifier
            # (~1000x amplification), which makes any precision bound
            # meaningless; trained rectifiers emit small residuals
            params = dict(params)
            params["params"] = jax.tree_util.tree_map(
                lambda x: x * 0.5, params["params"])
        raw = np.asarray(jax.jit(
            lambda p, a, b: model.apply(p, a, b)["outputs"][1]
        )(params, i0, i2))
        # the delivered output: every eval/demo driver clamps to [0,1] and
        # quantises to uint8 before writing (demo_MiddleBury.py:318-320
        # analog), so bound the CLAMPED image — unclamped random-init
        # rectifier outputs overshoot [0,1] by several units, which makes a
        # raw bound meaningless
        outs[dt] = np.clip(raw, 0.0, 1.0)
        outs[dt + "_raw"] = raw
    dev = float(np.abs(outs["bfloat16"] - outs["float32"]).max())
    dev_raw = float(
        np.abs(outs["bfloat16_raw"] - outs["float32_raw"]).max())
    p32 = float(psnr(jnp.asarray(outs["float32"]) * 255.0, gt * 255.0))
    p16 = float(psnr(jnp.asarray(outs["bfloat16"]) * 255.0, gt * 255.0))
    return {"metric": "bf16_eval_lane_accuracy_448x256",
            "value": round(dev, 6),
            "unit": "max |bf16-f32| clamped [0,1] output",
            "raw_dev": round(dev_raw, 6),
            "psnr_f32_db": round(p32, 4), "psnr_bf16_db": round(p16, 4),
            "psnr_delta_db": round(p16 - p32, 4),
            "note": "random-converted-init weights; no trained ckpt ships"}


def bench_middlebury():
    t = _dain_pair_time(512, 704)
    return {"metric": "dain_middlebury_pair_ms_704x512",
            "value": round(t * 1e3, 3), "unit": "ms/pair"}


def bench_hd():
    t = _dain_pair_time(768, 1280, n1=5, n2=20)
    return {"metric": "dain_hd_pair_ms_1280x768",
            "value": round(t * 1e3, 3), "unit": "ms/pair",
            "note": "≥720p on one chip; reference OOMs at 720p on 16GB"}


def bench_hd1080():
    t = _dain_pair_time(1088, 1920, n1=4, n2=16)
    return {"metric": "dain_hd_pair_ms_1920x1088",
            "value": round(t * 1e3, 3), "unit": "ms/pair"}


def bench_slowmotion(timestep, depth_impl="chained", steps_impl="unroll"):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models import DAINSlowMotion
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    h, w = 256, 448
    i0, i2 = _frames(rng, 1, h, w), _frames(rng, 1, h, w)
    model = DAINSlowMotion(timestep=timestep, depth_impl=depth_impl,
                           steps_impl=steps_impl)
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
    if steps_impl != "unroll":
        suffix += f"_{steps_impl}"
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
            "unit": "pairs/s (incl. host IO + PSNR/SSIM, batch 8, 512 pairs)",
            "avg_psnr": round(res["avg_psnr"], 3)}


CONFIGS = {
    "headline": bench_headline,
    "headline_bf16": lambda: bench_headline("bfloat16"),
    "bf16acc": bench_bf16_accuracy,
    "batch": bench_batch_scaling,
    "depth": bench_depth,
    "pwc": bench_pwc,
    "middlebury": bench_middlebury,
    "hd": bench_hd,
    "hd1080": bench_hd1080,
    "slowmotion4x": lambda: bench_slowmotion(0.25),
    "slowmotion8x": lambda: bench_slowmotion(0.125),
    "slowmotion4xp": lambda: bench_slowmotion(0.25, depth_impl="packed"),
    "slowmotion8xp": lambda: bench_slowmotion(0.125, depth_impl="packed"),
    "slowmotion4xp_scan": lambda: bench_slowmotion(
        0.25, depth_impl="packed", steps_impl="scan"),
    "slowmotion8xp_scan": lambda: bench_slowmotion(
        0.125, depth_impl="packed", steps_impl="scan"),
    "train": bench_train,
    "vimeo": bench_vimeo_sweep,
}


_CKPT = None


def main():
    global _CKPT
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        _CKPT = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    names = argv or list(CONFIGS)
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()   # steady-state timing unaffected (measured);
                                # repeat sessions skip the per-graph compiles
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    rows = []
    for name in names:
        try:
            row = CONFIGS[name]()
        except Exception as e:  # noqa: BLE001
            row = {"metric": name,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        row["config"] = name
        rows.append(row)
        print(json.dumps(row), flush=True)
        if out_path:    # write-through: a crash mid-matrix keeps prior rows
            with open(out_path, "w") as f:
                json.dump({"commit": commit, "session_start": _T0,
                           "rows": rows}, f, indent=1)


_T0 = time.strftime("%Y-%m-%dT%H:%M:%S")


if __name__ == "__main__":
    main()
