#!/usr/bin/env python
"""Trained-weight PSNR parity vs the (emulated) torch reference.

Closes the parity loop that a vendored ``best.pth`` would have provided
(none ships in this environment — the reference downloads it at runtime,
Colab_DAIN.ipynb wget cell): train our DAIN on a synthetic-motion
Vimeo-layout set to a non-trivial PSNR, export the trained weights into the
reference state_dict layout (``convert.invert_dain_state_dict``), load them
into the actual reference ``networks/DAIN.py`` running on CPU with its CUDA
ops emulated (tests/ref_emu.py), and compare the eval-protocol PSNR
(demo_test_ourdata.py:334-345: rectified output, clip, round-to-uint8, MSE
PSNR) over the held-out pairs.  North-star gate: |delta| <= 0.05 dB.

Run on CPU (the torch side is CPU anyway):
  JAX_PLATFORMS=cpu python tools/trained_parity.py --steps 150
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def psnr_uint8(out01: np.ndarray, gt01: np.ndarray) -> float:
    """The reference eval protocol (demo_test_ourdata.py:334-352): saved
    uint8 frame vs ground-truth uint8 frame, MSE PSNR."""
    rec = np.round(np.clip(out01, 0.0, 1.0) * 255.0)
    gt = np.round(np.clip(gt01, 0.0, 1.0) * 255.0)
    mse = float(np.mean((rec - gt) ** 2))
    return 20.0 * math.log10(255.0 / math.sqrt(max(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/trained_parity")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-pairs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vfidkr_tpu.config import ModelConfig
    from vfidkr_tpu.convert import invert_dain_state_dict
    from vfidkr_tpu.data import Vimeo90KDataset, vimeo90k_splits
    from vfidkr_tpu.training import (TrainConfig, create_train_state,
                                     train_step)

    root = os.path.join(args.work_dir, "vimeo_syn")
    if not os.path.exists(os.path.join(root, "tri_trainlist.txt")):
        subprocess.run(
            [sys.executable, "tools/make_synthetic_vimeo.py", "--out", root,
             "--n", str(args.n), "--height", str(args.height),
             "--width", str(args.width), "--seed", str(args.seed)],
            check=True)

    train_paths, test_paths = vimeo90k_splits(root)
    hw = (args.height, args.width)
    train_ds = Vimeo90KDataset(root, train_paths, args.batch_size,
                               augment=True, seed=args.seed, crop_hw=hw)
    test_ds = Vimeo90KDataset(root, test_paths, 1, augment=False, crop_hw=hw)

    config = TrainConfig(lr=args.lr, batch_size=args.batch_size)
    model = ModelConfig(net_name="DAIN", pwc_batch_chunk=None).build()
    sample = next(train_ds.batches(1))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    state, tx = create_train_state(model, jax.random.PRNGKey(args.seed),
                                   sample, config)
    jit_train = jax.jit(lambda s, b: train_step(model, tx, s, b, config))

    t0 = time.time()
    for i, batch in enumerate(train_ds.batches(args.steps)):
        state, metrics = jit_train(
            state, {k: jnp.asarray(v) for k, v in batch.items()})
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i}: total {float(metrics['total']):.5f} "
                  f"psnr {float(metrics['psnr']):.2f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    train_psnr = float(metrics["psnr"])

    # ---- eval protocol, our framework (rectified output, eval mode)
    params = jax.device_get(state.params)
    apply = jax.jit(lambda p, x0, x1: model.apply(
        {"params": p}, x0, x1)["outputs"][1])
    pairs = [test_ds._make_batch([i])
             for i in range(min(args.eval_pairs, len(test_ds.paths)))]
    ours = []
    for b in pairs:
        out = np.asarray(apply(params, jnp.asarray(b["x0"]),
                               jnp.asarray(b["x1"])))
        ours.append(psnr_uint8(out[0], b["y"][0]))

    # ---- same weights inside the actual reference graph (emulated CUDA ops)
    import torch
    import ref_emu
    with ref_emu.reference_env():
        ref = ref_emu.load_reference_model("DAIN", training=False)
        ref = ref.eval()
        ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        exported, missing = invert_dain_state_dict({"params": params}, ref_sd)
        print(f"exported {len(exported)} tensors "
              f"({len(missing)} reference keys unmapped: {missing[:4]})",
              file=sys.stderr)
        merged = {k: torch.from_numpy(exported.get(k, np.asarray(v)))
                  for k, v in ref_sd.items()}
        ref.load_state_dict(merged)
        theirs = []
        with torch.no_grad():
            for b in pairs:
                x0 = torch.from_numpy(b["x0"].transpose(0, 3, 1, 2))
                x1 = torch.from_numpy(b["x1"].transpose(0, 3, 1, 2))
                outs, _, _ = ref(torch.stack([x0, x1]))
                out = outs[1].numpy().transpose(0, 2, 3, 1)
                theirs.append(psnr_uint8(out[0], b["y"][0]))

    result = {
        "train_psnr_last": train_psnr,
        "psnr_ours": float(np.mean(ours)),
        "psnr_ref": float(np.mean(theirs)),
        "delta_db": float(abs(np.mean(ours) - np.mean(theirs))),
        "per_pair_ours": ours,
        "per_pair_ref": theirs,
        "pairs": len(pairs),
        "steps": args.steps,
    }
    print(json.dumps(result))
    return 0 if result["delta_db"] <= 0.05 else 2


if __name__ == "__main__":
    sys.exit(main())
