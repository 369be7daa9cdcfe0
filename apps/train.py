#!/usr/bin/env python
"""Training driver — TPU re-design of ``train.py``.

Mirrors the reference loop: Vimeo-90K triplets with balanced sampling,
Adamax with per-subnet LR groups, per-iteration Charbonnier pixel loss
(alpha-weighted across raw/rectified outputs), per-epoch validation with
PSNR, ReduceLROnPlateau on val loss, epoch checkpoints with previous-epoch
deletion + best-on-val, and metric rows appended to log.txt.

Data-parallel over every available chip via a 1-axis mesh (the TPU-native
replacement for the reference's single-GPU loop).

Usage:
  python apps/train.py --dataset-path /data/vimeo_triplet --save-path runs/x \
      [--batch-size 3] [--num-epochs 50] [--lr 2e-3] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-path", required=True)
    ap.add_argument("--save-path", required=True)
    ap.add_argument("--net-name", default="DAIN")
    ap.add_argument("--batch-size", type=int, default=3)
    ap.add_argument("--num-epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--rectify-lr", type=float, default=1e-3)
    ap.add_argument("--flow-lr-coe", type=float, default=0.01)
    ap.add_argument("--filter-lr-coe", type=float, default=1.0)
    ap.add_argument("--alpha", type=float, nargs=2, default=[0.0, 1.0])
    ap.add_argument("--epsilon", type=float, default=1e-6)
    ap.add_argument("--factor", type=float, default=0.2)
    ap.add_argument("--patience", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps-per-epoch", type=int, default=None,
                    help="override (default: len(train)/batch like reference)")
    ap.add_argument("--val-batches", type=int, default=None)
    ap.add_argument("--pretrained", default=None,
                    help="orbax params dir or torch .pth for fine-tuning")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest epoch checkpoint in "
                         "--save-path: restores the FULL train state "
                         "(params, Adamax state, plateau scheduler), appends "
                         "to log.txt, and keeps the best-val watermark "
                         "(the reference's --pretrained restart flow, "
                         "train.py:51-57, minus its lost optimizer state)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from vfidkr_tpu.config import ModelConfig
    from vfidkr_tpu.data import Vimeo90KDataset, prefetch, vimeo90k_splits
    from vfidkr_tpu.parallel import create_mesh, replicate, shard_batch
    from vfidkr_tpu.training import (TrainConfig, create_train_state,
                                     eval_step, plateau_step, train_step)
    from vfidkr_tpu.training.checkpoint import (CheckpointManager,
                                                filtered_partial_load)

    os.makedirs(args.save_path, exist_ok=True)
    with open(os.path.join(args.save_path, "args.txt"), "w") as f:
        json.dump(vars(args), f, indent=2)
    log_path = os.path.join(args.save_path, "log.txt")
    if not args.resume:
        open(log_path, "w").close()

    # tensorboard scalars (Train/Loss, Test/Loss, Test/PSNR — the reference's
    # tensorboardX tags, train.py:209,274-275); optional
    try:
        from flax.metrics import tensorboard as _tb
        tb = _tb.SummaryWriter(os.path.join(args.save_path, "tb"))
    except Exception:
        tb = None

    config = TrainConfig(
        lr=args.lr, rectify_lr=args.rectify_lr,
        flow_lr_coe=args.flow_lr_coe, filter_lr_coe=args.filter_lr_coe,
        alpha=tuple(args.alpha), epsilon=args.epsilon,
        batch_size=args.batch_size, num_epochs=args.num_epochs,
        factor=args.factor, patience=args.patience)

    # training keeps the ModelConfig defaults: filter_impl="slab" (exact on
    # any f32 input) and f32 convs (the reference training precision).
    # pwc_batch_chunk=None: measured round 5 — the chunked PWC BACKWARD is
    # worse (91.5 vs 68.0 ms), so training stays unchunked.
    # dense_impl="split": the PWC dense-block backward with concat buffers
    # is the train step's biggest stage (59 ms); split-weight evaluation
    # (identical MACs, f32-reassociation-identical) cuts it 2.5x
    # (tools/ubench_trainstep.py pwc_bwd/pwc_bwd_split; step A/B in
    # BASELINE.md).
    model = ModelConfig(net_name=args.net_name, pwc_batch_chunk=None,
                        dense_impl="split").build()
    train_paths, test_paths = vimeo90k_splits(args.dataset_path)
    train_ds = Vimeo90KDataset(args.dataset_path, train_paths,
                               args.batch_size, augment=True, seed=args.seed)
    val_ds = Vimeo90KDataset(args.dataset_path, test_paths, args.batch_size,
                             augment=False, seed=args.seed)
    print(f"{len(train_ds) + len(val_ds)} samples found, {len(train_ds)} "
          f"train samples and {len(val_ds)} test samples")

    mesh = create_mesh()
    sample = next(train_ds.batches(1))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    state, tx = create_train_state(model, jax.random.PRNGKey(args.seed),
                                   sample, config)

    if args.pretrained:
        if args.pretrained.endswith((".pth", ".tar")):
            from vfidkr_tpu.convert import (convert_dain_state_dict,
                                            load_torch_state_dict)
            ck = convert_dain_state_dict(load_torch_state_dict(args.pretrained))
            merged, loaded, _ = filtered_partial_load(
                {"params": jax.device_get(state.params)}, ck)
            state = state.replace(params=merged["params"])
            print(f"fine-tuning: loaded {len(loaded)} tensors from "
                  f"{args.pretrained}")
        else:
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.pretrained), jax.device_get(state))
            state = restored

    ckpt = CheckpointManager(args.save_path)
    best_val = float("inf")
    rows = []
    start_epoch = 0
    if args.resume:
        last = ckpt.latest_epoch()
        if last is None:
            print("--resume: no epoch checkpoint found, starting fresh")
        else:
            state = ckpt.restore(f"epoch{last}", jax.device_get(state))
            start_epoch = last + 1
            if os.path.exists(log_path) and os.path.getsize(log_path) > 0:
                prior = np.loadtxt(log_path, delimiter=",", ndmin=2)
                rows = [list(r) for r in prior if int(r[0]) <= last]
                if rows:
                    best_val = min(r[3] for r in rows)
                # epoch{last} was checkpointed BEFORE its validation ran, so
                # the restored plateau state has not seen epoch last's val
                # loss; replay it from log.txt so each resume doesn't extend
                # the plateau patience by one epoch vs an uninterrupted run
                last_row = next((r for r in rows if int(r[0]) == last), None)
                if last_row is not None:
                    state = state.replace(plateau=plateau_step(
                        state.plateau, last_row[3], factor=config.factor,
                        patience=config.patience))
            print(f"resumed from epoch{last} (next epoch {start_epoch}, "
                  f"best val {best_val:.5f}, lr scale "
                  f"{float(state.plateau.scale):.4f})")

    state = replicate(state, mesh)
    jit_train = jax.jit(lambda s, b: train_step(model, tx, s, b, config))
    jit_eval = jax.jit(lambda s, b: eval_step(model, s, b, config))

    steps = args.steps_per_epoch or train_ds.steps_per_epoch()
    val_steps = args.val_batches or val_ds.steps_per_epoch()

    for epoch in range(start_epoch, args.num_epochs):
        t0 = time.time()
        train_losses = []
        it = prefetch(train_ds.batches(steps), 2)
        for i, batch in enumerate(it):
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                                mesh)
            state, metrics = jit_train(state, batch)
            train_losses.append(float(metrics["total"]))
            if i % max(1, steps // 50) == 0:
                print(f"Ep [{epoch}/{i}] lr_scale "
                      f"{float(state.plateau.scale):.4f} "
                      f"Pix {[round(float(x), 5) for x in np.asarray(metrics['pixel'])]} "
                      f"TV {float(metrics['tv']):.4f} "
                      f"Sym {float(metrics['sym']):.4f} "
                      f"Total {float(metrics['total']):.5f}")
        train_avg = float(np.mean(train_losses)) if train_losses else 0.0
        print(f"***** epoch {epoch} took {time.time() - t0:.1f}s *****")

        ckpt.save_epoch(epoch, state)

        vals, psnrs = [], []
        for batch in prefetch(val_ds.batches(val_steps, sequential=True), 2):
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                                mesh)
            m = jit_eval(state, batch)
            vals.append(float(m["total"]))
            psnrs.append(float(m["psnr"]))
        val_avg = float(np.mean(vals)) if vals else 0.0
        psnr_avg = float(np.mean(psnrs)) if psnrs else 0.0
        print(f"Epoch {epoch}\tAvg Train {train_avg:.5f}\tVal {val_avg:.5f}\t"
              f"PSNR {psnr_avg:.5f}")

        rows.append([epoch, float(state.plateau.scale), train_avg, val_avg,
                     psnr_avg])
        np.savetxt(log_path, np.asarray(rows), fmt="%.8f", delimiter=",")
        if tb is not None:
            tb.scalar("Train/Loss", round(train_avg, 5), epoch)
            tb.scalar("Test/Loss", round(val_avg, 5), epoch)
            tb.scalar("Test/PSNR", round(psnr_avg, 5), epoch)
            tb.flush()

        if val_avg <= best_val:
            best_val = val_avg
            ckpt.save_best(state)
            print("\t\tBest weights updated for decreased validation loss")

        state = state.replace(plateau=plateau_step(
            state.plateau, val_avg, factor=config.factor,
            patience=config.patience))

    print("*********Finish Training********")


if __name__ == "__main__":
    main()
