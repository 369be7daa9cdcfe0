#!/usr/bin/env python
"""Vimeo-90K test-split PSNR/SSIM sweep — TPU re-design of
``demo_test_ourdata.py`` (same metrics/averaging, :364-388), batched and
jitted once instead of per-pair host loops.

Usage:
  python apps/eval_vimeo.py --dataset-path /data/vimeo_triplet \
      [--checkpoint model_weights/best] [--torch-checkpoint best.pth] \
      [--batch-size 1] [--save-which 1] [--limit N]
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
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--torch-checkpoint", default=None,
                    help="reference .pth to convert and evaluate")
    # Default matches the measured-fastest END-TO-END batch point on the
    # tunnelled v5e: B=8 sweeps 11.4 pairs/s vs 9.4 at B=1 (each jit
    # dispatch costs ~144 ms of tunnel round-trip latency, which batching
    # amortises).  Pure DEVICE time per frame is still best at B=1
    # (9.5 vs 13.1 ms/frame at B=4, BASELINE.md "batch scaling") — on a
    # directly-attached chip prefer --batch-size 1.
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--save-which", type=int, default=1,
                    help="0: blended output, 1: rectified (my_args.py default)")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap the number of eval BATCHES (of --batch-size "
                         "pairs each), not pairs")
    ap.add_argument("--out-dir", default=None,
                    help="save each interpolated frame as "
                         "<out-dir>/<seq>/output-im2.png (the reference's "
                         "per-pair save, demo_test_ourdata.py:256,334); "
                         "costs one device->host frame fetch per batch")
    from vfidkr_tpu.config import ModelConfig, add_model_flags
    add_model_flags(ap)   # --filter-impl (slab8) / --compute-dtype / ...
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from vfidkr_tpu.data import Vimeo90KDataset, prefetch, vimeo90k_splits
    from vfidkr_tpu.utils import (pad_to_multiple, psnr_per_image,
                                  ssim_per_image, unpad)

    # PNG-decoded frames sit on the 8-bit grid (default --filter-impl slab8);
    # --compute-dtype bfloat16 selects the fast-eval lane (BASELINE.md row)
    model = ModelConfig.from_args(args, net_name="DAIN").build()
    _, test_paths = vimeo90k_splits(args.dataset_path)
    ds = Vimeo90KDataset(args.dataset_path, test_paths, args.batch_size,
                         augment=False)

    rng = np.random.RandomState(0)
    sample_raw = jnp.asarray(rng.rand(args.batch_size, 256, 448, 3), jnp.float32)
    sample, _ = pad_to_multiple(sample_raw)   # reference eval pads to 320x512
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)

    if args.torch_checkpoint:
        from vfidkr_tpu.convert import convert_dain_state_dict, load_torch_state_dict
        from vfidkr_tpu.training.checkpoint import filtered_partial_load
        ck = convert_dain_state_dict(load_torch_state_dict(args.torch_checkpoint))
        params, loaded, skipped = filtered_partial_load(
            jax.device_get(params), ck)
        print(f"converted torch checkpoint: {len(loaded)} tensors loaded, "
              f"{len(skipped)} skipped", file=sys.stderr)
        params = jax.device_put(params)
    elif args.checkpoint:
        import orbax.checkpoint as ocp
        params = ocp.StandardCheckpointer().restore(
            args.checkpoint, jax.device_get(params))
        params = jax.device_put(params)

    which = args.save_which

    @jax.jit
    def step(params, x0, x1, y):
        # replication padding + crop, matching demo_test_ourdata.py:273-291
        x0p, pads = pad_to_multiple(x0)
        x1p, _ = pad_to_multiple(x1)
        out = model.apply(params, x0p, x1p)["outputs"][which]
        out = jnp.clip(unpad(out, pads), 0.0, 1.0)
        # the reference's metrics run on the SAVED uint8 frame re-read from
        # disk (demo_test_ourdata.py:334-345): round(out*255) IS that frame,
        # so computing on it in-graph is bit-identical to the re-read —
        # incl. the interpolation error IE = mean |rec - gt| (:341-345)
        out_u8 = jnp.round(out * 255.0)
        gt_u8 = jnp.round(y * 255.0)
        ie = jnp.mean(jnp.abs(out_u8 - gt_u8), axis=(1, 2, 3))
        return (psnr_per_image(out_u8, gt_u8),
                ssim_per_image(out_u8 / 255.0, gt_u8 / 255.0), ie,
                out_u8.astype(jnp.uint8))

    B = args.batch_size
    n_batches = (args.limit if args.limit is not None
                 else -(-len(ds.paths) // B))   # ceil: incl. remainder batch
    psnrs, ssims, ies = [], [], []
    if args.out_dir:
        from PIL import Image
        os.makedirs(args.out_dir, exist_ok=True)
    # warm the jit outside the timed loop (the reference protocol times
    # per-pair work after model build, demo_test_ourdata.py:251-333; the
    # one-time XLA compile is minutes and would swamp a short sweep)
    z = jnp.zeros((B, 256, 448, 3), jnp.float32)
    jax.block_until_ready(step(params, z, z, z))

    def batches_with_remainder():
        # sequential=True stops before a partial batch; the reference
        # protocol covers the FULL split (demo_test_ourdata.py:244-248), so
        # pad the trailing len%B pairs to a full batch by repeating the last
        # pair (jit shape reuse) and yield a validity count to mask with.
        yield from ((b, B) for b in ds.batches(sequential=True))
        rem = len(ds.paths) % B
        if rem:
            n = len(ds.paths)
            idxs = list(range(n - rem, n)) + [n - 1] * (B - rem)
            yield ds._make_batch(idxs), rem

    done = 0
    t0 = time.time()
    for batch, valid in prefetch(batches_with_remainder(), 2):
        if done >= n_batches:
            break
        p, s, e, frames = step(params, jnp.asarray(batch["x0"]),
                               jnp.asarray(batch["x1"]),
                               jnp.asarray(batch["y"]))
        # keep metrics on device — a float() here would cost a ~35-40 ms
        # tunnel round trip PER BATCH; everything syncs once after the loop
        psnrs.append(p[:valid])
        ssims.append(s[:valid])
        ies.append(e[:valid])
        if args.out_dir:
            # reference layout: <gen_dir>/<seq>/output-im2.png
            # (demo_test_ourdata.py:256)
            host = np.asarray(frames[:valid])
            for j in range(valid):
                rel = ds.paths[done * B + j]
                seq_dir = os.path.join(args.out_dir, rel)
                os.makedirs(seq_dir, exist_ok=True)
                Image.fromarray(host[j]).save(
                    os.path.join(seq_dir, "output-im2.png"))
        done += 1
        if done % 200 == 0:
            print(f"[{done}/{n_batches}]", file=sys.stderr)
    psnrs = np.concatenate([np.asarray(p) for p in psnrs])
    ssims = np.concatenate([np.asarray(s) for s in ssims])
    ies = np.concatenate([np.asarray(e) for e in ies])
    dt = time.time() - t0

    result = {
        "avg_psnr": float(np.mean(psnrs)),
        "avg_ssim": float(np.mean(ssims)),
        "avg_ie": float(np.mean(ies)),
        "pairs": int(psnrs.shape[0]),
        "pairs_per_sec": psnrs.shape[0] / dt,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
