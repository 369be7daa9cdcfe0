#!/usr/bin/env python
"""Triplet-directory eval (UCF/MiddleBury-style) — TPU re-design of
``demo_MiddleBury.py``: iterate directories containing a frame pair + ground
truth, pad each frame with replication padding to a 128-multiple (>=32 per
side, :294-312), synthesise the mid frame, unpad, save PNG, and accumulate
IE / PSNR / SSIM (:364-397).

Directory layout (reference UCF config, :254-266):
    <root>/<seq>/im2.png  <root>/<seq>/im4.png  -> predict <seq>/im3.png
Use --first/--second/--gt to change filenames (e.g. frame10/frame11 pairs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--first", default="im2.png")
    ap.add_argument("--second", default="im4.png")
    ap.add_argument("--gt", default="im3.png")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--torch-checkpoint", default=None)
    ap.add_argument("--save-which", type=int, default=1)
    ap.add_argument("--measure-time", action="store_true",
                    help="measure honest per-pair device time (compiles a "
                         "feedback scan; adds ~2-3 min of compile)")
    from vfidkr_tpu.config import ModelConfig, add_model_flags
    add_model_flags(ap)   # --filter-impl (slab8) / --compute-dtype / ...
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from PIL import Image
    from vfidkr_tpu.utils import (interpolation_error, pad_to_multiple, psnr,
                                  ssim, unpad)

    # PNG-decoded frames sit on the 8-bit grid (default --filter-impl slab8);
    # --compute-dtype bfloat16 selects the fast-eval lane (BASELINE.md row)
    model = ModelConfig.from_args(args, net_name="DAIN").build()
    params = None
    # one jitted function; jax.jit caches one compilation per padded shape
    fwd = jax.jit(
        lambda p, a, b: model.apply(p, a, b)["outputs"][args.save_which])

    seqs = sorted(d for d in os.listdir(args.root)
                  if os.path.isdir(os.path.join(args.root, d)))
    ies, psnrs, ssims, times = [], [], [], {}   # times keyed by padded shape

    for seq in seqs:
        def load(name):
            with Image.open(os.path.join(args.root, seq, name)) as im:
                return np.asarray(im.convert("RGB"), np.float32)[None] / 255.0

        x0, x1, gt = load(args.first), load(args.second), load(args.gt)
        x0p, pads = pad_to_multiple(jnp.asarray(x0))
        x1p, _ = pad_to_multiple(jnp.asarray(x1))

        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x0p, x1p)
            if args.torch_checkpoint:
                from vfidkr_tpu.convert import (convert_dain_state_dict,
                                                load_torch_state_dict)
                from vfidkr_tpu.training.checkpoint import filtered_partial_load
                ck = convert_dain_state_dict(
                    load_torch_state_dict(args.torch_checkpoint))
                params, loaded, skipped = filtered_partial_load(
                    jax.device_get(params), ck)
                print(f"loaded {len(loaded)} tensors ({len(skipped)} skipped)",
                      file=sys.stderr)
                params = jax.device_put(params)
            elif args.checkpoint:
                import orbax.checkpoint as ocp
                params = jax.device_put(ocp.StandardCheckpointer().restore(
                    args.checkpoint, jax.device_get(params)))

        if args.measure_time and x0p.shape not in times:
            # Honest device timing, measured once per padded shape: a feedback
            # scan + device_get (utils.profiling.device_time) — wall-clock
            # around block_until_ready under-reports >100x on tunnelled TPU
            # runtimes (see CLAUDE.md timing rule).
            from vfidkr_tpu.utils.profiling import device_time
            times[x0p.shape] = device_time(lambda a: fwd(params, a, x1p), x0p)
        out = unpad(fwd(params, x0p, x1p), pads)
        out = jnp.clip(out, 0.0, 1.0)

        out255 = jnp.round(out * 255.0)
        gt255 = jnp.round(jnp.asarray(gt) * 255.0)
        ies.append(float(interpolation_error(out255, gt255)))
        psnrs.append(float(psnr(out255, gt255)))
        ssims.append(float(ssim(out, jnp.asarray(gt))))

        if args.out_dir:
            os.makedirs(os.path.join(args.out_dir, seq), exist_ok=True)
            Image.fromarray(np.asarray(out255[0], np.uint8)).save(
                os.path.join(args.out_dir, seq, args.gt))
        print(f"{seq}: IE {ies[-1]:.4f} PSNR {psnrs[-1]:.4f} "
              f"SSIM {ssims[-1]:.5f}", file=sys.stderr)

    print(json.dumps({
        "avg_ie": float(np.mean(ies)),
        "avg_psnr": float(np.mean(psnrs)),
        "avg_ssim": float(np.mean(ssims)),
        "device_time_per_pair_s": (float(np.mean(list(times.values())))
                                   if times else None),
        "sequences": len(seqs),
    }))


if __name__ == "__main__":
    main()
