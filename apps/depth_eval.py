#!/usr/bin/env python
"""Standalone depth-estimation evaluation of the MegaDepth hourglass —
TPU re-design of the reference's depth-eval drivers
(``MegaDepth/rmse_error_main.py:1-67`` for the scale-invariant RMSE and
``MegaDepth/SDR_compute.py`` for the ordinal SDR error), using the metric
math in ``vfidkr_tpu.utils.depth_eval`` (``MegaDepth/models/HG_model.py:
50-166``).

Dataset layout (the reference reads MegaDepth_v1 image paths + h5 depth
targets via pickled lists, ``MegaDepth/data/image_folder.py:20-93``; this
driver uses the same per-sample payloads under one directory):

  <data-root>/<name>.png (or .jpg)   RGB (or grayscale) image
  <data-root>/<name>.h5              h5 with dataset "/depth" (float, m)
  <data-root>/<name>.sdr.npz         optional SfM ordinal pairs with int
                                     arrays xA, yA, xB, yB and gt in
                                     {-1, 0, 1} (image_folder.ImageFolder_TEST)

Per-sample preprocessing replicates ``image_folder.load_MD`` (:54-93):
image /255 resized bilinearly to (H, W); depth clamped to its [1, 98]
valid-pixel percentiles (values outside -> 0) when >10 valid pixels,
resized with nearest-neighbour, mask = depth > 1e-8, and gt where the mask
is off set to 1.0 (:109).  si-RMSE runs on log(gt) over the mask
(rmse_error_main.py:42); SDR classifies exp(log_pred) ratios at threshold
1.1 (HG_model.batch_classify:50-85).

Usage:
  python apps/depth_eval.py --data-root /data/md_eval \
      [--torch-checkpoint best.pth] [--checkpoint orbax_dir] \
      [--input-height 256 --input-width 320] [--limit N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def _resize(img: np.ndarray, hw, nearest: bool = False) -> np.ndarray:
    """PIL-backed resize (the reference uses skimage, unavailable here;
    bilinear/nearest order semantics match)."""
    from PIL import Image
    h, w = hw
    mode = Image.NEAREST if nearest else Image.BILINEAR
    if img.ndim == 2:
        return np.asarray(Image.fromarray(img).resize((w, h), mode))
    chans = [np.asarray(Image.fromarray(img[..., c]).resize((w, h), mode))
             for c in range(img.shape[-1])]
    return np.stack(chans, axis=-1)


def load_sample(img_path: str, h5_path: str, hw) -> tuple:
    """image_folder.load_MD (:54-93) + the gt fill at :109."""
    import h5py
    from PIL import Image

    with Image.open(img_path) as im:
        img = np.asarray(im, dtype=np.float32) / 255.0
    img = _resize(img, hw)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3].astype(np.float32)

    with h5py.File(h5_path, "r") as f:
        gt = np.asarray(f["/depth"], dtype=np.float32)

    valid = gt > 1e-8
    if np.sum(valid) > 10:
        hi = np.percentile(gt[valid], 98)
        lo = np.percentile(gt[valid], 1)
        gt = np.where(gt > hi, 0.0, gt)
        gt = np.where(gt < lo, 0.0, gt)
    max_depth = np.max(gt) + 1e-9
    gt = _resize((gt / max_depth).astype(np.float32), hw,
                 nearest=True) * max_depth
    mask = (gt > 1e-8).astype(np.float32)
    gt = np.where(mask < 0.1, 1.0, gt)           # image_folder.py:109
    return img, gt.astype(np.float32), mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--torch-checkpoint", default=None,
                    help="reference .pth: a bare MegaDepth checkpoint "
                         "(module.-prefixed, HG_model.py:39) or a full "
                         "DAIN_slowmotion state_dict (depthNet.* keys)")
    ap.add_argument("--checkpoint", default=None, help="orbax variables dir")
    # the reference evaluates 240x320 / 320x240 buckets
    # (rmse_error_main.py:12-24); our hourglass needs /32-divisible frames,
    # so the default bucket is the nearest divisible one
    ap.add_argument("--input-height", type=int, default=256)
    ap.add_argument("--input-width", type=int, default=320)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from vfidkr_tpu.models.megadepth import MegaDepthHourglass
    from vfidkr_tpu.utils.depth_eval import scale_invariant_rmse, sdr_counts

    imgs = sorted(p for ext in ("png", "jpg", "jpeg")
                  for p in glob.glob(os.path.join(args.data_root, f"*.{ext}")))
    samples = []
    for p in imgs:
        stem = os.path.splitext(p)[0]
        if os.path.exists(stem + ".h5") or os.path.exists(stem + ".sdr.npz"):
            samples.append((p, stem))
    if args.limit:
        samples = samples[:args.limit]
    if not samples:
        print(json.dumps({"error": "no <name>.{png,jpg}+<name>.h5 pairs "
                          f"under {args.data_root}"}))
        return 1

    hw = (args.input_height, args.input_width)
    model = MegaDepthHourglass()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *hw, 3), jnp.float32))

    if args.torch_checkpoint:
        from vfidkr_tpu.convert import (convert_dain_state_dict,
                                        convert_megadepth,
                                        load_torch_state_dict)
        from vfidkr_tpu.training.checkpoint import filtered_partial_load
        sd = load_torch_state_dict(args.torch_checkpoint)
        if any(k.startswith("depthNet.") for k in sd):
            ck = convert_dain_state_dict(sd)
            ck = {"params": ck["params"]["depth_net"],
                  "batch_stats": ck["batch_stats"]["depth_net"]}
        else:
            dp, ds = convert_megadepth(sd)
            ck = {"params": dp, "batch_stats": ds}
        variables, loaded, skipped = filtered_partial_load(
            jax.device_get(variables), ck)
        print(f"loaded {len(loaded)} tensors from {args.torch_checkpoint} "
              f"({len(skipped)} skipped)", file=sys.stderr)
        variables = jax.device_put(variables)
    elif args.checkpoint:
        import orbax.checkpoint as ocp
        variables = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint), jax.device_get(variables))
        variables = jax.device_put(variables)

    @jax.jit
    def predict(variables, img):
        return model.apply(variables, img[None])[0, ..., 0]   # (H, W) log-d

    @jax.jit
    def rmse_of(log_pred, gt, mask):
        return scale_invariant_rmse(log_pred, jnp.log(gt), mask)

    total_rmse, count = 0.0, 0
    sdr_err = np.zeros(3, np.int64)
    sdr_n = np.zeros(3, np.int64)
    for img_path, stem in samples:
        has_h5 = os.path.exists(stem + ".h5")
        if has_h5:
            img, gt, mask = load_sample(img_path, stem + ".h5", hw)
        else:
            from PIL import Image
            with Image.open(img_path) as im:
                img = np.asarray(im, dtype=np.float32) / 255.0
            img = _resize(img, hw)
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            img = img[..., :3].astype(np.float32)
        log_pred = predict(variables, jnp.asarray(img))

        if has_h5:
            # per-image loss summed, divided by image count at the end
            # (rmse_error_main.py:33-60 / HG_model.evaluate_RMSE:150-160)
            total_rmse += float(rmse_of(log_pred, jnp.asarray(gt),
                                        jnp.asarray(mask)))
            count += 1

        sdr_path = stem + ".sdr.npz"
        if os.path.exists(sdr_path):
            z = np.load(sdr_path)
            err, n = sdr_counts(log_pred,
                                jnp.asarray(z["xA"], jnp.int32),
                                jnp.asarray(z["yA"], jnp.int32),
                                jnp.asarray(z["xB"], jnp.int32),
                                jnp.asarray(z["yB"], jnp.int32),
                                jnp.asarray(z["gt"], jnp.int32))
            sdr_err += np.asarray(err, np.int64)
            sdr_n += np.asarray(n, np.int64)

    result = {"images": len(samples)}
    if count:
        result["si_rmse"] = total_rmse / count      # rmse_error_main.py:60
        result["rmse_images"] = count
    if sdr_n[2] > 0:
        # SDR_compute.py prints EQUAL / INEQUAL / TOTAL disagreement rates
        result["sdr"] = {
            "equal": float(sdr_err[0]) / max(int(sdr_n[0]), 1),
            "unequal": float(sdr_err[1]) / max(int(sdr_n[1]), 1),
            "total": float(sdr_err[2]) / int(sdr_n[2]),
            "pairs": int(sdr_n[2]),
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
