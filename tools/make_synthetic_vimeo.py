#!/usr/bin/env python
"""Generate a synthetic-motion Vimeo-90K-layout dataset for end-to-end
training validation (the environment ships no real Vimeo-90K; this gives the
training loop learnable signal — textured frames under rigid translation,
whose exact middle frame is the half-shift).

Layout matches vimeo90k.py / the reference loaders:
  root/sequences/<seq>/im{1,2,3}.png + tri_trainlist.txt / tri_testlist.txt

Usage: python tools/make_synthetic_vimeo.py --out /tmp/vimeo_syn --n 64
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def _texture(rng, h, w):
    """Smooth multi-scale random texture (interpolatable content: pure noise
    has no learnable motion signal)."""
    img = np.zeros((h, w, 3), np.float32)
    for scale in (4, 8, 16, 32):
        low = rng.rand(h // scale + 2, w // scale + 2, 3).astype(np.float32)
        ups = np.kron(low, np.ones((scale, scale, 1), np.float32))
        img += ups[:h, :w] / 4.0
    return np.clip(img, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=448)
    ap.add_argument("--max-shift", type=int, default=6,
                    help="max |dx|,|dy| between im1 and im3 (even numbers "
                         "keep im2 on the pixel grid)")
    ap.add_argument("--test-frac", type=float, default=0.125)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.RandomState(args.seed)
    h, w = args.height, args.width
    m = args.max_shift
    seq_dir = os.path.join(args.out, "sequences")
    names = []
    for i in range(args.n):
        # generate oversized texture, carve 3 shifted crops
        big = _texture(rng, h + 4 * m, w + 4 * m)
        dx = 2 * rng.randint(-m // 2, m // 2 + 1)
        dy = 2 * rng.randint(-m // 2, m // 2 + 1)
        cy, cx = 2 * m, 2 * m
        crops = []
        for k in (-1, 0, 1):       # im1, im2 (middle), im3
            y0 = cy + k * dy // 2
            x0 = cx + k * dx // 2
            crops.append(big[y0:y0 + h, x0:x0 + w])
        name = f"{i // 100:05d}/{i % 100:04d}"
        d = os.path.join(seq_dir, name)
        os.makedirs(d, exist_ok=True)
        for j, c in enumerate(crops, start=1):
            Image.fromarray(np.asarray(np.round(c * 255), np.uint8)).save(
                os.path.join(d, f"im{j}.png"))
        names.append(name)

    n_test = max(1, int(args.n * args.test_frac))
    with open(os.path.join(args.out, "tri_trainlist.txt"), "w") as f:
        f.write("\n".join(names[:-n_test]) + "\n")
    with open(os.path.join(args.out, "tri_testlist.txt"), "w") as f:
        f.write("\n".join(names[-n_test:]) + "\n")
    print(f"wrote {args.n} triplets ({args.n - n_test} train / {n_test} test)"
          f" to {args.out}")


if __name__ == "__main__":
    main()
