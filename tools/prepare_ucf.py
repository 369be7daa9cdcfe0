#!/usr/bin/env python
"""UCF-101 triplet preparation — equivalent of the reference ``prepare_ucf.py``
(:10-46): sample every 40th video, dump frames 2/3/4 of each sampled clip as
``im2.png`` / ``im3.png`` / ``im4.png`` triplet directories for the
MiddleBury-style eval driver (apps/demo_middlebury.py).

The reference uses OpenCV for video decode; this environment has no cv2 /
ffmpeg python plugin, so the tool accepts EITHER:
  - directories of already-extracted frames (one subdir per video), or
  - video files when ``imageio`` can decode them (plugin-dependent).

Usage:
  python tools/prepare_ucf.py --src /data/UCF-101 --dst /data/ucf_triplets \
      [--every 40] [--frames 2 3 4]
"""

from __future__ import annotations

import argparse
import os
import sys


def iter_videos(src):
    for root, _, files in os.walk(src):
        for f in sorted(files):
            if f.lower().endswith((".avi", ".mp4", ".mov", ".mkv")):
                yield os.path.join(root, f)


def read_frames_video(path, wanted):
    import imageio.v3 as iio
    frames = {}
    for i, frame in enumerate(iio.imiter(path)):
        if i in wanted:
            frames[i] = frame
        if i > max(wanted):
            break
    return frames


def read_frames_dir(path, wanted):
    from PIL import Image
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    frames = {}
    for i in wanted:
        if i < len(files):
            with Image.open(os.path.join(path, files[i])) as im:
                frames[i] = __import__("numpy").asarray(im.convert("RGB"))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--every", type=int, default=40,
                    help="sample every Nth video (reference: 40)")
    ap.add_argument("--frames", type=int, nargs=3, default=[1, 2, 3],
                    help="0-based indices of the triplet (reference dumps "
                         "frames 2,3,4 1-based)")
    args = ap.parse_args()

    from PIL import Image

    sources = list(iter_videos(args.src))
    use_dirs = not sources
    if use_dirs:
        sources = sorted(os.path.join(args.src, d) for d in os.listdir(args.src)
                         if os.path.isdir(os.path.join(args.src, d)))
    wanted = set(args.frames)

    count = 0
    for vi, vid in enumerate(sources):
        if vi % args.every:
            continue
        try:
            frames = (read_frames_dir if use_dirs else read_frames_video)(
                vid, wanted)
        except Exception as e:  # decode failure: skip like the reference would
            print(f"skip {vid}: {e}", file=sys.stderr)
            continue
        if len(frames) < 3:
            continue
        name = os.path.splitext(os.path.basename(vid))[0]
        out = os.path.join(args.dst, name)
        os.makedirs(out, exist_ok=True)
        for slot, idx in zip(("im2.png", "im3.png", "im4.png"),
                             sorted(args.frames)):
            Image.fromarray(frames[idx]).save(os.path.join(out, slot))
        count += 1
    print(f"wrote {count} triplets to {args.dst}")


if __name__ == "__main__":
    main()
