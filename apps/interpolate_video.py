#!/usr/bin/env python
"""Streaming video interpolation — TPU re-design of ``colab_interpolate.py``
plus the notebook's ffmpeg video front/back end (``Colab_DAIN.ipynb`` drives
ffmpeg extract -> colab_interpolate.py -> ffmpeg re-encode as three manual
steps; here one command covers video file -> N x-interpolated video file).

The reference processes one frame pair per model call with a full
GPU->host->PNG round trip per output frame (:64-156) — the throughput
bottleneck SURVEY.md §3.5 calls out.  Here the model is jitted once per
resolution bucket, decode/encode run in host threads, and frame pairs stream
through the device back-to-back.

Input: a directory of numbered frames (00001.png, ...) via --frames-dir, or
a video file via --video-in (decoded in a streaming fashion, no frame dump).
Output: --out-dir keeps the reference convention
``{frame:0Nd}{offset:03d}.png`` with offset 000 the pass-through original
and k=1..N-1 the interpolated steps; --video-out encodes straight to a video
at fps_in / time_step (both sinks may be used together).

Usage:
  python apps/interpolate_video.py --frames-dir in/ --out-dir out/ \
      --time-step 0.5 [--model DAIN|DAIN_slowmotion] [--checkpoint ...]
  python apps/interpolate_video.py --video-in clip.mp4 --video-out out.mp4 \
      --time-step 0.25 --model DAIN_slowmotion
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
    ap.add_argument("--frames-dir", default=None,
                    help="input: directory of numbered frames")
    ap.add_argument("--video-in", default=None,
                    help="input: video file (streamed via OpenCV/FFmpeg)")
    ap.add_argument("--out-dir", default=None,
                    help="output: PNG frames, reference naming convention")
    ap.add_argument("--video-out", default=None,
                    help="output: video file at fps_in / time_step")
    ap.add_argument("--fps-in", type=float, default=None,
                    help="input frame rate for --video-out (default: from "
                         "--video-in metadata, else 30)")
    ap.add_argument("--fourcc", default="mp4v",
                    help="--video-out codec fourcc (OpenCV VideoWriter)")
    ap.add_argument("--time-step", type=float, default=0.5)
    ap.add_argument("--model", default="DAIN",
                    choices=["DAIN", "DAIN_slowmotion"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--torch-checkpoint", default=None)
    ap.add_argument("--save-which", type=int, default=1)
    from vfidkr_tpu.config import ModelConfig, add_model_flags
    # packed depth: phase-packed hourglass eval (models/phasepack.py) —
    # 16.4 -> 11.9 ms on the depth net, exact to conv rounding and parity-
    # covered by the QUICK suite; kernels are pre-packed after load below
    add_model_flags(ap, depth_impl="packed")
    ap.add_argument("--spatial-shards", type=int, default=1,
                    help="row-shard frames over N devices with halo exchange"
                         " (frames N x taller than one chip's HBM fit)")
    ap.add_argument("--halo", type=int, default=64,
                    help="halo rows per shard (>= max motion + op support)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from PIL import Image
    from vfidkr_tpu.data import prefetch
    from vfidkr_tpu.utils import pad_to_multiple, unpad

    if (args.video_in is None) == (args.frames_dir is None):
        ap.error("give exactly one input: --frames-dir or --video-in")
    if args.out_dir is None and args.video_out is None:
        ap.error("give at least one output: --out-dir and/or --video-out")
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    fps_in = args.fps_in
    if args.frames_dir:
        frames = sorted(f for f in os.listdir(args.frames_dir)
                        if f.lower().endswith((".png", ".jpg", ".jpeg")))
        assert len(frames) >= 2, "need at least two frames"

        def frame_source():
            """Yields (1,H,W,3) float32 RGB in [0,1], on the 8-bit grid."""
            for name in frames:
                with Image.open(os.path.join(args.frames_dir, name)) as im:
                    yield np.asarray(im.convert("RGB"),
                                     np.float32)[None] / 255.0
    else:
        # video front end (the notebook's `ffmpeg -i in.mp4 %05d.png`
        # extract step, Colab_DAIN.ipynb) — streamed via OpenCV's bundled
        # FFmpeg, no intermediate frame dump
        import cv2
        cap = cv2.VideoCapture(args.video_in)
        if not cap.isOpened():
            ap.error(f"cannot open --video-in {args.video_in}")
        if fps_in is None:
            fps_in = cap.get(cv2.CAP_PROP_FPS) or None

        def frame_source():
            while True:
                ok, bgr = cap.read()
                if not ok:
                    break
                yield bgr[None, :, :, ::-1].astype(np.float32) / 255.0
            cap.release()
    fps_in = fps_in or 30.0

    if args.model == "DAIN" and args.time_step != 0.5:
        ap.error("DAIN supports --time-step 0.5 only (networks/DAIN.py:36); "
                 "use --model DAIN_slowmotion for other rates")
    model = ModelConfig.from_args(
        args, net_name=args.model, time_step=args.time_step).build()

    source = frame_source()
    try:
        first = next(source)
    except StopIteration:
        ap.error("input has no frames")

    def frame_pairs():
        prev = first
        for nxt in source:
            yield prev, nxt
            prev = nxt

    # with row sharding, local H/n + 2*halo must keep the /64 divisibility
    # the nets need; pad H up to a multiple of 64*n (and 128 as usual)
    pad_mult = 128 if args.spatial_shards == 1 else max(
        128, 64 * args.spatial_shards)
    # min_pad must preserve the multiple when a dim is already divisible
    min_pad = 32 if args.spatial_shards == 1 else pad_mult // 2
    pad_to = lambda x: pad_to_multiple(x, multiple=pad_mult, min_pad=min_pad)

    x0p, pads = pad_to(jnp.asarray(first))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0p, x0p)

    if args.torch_checkpoint:
        from vfidkr_tpu.convert import convert_dain_state_dict, load_torch_state_dict
        from vfidkr_tpu.training.checkpoint import filtered_partial_load
        ck = convert_dain_state_dict(load_torch_state_dict(args.torch_checkpoint))
        variables, loaded, skipped = filtered_partial_load(
            jax.device_get(variables), ck)
        print(f"loaded {len(loaded)} tensors ({len(skipped)} skipped)",
              file=sys.stderr)
        variables = jax.device_put(variables)
    elif args.checkpoint:
        import orbax.checkpoint as ocp
        variables = jax.device_put(ocp.StandardCheckpointer().restore(
            args.checkpoint, jax.device_get(variables)))

    if args.model == "DAIN_slowmotion" and args.depth_impl == "packed":
        # pre-pack the hourglass conv kernels once (checkpoints store the
        # canonical tree), so per-call graphs carry no kernel transforms
        from vfidkr_tpu.models.megadepth import prepack_megadepth
        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"]["depth_net"] = jax.jit(prepack_megadepth)(
            variables["params"]["depth_net"])

    def fwd(variables, a, b):
        res = model.apply(variables, a, b)
        outs = res["outputs"][args.save_which]
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        return [jnp.clip(o, 0.0, 1.0) for o in outs]

    if args.spatial_shards > 1:
        from vfidkr_tpu.parallel.spatial import shard_model_rows

        @jax.jit
        def interp(variables, a, b):
            return shard_model_rows(
                lambda x, y: fwd(variables, x, y),
                args.spatial_shards, args.halo)(a, b)
    else:
        interp = jax.jit(fwd)

    def to_u8(img01):
        return np.asarray(np.round(img01[0] * 255.0), np.uint8)

    def save(path, img01):
        Image.fromarray(to_u8(img01)).save(path)

    # video back end (the notebook's `ffmpeg -r fps/time_step -i %05d%03d.png
    # out.mp4` re-encode step): one ordered writer at fps_in / time_step,
    # fed in stream order from the main loop
    writer = None
    if args.video_out:
        import cv2
        fps_out = fps_in / args.time_step

        def emit_video(img01):
            nonlocal writer
            u8 = to_u8(img01)
            if writer is None:
                writer = cv2.VideoWriter(
                    args.video_out, cv2.VideoWriter_fourcc(*args.fourcc),
                    fps_out, (u8.shape[1], u8.shape[0]))
                assert writer.isOpened(), \
                    f"VideoWriter failed for {args.video_out} ({args.fourcc})"
            writer.write(u8[:, :, ::-1])    # RGB -> BGR
    else:
        emit_video = lambda img01: None

    # decode runs ahead via prefetch(); PNG encode runs behind in a worker
    # pool, so the device streams pairs back-to-back (the reference
    # round-trips GPU->host->PNG serially per frame, colab_interpolate.py:64-156)
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=4)
    pending = []

    def emit(idx, offset, img01):
        if args.out_dir:
            pending.append(pool.submit(
                save, os.path.join(args.out_dir,
                                   f"{idx:05d}{offset:03d}.png"), img01))
        emit_video(img01)

    t0 = time.time()
    produced = 0
    n_in = 1
    last = first
    for idx, (a, b) in enumerate(prefetch(frame_pairs(), 2), start=1):
        n_in += 1
        last = b
        ap_, pads = pad_to(jnp.asarray(a))
        bp_, _ = pad_to(jnp.asarray(b))
        outs = interp(variables, ap_, bp_)
        emit(idx, 0, a)
        for k, o in enumerate(outs, start=1):
            emit(idx, k, np.asarray(unpad(o, pads)))
            produced += 1
    emit(n_in, 0, last)
    for f in pending:
        f.result()
    pool.shutdown()
    if writer is not None:
        writer.release()
    dt = time.time() - t0

    print(json.dumps({
        "input_frames": n_in,
        "interpolated_frames": produced,
        "fps_in": fps_in,
        "fps_out": (fps_in / args.time_step) if args.video_out else None,
        "wall_s": dt,
        "interp_frames_per_sec": produced / dt if dt > 0 else None,
    }))


if __name__ == "__main__":
    main()
