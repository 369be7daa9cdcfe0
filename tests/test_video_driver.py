"""End-to-end test of the video front/back end in apps/interpolate_video.py
(the reference drives ffmpeg extract -> interpolate -> re-encode from
Colab_DAIN.ipynb; here one driver command covers video -> video)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_clip(path, n=5, h=96, w=64, fps=10.0):
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    rng = np.random.RandomState(0)
    base = (rng.rand(h, w + 2 * n, 3) * 255).astype(np.uint8)
    for i in range(n):
        wr.write(base[:, 2 * i:2 * i + w])   # rigid 2-px/frame pan
    wr.release()


@pytest.mark.slow
def test_video_in_video_out(tmp_path):
    clip = str(tmp_path / "in.mp4")
    out_mp4 = str(tmp_path / "out.mp4")
    out_dir = str(tmp_path / "frames")
    n = 5
    _write_clip(clip, n=n)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "apps/interpolate_video.py", "--video-in", clip,
         "--video-out", out_mp4, "--out-dir", out_dir, "--time-step", "0.5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["input_frames"] == n
    assert info["interpolated_frames"] == n - 1
    assert info["fps_out"] == pytest.approx(20.0)

    # PNG sink: reference {frame:05d}{offset:03d} naming, originals at 000
    expected = sorted([f"{i:05d}000.png" for i in range(1, n + 1)]
                      + [f"{i:05d}001.png" for i in range(1, n)])
    assert sorted(os.listdir(out_dir)) == expected

    # video sink: 2n-1 frames at 2x fps, same size as the input
    cap = cv2.VideoCapture(out_mp4)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 2 * n - 1
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(20.0)
    ok, f = cap.read()
    assert ok and f.shape == (96, 64, 3)
    # frame 0 of the output must be the (lossily re-encoded) first input
    cap_in = cv2.VideoCapture(clip)
    ok2, f_in = cap_in.read()
    assert ok2
    assert np.mean(np.abs(f.astype(np.float32) - f_in.astype(np.float32))) < 8.0
    cap.release(), cap_in.release()


@pytest.mark.slow
def test_eval_vimeo_out_dir_and_ie(tmp_path):
    """apps/eval_vimeo.py --out-dir saves the reference-layout PNG
    (<out>/<seq>/output-im2.png, demo_test_ourdata.py:256,334) and reports
    avg_ie; the IE recomputed from the saved uint8 frame must match the
    driver's in-graph value (the save->re-read protocol, :337-345)."""
    from PIL import Image
    rng = np.random.RandomState(0)
    names = []
    for i in range(2):
        rel = f"00001/{i:04d}"
        d = tmp_path / "sequences" / rel
        d.mkdir(parents=True)
        for f in ("im1.png", "im2.png", "im3.png"):
            arr = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f)
        names.append(rel)
    (tmp_path / "tri_trainlist.txt").write_text(names[0] + "\n\n")
    (tmp_path / "tri_testlist.txt").write_text(names[1] + "\n\n")
    out_dir = str(tmp_path / "gen")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "apps/eval_vimeo.py", "--dataset-path",
         str(tmp_path), "--batch-size", "1", "--out-dir", out_dir,
         "--filter-impl", "block"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["pairs"] == 1
    assert np.isfinite(info["avg_ie"]) and np.isfinite(info["avg_psnr"])

    saved = os.path.join(out_dir, names[1], "output-im2.png")
    assert os.path.exists(saved), os.listdir(out_dir)
    rec = np.asarray(Image.open(saved)).astype(np.float64)
    gt = np.asarray(Image.open(
        tmp_path / "sequences" / names[1] / "im2.png")).astype(np.float64)
    assert rec.shape == (64, 96, 3)
    ie = np.mean(np.abs(rec - gt))
    assert ie == pytest.approx(info["avg_ie"], abs=1e-4)
