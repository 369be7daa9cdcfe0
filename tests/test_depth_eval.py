"""Depth-eval metrics (scale-invariant RMSE / SDR) vs literal NumPy
translations of MegaDepth/models/HG_model.py:50-166."""
import numpy as np
import pytest
import jax.numpy as jnp

from vfidkr_tpu.utils.depth_eval import scale_invariant_rmse, sdr_counts


def test_scale_invariant_rmse_matches_formula(rng):
    h, w = 12, 16
    lp = rng.randn(h, w).astype(np.float32)
    lg = rng.randn(h, w).astype(np.float32)
    mask = (rng.rand(h, w) > 0.3).astype(np.float32)
    n = mask.sum()
    d = (lp - lg) * mask
    want = np.sqrt((d ** 2).sum() / n - d.sum() ** 2 / n ** 2)
    got = float(scale_invariant_rmse(jnp.asarray(lp), jnp.asarray(lg),
                                     jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_scale_invariance(rng):
    """Adding a constant to log-pred (a global depth scale) changes nothing."""
    h, w = 8, 8
    lp = rng.randn(h, w).astype(np.float32)
    lg = rng.randn(h, w).astype(np.float32)
    mask = np.ones((h, w), np.float32)
    a = float(scale_invariant_rmse(jnp.asarray(lp), jnp.asarray(lg),
                                   jnp.asarray(mask)))
    b = float(scale_invariant_rmse(jnp.asarray(lp + 3.7), jnp.asarray(lg),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_sdr_counts_match_reference_classify(rng):
    h, w, p = 10, 14, 64
    log_pred = rng.randn(h, w).astype(np.float32) * 0.3
    xa = rng.randint(0, w, p).astype(np.int32)
    xb = rng.randint(0, w, p).astype(np.int32)
    ya = rng.randint(0, h, p).astype(np.int32)
    yb = rng.randint(0, h, p).astype(np.int32)
    gt = rng.randint(-1, 2, p).astype(np.int32)

    errs, counts = sdr_counts(jnp.asarray(log_pred), xa, ya, xb, yb,
                              jnp.asarray(gt))
    errs, counts = np.asarray(errs), np.asarray(counts)

    # literal reference translation (batch_classify, threshold 1.1)
    depth = np.exp(log_pred)
    ratio = depth[ya, xa] / depth[yb, xb]
    est = np.zeros(p)
    est[ratio > 1.1] = 1
    est[ratio < 1 / 1.1] = -1
    diff = (est != gt).astype(np.int64)
    unequal_err = diff[gt != 0].sum()
    total_err = diff.sum()
    assert errs.tolist() == [total_err - unequal_err, unequal_err, total_err]
    assert counts.tolist() == [(gt == 0).sum(), (gt != 0).sum(), p]


@pytest.mark.slow
def test_depth_eval_driver(tmp_path):
    """apps/depth_eval.py end-to-end on a synthetic h5/png set — the role of
    the reference's rmse_error_main.py / SDR_compute.py drivers."""
    import json
    import os
    import subprocess
    import sys

    import h5py
    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.RandomState(0)
    h, w = 64, 96
    for i in range(2):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"s{i}.png")
        depth = (rng.rand(h, w) * 10 + 0.5).astype(np.float32)
        depth[:4] = 0.0                       # invalid region -> masked
        with h5py.File(tmp_path / f"s{i}.h5", "w") as f:
            f.create_dataset("/depth", data=depth)
    p = 50
    np.savez(tmp_path / "s0.sdr.npz",
             xA=rng.randint(0, w, p), yA=rng.randint(0, h, p),
             xB=rng.randint(0, w, p), yB=rng.randint(0, h, p),
             gt=rng.randint(-1, 2, p))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "apps/depth_eval.py", "--data-root", str(tmp_path),
         "--input-height", str(h), "--input-width", str(w)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["images"] == 2 and info["rmse_images"] == 2
    assert np.isfinite(info["si_rmse"]) and info["si_rmse"] >= 0.0
    assert info["sdr"]["pairs"] == p
    for k in ("equal", "unequal", "total"):
        assert 0.0 <= info["sdr"][k] <= 1.0
