"""Depth-eval metrics (scale-invariant RMSE / SDR) vs literal NumPy
translations of MegaDepth/models/HG_model.py:50-166."""
import numpy as np
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
