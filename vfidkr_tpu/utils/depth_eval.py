"""MegaDepth depth-evaluation metrics — the scale-invariant RMSE and the
Depth Ordinal (SDR) error of the reference's standalone depth-eval scripts
(``MegaDepth/models/HG_model.py:50-166``, driven by ``rmse_error_main.py``
and ``SDR_compute.py``).

These evaluate the MegaDepth hourglass as a *depth estimator* (log-depth
output); the VFI pipeline itself never calls them, but they complete the
reference's compiled capability surface for users evaluating the depth
subnet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_invariant_rmse(log_pred: jax.Array, log_gt: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """``HG_model.rmse_Loss`` (:133-144): the scale-invariant log-RMSE
    ``sqrt(mean(d^2) - mean(d)^2)`` over masked pixels, with
    ``d = (log_pred - log_gt) * mask``.

    Args: (H, W) or broadcastable arrays; mask in {0, 1}.
    Returns a scalar.
    """
    n = jnp.sum(mask)
    d = (log_pred - log_gt) * mask
    s1 = jnp.sum(d * d) / n
    s2 = jnp.square(jnp.sum(d)) / (n * n)
    return jnp.sqrt(s1 - s2)


def sdr_counts(log_pred: jax.Array, x_a, y_a, x_b, y_b, gt_ordinal,
               threshold: float = 1.1):
    """``HG_model.batch_classify``/``computeSDR`` (:50-124): classify the
    predicted ordinal relation of point pairs and count disagreements.

    Args:
      log_pred: (H, W) predicted log-depth (the hourglass output channel).
      x_a, y_a, x_b, y_b: (P,) int32 coordinates of the SfM point pairs.
      gt_ordinal: (P,) in {-1, 0, 1} — ground-truth ordinal label
        (-1 = A closer, 0 = equal, +1 = A farther — matching
        ``batch_classify``, which assigns +1 when z_A/z_B > threshold,
        i.e. A has the larger depth).
      threshold: ratio threshold (reference fixes 1.1).

    Returns:
      (errors, counts): each a 3-vector [equal, unequal, total] matching
      the reference's ``error_list`` / ``count_list``.
    """
    depth = jnp.exp(log_pred)
    z_a = depth[y_a, x_a]
    z_b = depth[y_b, x_b]
    ratio = z_a / z_b
    est = jnp.where(ratio > threshold, 1,
                    jnp.where(ratio < 1.0 / threshold, -1, 0))
    diff = (est != gt_ordinal).astype(jnp.int32)

    unequal_mask = (gt_ordinal != 0)
    unequal_err = jnp.sum(jnp.where(unequal_mask, diff, 0))
    total_err = jnp.sum(diff)
    equal_err = total_err - unequal_err

    total = gt_ordinal.shape[0]
    unequal_n = jnp.sum(unequal_mask.astype(jnp.int32))
    equal_n = total - unequal_n
    return (jnp.stack([equal_err, unequal_err, total_err]),
            jnp.stack([equal_n, unequal_n, jnp.asarray(total)]))
