"""Evaluation metrics — IE / PSNR / gaussian-window SSIM with the exact
formulas of the reference eval drivers.

- IE (interpolation error): mean absolute difference on [0,255] images
  (demo_MiddleBury.py:367).
- PSNR: from MSE on [0,255] via the same rounding path (demo_MiddleBury.py
  :368-371 computes MSE on the rounded uint8-scale image).
- SSIM: separable 11-tap gaussian (sigma 1.5) VALID-window SSIM, K=(0.01,
  0.03), data_range=1 on NCHW->here-NHWC floats (demo_MiddleBury.py:24-162).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def interpolation_error(pred_255, gt_255):
    """Mean |diff| on [0,255] images (any shape)."""
    return jnp.mean(jnp.abs(pred_255.astype(jnp.float32)
                            - gt_255.astype(jnp.float32)))


def psnr(pred_255, gt_255):
    """demo_MiddleBury.py:368-371: MSE on [0,255] -> 20*log10(255/sqrt(MSE)).

    The reference protocol averages *per-image* PSNRs over the eval set
    (demo_test_ourdata.py:368-388), never a pooled-MSE PSNR.  Batched (4-D)
    inputs therefore reduce MSE per image and return the mean of the
    per-image PSNRs; 3-D inputs are a single image.
    """
    diff = pred_255.astype(jnp.float32) - gt_255.astype(jnp.float32)
    if diff.ndim == 4:
        mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    else:
        mse = jnp.mean(diff * diff)
    return jnp.mean(20.0 * jnp.log10(255.0 / jnp.sqrt(mse)))


def psnr_per_image(pred_255, gt_255):
    """Per-image PSNR vector (B,) — same formula as :func:`psnr`, unreduced,
    so callers can mask padded batch entries (eval drivers)."""
    diff = pred_255.astype(jnp.float32) - gt_255.astype(jnp.float32)
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def _gauss_kernel_1d(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return jnp.asarray(g / g.sum())


def _gaussian_filter(x, win):
    """Separable VALID 1-D gaussian blur along H then W. x: (B,H,W,C)."""
    k = win.shape[0]
    kh = win.reshape(k, 1, 1, 1)
    kw = win.reshape(1, k, 1, 1)

    def depthwise(x, kernel):
        c = x.shape[-1]
        kernel = jnp.tile(kernel, (1, 1, 1, c))
        # HIGHEST: the sigma estimates are E[x^2] - mu^2 differences — TPU
        # DEFAULT (bf16-pass) conv precision cancels catastrophically and
        # sends SSIM outside [-1, 1]
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    return depthwise(depthwise(x, kh), kw)


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim_per_image(x, y, data_range=1.0, win_size=11, win_sigma=1.5,
                   k1=0.01, k2=0.03):
    """(B,H,W,C) float images -> per-image SSIM vector (B,) (reference
    formula, reduced over H/W/C only — lets eval drivers mask padded batch
    entries)."""
    win = _gauss_kernel_1d(win_size, win_sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim(x, y, **kw):
    """(B,H,W,C) float images -> scalar mean SSIM (reference formula)."""
    return jnp.mean(ssim_per_image(x, y, **kw))
