"""Loss functions — equivalents of ``loss_function.py:16-88``.

Note (reference behaviour preserved): ``part_loss`` computes pixel, offset-TV
and symmetry terms, but only the pixel losses reach the optimiser
(train.py:186: ``total_loss = sum(alpha_i * pixel_i)``); TV/sym are logged
only.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def charbonnier_loss(x, epsilon):
    """loss_function.py:16-18: mean(sqrt(x^2 + eps^2))."""
    return jnp.mean(jnp.sqrt(x * x + epsilon * epsilon))


def neg_psnr_loss(x, epsilon):
    """loss_function.py:19-21."""
    per = jnp.mean(jnp.sqrt(x * x + epsilon * epsilon), axis=(1, 2, 3))
    return jnp.mean(-jnp.log(1.0 / per) / 100.0)


def tv_loss(x, epsilon):
    """loss_function.py:23-29 (NHWC)."""
    d1 = x[:, :-1, :-1, :] - x[:, 1:, :-1, :]
    d2 = x[:, :-1, :-1, :] - x[:, :-1, 1:, :]
    return jnp.mean(jnp.sqrt(d1 ** 2 + d2 ** 2 + epsilon * epsilon))


def gra_adap_tv_loss(flow, image, epsilon):
    """Gradient-adaptive TV of the projected flow (loss_function.py:32-40):
    TV of the flow weighted by exp(-|image gradient|)."""
    iw = jnp.exp(-jnp.sum(
        jnp.abs(image[:, :-1, :-1, :] - image[:, 1:, :-1, :])
        + jnp.abs(image[:, :-1, :-1, :] - image[:, :-1, 1:, :]), axis=-1))
    d1 = flow[:, :-1, :-1, :] - flow[:, 1:, :-1, :]
    d2 = flow[:, :-1, :-1, :] - flow[:, :-1, 1:, :]
    tv = jnp.sum(jnp.sqrt(d1 ** 2 + d2 ** 2 + epsilon * epsilon), axis=-1)
    return jnp.mean(iw * tv)


def smooth_loss(x, epsilon):
    """loss_function.py:42-49."""
    return tv_loss(x, epsilon)


def motion_sym_loss(offsets, epsilon):
    """loss_function.py:52-59: penalise F_t->0 + F_t->1 != 0."""
    return jnp.mean(jnp.sqrt((offsets[0] + offsets[1]) ** 2 + epsilon ** 2))


def part_loss(diffs: Sequence, offsets: Sequence, images: Sequence,
              epsilon: float, use_neg_psnr: bool = False):
    """loss_function.py:64-88.  diffs: list of (out - gt); offsets: list of
    [off0, off1] pairs; images: [I0, I1]."""
    pixel_fn = neg_psnr_loss if use_neg_psnr else charbonnier_loss
    pixel = [pixel_fn(d, epsilon) for d in diffs]
    offset = [gra_adap_tv_loss(off[0], images[0], epsilon)
              + gra_adap_tv_loss(off[1], images[1], epsilon)
              for off in [offsets]] if offsets is not None else [jnp.zeros(())]
    sym = [motion_sym_loss(offsets, epsilon)] if offsets is not None \
        else [jnp.zeros(())]
    return pixel, offset, sym


def total_loss(pixel_losses: Sequence, alpha: Sequence[float]):
    """train.py:186: sum(alpha_i * pixel_i) over alpha_i > 0."""
    return sum((a * p) for a, p in zip(alpha, pixel_losses) if a > 0)


def psnr_from_diff(diff):
    """Validation PSNR (train.py:250-253): per-sample MSE -> mean PSNR."""
    per_sample = jnp.mean(diff ** 2, axis=(1, 2, 3))
    return jnp.mean(20.0 * jnp.log(1.0 / jnp.sqrt(per_sample))) / jnp.log(10.0)
