"""Replication padding to static 128-multiples — the reference pads every
eval frame with ReplicationPad2d to a multiple of 128 with at least 32 px on
each side (demo_MiddleBury.py:294-312); static padded shapes per resolution
bucket keep XLA recompiles bounded."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vfidkr_tpu.models.layers import replication_pad


def pad_to_multiple(x, multiple: int = 128, min_pad: int = 32):
    """x: (B,H,W,C) -> (padded, (left, right, top, bottom)).

    Mirrors demo_MiddleBury.py:294-312: grow each side by >= min_pad, rounded
    so the padded dims are multiples of ``multiple``, split evenly
    (left = floor(total/2)).
    """
    h, w = x.shape[1], x.shape[2]

    def pads(dim):
        if dim % multiple == 0 and min_pad == 0:
            return 0, 0
        total = multiple - dim % multiple if dim % multiple else 0
        while total < 2 * min_pad:
            total += multiple
        lo = total // 2
        return lo, total - lo

    top, bottom = pads(h)
    left, right = pads(w)
    return replication_pad(x, (left, right, top, bottom)), (left, right, top, bottom)


def unpad(x, pads: Tuple[int, int, int, int]):
    left, right, top, bottom = pads
    return x[:, top:x.shape[1] - bottom, left:x.shape[2] - right, :]
