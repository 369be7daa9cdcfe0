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

    Exactly demo_MiddleBury.py:294-312 (same in demo_test_ourdata.py:273-291):
    a dim NOT divisible by ``multiple`` is padded up to the next multiple,
    split evenly with the smaller half on the left/top; a dim that IS
    divisible gets exactly ``min_pad`` on each side (so e.g. 256 -> 320 —
    the result is only guaranteed divisible by 64, which is what the nets
    need).
    """
    h, w = x.shape[1], x.shape[2]

    def pads(dim):
        if dim % multiple:
            total = multiple - dim % multiple
            lo = total // 2
            return lo, total - lo
        return min_pad, min_pad

    top, bottom = pads(h)
    left, right = pads(w)
    return replication_pad(x, (left, right, top, bottom)), (left, right, top, bottom)


def unpad(x, pads: Tuple[int, int, int, int]):
    left, right, top, bottom = pads
    return x[:, top:x.shape[1] - bottom, left:x.shape[2] - right, :]
