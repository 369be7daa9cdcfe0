"""Spatial sharding: split H across a mesh axis with halo exchange.

The reference handles big frames by padding to 128-multiples and hoping the
GPU has memory (Colab notes: 16 GB <-> 720p, 8 GB <-> 480p, SURVEY.md §5).
On TPU the same model can run on frames larger than one chip's HBM by
sharding rows across chips: each device holds ``H/n + 2*halo`` rows, halo
rows are exchanged with mesh neighbours over ICI via ``ppermute``, the
(local) network runs per-shard, and the halos are cropped off the output.

Exactness contract (measured in tests/test_parallel_dain.py): operators
whose receptive field fits in ``halo`` rows (the scatter/warp op chain with
|flow| + window support <= halo) are EXACT on every row, including the
global frame edges and with hole filling on: inside the wrapper's
``spatial_frame`` context the ops evaluate validity bounds in GLOBAL frame
coordinates, mask phantom (edge-replicated) scatter sources, and the hole
fill's frame-global nearest-filled search runs as local interior scans plus
all-gathered cross-shard carries over the mesh axis (round 3; previously
rows within flow-support of the global top/bottom edge were corrupted and
the fill was a tiled approximation).  For the full DAIN pipeline
(downsampling pyramids + flows up to W/2) tiling remains the standard
approximation — pick ``halo`` >= the largest expected motion + network
context (the eval default of 64 covers Vimeo-scale motion).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ---------------------------------------------------------------------------
# Spatial frame context: lets ops evaluate frame-global semantics (validity
# bounds, scatter-source masking, cross-shard hole-fill scans) while running
# on a halo-extended local block inside shard_map.  Trace-time stack, same
# pattern as models.layers.conv_compute_dtype.
# ---------------------------------------------------------------------------

_SPATIAL_FRAME: list = []


@contextlib.contextmanager
def spatial_frame(axis_name: str, halo: int):
    _SPATIAL_FRAME.append((axis_name, halo))
    try:
        yield
    finally:
        _SPATIAL_FRAME.pop()


def current_spatial_frame() -> Optional[Tuple[str, int]]:
    return _SPATIAL_FRAME[-1] if _SPATIAL_FRAME else None


def global_row_frame(h_ext: int):
    """Inside a spatial_frame: (row0, h_global, axis, halo) where ``row0`` is
    the global row index of local (halo-extended) row 0 — negative on the
    first shard, whose top halo rows are phantom (edge-replicated) rows above
    the real frame.  None outside a spatial_frame."""
    ctx = current_spatial_frame()
    if ctx is None:
        return None
    axis, halo = ctx
    idx = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    hs = h_ext - 2 * halo
    row0 = idx * hs - halo
    return row0, n * hs, axis, halo


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str,
                       edge_mode: str = "edge") -> jax.Array:
    """Inside shard_map: append `halo` rows from the up/down neighbours.

    x: (B, H_shard, W, C) local block -> (B, H_shard + 2*halo, W, C).
    At the global top/bottom, ``edge_mode`` picks replication padding
    ("edge", matching the eval-path border handling) or zeros ("zero",
    matching zero-padded convs).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = x[:, :halo]          # my top rows -> neighbour above sends me its bottom
    bot_rows = x[:, -halo:]

    # receive the bottom rows of the shard above (shift down: i -> i+1)
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)])
    # receive the top rows of the shard below (shift up: i -> i-1)
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(n - 1)])

    if edge_mode == "edge":
        edge_top = jnp.repeat(x[:, :1], halo, axis=1)
        edge_bot = jnp.repeat(x[:, -1:], halo, axis=1)
    else:
        edge_top = jnp.zeros_like(top_rows)
        edge_bot = jnp.zeros_like(bot_rows)
    top = jnp.where(idx == 0, edge_top, from_above)
    bot = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([top, x, bot], axis=1)


def spatial_shard_fn(fn: Callable, mesh: Mesh, halo: int,
                     axis_name: str = "spatial",
                     edge_mode: str = "edge") -> Callable:
    """Wrap ``fn(*arrays) -> array-or-pytree`` (all NHWC, same H) so it runs
    sharded over rows of the given mesh axis with halo exchange.

    The wrapped function takes/returns global arrays; H must divide by the
    axis size, and fn must preserve H (stride-1 semantics overall).  For a
    pipeline with internal downsampling (DAIN: PWC /64, U-Net /32) pick
    ``halo`` so that H/axis_size + 2*halo satisfies the divisibility and
    halo >= max expected |flow| + op support (64 covers Vimeo-scale motion;
    exactness contract measured in tests/test_parallel_dain.py).
    """
    spec = P(None, axis_name, None, None)

    def local_fn(*arrays):
        padded = [halo_exchange_rows(a, halo, axis_name, edge_mode)
                  for a in arrays]
        with spatial_frame(axis_name, halo):
            out = fn(*padded)
        return jax.tree_util.tree_map(
            lambda o: o[:, halo:o.shape[1] - halo], out)

    def wrapper(*arrays):
        sh = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=tuple(spec for _ in arrays),
                           out_specs=spec)
        return sh(*arrays)

    return wrapper


def shard_model_rows(apply_fn: Callable, n_shards: int, halo: int = 64):
    """Convenience for the drivers: row-shard a full model forward over the
    first ``n_shards`` local devices.  ``apply_fn(i0, i2) -> pytree`` of
    NHWC arrays.  Frames n_shards x taller than one chip's HBM limit run at
    the same per-chip footprint (the reference's 16 GB <-> 720p OOM wall,
    Colab_DAIN.ipynb)."""
    import numpy as np
    devs = jax.devices()
    if len(devs) < n_shards:
        raise ValueError(f"--spatial-shards {n_shards} > {len(devs)} devices")
    mesh = Mesh(np.array(devs[:n_shards]), ("spatial",))
    return spatial_shard_fn(apply_fn, mesh, halo)
