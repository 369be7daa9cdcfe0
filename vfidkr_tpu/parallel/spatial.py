"""Spatial sharding: split H across a mesh axis with halo exchange.

The reference handles big frames by padding to 128-multiples and hoping the
GPU has memory (Colab notes: 16 GB <-> 720p, 8 GB <-> 480p, SURVEY.md §5).
On TPU the same model can run on frames larger than one chip's HBM by
sharding rows across chips: each device holds ``H/n + 2*halo`` rows, halo
rows are exchanged with mesh neighbours over ICI via ``ppermute``, the
(local) network runs per-shard, and the halos are cropped off the output.

Exact for operators whose receptive field fits in ``halo`` rows; for the full
DAIN pipeline (downsampling pyramids + flows up to W/2) it is the standard
tiled-inference approximation — pick ``halo`` >= the largest expected motion
+ network context (the eval default of 64 covers Vimeo-scale motion).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    """Wrap ``fn(*arrays) -> array`` (all NHWC, same H) so it runs sharded
    over rows of the given mesh axis with halo exchange.

    The wrapped function takes/returns global arrays; H must divide by the
    axis size, and fn must preserve H (stride-1 semantics overall).
    """
    spec = P(None, axis_name, None, None)

    def local_fn(*arrays):
        padded = [halo_exchange_rows(a, halo, axis_name, edge_mode)
                  for a in arrays]
        out = fn(*padded)
        return out[:, halo:out.shape[1] - halo]

    def wrapper(*arrays):
        sh = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=tuple(spec for _ in arrays),
                           out_specs=spec)
        return sh(*arrays)

    return wrapper
