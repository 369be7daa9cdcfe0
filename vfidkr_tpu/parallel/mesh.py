"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.4: no torch.distributed /
NCCL anywhere).  Here parallelism is first-class and TPU-native: a
``jax.sharding.Mesh`` with a ``data`` axis for batch data-parallel training
(XLA inserts the gradient all-reduce over ICI automatically under jit) and an
optional ``spatial`` axis for sharding H across chips at very high
resolutions (see ``vfidkr_tpu.parallel.spatial``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_sizes: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("data",),
                devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With the default single axis, ``create_mesh()`` gives pure DP over every
    available chip; pass e.g. ``axis_sizes=(2, 4), axis_names=("data",
    "spatial")`` for a 2-way-DP x 4-way-spatial layout.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,)
    devices = devices.reshape(axis_sizes)
    return Mesh(devices, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of NHWC arrays over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch dict with its leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
