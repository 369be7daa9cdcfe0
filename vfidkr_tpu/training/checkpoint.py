"""Checkpointing — re-design of the reference's per-epoch ``torch.save`` +
best-on-val scheme (train.py:211-218,286-289) with orbax, preserving the
reference's *filtered partial restore* semantics (train.py:51-57,
demo_MiddleBury.py:210-216): keep only checkpoint entries whose key exists in
the target tree, so checkpoints from ablation variants (extra OccNet /
DeconvField weights) interoperate.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def flatten_tree(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def unflatten_tree(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def filtered_partial_load(target_tree, ckpt_tree, strict_shapes=False):
    """Overlay ckpt entries onto target, dropping keys absent from the target
    (the reference's key-intersection semantics, train.py:51-57).  With
    ``strict_shapes=True`` a key that exists but has a mismatched shape
    raises (the reference's load_state_dict would hard-fail there); by
    default it is skipped and reported."""
    tgt = flatten_tree(target_tree)
    ck = flatten_tree(ckpt_tree)
    merged = dict(tgt)
    loaded, skipped = [], []
    for path, v in ck.items():
        if path in tgt and (np.shape(v) == np.shape(tgt[path])):
            merged[path] = v
            loaded.append(path)
        else:
            if strict_shapes and path in tgt:
                raise ValueError(
                    f"shape mismatch for {'.'.join(path)}: checkpoint "
                    f"{np.shape(v)} vs target {np.shape(tgt[path])}")
            skipped.append(path)
    return unflatten_tree(merged), loaded, skipped


class CheckpointManager:
    """Epoch checkpoints with previous-epoch deletion + best.on-val tracking,
    mirroring train.py's layout: <dir>/epoch<k>, <dir>/best."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name):
        return os.path.join(self.directory, name)

    def save_epoch(self, epoch: int, state: Any):
        path = self._path(f"epoch{epoch}")
        self._ckpt.save(path, jax.device_get(state), force=True)
        # orbax saves are async: finalize before deleting the previous epoch
        # (and so process exit can't strand a *.orbax-checkpoint-tmp dir)
        self._ckpt.wait_until_finished()
        prev = self._path(f"epoch{epoch - 1}")
        if os.path.exists(prev):
            import shutil
            shutil.rmtree(prev)

    def save_best(self, state: Any):
        self._ckpt.save(self._path("best"), jax.device_get(state), force=True)
        self._ckpt.wait_until_finished()

    def restore(self, name: str, target: Any):
        return self._ckpt.restore(self._path(name), target)

    def latest_epoch(self) -> Optional[int]:
        epochs = [int(d[5:]) for d in os.listdir(self.directory)
                  if d.startswith("epoch") and d[5:].isdigit()]
        return max(epochs) if epochs else None
