"""Inverse checkpoint converter: flax variables -> reference torch state_dict.

Closes the trained-weight parity loop without a vendored ``best.pth``
(no reference checkpoint ships in this environment): weights trained HERE
can be exported into the reference's ``train.py`` state_dict layout and
loaded by the emulated torch reference (tests/ref_emu.py) — or by the real
reference — through its filtered partial-load path (train.py:51-57).

Design: rather than hand-maintaining a second key map, the inverse is
DERIVED from the forward converter.  ``convert_dain_state_dict`` is run on
a synthetic state_dict whose values are index arrays (``arange`` reshaped
to each reference tensor's shape) tagged with their torch key; the forward
layout transforms (``conv_w``/``deconv_w`` transposes) act on the index
arrays, so each leaf of the resulting tree carries (a) the torch key it
came from and (b) the original flat index of every element.  Inverting a
real flax leaf is then a pure scatter: ``out.flat[idx.ravel()] = val.ravel()``
— exact for ANY bijective layout transform, with no second transform table
to keep in sync.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from vfidkr_tpu.convert.torch_loader import convert_dain_state_dict


class _Tagged(np.ndarray):
    """ndarray that propagates a ``.key`` attribute through views
    (np.transpose returns a view -> __array_finalize__ runs)."""
    def __array_finalize__(self, obj):
        if obj is not None:
            self.key = getattr(obj, "key", None)


def _tagged_index_sd(reference_sd: Dict[str, np.ndarray]) -> dict:
    out = {}
    for k, v in reference_sd.items():
        shape = tuple(np.asarray(v).shape)
        a = np.arange(int(np.prod(shape)), dtype=np.int64).reshape(shape)
        a = a.view(_Tagged)
        a.key = k
        out[k] = a
    return out


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


def _lookup(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def invert_dain_state_dict(
        variables: dict,
        reference_sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray],
                                                      list]:
    """Export flax ``variables`` ({"params": ..., "batch_stats": ...}) into
    the reference state_dict layout.

    Args:
      variables: our model's variable tree (e.g. ``{"params": state.params,
        "batch_stats": ...}``), host or device arrays.
      reference_sd: a state_dict of the TARGET reference model (random
        weights are fine — only keys/shapes are read), e.g.
        ``ref_emu.load_reference_model(...).state_dict()``.

    Returns:
      (state_dict, missing): ``state_dict`` maps every reference key whose
      flax counterpart exists to the exported tensor (float32, reference
      layout); ``missing`` lists reference keys with no counterpart (e.g.
      ``num_batches_tracked`` BN counters, or sections absent from this
      variables tree) — merge over the target model's own state_dict, which
      is exactly the reference's filtered-load semantics.
    """
    idx_tree = convert_dain_state_dict(_tagged_index_sd(reference_sd))
    out: Dict[str, np.ndarray] = {}
    for path, idx_leaf in _flatten(idx_tree):
        val = _lookup(variables, path)
        if val is None:
            continue
        val = np.asarray(val, np.float32)
        if val.shape != idx_leaf.shape:
            continue          # shape-mismatched variant (filtered-load rule)
        ref_shape = np.asarray(reference_sd[idx_leaf.key]).shape
        orig = np.empty(ref_shape, np.float32)
        orig.ravel()[np.asarray(idx_leaf).ravel()] = val.ravel()
        out[idx_leaf.key] = orig
    missing = [k for k in reference_sd if k not in out]
    return out, missing
