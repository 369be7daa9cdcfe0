"""ReduceLROnPlateau — functional re-design of the vendored scheduler
(``lr_scheduler.py:167-308``; stock semantics: mode='min', rel threshold
1e-4, factor/patience/cooldown/min_lr from args, train.py:97).

Instead of mutating per-group LRs, the state tracks a single multiplicative
``scale`` applied on top of the static per-group LRs (the reference reduces
every group by the same factor, so this is equivalent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct


class PlateauState(struct.PyTreeNode):
    scale: jnp.ndarray            # current LR multiplier
    best: jnp.ndarray             # best metric seen
    num_bad_epochs: jnp.ndarray
    cooldown_counter: jnp.ndarray


def plateau_init() -> PlateauState:
    return PlateauState(
        scale=jnp.asarray(1.0, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad_epochs=jnp.asarray(0, jnp.int32),
        cooldown_counter=jnp.asarray(0, jnp.int32),
    )


def plateau_step(state: PlateauState, metric, factor: float = 0.2,
                 patience: int = 3, threshold: float = 1e-4,
                 cooldown: int = 0, min_scale: float = 0.0) -> PlateauState:
    """One scheduler.step(metric) in 'min' mode with rel threshold."""
    metric = jnp.asarray(metric, jnp.float32)
    is_better = metric < state.best * (1.0 - threshold)

    best = jnp.where(is_better, metric, state.best)
    in_cooldown = state.cooldown_counter > 0
    num_bad = jnp.where(is_better | in_cooldown, 0, state.num_bad_epochs + 1)
    cooldown_counter = jnp.maximum(state.cooldown_counter - 1, 0)

    reduce_now = num_bad > patience
    scale = jnp.where(reduce_now,
                      jnp.maximum(state.scale * factor, min_scale),
                      state.scale)
    cooldown_counter = jnp.where(reduce_now, cooldown, cooldown_counter)
    num_bad = jnp.where(reduce_now, 0, num_bad)
    return PlateauState(scale=scale, best=best, num_bad_epochs=num_bad,
                        cooldown_counter=cooldown_counter)
