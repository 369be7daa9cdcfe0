"""Optimizer + train/eval steps — re-design of ``train.py:85-207``.

The reference uses torch Adamax with 5 param groups at different LRs
(train.py:85-94): the three kernel-prediction nets at ``filter_lr_coe * lr``,
PWC-Net at ``flow_lr_coe(0.01) * lr`` and the rectifier at ``rectify_lr``;
ctxNet/depthNet groups are commented out, and OccNet/DeconvField never join an
optimizer — i.e. everything outside the three groups is frozen.  Here that is
an ``optax.multi_transform`` over top-level parameter labels, with each group
``chain(adamax(1.0), scale(group_lr))`` so a single dynamic plateau
``lr_scale`` can multiply all groups (ReduceLROnPlateau reduces every group by
the same factor).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vfidkr_tpu.training import loss as L
from vfidkr_tpu.training.lr_schedule import PlateauState, plateau_init


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the my_args.py defaults (:13-74)."""
    lr: float = 2e-3
    rectify_lr: float = 1e-3
    filter_lr_coe: float = 1.0
    flow_lr_coe: float = 0.01
    occ_lr_coe: float = 1.0
    ctx_lr_coe: float = 1.0
    depth_lr_coe: float = 1e-3
    alpha: Tuple[float, ...] = (0.0, 1.0)
    epsilon: float = 1e-6
    weight_decay: float = 0.0
    batch_size: int = 3
    num_epochs: int = 50
    factor: float = 0.2        # ReduceLROnPlateau factor
    patience: int = 3
    use_neg_psnr: bool = False


_GROUP_OF_MODULE = {
    "filter_net": "filter",
    "filter_head1": "filter",
    "filter_head2": "filter",
    "flownets": "flow",
    "rectify_net": "rectify",
    # ctx_net / depth_net / occ_net / deconv_field -> frozen (reference
    # excludes them from the optimizer)
}


def param_labels(params) -> Any:
    return {k: jax.tree_util.tree_map(
                lambda _: _GROUP_OF_MODULE.get(k, "frozen"), v)
            for k, v in params.items()}


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    def group(lr):
        tx = optax.chain(optax.adamax(1.0, b1=0.9, b2=0.999, eps=1e-8),
                         optax.scale(lr))
        if config.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(config.weight_decay), tx)
        return tx

    return optax.multi_transform(
        {
            "filter": group(config.filter_lr_coe * config.lr),
            "flow": group(config.flow_lr_coe * config.lr),
            "rectify": group(config.rectify_lr),
            "frozen": optax.set_to_zero(),
        },
        param_labels,
    )


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any          # empty dict for models without BN
    opt_state: Any
    plateau: PlateauState


def create_train_state(model, rng, sample_batch, config: TrainConfig,
                       params=None) -> Tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        variables = model.init(rng, sample_batch["x0"], sample_batch["x1"],
                               train=True)
    else:
        variables = params
    params_ = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config)
    opt_state = tx.init(params_)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params_,
                       batch_stats=batch_stats, opt_state=opt_state,
                       plateau=plateau_init())
    return state, tx


def _model_losses(model, variables, batch, config: TrainConfig, train,
                  mutable):
    """Forward + reference loss decomposition. Returns (total, aux)."""
    out = model.apply(variables, batch["x0"], batch["x1"], train=train,
                      mutable=mutable)
    if mutable:
        res, updates = out
    else:
        res, updates = out, {}
    outputs = res["outputs"]
    # DAIN: [out, rect]; slow-motion: [[out_k...], [rect_k...]].  The dataset
    # provides one mid-frame GT, so multi-frame training is only meaningful
    # at time_step=0.5 (the reference's slow-motion train path is broken for
    # other steps: list-minus-tensor at DAIN_slowmotion.py:189); we average
    # per-frame *losses* (not diffs — errors must not cancel across frames).
    if isinstance(outputs[0], (list, tuple)):
        diffs = [[o - batch["y"] for o in outs] for outs in outputs]
        pixel_fn = (L.neg_psnr_loss if config.use_neg_psnr
                    else L.charbonnier_loss)
        pixel = [sum(pixel_fn(d, config.epsilon) for d in ds) / len(ds)
                 for ds in diffs]
        _, offset, sym = L.part_loss(
            [ds[-1] for ds in diffs], res["offsets"],
            [batch["x0"], batch["x1"]], config.epsilon, config.use_neg_psnr)
        diffs = [ds[-1] for ds in diffs]
    else:
        diffs = [o - batch["y"] for o in outputs]
        pixel, offset, sym = L.part_loss(
            diffs, res["offsets"], [batch["x0"], batch["x1"]], config.epsilon,
            config.use_neg_psnr)
    total = L.total_loss(pixel, config.alpha)
    aux = {
        "pixel": jnp.stack(pixel),
        "tv": offset[0],
        "sym": sym[0],
        "total": total,
        "psnr": L.psnr_from_diff(diffs[-1]),
        "updates": updates,
    }
    return total, aux


def train_step(model, tx, state: TrainState, batch, config: TrainConfig,
               freeze_dead_backward: bool = True):
    """One optimizer step (train.py:178-207). Pure; jit/shard outside."""
    has_bn = bool(state.batch_stats)
    mutable = ["batch_stats"] if has_bn else False

    def loss_fn(params):
        # frozen groups (depth/ctx/occ — reference excludes them from the
        # optimizer, train.py:65-77) enter as stop_gradient so their dead
        # backward (~88 ms of MegaDepth input-grads alone at B=3 @256x448)
        # can never be computed.  Measured NEUTRAL on v5e (round-5 one-
        # process A/B, tools/ubench_trainstep.py step/step_nofreeze: 176.8
        # vs 176.8 ms) because XLA already DCEs the frozen grads through
        # optax.set_to_zero inside the same jit — the stop_gradient makes
        # that guarantee explicit instead of relying on whole-graph DCE
        # (e.g. if grads are ever returned, logged, or the optimizer update
        # leaves the jit).  Updates are bit-identical; grad parity for every
        # group lives in tests/test_full_graph_backward.py (which
        # differentiates model.apply directly, without this freeze).
        fparams = params
        if freeze_dead_backward:
            fparams = {k: (jax.tree_util.tree_map(jax.lax.stop_gradient, v)
                           if _GROUP_OF_MODULE.get(k, "frozen") == "frozen"
                           else v)
                       for k, v in params.items()}
        variables = {"params": fparams}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        return _model_losses(model, variables, batch, config, True, mutable)

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: u * state.plateau.scale, updates)
    params = optax.apply_updates(state.params, updates)
    new_bn = aux["updates"].get("batch_stats", state.batch_stats)
    new_state = state.replace(step=state.step + 1, params=params,
                              batch_stats=new_bn, opt_state=opt_state)
    metrics = {k: aux[k] for k in ("pixel", "tv", "sym", "total", "psnr")}
    return new_state, metrics


def eval_step(model, state: TrainState, batch, config: TrainConfig):
    """Validation (train.py:233-260). The reference validates under
    torch.no_grad(), so FlowProjection runs with fillhole=1 (requires_grad is
    False, FlowProjectionLayer.py:23) — hence train=False here."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    total, aux = _model_losses(model, variables, batch, config, False, False)
    return {k: aux[k] for k in ("pixel", "tv", "sym", "total", "psnr")}
