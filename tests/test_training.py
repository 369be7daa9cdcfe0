"""Training subsystem: losses vs torch formulas, optimizer grouping, plateau
schedule, and a data-parallel train step over the virtual 8-device mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfidkr_tpu.models import DAIN
from vfidkr_tpu.parallel import create_mesh, replicate, shard_batch
from vfidkr_tpu.training import (
    TrainConfig,
    charbonnier_loss,
    create_train_state,
    eval_step,
    gra_adap_tv_loss,
    motion_sym_loss,
    plateau_init,
    plateau_step,
    train_step,
)


def test_loss_formulas_match_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.rand(2, 8, 9, 3).astype(np.float32) - 0.5
    eps = 1e-6
    want = torch.mean(torch.sqrt(torch.from_numpy(x) ** 2 + eps ** 2)).item()
    got = float(charbonnier_loss(jnp.asarray(x), eps))
    assert abs(got - want) < 1e-6

    flow = rng.rand(2, 8, 9, 2).astype(np.float32)
    img = rng.rand(2, 8, 9, 3).astype(np.float32)
    tf = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    ti = torch.from_numpy(img.transpose(0, 3, 1, 2))
    w = torch.exp(-torch.sum(
        torch.abs(ti[:, :, :-1, :-1] - ti[:, :, 1:, :-1])
        + torch.abs(ti[:, :, :-1, :-1] - ti[:, :, :-1, 1:]), dim=1))
    tv = torch.sum(torch.sqrt(
        (tf[:, :, :-1, :-1] - tf[:, :, 1:, :-1]) ** 2
        + (tf[:, :, :-1, :-1] - tf[:, :, :-1, 1:]) ** 2 + eps * eps), dim=1)
    want = torch.mean(w * tv).item()
    got = float(gra_adap_tv_loss(jnp.asarray(flow), jnp.asarray(img), eps))
    assert abs(got - want) < 1e-5


def test_plateau_schedule():
    s = plateau_init()
    # improving: no reduction
    for m in [1.0, 0.9, 0.8]:
        s = plateau_step(s, m, factor=0.2, patience=2)
    assert float(s.scale) == 1.0
    # stall for patience+1 epochs -> reduce once
    for _ in range(3):
        s = plateau_step(s, 0.85, factor=0.2, patience=2)
    assert abs(float(s.scale) - 0.2) < 1e-6
    assert int(s.num_bad_epochs) == 0


def _tiny_batch(rng, b=2, h=64, w=64):
    return {
        "x0": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "x1": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "y": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
    }


@pytest.mark.slow
def test_train_step_updates_correct_groups(rng):
    model = DAIN()
    config = TrainConfig()
    batch = _tiny_batch(rng)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, config)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    state2, metrics = jax.jit(
        lambda s, b: train_step(model, tx, s, b, config))(state, batch)

    def delta(mod):
        return sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(state2.params[mod]),
            jax.tree_util.tree_leaves(p0[mod])))

    assert delta("filter_net") > 0
    assert delta("flownets") > 0
    assert delta("rectify_net") > 0
    # frozen groups must not move (reference keeps them out of the optimizer)
    assert delta("occ_net") == 0
    assert delta("ctx_net") == 0
    assert delta("deconv_field") == 0
    assert np.isfinite(float(metrics["total"]))
    assert int(state2.step) == 1


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device(rng):
    """DP over the 8-device CPU mesh must give the same loss and gradients as
    one device (up to f32 reduction-order noise).  Post-optimizer params are
    NOT compared: Adamax's first step is ~sign(g)*lr, so reduction noise on
    near-zero gradients legitimately flips update signs."""
    model = DAIN()
    config = TrainConfig()
    batch = _tiny_batch(rng, b=8)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, config)

    from vfidkr_tpu.training.train_state import _model_losses

    def loss_and_grads(params, b):
        def f(p):
            total, _ = _model_losses(model, {"params": p}, b, config, True, False)
            return total
        return jax.value_and_grad(f)(params)

    fn = jax.jit(loss_and_grads)
    ref_loss, ref_grads = fn(state.params, batch)

    mesh = create_mesh()
    assert mesh.devices.size == 8
    dp_loss, dp_grads = fn(replicate(state.params, mesh),
                           shard_batch(batch, mesh))

    assert abs(float(dp_loss) - float(ref_loss)) < 1e-4
    # Tolerances allow a small tail of discrete flips: batch-size-dependent
    # conv accumulation order shifts flows by ~1 ulp, which can flip a
    # floor() landing index and change individual warp taps outright —
    # inherent to the op, not a DP bug (the loss above agrees to 1e-4).
    for a, b in zip(jax.tree_util.tree_leaves(dp_grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > (2e-4 + 5e-3 * np.abs(b))
        assert bad.mean() < 1e-3, (bad.mean(), np.abs(a - b).max())
        assert np.abs(a - b).max() < 5e-3


@pytest.mark.slow
def test_slowmotion_train_step_updates_batch_stats(rng):
    """DAIN_slowmotion trains with MegaDepth BN in batch-stats mode; the
    train step must thread batch_stats updates and freeze depth/ctx params
    (reference excludes them from the optimizer)."""
    from vfidkr_tpu.models import DAINSlowMotion

    model = DAINSlowMotion(timestep=0.5, train_bn=True)
    config = TrainConfig()
    batch = _tiny_batch(rng, b=1, h=64, w=64)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, config)
    assert state.batch_stats, "MegaDepth BN stats expected"

    bn0 = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    d0 = jax.tree_util.tree_leaves(state.params["depth_net"])[0].copy()
    state2, metrics = jax.jit(
        lambda s, b: train_step(model, tx, s, b, config))(state, batch)

    bn1 = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert float(jnp.abs(bn1 - bn0).max()) > 0          # running stats moved
    d1 = jax.tree_util.tree_leaves(state2.params["depth_net"])[0]
    assert float(jnp.abs(d1 - d0).max()) == 0           # depth net frozen
    assert np.isfinite(float(metrics["total"]))
