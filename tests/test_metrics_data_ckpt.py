"""Metrics (vs reference torch SSIM formula), Vimeo data pipeline (synthetic
on-disk dataset), and filtered partial checkpoint loading."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from vfidkr_tpu.utils import interpolation_error, pad_to_multiple, psnr, ssim, unpad
from vfidkr_tpu.training.checkpoint import (
    filtered_partial_load,
    flatten_tree,
    unflatten_tree,
)


@pytest.mark.parity
def test_ssim_matches_reference_formula(rng):
    """Reference SSIM (demo_MiddleBury.py:24-162): separable 11-tap gaussian
    (sigma 1.5), VALID windows, K=(0.01,0.03) — reimplemented in torch here."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.rand(2, 32, 40, 3).astype(np.float32)
    y = np.clip(x + rng.randn(2, 32, 40, 3).astype(np.float32) * 0.05, 0, 1)

    coords = torch.arange(11, dtype=torch.float) - 5
    g = torch.exp(-(coords ** 2) / (2 * 1.5 ** 2))
    g = (g / g.sum()).reshape(1, 1, 1, 11).repeat(3, 1, 1, 1)

    def gf(t):
        t = F.conv2d(t, g.transpose(2, 3), groups=3)
        return F.conv2d(t, g, groups=3)

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ty = torch.from_numpy(y.transpose(0, 3, 1, 2))
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = gf(tx), gf(ty)
    s1 = gf(tx * tx) - mu1 ** 2
    s2 = gf(ty * ty) - mu2 ** 2
    s12 = gf(tx * ty) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    smap = ((2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)) * cs
    want = smap.mean().item()

    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) < 1e-5


def test_psnr_ie_basics(rng):
    a = (rng.rand(1, 16, 16, 3) * 255).astype(np.float32)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))) == float("inf")
    b = np.clip(a + 10, 0, 255)
    assert abs(float(interpolation_error(jnp.asarray(a), jnp.asarray(b))) -
               float(np.abs(a - b).mean())) < 1e-4


def test_psnr_batched_averages_per_image(rng):
    """Reference protocol (demo_test_ourdata.py:368-388) averages per-image
    PSNRs; with two images of unequal error, a pooled-MSE PSNR is strictly
    lower than the per-image mean — guard against that regression."""
    gt = (rng.rand(2, 16, 16, 3) * 255).astype(np.float32)
    pred = gt.copy()
    pred[0] = np.clip(gt[0] + 2, 0, 255)    # small error
    pred[1] = np.clip(gt[1] + 40, 0, 255)   # large error

    def one(p, g):
        mse = np.mean((p - g) ** 2)
        return 20.0 * np.log10(255.0 / np.sqrt(mse))

    expected = (one(pred[0], gt[0]) + one(pred[1], gt[1])) / 2.0
    got = float(psnr(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - expected) < 1e-3
    pooled = one(pred, gt)
    assert got > pooled + 0.5  # the two protocols genuinely differ here


def test_pad_to_multiple(rng):
    """Reference policy (demo_MiddleBury.py:294-312): unaligned dims pad to
    the next 128-multiple (448 -> 512, split 32/32); aligned dims get exactly
    32 per side (256 -> 320)."""
    x = jnp.asarray(rng.rand(1, 256, 448, 3), jnp.float32)
    padded, pads = pad_to_multiple(x, 128, 32)
    assert padded.shape[1:3] == (320, 512)
    assert pads == (32, 32, 32, 32)
    back = unpad(padded, pads)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    x2 = jnp.asarray(rng.rand(1, 250, 440, 3), jnp.float32)
    p2, pads2 = pad_to_multiple(x2, 128, 32)
    assert p2.shape[1:3] == (256, 512)
    assert pads2 == (36, 36, 3, 3)   # (left, right, top, bottom)


def _make_synthetic_vimeo(tmp_path, n_seqs=4, hw=(64, 96)):
    rng = np.random.RandomState(0)
    from PIL import Image
    names = []
    for i in range(n_seqs):
        rel = f"00001/{i:04d}"
        d = tmp_path / "sequences" / rel
        d.mkdir(parents=True)
        for f in ("im1.png", "im2.png", "im3.png"):
            arr = (rng.rand(*hw, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f)
        names.append(rel)
    (tmp_path / "tri_trainlist.txt").write_text("\n".join(names[:3]) + "\n\n")
    (tmp_path / "tri_testlist.txt").write_text("\n".join(names[3:]) + "\n\n")
    return names


def test_vimeo_pipeline(tmp_path, rng):
    from vfidkr_tpu.data import Vimeo90KDataset, prefetch, vimeo90k_splits
    _make_synthetic_vimeo(tmp_path)
    train, test = vimeo90k_splits(str(tmp_path))
    assert len(train) == 3 and len(test) == 1

    ds = Vimeo90KDataset(str(tmp_path), train, batch_size=2, augment=True,
                         crop_hw=(32, 48))
    batches = list(prefetch(ds.batches(3), 2))
    assert len(batches) == 3
    b = batches[0]
    assert b["x0"].shape == (2, 32, 48, 3)
    assert b["x0"].dtype == np.float32
    assert 0.0 <= b["x0"].min() and b["x0"].max() <= 1.0
    # sampler keeps drawing beyond one epoch (infinite balanced sampler)
    many = list(ds.batches(5))
    assert len(many) == 5


def test_filtered_partial_load():
    target = {"a": {"w": np.zeros((2, 2))}, "b": {"w": np.zeros(3)}}
    ckpt = {"a": {"w": np.ones((2, 2))},
            "b": {"w": np.ones(4)},              # shape mismatch -> skipped
            "c": {"w": np.ones(1)}}              # unknown key -> skipped
    merged, loaded, skipped = filtered_partial_load(target, ckpt)
    assert merged["a"]["w"].sum() == 4
    assert merged["b"]["w"].sum() == 0
    assert ("a", "w") in loaded
    assert len(skipped) == 2
    # flatten/unflatten round trip
    assert unflatten_tree(flatten_tree(target)).keys() == target.keys()


def test_native_augment_parity(rng):
    """C++ batch augmentation must be bit-identical to the Python path."""
    from vfidkr_tpu.data import native as nat
    if not nat.native_available():
        pytest.skip("native lib not built (make -C native)")
    n, h, w = 4, 64, 96
    im1, im2, im3 = (rng.randint(0, 256, (n, h, w, 3)).astype(np.uint8)
                     for _ in range(3))
    aug = nat.make_aug_records(np.random.RandomState(1), n, h, w, (32, 48), True)
    out = nat.augment_triplet_batch(im1, im2, im3, aug, (32, 48))
    lib, nat._lib = nat._lib, None
    orig = nat.load_native
    nat.load_native = lambda: None
    try:
        ref = nat.augment_triplet_batch(im1, im2, im3, aug, (32, 48))
    finally:
        nat.load_native = orig
        nat._lib = lib
    for k in ("x0", "x1", "y"):
        np.testing.assert_array_equal(out[k], ref[k])


def test_checkpoint_manager_full_trainstate_roundtrip(tmp_path, rng):
    """CheckpointManager (training/checkpoint.py) must roundtrip the FULL
    TrainState — params, Adamax moments per LR group, step counter, and
    plateau scheduler fields (scale/best/num_bad_epochs/cooldown) — and keep
    the reference's epoch layout (epoch<k> dir, previous epoch deleted,
    best on val; train.py:211-218,286-289).  This is the unit contract the
    driver's --resume flow (apps/train.py) relies on."""
    import jax
    import flax.linen as nn
    from vfidkr_tpu.training import (TrainConfig, create_train_state,
                                     plateau_step)
    from vfidkr_tpu.training.checkpoint import CheckpointManager

    class Toy(nn.Module):
        # submodule names land in the real optimizer groups (filter/flow/
        # rectify) plus one frozen module, so opt_state has the
        # multi_transform structure the driver checkpoints
        @nn.compact
        def __call__(self, x0, x1, train=False):
            a = nn.Dense(3, name="filter_net")(x0)
            b = nn.Dense(3, name="flownets")(x1)
            c = nn.Dense(3, name="rectify_net")(a + b)
            return nn.Dense(3, name="ctx_net")(c)

    batch = {"x0": jnp.asarray(rng.rand(2, 4, 5, 3), jnp.float32),
             "x1": jnp.asarray(rng.rand(2, 4, 5, 3), jnp.float32)}
    model = Toy()
    cfg = TrainConfig()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)

    # evolve every leaf away from init: one synthetic optimizer step
    # (populates the Adamax moments), a step bump, and two plateau steps
    # that trigger a reduction (patience=0 -> scale 0.2, num_bad reset)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    pl = plateau_step(state.plateau, 1.0, factor=0.2, patience=0)
    pl = plateau_step(pl, 2.0, factor=0.2, patience=0)   # worse -> reduce
    state = state.replace(step=jnp.asarray(7, jnp.int32), params=params,
                          opt_state=opt_state, plateau=pl)
    assert float(state.plateau.scale) == pytest.approx(0.2)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_epoch(0, state)
    ckpt.save_epoch(1, state)
    assert ckpt.latest_epoch() == 1
    assert not os.path.exists(str(tmp_path / "epoch0"))   # rotated away
    ckpt.save_best(state)

    # restore into a DIFFERENT init (fresh rng) — every leaf must come back
    # bit-exact, incl. optimizer moments and plateau fields
    other, _ = create_train_state(model, jax.random.PRNGKey(1), batch, cfg)
    restored = ckpt.restore("epoch1", jax.device_get(other))
    want = jax.device_get(state)
    flat_w, tdef_w = jax.tree_util.tree_flatten(want)
    flat_r, tdef_r = jax.tree_util.tree_flatten(restored)
    assert tdef_w == tdef_r
    for w, r in zip(flat_w, flat_r):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(r))
    assert int(restored.step) == 7
    assert float(restored.plateau.scale) == pytest.approx(0.2)

    best = ckpt.restore("best", jax.device_get(other))
    np.testing.assert_array_equal(
        np.asarray(best.plateau.best), np.asarray(want.plateau.best))
