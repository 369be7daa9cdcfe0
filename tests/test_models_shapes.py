"""Model construction + forward shape smoke tests (CPU, tiny inputs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfidkr_tpu.models import (
    DAIN,
    DAINSlowMotion,
    MegaDepthHourglass,
    MonoNet5,
    OccNet,
    PWCDCNet,
    build_model,
    multiple_basic_block_4,
    s2df_3dense,
)


def test_mononet5_shapes(rng):
    x = jnp.asarray(rng.rand(1, 64, 96, 6), jnp.float32)
    m = MonoNet5()
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 64, 96, 16)


def test_s2df_shapes(rng):
    x = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)
    m = s2df_3dense()
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 32, 48, 195)   # 3 + 3*64


def test_rectifier_shapes(rng):
    x = jnp.asarray(rng.rand(1, 16, 16, 45), jnp.float32)
    m = multiple_basic_block_4(128)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 16, 16, 3)


@pytest.mark.slow
def test_pwcnet_shapes(rng):
    i0 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
    m = PWCDCNet()
    params = m.init(jax.random.PRNGKey(0), i0, i2)
    flow = m.apply(params, i0, i2)
    assert flow.shape == (1, 16, 32, 2)   # 1/4 resolution
    flows = m.apply(params, i0, i2, output_more=True)
    assert [f.shape[1] for f in flows] == [16, 8, 4, 2, 1]


def test_pwcnet_dense_split_matches_concat(rng):
    """dense_impl='split' (split-weight evaluation, no concat buffers) vs
    the reference concat formulation: identical param tree; identical math
    up to f32 reassociation.  The single-level probe matches tightly; the
    full 5-level flow is compared loosely because sub-ulp flow differences
    shift warp sample positions and amplify level-over-level (chaotic at
    random init; see models/pwcnet.py dense_impl docstring)."""
    i0 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
    m0 = PWCDCNet()
    ms = PWCDCNet(dense_impl="split")
    p = jax.jit(m0.init)(jax.random.PRNGKey(0), i0, i2)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(
                jax.jit(ms.init)(jax.random.PRNGKey(0), i0, i2)))
    l6_0 = m0.apply(p, i0, i2, method="decode_upto", upto=6)
    l6_s = ms.apply(p, i0, i2, method="decode_upto", upto=6)
    np.testing.assert_allclose(np.asarray(l6_s), np.asarray(l6_0),
                               rtol=1e-5, atol=1e-6)
    f0 = m0.apply(p, i0, i2)
    fs = ms.apply(p, i0, i2)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(f0),
                               rtol=0.2, atol=5e-3)


def test_occnet_shapes(rng):
    x = jnp.asarray(rng.rand(1, 64, 64, 6), jnp.float32)
    m = OccNet()
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 64, 64, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


@pytest.mark.slow
def test_megadepth_shapes(rng):
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m = MegaDepthHourglass()
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 64, 64, 1)
    assert "batch_stats" in variables


@pytest.mark.slow
def test_megadepth_fusion_variants_share_params_and_outputs(rng):
    """The inception-cell fusion reformulations (models/megadepth.py) must
    declare the identical param tree and match the unfused evaluation to f32
    rounding (both default OFF per the device ablation; this keeps the
    opt-in paths honest)."""
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m0 = MegaDepthHourglass(fuse_stage1=False, fuse_stage2_max_hw=0)
    variables = m0.init(jax.random.PRNGKey(0), x)
    y0 = m0.apply(variables, x)
    for kw in (dict(fuse_stage1=True, fuse_stage2_max_hw=0),
               dict(fuse_stage1=True, fuse_stage2_max_hw=1 << 30)):
        m = MegaDepthHourglass(**kw)
        v2 = m.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape, variables, v2))
        y = m.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   rtol=2e-5, atol=2e-6)


def test_megadepth_packed_matches_unpacked(rng):
    """Phase-packed hourglass evaluation (packed=True, models/phasepack.py
    general-k machinery) must share the exact param tree with the canonical
    mode and reproduce its output to f32 rounding — both with the original
    params (in-graph kernel packing) and with ``prepack_megadepth``'d
    params (the load-time path inference drivers use).

    Deliberately in the QUICK suite (~20 s warm): apps/interpolate_video.py
    defaults to depth_impl='packed', so the default driver configuration
    must be parity-covered on every test run (round-3 advisor)."""
    from vfidkr_tpu.models.megadepth import prepack_megadepth

    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m0 = MegaDepthHourglass()
    variables = m0.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(m0.apply(variables, x))

    mp = MegaDepthHourglass(packed=True)
    vp = mp.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, variables, vp))
    yp = np.asarray(mp.apply(variables, x))
    np.testing.assert_allclose(yp, y0, rtol=2e-5, atol=2e-6)

    vpre = dict(variables)
    vpre["params"] = prepack_megadepth(variables["params"])
    yq = np.asarray(mp.apply(vpre, x))
    np.testing.assert_allclose(yq, y0, rtol=2e-5, atol=2e-6)


def test_mononet_packed_matches_chained(rng):
    """Phase-packed evaluation (models/phasepack.py) must share the exact
    param tree with the chained path and match its outputs to f32 rounding
    (MonoNet5 trunk + a branch head)."""
    from vfidkr_tpu.models.mononet import BranchHead, MonoNet5
    from vfidkr_tpu.models.phasepack import unpack2

    x = jnp.asarray(rng.rand(1, 64, 96, 6), jnp.float32)
    m0, mp = MonoNet5(impl="chained"), MonoNet5(impl="packed")
    p = m0.init(jax.random.PRNGKey(0), x)
    p2 = mp.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(jnp.array_equal, p, p2))
    y0 = m0.apply(p, x)
    yp = unpack2(mp.apply(p, x))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)

    h0, hp = BranchHead(16, impl="chained"), BranchHead(16, impl="packed")
    ph = h0.init(jax.random.PRNGKey(1), y0)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        jnp.array_equal, ph, hp.init(jax.random.PRNGKey(1),
                                     mp.apply(p, x))))
    f0 = h0.apply(ph, y0)
    fp = unpack2(hp.apply(ph, mp.apply(p, x)))
    np.testing.assert_allclose(np.asarray(fp), np.asarray(f0),
                               rtol=1e-5, atol=1e-5)


def test_dain_forward(rng):
    i0 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
    m = build_model("DAIN")
    # jit so the persistent compile cache makes warm re-runs cheap (eager
    # per-op dispatch of the full graph costs ~45 s on the 1-CPU test host)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), i0, i2)
    res = jax.jit(m.apply)(params, i0, i2)
    out, rect = res["outputs"]
    assert out.shape == (1, 64, 128, 3)
    assert rect.shape == (1, 64, 128, 3)
    assert res["offsets"][0].shape == (1, 64, 128, 2)
    assert res["filters"][0].shape == (1, 64, 128, 16)
    # vestigial nets' params exist for checkpoint interop
    assert "occ_net" in params["params"]
    assert "deconv_field" in params["params"]
    assert "ctx_net" in params["params"]


@pytest.mark.slow
def test_dain_train_grads(rng):
    i0 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    i1 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m = DAIN()
    params = m.init(jax.random.PRNGKey(0), i0, i2, train=True)

    def loss_fn(p):
        res = m.apply(p, i0, i2, train=True)
        return sum(jnp.mean(jnp.abs(o - i1)) for o in res["outputs"])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # flow net must receive gradient through projection + filter interp
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(grads["params"]["flownets"]))
    assert gsum > 0


@pytest.mark.slow
def test_dain_slowmotion_forward(rng):
    i0 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m = DAINSlowMotion(timestep=0.25)
    variables = m.init(jax.random.PRNGKey(0), i0, i2)
    res = m.apply(variables, i0, i2)
    outs, rects = res["outputs"]
    assert len(outs) == 3 and len(rects) == 3   # 1/0.25 - 1 frames
    assert outs[0].shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_dain_slowmotion_packed_depth_matches(rng):
    """depth_impl='packed' (phase-packed hourglass + prepacked kernels, the
    video-driver eval default) must share the canonical param tree and match
    the chained model's outputs to conv-rounding tolerance."""
    from vfidkr_tpu.models.megadepth import prepack_megadepth

    i0 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m0 = DAINSlowMotion(timestep=0.5)
    variables = m0.init(jax.random.PRNGKey(0), i0, i2)
    (y0,), (r0,) = m0.apply(variables, i0, i2)["outputs"]

    mp = DAINSlowMotion(timestep=0.5, depth_impl="packed")
    vp = mp.init(jax.random.PRNGKey(0), i0, i2)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, variables, vp))

    vpre = dict(variables)
    vpre["params"] = dict(variables["params"])
    vpre["params"]["depth_net"] = prepack_megadepth(
        variables["params"]["depth_net"])
    (yp,), (rp,) = mp.apply(vpre, i0, i2)["outputs"]
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(r0),
                               rtol=1e-3, atol=1e-4)


def test_dain_slowmotion_scan_steps_match_unrolled_1frame(rng):
    """steps_impl='scan' (one traced step, the 8x compile-blow-up fix) must
    share the unrolled param tree and reproduce its outputs bit-exactly.
    Quick-suite case: t=0.5 -> a length-1 scan exercises the nn.scan
    machinery cheaply; the multi-step case is the @slow test below."""
    i0 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m0 = DAINSlowMotion(timestep=0.5)
    ms = DAINSlowMotion(timestep=0.5, steps_impl="scan")
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), i0, i2)
    vs = jax.jit(ms.init)(jax.random.PRNGKey(0), i0, i2)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        jnp.array_equal, v, vs))
    r0 = jax.jit(m0.apply)(v, i0, i2)
    rs = jax.jit(ms.apply)(v, i0, i2)
    for a, b in zip(r0["outputs"][1], rs["outputs"][1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(r0["offsets"], rs["offsets"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_dain_slowmotion_scan_steps_match_unrolled_4x(rng):
    """Multi-step scan parity at t=0.25 (3 frames): outputs and final-step
    offsets must match the unrolled loop bit-exactly (same ops, same order,
    only the tracing strategy differs)."""
    i0 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    m0 = DAINSlowMotion(timestep=0.25)
    ms = DAINSlowMotion(timestep=0.25, steps_impl="scan")
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), i0, i2)
    r0 = jax.jit(m0.apply)(v, i0, i2)
    rs = jax.jit(ms.apply)(v, i0, i2)
    outs0, rects0 = r0["outputs"]
    outss, rectss = rs["outputs"]
    assert len(outss) == 3 and len(rectss) == 3
    for a, b in zip(outs0 + rects0, outss + rectss):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
