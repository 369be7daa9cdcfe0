"""Full-graph forward parity: the *reference* torch DAIN / DAIN_slowmotion
(networks/DAIN.py:101-294, networks/DAIN_slowmotion.py:101-202) run on CPU
with their CUDA ops emulated in NumPy (tests/ref_emu.py), randomized weights
converted through ``convert_dain_state_dict`` — whole-model outputs must
match our flax models.  This is the strongest trained-weight-parity proxy
available without a vendored ``best.pth``."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import golden  # noqa: E402
import ref_emu  # noqa: E402
from vfidkr_tpu.convert import convert_dain_state_dict  # noqa: E402
from vfidkr_tpu.models import DAIN, DAINSlowMotion  # noqa: E402
from vfidkr_tpu.training.checkpoint import filtered_partial_load  # noqa: E402

pytestmark = [pytest.mark.parity]


def test_emu_matches_golden(rng):
    """Pin the vectorized NumPy emulations to the loop oracles."""
    h, w = 12, 16
    img = rng.rand(h, w, 3).astype(np.float32)
    flow = (rng.rand(h, w, 2).astype(np.float32) - 0.5) * 5
    filt = rng.rand(h, w, 16).astype(np.float32)
    np.testing.assert_allclose(
        ref_emu.np_filter_interpolate(img, flow, filt),
        golden.filter_interpolate_fwd(img, flow, filt), rtol=1e-5, atol=1e-6)

    out_e, cnt_e = ref_emu.np_flow_project(flow, fill=True)
    out_g, cnt_g = golden.flow_project_fwd(flow, fill=True)
    np.testing.assert_allclose(cnt_e, cnt_g, atol=0)
    np.testing.assert_allclose(out_e, out_g, rtol=1e-5, atol=1e-6)

    d = rng.rand(h, w).astype(np.float32) + 0.1
    out_e, cnt_e = ref_emu.np_depth_flow_project(flow, d, fill=True)
    out_g, cnt_g = golden.depth_flow_project_fwd(flow, d, fill=True)
    np.testing.assert_allclose(cnt_e, cnt_g, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out_e, out_g, rtol=1e-5, atol=1e-5)


def _tame(model, seed=0):
    """Shrink random weights so deep-graph activations stay sane (same policy
    as test_convert_parity)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.5)
        # free extra entropy into the conv biases so flows are non-trivial
        for name, p in model.named_parameters():
            if name.endswith("bias") and p.ndim == 1:
                p.add_((torch.rand(p.shape, generator=g) - 0.5) * 0.02)
    return model


@pytest.mark.slow
def test_dain_full_graph_parity(rng):
    h, w = 64, 128
    x0 = rng.rand(1, 3, h, w).astype(np.float32)
    x2 = rng.rand(1, 3, h, w).astype(np.float32)

    with ref_emu.reference_env():
        ref = ref_emu.load_reference_model("DAIN", training=False)
        ref = _tame(ref.eval())
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        with torch.no_grad():
            outs, offs, filts = ref(torch.stack(
                [torch.from_numpy(x0), torch.from_numpy(x2)]))
        want_rect = outs[1].numpy().transpose(0, 2, 3, 1)
        want_out = outs[0].numpy().transpose(0, 2, 3, 1)
        want_off0 = offs[0].numpy().transpose(0, 2, 3, 1)

    model = DAIN()
    i0 = jnp.asarray(x0.transpose(0, 2, 3, 1))
    i2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
    init_vars = jax.device_get(model.init(jax.random.PRNGKey(0), i0, i2))
    merged, loaded, skipped = filtered_partial_load(
        init_vars, convert_dain_state_dict(sd))
    assert len(loaded) > 200, (len(loaded), skipped[:5])
    got = model.apply(merged, i0, i2)

    np.testing.assert_allclose(np.asarray(got["offsets"][0]), want_off0,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["outputs"][0]), want_out,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["outputs"][1]), want_rect,
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_dain_slowmotion_full_graph_parity(rng):
    h, w = 64, 128
    ts = 0.25   # 3 intermediate frames
    x0 = rng.rand(1, 3, h, w).astype(np.float32)
    x2 = rng.rand(1, 3, h, w).astype(np.float32)

    with ref_emu.reference_env():
        ref = ref_emu.load_reference_model(
            "DAIN_slowmotion", training=False, timestep=ts)
        ref = _tame(ref.eval())
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        with torch.no_grad():
            outs, offs, filts = ref(torch.stack(
                [torch.from_numpy(x0), torch.from_numpy(x2)]))
        # eval returns lists over the N time steps (:164-202)
        want_rect = [o.numpy().transpose(0, 2, 3, 1) for o in outs[1]]

    model = DAINSlowMotion(timestep=ts)
    i0 = jnp.asarray(x0.transpose(0, 2, 3, 1))
    i2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
    init_vars = jax.device_get(model.init(jax.random.PRNGKey(0), i0, i2))
    merged, loaded, skipped = filtered_partial_load(
        init_vars, convert_dain_state_dict(sd))
    assert len(loaded) > 500, (len(loaded), skipped[:5])
    got = model.apply(merged, i0, i2)

    assert len(got["outputs"][1]) == len(want_rect) == 3
    for k, want in enumerate(want_rect):
        np.testing.assert_allclose(np.asarray(got["outputs"][1][k]), want,
                                   rtol=2e-3, atol=5e-4, err_msg=f"step {k}")
