"""Full-graph BACKWARD parity (VERDICT r2 item 5): end-to-end model gradients
vs torch autograd through the reference graph.

The reference torch DAIN / DAIN_slowmotion run on CPU with their CUDA ops
replaced by *differentiable* torch emulations (ref_emu._make_diff_stub_modules
— FilterInterpolation/FlowProjection backwards are the autodiff of their
forwards; DepthFlowProjection carries the reference's ``(f - out)``
depth-grad quirk as an explicit autograd.Function backward,
depthflowprojection_cuda_kernel.cu:312-330).  The training loss
``charbonnier(rectified - y)`` (train.py:186, alpha=[0,1]) is backpropagated
through both graphs; per-parameter gradients are compared through the same
``convert_dain_state_dict`` mapping used for weights (pure renames +
transposes, so it maps gradients exactly).

Both sides run the eval graph with gradients enabled: the reference's
slowmotion train branch is bit-rotted (``losses += [cur_output -
cur_input_1]`` subtracts a tensor from a python list,
DAIN_slowmotion.py:188), and eval-with-grads is module-wise identical to the
train graph — FlowProjection sees requires_grad=True inputs either way, so
hole fill stays off (FlowProjectionLayer.py:23).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import ref_emu  # noqa: E402
from vfidkr_tpu.convert import convert_dain_state_dict  # noqa: E402
from vfidkr_tpu.models import DAIN, DAINSlowMotion  # noqa: E402
from vfidkr_tpu.ops import depth_flow_project  # noqa: E402
from vfidkr_tpu.training import loss as L  # noqa: E402
from vfidkr_tpu.training.checkpoint import (  # noqa: E402
    filtered_partial_load, flatten_tree)

pytestmark = [pytest.mark.parity]

EPS = 1e-6


def test_diff_stubs_match_numpy_stubs(rng):
    """Pin the differentiable torch emulations' forwards to the NumPy stubs
    (which test_emu_matches_golden pins to the loop oracles)."""
    h, w = 12, 16
    img = rng.rand(2, 3, h, w).astype(np.float32)
    flow = ((rng.rand(2, 2, h, w).astype(np.float32) - 0.5) * 5)
    filt = rng.rand(2, 16, h, w).astype(np.float32)
    d = (rng.rand(2, 1, h, w).astype(np.float32) + 0.1)

    fi, fp, dfp = ref_emu._make_diff_stub_modules(torch)
    got = fi()(torch.from_numpy(img), torch.from_numpy(flow),
               torch.from_numpy(filt)).detach().numpy()
    want = np.stack([ref_emu.np_filter_interpolate(
        img[b].transpose(1, 2, 0), flow[b].transpose(1, 2, 0),
        filt[b].transpose(1, 2, 0)).transpose(2, 0, 1) for b in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got = fp(requires_grad=True)(torch.from_numpy(flow)).detach().numpy()
    want = np.stack([ref_emu.np_flow_project(
        flow[b].transpose(1, 2, 0))[0].transpose(2, 0, 1) for b in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got = dfp(requires_grad=True)(
        torch.from_numpy(flow), torch.from_numpy(d)).detach().numpy()
    want = np.stack([ref_emu.np_depth_flow_project(
        flow[b].transpose(1, 2, 0), d[b, 0])[0].transpose(2, 0, 1)
        for b in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dfp_torch_backward_matches_jax_vjp(rng):
    """The torch DepthFlowProjection Function's backward must equal our
    reference-exact custom VJP — including the (f - out) quirk."""
    h, w = 12, 16
    flow = ((rng.rand(1, 2, h, w).astype(np.float32) - 0.5) * 5)
    d = (rng.rand(1, 1, h, w).astype(np.float32) + 0.1)
    g = rng.rand(1, 2, h, w).astype(np.float32)

    _, _, dfp = ref_emu._make_diff_stub_modules(torch)
    ft = torch.from_numpy(flow).requires_grad_()
    dt = torch.from_numpy(d).requires_grad_()
    out = dfp(requires_grad=True)(ft, dt)
    out.backward(torch.from_numpy(g))

    def f(fl, dd):
        return depth_flow_project(fl, dd, hole_fill=False)

    fj = jnp.asarray(flow.transpose(0, 2, 3, 1))
    dj = jnp.asarray(d.transpose(0, 2, 3, 1))
    _, vjp = jax.vjp(f, fj, dj)
    gfj, gdj = vjp(jnp.asarray(g.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(ft.grad.numpy().transpose(0, 2, 3, 1),
                               np.asarray(gfj), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dt.grad.numpy()[:, 0],
                               np.asarray(gdj)[..., 0], rtol=1e-4, atol=1e-5)


def _tame(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.5)
        for name, p in model.named_parameters():
            if name.endswith("bias") and p.ndim == 1:
                p.add_((torch.rand(p.shape, generator=g) - 0.5) * 0.02)
    return model


def _compare_grads(tgrads_sd, jax_grads, min_leaves):
    """Map torch grads through the weight converter (renames + transposes
    apply identically to gradients) and compare leaf-by-leaf."""
    gtree = convert_dain_state_dict(tgrads_sd)
    gflat = flatten_tree(gtree.get("params", gtree))
    jflat = flatten_tree(jax_grads)
    compared, worst = 0, 0.0
    for path, tg in gflat.items():
        if path not in jflat:
            continue
        jg = np.asarray(jflat[path], np.float32)
        tg = np.asarray(tg, np.float32)
        assert jg.shape == tg.shape, path
        scale = max(np.abs(tg).max(), np.abs(jg).max(), 1e-12)
        err = np.abs(jg - tg).max() / scale
        worst = max(worst, err)
        np.testing.assert_allclose(jg, tg, rtol=5e-3, atol=5e-3 * scale,
                                   err_msg=str(path))
        compared += 1
    assert compared >= min_leaves, (compared, min_leaves)
    return compared, worst


@pytest.mark.slow
def test_dain_full_graph_backward_parity(rng):
    h, w = 64, 128
    x0 = rng.rand(1, 3, h, w).astype(np.float32)
    y = rng.rand(1, 3, h, w).astype(np.float32)
    x2 = rng.rand(1, 3, h, w).astype(np.float32)

    with ref_emu.reference_env(differentiable=True):
        ref = ref_emu.load_reference_model("DAIN", training=False)
        ref = _tame(ref.eval())
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        outs, _, _ = ref(torch.stack(
            [torch.from_numpy(x0), torch.from_numpy(x2)]))
        rect = outs[1]
        total = torch.mean(torch.sqrt(
            (rect - torch.from_numpy(y)) ** 2 + EPS ** 2))
        total.backward()
        tgrads = {k: (p.grad.numpy() if p.grad is not None
                      else np.zeros(p.shape, np.float32))
                  for k, p in ref.named_parameters()}

    model = DAIN()
    i0 = jnp.asarray(x0.transpose(0, 2, 3, 1))
    i2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
    yj = jnp.asarray(y.transpose(0, 2, 3, 1))
    init_vars = jax.device_get(model.init(jax.random.PRNGKey(0), i0, i2))
    merged, loaded, _ = filtered_partial_load(
        init_vars, convert_dain_state_dict(sd))
    assert len(loaded) > 200

    def loss_fn(params):
        out = model.apply({"params": params}, i0, i2, train=True)
        return L.charbonnier_loss(out["outputs"][1] - yj, EPS)

    jgrads = jax.grad(loss_fn)(merged["params"])
    compared, worst = _compare_grads(tgrads, jgrads, min_leaves=150)


@pytest.mark.slow
def test_dain_slowmotion_full_graph_backward_parity(rng):
    h, w = 64, 128
    ts = 0.5    # 1 intermediate frame keeps the depth+context graph cheap
    x0 = rng.rand(1, 3, h, w).astype(np.float32)
    y = rng.rand(1, 3, h, w).astype(np.float32)
    x2 = rng.rand(1, 3, h, w).astype(np.float32)

    with ref_emu.reference_env(differentiable=True):
        ref = ref_emu.load_reference_model(
            "DAIN_slowmotion", training=False, timestep=ts)
        ref = _tame(ref.eval())
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        outs, _, _ = ref(torch.stack(
            [torch.from_numpy(x0), torch.from_numpy(x2)]))
        rect = outs[1][0]                      # eval returns per-step lists
        total = torch.mean(torch.sqrt(
            (rect - torch.from_numpy(y)) ** 2 + EPS ** 2))
        total.backward()
        tgrads = {k: (p.grad.numpy() if p.grad is not None
                      else np.zeros(p.shape, np.float32))
                  for k, p in ref.named_parameters()}

    model = DAINSlowMotion(timestep=ts)
    i0 = jnp.asarray(x0.transpose(0, 2, 3, 1))
    i2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
    yj = jnp.asarray(y.transpose(0, 2, 3, 1))
    init_vars = jax.device_get(model.init(jax.random.PRNGKey(0), i0, i2))
    merged, loaded, _ = filtered_partial_load(
        init_vars, convert_dain_state_dict(sd))
    assert len(loaded) > 500

    non_params = {k: v for k, v in merged.items() if k != "params"}

    def loss_fn(params):
        out = model.apply({"params": params, **non_params}, i0, i2,
                          train=True)
        return L.charbonnier_loss(out["outputs"][1][0] - yj, EPS)

    jgrads = jax.grad(loss_fn)(merged["params"])
    compared, worst = _compare_grads(tgrads, jgrads, min_leaves=200)
