#!/usr/bin/env python
"""Per-stage fwd/bwd attribution of the DAIN train step (VERDICT r4 item 1).

The train step measured 225.3 ms at B=3 @448x256 (bench_matrix round 3)
while the eval forward is ~9 ms/frame — the backward has never been
profiled.  This tool slope-times each stage's forward AND its VJP at the
shapes the training graph sees (batch 3, 256x448 crop, reference
train.py:71-77), so the expensive backwards are attributable:

  filter    filter_interpolate slab fwd / vjp          on (2B, H, W, 3)
  project   flow_project (train: no fill) fwd / vjp    on (2B, H, W, 2)
  pwc       bidirectional PWC fwd / vjp                on (B, H, W, 3) pairs
  mononet   MonoNet5 trunk + heads fwd / vjp           on (B, H, W, 6)
  rectify   MultipleBasicBlock_4 fwd / vjp             on (B, H, W, 45)
  step      the full jitted train_step (fwd+bwd+Adamax update)

Each VJP measurement computes ALL input gradients (image/flow/filter etc.)
and keeps them live via reduced-scalar feedback.  Usage:

  python tools/ubench_trainstep.py [stage ...]      (default: all but step)
  python tools/ubench_trainstep.py step             (compile-heavy)

Run ONE TPU process at a time (CLAUDE.md timing rules).
"""

from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np

B = 3
H, W = 256, 448


def _flow(rng, n, scale=10.0):
    return ((rng.rand(n, H, W, 2).astype(np.float32) - 0.5) * 2 * scale)


def stage_filter(mode, impl="slab", n=2 * B, n1=10, n2=40):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops import filter_interpolate
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(n, H, W, 3), jnp.float32)
    filt = jnp.asarray(rng.rand(n, H, W, 16), jnp.float32)
    flow0 = jnp.asarray(_flow(rng, n), jnp.float32)

    fi = functools.partial(filter_interpolate, filter_size=4, impl=impl)

    if mode == "fwd":
        def step(flow):
            out = fi(img, flow, filt)
            r = jnp.mean(out, axis=(1, 2, 3))
            return flow * 0.999 + 1e-6 * r[:, None, None, None]
    else:
        def step(flow):
            out, vjp = jax.vjp(fi, img, flow, filt)
            gi, gf, gk = vjp(out)
            return (flow * 0.999 + 1e-6 * gf
                    + 1e-9 * (jnp.sum(gi) + jnp.sum(gk)))

    return device_time_slope(jax.jit(step), flow0, n1=n1, n2=n2)


def stage_project(mode):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops import flow_project
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    flow0 = jnp.asarray(_flow(rng, 2 * B), jnp.float32)
    fp = functools.partial(flow_project, hole_fill=False)   # train mode

    if mode == "fwd":
        def step(flow):
            out = fp(flow)
            return flow * 0.999 + 1e-6 * out
    else:
        def step(flow):
            out, vjp = jax.vjp(fp, flow)
            gf, = vjp(out)
            return flow * 0.999 + 1e-6 * gf

    return device_time_slope(jax.jit(step), flow0, n1=10, n2=40)


def stage_scatter_bwd_only(_):
    """The _scatter4_transpose VJP body alone (chunked one-hot matmuls)."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops.flow_projection import (_landing, _scatter4_transpose)
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    flow = jnp.asarray(_flow(rng, 2 * B), jnp.float32)
    _, _, _, ix_l, ix_r, iy_t, iy_b = jax.vmap(_landing)(flow)
    g0 = jnp.asarray(rng.rand(2 * B, H, W, 3), jnp.float32)

    def step(g):
        d = jax.vmap(_scatter4_transpose)(iy_t, iy_b, ix_l, ix_r, g)
        return g * 0.999 + 1e-6 * d

    return device_time_slope(jax.jit(step), g0, n1=10, n2=40)


def stage_pwc(mode, chunk=None, dense="concat"):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    model = PWCDCNet(batch_chunk=chunk,   # train default: unchunked
                     dense_impl=dense)
    params = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")

    def fwd(p, x):
        f, bk = model.apply(p, x, i2, method="bidirectional")
        return jnp.mean(f) + jnp.mean(bk)

    if mode == "fwd":
        def step(x):
            return x * 0.999 + 1e-4 * fwd(params, x)
    else:
        def step(x):
            l, (gp, gx) = jax.value_and_grad(fwd, argnums=(0, 1))(params, x)
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gp))
            return x * 0.999 + 1e-4 * gx + 1e-9 * gsum

    return device_time_slope(jax.jit(step), i0, n1=10, n2=40)


def stage_pwc_part(mode, method="pyramid_only", upto=None):
    """Bisect the PWC backward: pyramid alone, then decode stopped at
    successive levels (6 = coarsest decode only .. 2 = full)."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    model = PWCDCNet(batch_chunk=None)
    kw = {} if upto is None else {"upto": upto}
    params = jax.jit(model.init,
                     static_argnames=("method", "upto"))(
        jax.random.PRNGKey(0), i0, i2, method=method, **kw)

    def fwd(p, x):
        out = model.apply(p, x, i2, method=method, **kw)
        return sum(jnp.mean(t ** 2) for t in jax.tree_util.tree_leaves(out))

    if mode == "fwd":
        def step(x):
            return x * 0.999 + 1e-4 * fwd(params, x)
    else:
        def step(x):
            l, (gp, gx) = jax.value_and_grad(fwd, argnums=(0, 1))(params, x)
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gp))
            return x * 0.999 + 1e-4 * gx + 1e-9 * gsum

    return device_time_slope(jax.jit(step), i0, n1=10, n2=40)


def stage_corr(mode, n=2 * B, hh=64, ww=112, c=32):
    """The correlation cost volume alone at the level-2 decode shape (the
    largest corr call in the train graph)."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops.correlation import correlation_cost_volume
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.rand(n, hh, ww, c), jnp.float32)
    f2 = jnp.asarray(rng.rand(n, hh, ww, c), jnp.float32)

    def fn(a):
        return jnp.mean(correlation_cost_volume(a, f2) ** 2)

    if mode == "fwd":
        def step(a):
            return a * 0.999 + 1e-4 * fn(a)
    else:
        def step(a):
            g = jax.grad(fn)(a)
            return a * 0.999 + 1e-4 * g

    return device_time_slope(jax.jit(step), f1, n1=10, n2=40)


def stage_mononet(mode, pool="custom"):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.mononet import BranchHead, MonoNet5
    from vfidkr_tpu.utils.profiling import device_time_slope

    if pool == "reduce_window":        # pre-round-5 nn.max_pool A/B arm
        import flax.linen as nn
        from vfidkr_tpu.models import mononet as _mn
        _mn.max_pool_2x2 = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, H, W, 6), jnp.float32)
    trunk = MonoNet5()
    h1, h2 = BranchHead(16), BranchHead(16)
    pt = jax.jit(trunk.init)(jax.random.PRNGKey(0), x0)
    t0 = trunk.apply(pt, x0)
    p1 = jax.jit(h1.init)(jax.random.PRNGKey(1), t0)
    p2 = jax.jit(h2.init)(jax.random.PRNGKey(2), t0)

    def fwd(ps, x):
        pt, p1, p2 = ps
        t = trunk.apply(pt, x)
        return jnp.mean(h1.apply(p1, t) ** 2) + jnp.mean(h2.apply(p2, t) ** 2)

    ps = (pt, p1, p2)
    if mode == "fwd":
        def step(x):
            return x * 0.999 + 1e-4 * fwd(ps, x)
    else:
        def step(x):
            l, (gp, gx) = jax.value_and_grad(fwd, argnums=(0, 1))(ps, x)
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gp))
            return x * 0.999 + 1e-4 * gx + 1e-9 * gsum

    return device_time_slope(jax.jit(step), x0, n1=10, n2=40)


def stage_rectify(mode):
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.resblock import MultipleBasicBlock
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, H, W, 45), jnp.float32)
    m = MultipleBasicBlock(4, 128)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x0)

    def fwd(p, x):
        return jnp.mean(m.apply(p, x) ** 2)

    if mode == "fwd":
        def step(x):
            return x * 0.999 + 1e-4 * fwd(params, x)
    else:
        def step(x):
            l, (gp, gx) = jax.value_and_grad(fwd, argnums=(0, 1))(params, x)
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gp))
            return x * 0.999 + 1e-4 * gx + 1e-9 * gsum

    return device_time_slope(jax.jit(step), x0, n1=10, n2=40)


def stage_depth(mode):
    """MegaDepth hourglass at the train shape (2B images — DAIN runs it on
    the concatenated frame pair; frozen LR group but still differentiated
    for input grads, so its bwd is in the step)."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.megadepth import MegaDepthHourglass
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(2 * B, H, W, 3), jnp.float32)
    m = MegaDepthHourglass()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x0)

    def fwd(p, x):
        return jnp.mean(m.apply(p, x) ** 2)

    if mode == "fwd":
        def step(x):
            return x * 0.999 + 1e-4 * fwd(params, x)
    elif mode == "bwd_input":
        # frozen-group semantics: params get no grad (stop_gradient), only
        # the input grad flows — this is what the train step actually pays
        def step(x):
            g = jax.grad(lambda xx: fwd(jax.lax.stop_gradient(params),
                                        xx))(x)
            return x * 0.999 + 1e-4 * g
    else:
        def step(x):
            l, (gp, gx) = jax.value_and_grad(fwd, argnums=(0, 1))(params, x)
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gp))
            return x * 0.999 + 1e-4 * gx + 1e-9 * gsum

    return device_time_slope(jax.jit(step), x0, n1=5, n2=20)


def stage_conv1(mode, ks=3, cin=128, cout=128):
    """One conv at the rectifier's shape — attributes the conv-backward
    overhead (data grad vs weight grad vs fwd).  ks/cin/cout vary the
    kernel: the rectifier's 7x7 45->128 head is the suspect for its
    5.3x bwd/fwd ratio."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, H, W, cin), jnp.float32)
    k0 = jnp.asarray(rng.rand(ks, ks, cin, cout) * 0.05, jnp.float32)
    p = ks // 2

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if mode == "fwd":
        def step(x):
            return x * 0.999 + 1e-4 * jnp.mean(conv(x, k0))
    elif mode == "bwd_data":
        def step(x):
            g = jax.grad(lambda xx: jnp.mean(conv(xx, k0) ** 2))(x)
            return x * 0.999 + 1e-4 * g
    else:   # bwd_weight
        def step(x):
            gk = jax.grad(lambda kk: jnp.mean(conv(x, kk) ** 2))(k0)
            return x * 0.999 + 1e-4 * jnp.sum(gk)

    return device_time_slope(jax.jit(step), x0, n1=20, n2=80)


def stage_step(_, xla_bwd=False, freeze=True, dense="concat"):
    """Full train_step (fwd+bwd+Adamax).  Compile-heavy: ~13+ min cold on
    this host; cached thereafter (enable_persistent_cache).

    xla_bwd: force the pre-round-5 XLA op backwards (VFIDKR_XLA_BWD gate,
    read at trace time).  freeze: stop_gradient the frozen LR groups so
    their dead backward is DCE'd (train_step freeze_dead_backward)."""
    import os
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.config import ModelConfig
    from vfidkr_tpu.training import TrainConfig, create_train_state, train_step
    from vfidkr_tpu.utils.profiling import device_time

    if xla_bwd:
        os.environ["VFIDKR_XLA_BWD"] = "1"
    else:
        os.environ.pop("VFIDKR_XLA_BWD", None)

    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
             for k in ("x0", "x1", "y")}
    config = TrainConfig()
    model = ModelConfig(net_name="DAIN", pwc_batch_chunk=None,
                        dense_impl=dense).build()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   config)
    jit_train = jax.jit(lambda s, b: train_step(
        model, tx, s, b, config, freeze_dead_backward=freeze))

    import time
    t0 = time.time()
    state2, _ = jit_train(state, batch)
    jax.block_until_ready(state2.params)
    print(f"  [compile+1st step: {time.time() - t0:.0f}s]", file=sys.stderr)

    def step(s):
        s2, _ = jit_train(s, batch)
        return s2

    # feedback through the state pytree keeps every iteration live
    return device_time(step, state, iters=20)


def stage_step_ab():
    """ONE-process A/B of the train step: round-4 op backwards + dead
    frozen-group backward vs the round-5 Pallas backwards vs + frozen-group
    DCE (the shipped configuration)."""
    out = {}
    for tag, kw in (("step_r4_xla_bwd", dict(xla_bwd=True, freeze=False)),
                    ("step_pallas_bwd", dict(xla_bwd=False, freeze=False)),
                    ("step_pallas_frozen_dce", dict(xla_bwd=False,
                                                    freeze=True))):
        ms = stage_step(None, **kw) * 1e3
        out[tag] = round(ms, 3)
        print(f"{tag:>24}: {ms:8.3f} ms", file=sys.stderr, flush=True)
    return out


STAGES = {
    "filter_fwd": lambda: stage_filter("fwd"),
    "filter_bwd": lambda: stage_filter("bwd"),
    # the block-vjp backward CRASHES the TPU worker inside a >=10-iter
    # feedback scan at the (6, 256, 448) train shape (measured r5) — the
    # small-iteration B=2 variants below bound its cost instead
    "filter_bwd_small": lambda: stage_filter("bwd", n=2, n1=3, n2=9),
    "filter_block_bwd_small": lambda: stage_filter("bwd", impl="block",
                                                   n=2, n1=3, n2=9),
    "project_fwd": lambda: stage_project("fwd"),
    "project_bwd": lambda: stage_project("bwd"),
    "scatter_bwd_only": lambda: stage_scatter_bwd_only(None),
    "pwc_fwd": lambda: stage_pwc("fwd"),
    "pwc_bwd": lambda: stage_pwc("bwd"),
    "pwc_fwd_c4": lambda: stage_pwc("fwd", chunk=4),
    "pwc_bwd_c4": lambda: stage_pwc("bwd", chunk=4),
    "pwc_pyr_fwd": lambda: stage_pwc_part("fwd"),
    "pwc_pyr_bwd": lambda: stage_pwc_part("bwd"),
    "pwc_upto6_bwd": lambda: stage_pwc_part("bwd", "decode_upto", 6),
    "pwc_upto4_bwd": lambda: stage_pwc_part("bwd", "decode_upto", 4),
    "pwc_upto2_bwd": lambda: stage_pwc_part("bwd", "decode_upto", 2),
    "corr_fwd": lambda: stage_corr("fwd"),
    "corr_bwd": lambda: stage_corr("bwd"),
    "pwc_bwd_split": lambda: stage_pwc("bwd", dense="split"),
    "conv7_fwd": lambda: stage_conv1("fwd", ks=7, cin=45),
    "conv7_bwd_data": lambda: stage_conv1("bwd_data", ks=7, cin=45),
    "conv7_bwd_weight": lambda: stage_conv1("bwd_weight", ks=7, cin=45),
    "mononet_fwd": lambda: stage_mononet("fwd"),
    "mononet_bwd": lambda: stage_mononet("bwd"),
    "mononet_bwd_rw": lambda: stage_mononet("bwd", pool="reduce_window"),
    "rectify_fwd": lambda: stage_rectify("fwd"),
    "rectify_bwd": lambda: stage_rectify("bwd"),
    "conv1_fwd": lambda: stage_conv1("fwd"),
    "conv1_bwd_data": lambda: stage_conv1("bwd_data"),
    "conv1_bwd_weight": lambda: stage_conv1("bwd_weight"),
    "depth_fwd": lambda: stage_depth("fwd"),
    "depth_bwd": lambda: stage_depth("bwd"),
    "depth_bwd_input": lambda: stage_depth("bwd_input"),
    "step": lambda: stage_step(None),                      # shipped config
    "step_nofreeze": lambda: stage_step(None, freeze=False),
    "step_xlabwd": lambda: stage_step(None, xla_bwd=True, freeze=False),
    "step_split": lambda: stage_step(None, dense="split"),   # train driver
}


def main():
    from vfidkr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    names = sys.argv[1:] or [k for k in STAGES
                             if k != "step" and not k.startswith("depth")]
    out = {}
    for name in names:
        if name == "step_ab":
            out.update(stage_step_ab())
            continue
        ms = STAGES[name]() * 1e3
        out[name] = round(ms, 3)
        print(f"{name:>18}: {ms:8.3f} ms", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
