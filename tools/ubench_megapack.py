#!/usr/bin/env python
"""Phase-packing probe for the MegaDepth inception branch convs.

The hourglass runs at ~19% MXU efficiency (141 GMAC pair in 16.4 ms): its
branch convs emit cout=16 (stage 2) / 32 (stage 1), wasting 7/8 of every
128-lane MXU N-tile.  Generalises the models/phasepack.py 2x2 trick to any
odd k: with r = (k-1)/2, pp = ceil(r/2), kp = floor((1+r)/2) -
floor((1-r)/2) + 1, output phase ry is read from extended cell position
Z = Y + off(ry), off(ry) = pp + floor((ry-r)/2), and tap dy decomposes as
dy = 2*(off(ry) - pp + cy) + qy - ry — one cell conv with kernel
(kp, kp, 4Cin, 4Cout) and cell padding (pp, kp-pp) reproduces the conv
exactly.  MAC ratio 4*kp^2/k^2: k=3 1.78x, k=5 1.44x, k=7 1.31x,
k=11 1.19x; N-utilisation for cout=16 rises 16->64 lanes.

Usage: python tools/ubench_megapack.py    (ONE TPU process at a time)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def geometry(k):
    r = (k - 1) // 2
    pp = -(-r // 2)                                   # ceil(r/2)
    kp = ((1 + r) // 2) - ((1 - r) // 2 if r else 0) + 1
    if r == 0:
        pp, kp = 0, 1
    return r, pp, kp


def off_phase(ry, r, pp):
    return pp + ((ry - r) // 2) if r else 0


def pack2(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unpack2(xp):
    b, h2, w2, c4 = xp.shape
    c = c4 // 4
    x = xp.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def pack_kernel(kernel):
    """(k, k, Cin, Cout) f32 -> (kp, kp, 4Cin, 4Cout) cell kernel (numpy)."""
    kernel = np.asarray(kernel)
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    r, pp, kp = geometry(k)
    out = np.zeros((kp, kp, 4 * cin, 4 * cout), kernel.dtype)
    for ry in range(2):
        oy = off_phase(ry, r, pp)
        for rx in range(2):
            ox = off_phase(rx, r, pp)
            for cy in range(kp):
                for cx in range(kp):
                    for qy in range(2):
                        for qx in range(2):
                            dy = 2 * (oy - pp + cy) + qy - ry
                            dx = 2 * (ox - pp + cx) + qx - rx
                            if abs(dy) > r or abs(dx) > r:
                                continue
                            bi = (qy * 2 + qx) * cin
                            bo = (ry * 2 + rx) * cout
                            out[cy, cx, bi:bi + cin, bo:bo + cout] = \
                                kernel[r + dy, r + dx]
    return out


def packed_conv(xp, wp_packed, k, cout):
    """xp (B, H2, W2, 4Cin) -> (B, H2, W2, 4Cout), SAME semantics."""
    import jax
    import jax.numpy as jnp
    r, pp, kp = geometry(k)
    ext = jax.lax.conv_general_dilated(
        xp, jnp.asarray(wp_packed), (1, 1),
        ((pp, kp - pp), (pp, kp - pp)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h2, w2 = xp.shape[1], xp.shape[2]
    blocks = []
    for ry in range(2):
        oy = off_phase(ry, r, pp)
        for rx in range(2):
            ox = off_phase(rx, r, pp)
            blk = ext[:, oy:oy + h2, ox:ox + w2,
                      (ry * 2 + rx) * cout:(ry * 2 + rx + 1) * cout]
            blocks.append(blk)
    return jnp.concatenate(blocks, axis=-1)


def full_hourglass(h=256, w=448):
    """Measure the FULL MegaDepthHourglass packed vs unpacked at the
    slow-motion shape (pair batch-2, default 448x256) with pre-packed
    kernels.  ``--sweep`` runs 448x256 / 128x128 / 64x64 to locate where
    the packed win concentrates (large maps) vs where the per-conv 4-slice
    relayouts dominate (small maps) — input to a possible hybrid cutoff."""
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.megadepth import (MegaDepthHourglass,
                                             prepack_megadepth)
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, h, w, 3), jnp.float32)
    m0 = MegaDepthHourglass()
    variables = jax.jit(m0.init)(jax.random.PRNGKey(0), x)

    def feedback(model, v):
        def f(x):
            y = model.apply(v, x)
            return x + 1e-3 * y
        return jax.jit(f)

    want = np.asarray(jax.device_get(jax.jit(
        lambda x: m0.apply(variables, x))(x)))
    t0 = device_time_slope(feedback(m0, variables), x, n1=10, n2=40)
    print(json.dumps({"metric": f"hourglass_unpacked_ms_{h}x{w}",
                      "value": round(t0 * 1e3, 2)}), flush=True)

    mp = MegaDepthHourglass(packed=True)
    vpre = dict(variables)
    vpre["params"] = jax.device_get(jax.jit(prepack_megadepth)(
        variables["params"]))
    got = np.asarray(jax.device_get(jax.jit(
        lambda x: mp.apply(vpre, x))(x)))
    err = float(np.abs(got - want).max())
    t1 = device_time_slope(feedback(mp, vpre), x, n1=10, n2=40)
    print(json.dumps({"metric": f"hourglass_packed_ms_{h}x{w}",
                      "value": round(t1 * 1e3, 2), "maxerr": round(err, 6),
                      "out_scale": round(float(np.abs(want).max()), 3),
                      "speedup": round(t0 / t1, 2)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    b, h, w = 2, 256, 448

    for k, cin, cout in ((11, 32, 16), (7, 32, 16), (5, 32, 16),
                         (3, 32, 16), (1, 128, 32)):
        x = jnp.asarray(rng.randn(b, h, w, cin) * 0.3, jnp.float32)
        kern = np.asarray(rng.randn(k, k, cin, cout) * 0.05, np.float32)

        def base(x):
            return lax.conv_general_dilated(
                x, jnp.asarray(kern), (1, 1),
                ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        want = np.asarray(jax.device_get(jax.jit(base)(x)))
        f = jax.jit(lambda x: x + 1e-3 * jnp.sum(base(x), -1, keepdims=True))
        t0 = device_time_slope(f, x, n1=20, n2=80)
        print(json.dumps({"metric": f"k{k}_unpacked_ms",
                          "value": round(t0 * 1e3, 3)}), flush=True)

        wp = pack_kernel(kern)

        def packed(x):
            return unpack2(packed_conv(pack2(x), wp, k, cout))

        got = np.asarray(jax.device_get(jax.jit(packed)(x)))
        err = float(np.abs(got - want).max())
        fp = jax.jit(lambda x: x + 1e-3 * jnp.sum(
            packed(x), -1, keepdims=True))
        t = device_time_slope(fp, x, n1=20, n2=80)
        print(json.dumps({"metric": f"k{k}_packed2_ms",
                          "value": round(t * 1e3, 3),
                          "maxerr": round(err, 8),
                          "speedup": round(t0 / t, 2)}), flush=True)

        # packed WITHOUT the pack/unpack boundary relayouts (the regime a
        # fully-packed hourglass would run in)
        xp = pack2(x)

        def packed_core(xp):
            return packed_conv(xp, wp, k, cout)

        fc = jax.jit(lambda xp: xp + 1e-3 * jnp.sum(
            packed_core(xp), -1, keepdims=True))
        t2 = device_time_slope(fc, xp, n1=20, n2=80)
        print(json.dumps({"metric": f"k{k}_packed2_core_ms",
                          "value": round(t2 * 1e3, 3),
                          "speedup": round(t0 / t2, 2)}), flush=True)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        for h, w in ((256, 448), (128, 128), (64, 64)):
            full_hourglass(h, w)
    elif "--full" in sys.argv:
        full_hourglass()
    else:
        main()
