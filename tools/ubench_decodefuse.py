#!/usr/bin/env python
"""Formulation shootout for the PWC decode dense blocks (ROADMAP item 1).

The decode levels run DenseNet-style conv chains at tiny spatial dims
(level 6: 7x4 ... level 2: 112x64) where measured MXU efficiency is
7-20% (tools/ubench_pwc.py).  Candidates per level geometry:

  conv     lax.conv_general_dilated chain (current path)
  im2col   conv_general_dilated_patches once per stage + dot
  taps     9 shifted (P,Cin)@(Cin,Cout) dots on a pre-padded (H+2,W+2,C)
           buffer, accumulated — the Pallas mega-kernel's math, run in XLA
           to bound what fusion can win before writing Mosaic
  split    conv(concat([o_i..o_0, x])) re-expressed as sum of per-piece
           convs with split weights — identical MACs, but NO concat buffers
           are ever materialised (level 2 writes+reads ~125 MB of concats)

Each case replicates the exact dense-block channel growth
(reference PWCNet/PWCNet.py:80-127): five 3x3 convs 128/128/96/64/32 with
concat growth from the level's input channel count, plus predict_flow.

Usage: python tools/ubench_decodefuse.py   (ONE TPU process at a time)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

# (level, B, H, W, Cin) — B=2 matches the bidirectional batched decode at
# the headline 448x256 input; Cin = 81 corr + feat + 2 flow + 2 upfeat.
GEOMS = [
    (5, 2, 14, 8, 81 + 128 + 2 + 2),
    (4, 2, 28, 16, 81 + 96 + 2 + 2),
    (3, 2, 56, 32, 81 + 64 + 2 + 2),
    (2, 2, 112, 64, 81 + 32 + 2 + 2),
]
GROWTH = (128, 128, 96, 64, 32)


def _weights(rng, cin):
    ws = []
    c = cin
    for cout in GROWTH:
        ws.append(np.asarray(rng.randn(3, 3, c, cout) * 0.05, np.float32))
        c += cout
    ws.append(np.asarray(rng.randn(3, 3, c, 2) * 0.05, np.float32))
    return ws


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)

    def conv3(x, w):
        return lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.1 * x)

    def run_conv(x, ws):
        for w in ws[:-1]:
            x = jnp.concatenate([lrelu(conv3(x, w)), x], axis=-1)
        return conv3(x, ws[-1])

    def im2col(x):
        # (B,H,W,C) -> (B,H,W,9*C) patches, SAME padding
        return lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def run_im2col(x, ws):
        for w in ws[:-1]:
            cin, cout = w.shape[2], w.shape[3]
            p = im2col(x)
            # patches layout is C-major: (c, dy, dx) -> match by transposing w
            wm = jnp.asarray(w).transpose(2, 0, 1, 3).reshape(9 * cin, cout)
            y = jnp.einsum("bhwk,kn->bhwn", p, wm,
                           precision=lax.Precision.HIGHEST)
            x = jnp.concatenate([lrelu(y), x], axis=-1)
        w = ws[-1]
        cin, cout = w.shape[2], w.shape[3]
        wm = jnp.asarray(w).transpose(2, 0, 1, 3).reshape(9 * cin, cout)
        return jnp.einsum("bhwk,kn->bhwn", im2col(x), wm,
                          precision=lax.Precision.HIGHEST)

    def run_taps(x, ws):
        b, h, wdt, _ = x.shape
        for w in ws:
            cout = w.shape[3]
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((b, h, wdt, cout), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + jnp.einsum(
                        "bhwc,cn->bhwn",
                        lax.dynamic_slice(xp, (0, dy, dx, 0),
                                          (b, h, wdt, x.shape[3])),
                        jnp.asarray(w)[dy, dx],
                        precision=lax.Precision.HIGHEST)
            if w is ws[-1]:
                return acc
            x = jnp.concatenate([lrelu(acc), x], axis=-1)
        return acc

    def run_split(x, ws):
        pieces = [x]          # newest first, matching concat([new, x]) order
        sizes = [x.shape[-1]]
        out = None
        for w in ws:
            w = jnp.asarray(w)
            off = 0
            y = None
            for piece, sz in zip(pieces, sizes):
                part = conv3(piece, w[:, :, off:off + sz, :])
                y = part if y is None else y + part
                off += sz
            if w.shape[3] == 2:       # predict_flow
                out = y
                break
            pieces.insert(0, lrelu(y))
            sizes.insert(0, w.shape[3])
        return out

    for lvl, b, h, wdt, cin in GEOMS:
        x = jnp.asarray(rng.randn(b, h, wdt, cin) * 0.3, jnp.float32)
        ws = _weights(rng, cin)
        outs = {}
        for tag, fn in (("conv", run_conv), ("im2col", run_im2col),
                        ("taps", run_taps), ("split", run_split)):
            f = jax.jit(lambda x, fn=fn: fn(x, ws))
            outs[tag] = np.asarray(jax.device_get(f(x)))
            # feedback-scan timer needs carry-shaped output
            f = jax.jit(
                lambda x, fn=fn: x + 1e-3 * jnp.sum(fn(x, ws), axis=-1,
                                                    keepdims=True))
            t = device_time_slope(f, x, n1=30, n2=120)
            print(json.dumps({"metric": f"dense_l{lvl}_{tag}_ms",
                              "value": round(t * 1e3, 3)}), flush=True)
        scale = float(np.abs(outs["conv"]).max())
        for tag in ("im2col", "taps", "split"):
            err = float(np.abs(outs[tag] - outs["conv"]).max())
            print(json.dumps({"metric": f"dense_l{lvl}_{tag}_maxerr",
                              "value": err, "rel": err / scale}), flush=True)


if __name__ == "__main__":
    main()
