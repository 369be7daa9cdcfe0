#!/usr/bin/env python
"""A/B the ctx lane-gather kernel's row-loop bounds granularity
(ops/pallas/ctx_gather_kernel.py ``bounds=``): "chunk" (round-3: one
[min, max+fs) interval per 128-px chunk) vs "quad" (round-5: <= 4 disjoint
intervals merged from per-32-px quarter ranges — skips the dead rows
between flow clusters).

Flow cases:
  gentle15 / wavy15 / random : the ubench_ctx_geom suite (smooth + worst)
  vsplit / hsplit            : piecewise-constant motion boundaries
                               (vertical / horizontal), the realistic
                               discontinuity trained flows carry at object
                               edges — the regime quad bounds target.

Usage: python tools/ubench_ctx_bounds.py    (ONE TPU process at a time)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

B, H, W, C = 2, 256, 448, 196
FS = 4


def main():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.ops.pallas.ctx_gather_kernel import ctx_gather_pallas
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    kw = jnp.asarray(rng.rand(B, H, W, FS * FS), jnp.float32)

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def smooth_flow(amp, periods):
        fy = amp * np.sin(2 * np.pi * xx / W * periods) \
            * np.cos(2 * np.pi * yy / H * periods)
        fx = amp * np.cos(2 * np.pi * xx / W * periods)
        return fy, fx

    # piecewise-constant vertical flows with a boundary: a moving object
    # (fy = +18) over a counter-moving background (fy = -18)
    vsplit_fy = np.where((xx // 96) % 2 == 0, 18.0, -18.0)
    hsplit_fy = np.where((yy // 48) % 2 == 0, 18.0, -18.0)

    cases = {}
    for tag, (fy, fx) in (("gentle15", smooth_flow(15.0, 1.0)),
                          ("wavy15", smooth_flow(15.0, 3.0)),
                          ("vsplit18", (vsplit_fy, 0.0 * xx)),
                          ("hsplit18", (hsplit_fy, 0.0 * xx)),
                          ("random", (rng.rand(H, W) * 40 - 20,
                                      rng.rand(H, W) * 40 - 20))):
        base_v = np.clip(np.floor(yy + fy).astype(np.int32), -8, H + 8)
        base_u = np.clip(np.floor(xx + fx).astype(np.int32), -8, W + 8)
        cases[tag] = (
            jnp.asarray(np.broadcast_to(base_v, (B, H, W)), jnp.int32),
            jnp.asarray(np.broadcast_to(base_u, (B, H, W)), jnp.int32))

    band, tw, rv, rh, c_chunk = 64, 64, 26, 30, 40
    out = {}
    for tag, (bvp, bup) in cases.items():
        ref = None
        for bounds in ("chunk", "quad"):
            def f(img, bvp=bvp, bup=bup, bounds=bounds):
                o = ctx_gather_pallas(img, bvp, bup, kw, band=band, tw=tw,
                                      rv=rv, rh=rh, c_chunk=c_chunk,
                                      bounds=bounds)
                s = jnp.sum(o)
                return jnp.where(jnp.isfinite(s), jnp.roll(img, 7, axis=2),
                                 img)

            # exactness: both bounds modes must produce identical sums
            o = ctx_gather_pallas(img, bvp, bup, kw, band=band, tw=tw,
                                  rv=rv, rh=rh, c_chunk=c_chunk,
                                  bounds=bounds)
            s = float(jax.device_get(jnp.sum(o)))
            if ref is None:
                ref = s
            else:
                assert s == ref, (tag, bounds, s, ref)

            t = device_time_slope(jax.jit(f), img, n1=10, n2=40)
            out[f"{tag}_{bounds}"] = round(t * 1e3, 3)
            print(f"{tag:>10} {bounds:>5}: {t * 1e3:8.3f} ms",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
