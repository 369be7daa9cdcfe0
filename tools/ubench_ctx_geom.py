#!/usr/bin/env python
"""Geometry shootout for the big-C context-warp lane-gather kernel
(ops/pallas/ctx_gather_kernel.py): the fixed floor is dominated by DMA +
per-chunk prep + grid-step overhead (tools/ubench_ctx_ablate.py), so
``band=128`` (half the grid steps, 1.375x vs 1.75x DMA row overlap) is the
main lever (docs/ROADMAP.md item 2).

Measures the production kernel at several (band, c_chunk) points on
smooth sinusoid flows (the realistic regime — trained slow-motion flows are
spatially smooth), plus a per-pixel-random worst case.

Usage: python tools/ubench_ctx_geom.py    (ONE TPU process at a time)
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

    cases = {}
    for tag, (fy, fx) in (("gentle15", smooth_flow(15.0, 1.0)),
                          ("wavy15", smooth_flow(15.0, 3.0)),
                          ("random", (rng.rand(H, W) * 40 - 20,
                                      rng.rand(H, W) * 40 - 20))):
        base_v = np.clip(np.floor(yy + fy).astype(np.int32), -8, H + 8)
        base_u = np.clip(np.floor(xx + fx).astype(np.int32), -8, W + 8)
        cases[tag] = (
            jnp.asarray(np.broadcast_to(base_v, (B, H, W)), jnp.int32),
            jnp.asarray(np.broadcast_to(base_u, (B, H, W)), jnp.int32))

    # base_v/base_u are window top-left coords (~floor(y+fy)); the kernel
    # shifts by rv/rh and clips into the slab internally.
    for band, c_chunk in ((64, 40), (128, 40), (128, 48), (32, 40)):
        rv, rh, tw = 26, 30, 64
        for tag, (bv, bu) in cases.items():
            bvp, bup = bv, bu

            def f(img, bvp=bvp, bup=bup, band=band, c_chunk=c_chunk):
                out = ctx_gather_pallas(img, bvp, bup, kw, band=band,
                                        tw=tw, rv=rv, rh=rh,
                                        c_chunk=c_chunk)
                s = jnp.sum(out)
                return jnp.where(jnp.isfinite(s), jnp.roll(img, 7, axis=2),
                                 img)

            try:
                t = device_time_slope(jax.jit(f), img, n1=10, n2=40)
                print(json.dumps(
                    {"metric": f"ctx_b{band}_cc{c_chunk}_{tag}_ms",
                     "value": round(t * 1e3, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(
                    {"metric": f"ctx_b{band}_cc{c_chunk}_{tag}_ms",
                     "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                    flush=True)


if __name__ == "__main__":
    main()
