#!/usr/bin/env python
"""1080p-shape row-sharded DAIN forward on a virtual 8-device mesh.

Documents the capability envelope the spatial sharding layer exists for
(the reference OOMs at 720p on a 16 GB GPU, Colab_DAIN.ipynb): a full
1088x1920 frame pair runs as 8 row shards of 136 rows + 28 halo rows
(136 + 2*28 = 192, divisible by the pipeline's /64 downsampling), with
halo exchange over the mesh axis (parallel/spatial.py).

Runs on CPU with xla_force_host_platform_device_count=8 — the same dryrun
mechanism the driver uses (__graft_entry__.dryrun_multichip); expect
minutes of XLA CPU compile.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/dryrun_1080p_sharded.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from vfidkr_tpu.models import DAIN
    from vfidkr_tpu.parallel.spatial import spatial_shard_fn

    n = 8
    halo = 28
    h, w = 1088, 1920          # 8 x 136 rows; 136 + 2*28 = 192 = 3*64
    devices = jax.devices()[:n]
    mesh = Mesh(np.array(devices), ("spatial",))

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)

    model = DAIN()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 i0[:, :192, :256], i2[:, :192, :256])
    fwd = lambda a, b: model.apply(params, a, b)["outputs"][1]

    t0 = time.time()
    out = jax.jit(spatial_shard_fn(fwd, mesh, halo))(i0, i2)
    jax.block_until_ready(out)
    ok = bool(np.all(np.isfinite(np.asarray(out)))) \
        and out.shape == (1, h, w, 3)
    print(json.dumps({"metric": "dain_1080p_sharded_dryrun",
                      "shape": [h, w], "devices": n, "halo": halo,
                      "ok": ok, "wall_s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
