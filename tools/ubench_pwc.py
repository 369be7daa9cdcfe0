#!/usr/bin/env python
"""PWC-Net cost attribution on device: pyramid (MXU-bound) vs decode
(launch-bound), to size the per-level decode-fusion lever (ROADMAP item 1;
reference decode structure: PWCNet/PWCNet.py:230-320).

Usage: python tools/ubench_pwc.py [dense_impl]   (one TPU process at a time)
``dense_impl``: concat (default) | split — dense-block evaluation mode
(models/pwcnet.py).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vfidkr_tpu.models.pwcnet import PWCDCNet
    from vfidkr_tpu.utils.profiling import device_time_slope

    rng = np.random.RandomState(0)
    i0 = jnp.asarray(np.round(rng.rand(1, 256, 448, 3) * 255) / 255,
                     jnp.float32)
    i2 = jnp.asarray(np.round(rng.rand(1, 256, 448, 3) * 255) / 255,
                     jnp.float32)
    dense_impl = sys.argv[1] if len(sys.argv) > 1 else "concat"
    model = PWCDCNet(dense_impl=dense_impl)
    params = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), i0, i2, method="bidirectional")
    jax.block_until_ready(params)

    def full(x):
        f, b = model.apply(params, x, i2, method="bidirectional")
        return x + 1e-3 * jnp.pad(
            jnp.concatenate([f, b], axis=-1),
            ((0, 0), (0, x.shape[1] - f.shape[1]),
             (0, x.shape[2] - f.shape[2]), (0, 0)))[..., :3]

    def pyr(x):
        c = model.apply(params, x, i2, method="pyramid_only")
        s = sum(jnp.sum(t) for t in c)
        return jnp.where(jnp.isfinite(s), jnp.roll(x, 7, axis=2), x)

    t_full = device_time_slope(jax.jit(full), i0, n1=20, n2=80)
    t_pyr = device_time_slope(jax.jit(pyr), i0, n1=20, n2=80)
    print(json.dumps({"metric": "pwc_full_bidirectional_ms",
                      "value": round(t_full * 1e3, 3)}), flush=True)
    print(json.dumps({"metric": "pwc_pyramid_only_ms",
                      "value": round(t_pyr * 1e3, 3)}), flush=True)
    print(json.dumps({"metric": "pwc_decode_residual_ms",
                      "value": round((t_full - t_pyr) * 1e3, 3)}), flush=True)

    prev = t_pyr
    for upto in (6, 5, 4, 3, -1, -2, -3, 2):
        def probe(x, upto=upto):
            f = model.apply(params, x, i2, method="decode_upto", upto=upto)
            s = jnp.sum(f)
            return jnp.where(jnp.isfinite(s), jnp.roll(x, 7, axis=2), x)

        t = device_time_slope(jax.jit(probe), i0, n1=20, n2=80)
        print(json.dumps({"metric": f"pwc_decode_level_{upto}_ms",
                          "value": round((t - prev) * 1e3, 3),
                          "cum_ms": round(t * 1e3, 3)}), flush=True)
        prev = t


if __name__ == "__main__":
    main()
