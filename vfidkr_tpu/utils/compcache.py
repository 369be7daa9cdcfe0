"""Persistent XLA compilation cache for the inference/training drivers.

The reference pays its compile cost at build time (nvcc, ~20 min per the
Colab notebook); here XLA compiles at run time instead — ~40 s for DAIN and
several minutes for the phase-packed DAIN_slowmotion graph, per process.
Enabling JAX's persistent compilation cache makes every driver invocation
after the first (per model/shape/toolchain) skip compilation entirely, the
same way tests/conftest.py already does for the CPU suite.

Call ``enable_persistent_cache()`` early in a driver ``main()`` (before the
first jit executes; safe any time).  Opt out with VFIDKR_NO_COMPILE_CACHE=1
or redirect with VFIDKR_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir or None
    when disabled.  Entries are keyed on program + compile options +
    toolchain version, so stale hits are not a concern."""
    if os.environ.get("VFIDKR_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get(
        "VFIDKR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vfidkr_tpu",
                     "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even quick compiles: the tunnelled-TPU dispatch makes every
    # compile round trip expensive, and entries are tiny
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
