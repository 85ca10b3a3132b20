"""Runtime configuration helpers.

The reference protocol needs float64 (tolerances to 1e-16; SURVEY.md §6),
and on this environment the axon TPU plugin ignores ``JAX_PLATFORMS`` so
CPU runs must be forced through the config API.  ``setup()`` bundles the
working combination.
"""

from __future__ import annotations

import os


def setup(cpu: bool = False, x64: bool = True, cache_dir: str | None = "/tmp/jax_cache"):
    """Configure JAX for parity (CPU/x64) or TPU benchmark runs.

    Call before any JAX computation.
    """
    import jax

    if cpu:
        # Env var alone is insufficient: the axon TPU plugin registers
        # regardless; the config flag wins.
        jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax
