"""Test configuration: force an 8-device virtual CPU mesh and float64.

The reference protocol runs at tolerances down to 1e-16 (SURVEY.md §6), so
unit/parity tests use x64 on CPU; TPU benchmarks use f32/bf16 separately.
Multi-chip sharding tests use the 8 virtual host devices (the TPU-native
analog of a fake backend; SURVEY.md §4).
"""

import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Tests that call build_sweep must not write tiny instances into the
# repo-tree dataset/_cache (the chip harness's generated-instance cache).
os.environ.setdefault(
    "RIPTRM_CACHE_DIR", tempfile.mkdtemp(prefix="riptrm_cache_")
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU through the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: this box has 2 slow vCPUs and compile time
# dominates the test suite, so cache aggressively across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
