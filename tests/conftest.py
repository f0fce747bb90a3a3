"""Test harness configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on
a virtual mesh; real TPU hardware is single-chip in this environment) and
with x64 enabled — the parity bar is 1e-6 trajectory error (BASELINE.md),
which needs an f64 mode; the performance path is f32 on TPU.

NOTE: some installed pytest plugin imports jax before this conftest runs, so
env vars alone are read too late; ``jax.config.update`` works after import
as long as no backend has been initialized yet, and XLA_FLAGS is read at
backend-init time, so both settings below are still effective here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the full tier's wall time is dominated
# by closed-loop compiles (each distinct loop length is its own program),
# and the programs are identical across pytest invocations.  Measured on
# tests/test_mhe.py: 74 s cold -> 41 s warm.  An externally-set
# JAX_COMPILATION_CACHE_DIR wins over the default repo-local path.
_cache = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache)
