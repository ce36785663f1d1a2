"""Test configuration: CPU platform with 8 virtual devices, x64 enabled.

Mirrors the driver's multi-chip dry-run environment: sharding tests run on a
virtual 8-device CPU mesh (no multi-chip TPU hardware available here).
"""

import os

# Force CPU: tests must not grab the (single, shared) TPU chip, and the
# virtual 8-device mesh below only exists on the host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

# The hosted-TPU ("axon") plugin in this environment ignores the
# JAX_PLATFORMS env var and registers itself as the default backend anyway;
# the config flag still wins, so set it explicitly before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: linalg kernels (QR/eigh/LU) compile once
# across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dre_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
