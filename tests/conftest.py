"""Test configuration: run on an 8-device virtual CPU mesh with x64.

The sandbox pre-imports JAX with a TPU plugin selected via JAX_PLATFORMS,
so flipping the env var is not enough — we switch the platform through
jax.config before any backend initializes. XLA_FLAGS still must carry the
virtual device count before first device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
