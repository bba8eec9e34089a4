"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (the driver separately dry-runs multi-chip on TPU).

The environment may pin JAX_PLATFORMS to a TPU plugin and override it again
from sitecustomize, so we force the config knob directly before any backend
initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
