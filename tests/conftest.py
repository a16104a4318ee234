"""Test harness: force an 8-device virtual CPU topology before JAX loads.

Multi-chip sharding logic is validated the TPU-native way — a faked 8-device
host platform (see SURVEY.md §4) — so the suite runs anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
