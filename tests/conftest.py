"""Test harness: force an 8-device virtual CPU topology before JAX's backend
initializes.

Multi-chip sharding logic is validated the TPU-native way — a faked 8-device
host platform (see SURVEY.md §4) — so the suite runs anywhere. Note the axon
TPU plugin overrides the JAX_PLATFORMS env var, so we must use
jax.config.update (which wins over the plugin's default)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
