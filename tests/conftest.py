"""Test harness: force an 8-device virtual CPU topology before JAX's backend
initializes.

Multi-chip sharding logic is validated the TPU-native way — a faked 8-device
host platform (see SURVEY.md §4) — so the suite runs anywhere. Note the axon
TPU plugin overrides the JAX_PLATFORMS env var, so we must use
jax.config.update (which wins over the plugin's default)."""

import os
import shutil
import subprocess
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# Build the native host-preprocessing library (native/preprocess.cpp) so
# tests/test_native.py runs instead of skipping: a C++ path the suite never
# exercises is a C++ path that silently rots.
_NATIVE = Path(__file__).resolve().parents[1] / "native"
if shutil.which("make") and shutil.which(os.environ.get("CXX", "g++")) and \
        not (_NATIVE / "libfkpreproc.so").exists():
    subprocess.run(["make", "-C", str(_NATIVE)], check=False,
                   capture_output=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
