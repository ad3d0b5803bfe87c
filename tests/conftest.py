"""Test configuration: force an 8-device CPU JAX platform.

Multi-device tests exercise the pjit data-parallel path without TPUs (the
TPU-world analogue of a fake backend — SURVEY §4). Must run before jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The CPU backend's default conv/matmul precision is visibly lossy (~1e-4
# relative). Tests verify math, not runtime perf policy, so pin to highest.
jax.config.update("jax_default_matmul_precision", "highest")

# A TPU-tunnel plugin (sitecustomize) may programmatically set
# jax_platforms to its own backend, overriding the env var — force CPU.
jax.config.update("jax_platforms", "cpu")
