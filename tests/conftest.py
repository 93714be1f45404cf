"""Test harness config: force the CPU backend with 8 virtual devices so the
whole suite (including multi-chip sharding tests) runs fast and without TPU
hardware (SURVEY.md §4).

Note: the environment pre-imports jax and registers a TPU backend via
sitecustomize, so env vars alone are too late — we must flip the platform via
jax.config before first backend use.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
