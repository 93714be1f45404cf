"""Test harness config: force the CPU backend with 8 virtual devices so the
whole suite (including multi-chip sharding tests) runs fast and without TPU
hardware (SURVEY.md §4).

Note: the environment pre-imports jax and registers a TPU backend via
sitecustomize, so env vars alone are too late — we must flip the platform via
jax.config before first backend use.
"""

import os
import sys

_ON_TPU = os.environ.get("XFMAMBA_TEST_TPU") == "1"

if not _ON_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # on-device tier (tests/test_tpu_onchip.py):
    #   XFMAMBA_TEST_TPU=1 pytest tests/test_tpu_onchip.py -m tpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Pin the f32-exact erf GELU for the suite's tight-tolerance (2e-5) kernel
# equivalence tests; the shipped tanh-GELU fast path is covered separately
# by tests/test_gelu_tanh.py at its own (documented ~3e-4) tolerance.
from xfmamba_tpu.ops import vss_block_pallas as _vbp  # noqa: E402

_vbp.GELU_TANH = False
