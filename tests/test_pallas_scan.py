"""Fused Pallas cross-scan kernel vs the XLA associative-scan core, run in
interpreter mode on CPU (the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from xfmamba_tpu.models.ss2d import ss2d_core_from_projs
from xfmamba_tpu.ops.selective_scan_pallas import _core_pallas_fwd_impl


@pytest.mark.parametrize("B,H,W,D,N,chunk", [
    (2, 6, 5, 16, 1, None),       # single chunk
    (1, 28, 28, 16, 1, 128),      # multi-chunk, exact division
    (2, 20, 19, 8, 2, 128),       # multi-chunk with padded tail
    (1, 7, 7, 32, 16, None),      # fusion regime: N=16
    (1, 9, 9, 16, 1, 16),         # many tiny chunks
])
def test_pallas_matches_xla_core(B, H, W, D, N, chunk):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((B, H, W, D)).astype(np.float32)
    dts = (0.5 * rng.random((B, H, W, 4, D))).astype(np.float32)
    Bs = rng.standard_normal((B, H, W, 4, N)).astype(np.float32)
    Cs = rng.standard_normal((B, H, W, 4, N)).astype(np.float32)
    A = (-0.5 * rng.random((4, D, N))).astype(np.float32)
    Dm = rng.standard_normal((4, D)).astype(np.float32)
    bias = (0.5 * rng.random((4, D))).astype(np.float32)
    args = tuple(map(jnp.asarray, (x, dts, Bs, Cs, A, Dm, bias)))
    y_ref = ss2d_core_from_projs(*args, scan_mode="cross2d")
    y_pal = _core_pallas_fwd_impl(*args, interpret=True, chunk=chunk)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
