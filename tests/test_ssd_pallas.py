"""Pallas SSD chunk-scan kernel vs the XLA einsum formulation (the
golden-tested oracle of `tests/test_ssd.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.ops.ssd import ssd_chunk_scan
from xfmamba_tpu.ops.ssd_pallas import ssd_chunk_scan_pallas, ssd_supported

pytestmark = pytest.mark.slow


def _mk(b, s, h, p, g, n, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (b, s, h, p), jnp.float32)
    dt = jax.random.normal(ks[1], (b, s, h), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (h,), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (b, s, g, n), jnp.float32)
    C = jax.random.normal(ks[4], (b, s, g, n), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[5], (h,), jnp.float32)
    return x, dt, A, B, C, bias


@pytest.mark.parametrize("b,s,h,p,g,n,chunk", [
    (2, 32, 4, 8, 2, 8, 8),      # divisible chunks, multi-head tiles
    (1, 24, 2, 8, 1, 8, 8),      # exact chunks, single group
    (1, 49, 4, 16, 4, 8, 16),    # stage-3-like odd L (in-kernel padding)
])
def test_pallas_matches_xla(b, s, h, p, g, n, chunk):
    x, dt, A, B, C, bias = _mk(b, s, h, p, g, n)
    D = jnp.ones((h,), jnp.float32) * 0.7
    y_ref, fin_ref = ssd_chunk_scan(
        x, dt, A, B, C, chunk_size=chunk, D=D, dt_bias=bias,
        dt_softplus=True, return_final_states=True)
    y_k, fin_k = ssd_chunk_scan_pallas(
        x, dt, A, B, C, chunk_size=chunk, D=D, dt_bias=bias,
        interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_initial_states_and_matrix_D():
    b, s, h, p, g, n = 1, 16, 2, 8, 2, 8
    x, dt, A, B, C, bias = _mk(b, s, h, p, g, n, seed=3)
    D = jax.random.normal(jax.random.PRNGKey(9), (h, p), jnp.float32)
    init = jax.random.normal(jax.random.PRNGKey(10), (b, h, p, n),
                             jnp.float32)
    y_ref, fin_ref = ssd_chunk_scan(
        x, dt, A, B, C, chunk_size=8, D=D, dt_bias=bias,
        initial_states=init, dt_softplus=True, return_final_states=True)
    y_k, fin_k = ssd_chunk_scan_pallas(
        x, dt, A, B, C, chunk_size=8, D=D, dt_bias=bias,
        initial_states=init, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref),
                               rtol=2e-4, atol=2e-4)


def test_supported_gate():
    assert ssd_supported(3136, 24, 16, 64, 4, 64)    # m2 stage-0
    assert ssd_supported(49, 192, 16, 64, 4, 64)     # m2 stage-3
    assert not ssd_supported(32, 5, 16, 64, 4, 64)   # h % g != 0
    assert not ssd_supported(32, 8, 4, 64, 4, 64)    # p too small
