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


# ---------------------------------------------------------------------
# training path: fused forward + reverse-chunk adjoint kernel vs the XLA
# einsum autodiff (the gradient oracle) — VERDICT r2 item 5
# ---------------------------------------------------------------------

from xfmamba_tpu.ops import ssd_pallas as _sp


@pytest.fixture
def _interpret_train():
    old = _sp.INTERPRET_TRAIN
    _sp.INTERPRET_TRAIN = True
    yield
    _sp.INTERPRET_TRAIN = old


@pytest.mark.parametrize("b,s,h,p,g,n,chunk", [
    (2, 32, 4, 8, 2, 8, 8),      # divisible chunks, multi-head tiles
    (1, 49, 4, 16, 4, 8, 16),    # odd L (in-kernel padding path)
])
def test_train_grad_parity(b, s, h, p, g, n, chunk, _interpret_train):
    x, dt, A, B, C, bias = _mk(b, s, h, p, g, n, seed=7)
    D = jnp.ones((h,), jnp.float32) * 0.7
    wy = jax.random.normal(jax.random.PRNGKey(21), (b, s, h, p), jnp.float32)
    wf = jax.random.normal(jax.random.PRNGKey(22), (b, h, p, n), jnp.float32)

    def loss_ref(x, dt, A, B, C, D, bias):
        y, fin = ssd_chunk_scan(
            x, dt, A, B, C, chunk_size=chunk, D=D, dt_bias=bias,
            dt_softplus=True, return_final_states=True)
        return jnp.sum(y.astype(jnp.float32) * wy) + jnp.sum(fin * wf)

    def loss_k(x, dt, A, B, C, D, bias):
        y, fin = _sp.ssd_chunk_scan_pallas_train(
            x, dt, A, B, C, chunk, D, bias, None)
        return jnp.sum(y.astype(jnp.float32) * wy) + jnp.sum(fin * wf)

    args = (x, dt, A, B, C, D, bias)
    l_ref, g_ref = jax.value_and_grad(loss_ref, argnums=range(7))(*args)
    l_k, g_k = jax.value_and_grad(loss_k, argnums=range(7))(*args)
    np.testing.assert_allclose(float(l_k), float(l_ref), rtol=2e-4)
    names = ("dx", "ddt", "dA", "dB", "dC", "dD", "dbias")
    for nm, a, r in zip(names, g_k, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=5e-4, atol=5e-4 * scale,
            err_msg=nm)


def test_train_grad_initial_states_matrix_D(_interpret_train):
    b, s, h, p, g, n, chunk = 1, 16, 2, 8, 2, 8, 8
    x, dt, A, B, C, bias = _mk(b, s, h, p, g, n, seed=11)
    D = jax.random.normal(jax.random.PRNGKey(12), (h, p), jnp.float32)
    init = 0.5 * jax.random.normal(jax.random.PRNGKey(13), (b, h, p, n),
                                   jnp.float32)
    wy = jax.random.normal(jax.random.PRNGKey(23), (b, s, h, p), jnp.float32)

    def loss_ref(x, dt, A, B, C, D, bias, init):
        y = ssd_chunk_scan(x, dt, A, B, C, chunk_size=chunk, D=D,
                           dt_bias=bias, initial_states=init,
                           dt_softplus=True)
        return jnp.sum(y.astype(jnp.float32) * wy)

    def loss_k(x, dt, A, B, C, D, bias, init):
        y, _ = _sp.ssd_chunk_scan_pallas_train(
            x, dt, A, B, C, chunk, D, bias, init)
        return jnp.sum(y.astype(jnp.float32) * wy)

    args = (x, dt, A, B, C, D, bias, init)
    g_ref = jax.grad(loss_ref, argnums=range(8))(*args)
    g_k = jax.grad(loss_k, argnums=range(8))(*args)
    names = ("dx", "ddt", "dA", "dB", "dC", "dD", "dbias", "dinit")
    for nm, a, r in zip(names, g_k, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=5e-4, atol=5e-4 * scale,
            err_msg=nm)
