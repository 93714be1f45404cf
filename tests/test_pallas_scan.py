"""Fused Pallas cross-scan kernel vs the XLA associative-scan core, run in
interpreter mode on CPU (the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xfmamba_tpu.models.ss2d import ss2d_core_from_projs
from xfmamba_tpu.ops.selective_scan_pallas import _core_pallas_fwd_impl

pytestmark = pytest.mark.slow


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


# =====================================================================
# grouped (K, N) kernel
# =====================================================================

def test_grouped_scan_matches_oracle():
    from xfmamba_tpu.ops.selective_scan import selective_scan
    from xfmamba_tpu.ops.selective_scan_pallas import grouped_scan_pallas_fwd

    key = jax.random.key(0)
    B, L, K, C, N = 2, 49, 2, 24, 16
    KC = K * C
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (B, L, KC))
    dt = jax.random.normal(ks[1], (B, L, KC)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (KC, N)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, K, N))
    Cm = jax.random.normal(ks[4], (B, L, K, N))
    Dv = jax.random.normal(ks[5], (KC,))
    bias = jax.random.normal(ks[6], (KC,)) * 0.1

    for reverse in (False, True):
        want = selective_scan(u, dt, A, Bm, Cm, Dv, bias,
                              delta_softplus=True, reverse=reverse)
        got, _ = grouped_scan_pallas_fwd(u, dt, A, Bm, Cm, Dv, bias,
                                         delta_softplus=True,
                                         reverse=reverse, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_grouped_scan_chunked_matches_oracle():
    from xfmamba_tpu.ops.selective_scan import selective_scan
    from xfmamba_tpu.ops.selective_scan_pallas import grouped_scan_pallas_fwd

    key = jax.random.key(1)
    B, L, K, C, N = 1, 300, 1, 16, 4   # forces n_chunks > 1 with chunk=128
    ks = jax.random.split(key, 5)
    u = jax.random.normal(ks[0], (B, L, K * C))
    dt = jax.random.normal(ks[1], (B, L, K * C)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (K * C, N)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, K, N))
    Cm = jax.random.normal(ks[4], (B, L, K, N))

    for reverse in (False, True):
        want = selective_scan(u, dt, A, Bm, Cm, None, None,
                              delta_softplus=True, reverse=reverse)
        got, _ = grouped_scan_pallas_fwd(u, dt, A, Bm, Cm, None, None,
                                         delta_softplus=True,
                                         reverse=reverse, interpret=True,
                                         chunk=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_fused_proj_n1_matches_xla_core():
    from xfmamba_tpu.models.ss2d import ss2d_core
    from xfmamba_tpu.ops.selective_scan_pallas import _core_fused_proj_impl

    rng = np.random.default_rng(7)
    B, H, W, D, R = 2, 10, 9, 16, 2
    x = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    xw = jnp.asarray(rng.standard_normal((4, R + 2, D)) * 0.1, jnp.float32)
    dw = jnp.asarray(rng.standard_normal((4, D, R)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, D)) * 0.1, jnp.float32)
    A_logs = jnp.asarray(rng.standard_normal((4 * D, 1)) * 0.2, jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((4 * D,)), jnp.float32)

    want = ss2d_core(x, xw, dw, bias, A_logs, Ds, d_state=1,
                     backend="xla")
    got = _core_fused_proj_impl(x, xw, dw, bias, A_logs, Ds,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # multi-chunk
    got2 = _core_fused_proj_impl(x, xw, dw, bias, A_logs, Ds,
                                 interpret=True, chunk=32)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H,W,chunk", [(10, 9, None), (12, 8, 32)])
def test_fused_proj_n1_backward_matches_autodiff(H, W, chunk):
    """The dedicated Pallas backward kernel vs XLA autodiff of the same
    core (the oracle role of `test_selective_scan.py`'s gradient checks)."""
    from xfmamba_tpu.models.ss2d import ss2d_core
    from xfmamba_tpu.ops.selective_scan_pallas import (
        _core_fused_proj_bwd_impl, _core_fused_proj_parts)

    rng = np.random.default_rng(11)
    B, D, R = 2, 16, 2
    x = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    xw = jnp.asarray(rng.standard_normal((4, R + 2, D)) * 0.1, jnp.float32)
    dw = jnp.asarray(rng.standard_normal((4, D, R)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, D)) * 0.1, jnp.float32)
    A_logs = jnp.asarray(rng.standard_normal((4 * D, 1)) * 0.2, jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((4 * D,)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)

    _, vjp = jax.vjp(
        lambda *a: ss2d_core(*a, d_state=1, backend="xla"),
        x, xw, dw, bias, A_logs, Ds)
    want = vjp(g)

    _, (xd_f, xd_r, cf, cr) = _core_fused_proj_parts(
        x, xw, dw, bias, A_logs, Ds, interpret=True, chunk=chunk)
    got = _core_fused_proj_bwd_impl(x, xw, dw, bias, A_logs, Ds,
                                    xd_f, xd_r, cf, cr, g,
                                    interpret=True, chunk=chunk)
    names = ["dx", "d_x_proj_w", "d_dt_w", "d_bias", "d_A_logs", "d_Ds"]
    for name, w_arr, g_arr in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g_arr), np.asarray(w_arr), rtol=5e-4, atol=5e-4,
            err_msg=name)


@pytest.mark.parametrize("reverse", [False, True])
def test_grouped_bwd_kernel_matches_vjp(reverse):
    """The grouped Pallas adjoint kernel == XLA autodiff of the oracle."""
    from xfmamba_tpu.ops.selective_scan import selective_scan
    from xfmamba_tpu.ops.selective_scan_pallas import (
        grouped_scan_pallas_bwd, grouped_scan_pallas_fwd)

    key = jax.random.key(3)
    B, L, K, C, N = 1, 25, 2, 8, 4
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (B, L, K * C))
    dt = jax.random.normal(ks[1], (B, L, K * C)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (K * C, N)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, K, N))
    Cm = jax.random.normal(ks[4], (B, L, K, N))
    Dv = jax.random.normal(ks[5], (K * C,))
    bias = jax.random.normal(ks[6], (K * C,)) * 0.1
    g = jax.random.normal(ks[7], (B, L, K * C))

    _, vjp = jax.vjp(
        lambda *a: selective_scan(*a, delta_softplus=True, reverse=reverse),
        u, dt, A, Bm, Cm, Dv, bias)
    want = vjp(g)
    _, carr = grouped_scan_pallas_fwd(u, dt, A, Bm, Cm, Dv, bias,
                                      delta_softplus=True, reverse=reverse,
                                      interpret=True)
    got = grouped_scan_pallas_bwd(u, dt, A, Bm, Cm, Dv, bias, carr, g,
                                  reverse=reverse, interpret=True)
    names = ["du", "d_delta", "dA", "dB", "dC", "dD", "dbias"]
    for name, w_arr, g_arr in zip(names, want, got):
        np.testing.assert_allclose(np.asarray(g_arr), np.asarray(w_arr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("reverse", [False, True])
def test_grouped_bwd_kernel_multichunk(reverse):
    from xfmamba_tpu.ops.selective_scan import selective_scan
    from xfmamba_tpu.ops.selective_scan_pallas import (
        grouped_scan_pallas_bwd, grouped_scan_pallas_fwd)

    key = jax.random.key(9)
    B, L, K, C, N = 1, 300, 2, 8, 3
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (B, L, K * C))
    dt = jax.random.normal(ks[1], (B, L, K * C)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (K * C, N)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, K, N))
    Cm = jax.random.normal(ks[4], (B, L, K, N))
    Dv = jax.random.normal(ks[5], (K * C,))
    bias = jax.random.normal(ks[6], (K * C,)) * 0.1
    g = jax.random.normal(ks[7], (B, L, K * C))

    _, vjp = jax.vjp(
        lambda *a: selective_scan(*a, delta_softplus=True, reverse=reverse),
        u, dt, A, Bm, Cm, Dv, bias)
    want = vjp(g)
    _, carr = grouped_scan_pallas_fwd(u, dt, A, Bm, Cm, Dv, bias,
                                      delta_softplus=True, reverse=reverse,
                                      interpret=True, chunk=128)
    got = grouped_scan_pallas_bwd(u, dt, A, Bm, Cm, Dv, bias, carr, g,
                                  reverse=reverse, interpret=True,
                                  chunk=128)
    names = ["du", "d_delta", "dA", "dB", "dC", "dD", "dbias"]
    for name, w_arr, g_arr in zip(names, want, got):
        np.testing.assert_allclose(np.asarray(g_arr), np.asarray(w_arr),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
