"""Numerical coverage for the whole-map multi-state kernel plumbing
(`ops/vss_block_pallas.py:nk_scan_call` / `nk_scan_from_projs`) — the
TPU-only inference replacement for the grouped scan inside CrossSS2Dv5 and
ShallowFuseSS2Dv4 (`models/fusion.py`).

Oracle strategy per SURVEY.md §4: fast kernel (interpret mode on CPU) vs the
composable `ss2d_core_from_projs` / `selective_scan` path, which is itself
golden-tested against the PyTorch reference.  Covers the A row ordering,
per-k dt/Bs/Cs slicing, Dsum accumulation, and the group-reshape path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.ss2d import ss2d_core_from_projs
from xfmamba_tpu.ops.selective_scan import selective_scan
from xfmamba_tpu.ops.vss_block_pallas import nk_scan_call, nk_scan_from_projs

pytestmark = pytest.mark.slow


def _projs(seed, B, H, W, D, K, N):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (B, H, W, D), jnp.float32)
    dts = 0.3 * jax.random.normal(ks[1], (B, H, W, K, D), jnp.float32)
    Bs = jax.random.normal(ks[2], (B, H, W, K, N), jnp.float32)
    Cs = jax.random.normal(ks[3], (B, H, W, K, N), jnp.float32)
    A = -jnp.exp(0.5 * jax.random.normal(ks[4], (K, D, N), jnp.float32))
    Dmat = jax.random.normal(ks[5], (K, D), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[6], (K, D), jnp.float32)
    return x, dts, Bs, Cs, A, Dmat, bias


@pytest.mark.parametrize("scan_mode", ["cross2d", "unidi", "bidi"])
def test_nk_scan_from_projs_matches_composable(scan_mode):
    B, H, W, D, K, N = 2, 6, 8, 16, 4, 4
    x, dts, Bs, Cs, A, Dmat, bias = _projs(0, B, H, W, D, K, N)
    y_ref = ss2d_core_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                                 scan_mode=scan_mode,
                                 scan_impl=selective_scan)
    y_k = nk_scan_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                             scan_mode=scan_mode, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("group", [1, 2])
def test_nk_scan_group_reshape(group):
    """The G-image stacking path must not leak state across stacked maps."""
    B, H, W, D, K, N = 4, 4, 6, 8, 4, 2
    x, dts, Bs, Cs, A, Dmat, bias = _projs(1, B, H, W, D, K, N)
    y_ref = nk_scan_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                               scan_mode="cross2d", group=1, interpret=True)
    y_g = nk_scan_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                             scan_mode="cross2d", group=group,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_nk_scan_shallowfuse_pattern():
    """The ShallowFuseSS2Dv4 per-k call pattern (`models/fusion.py`):
    K=2 flat forward scans over the flattened map, one nk_scan_call per
    group, vs the composable selective_scan oracle over the stacked input."""
    B, H, W, d_inner, N = 2, 4, 8, 12, 4
    K = 2
    L = H * W
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    u = jax.random.normal(ks[0], (B, L, K * d_inner), jnp.float32)
    dts = 0.3 * jax.random.normal(ks[1], (B, L, K * d_inner), jnp.float32)
    Bs = jax.random.normal(ks[2], (B, L, K, N), jnp.float32)
    Cs = jax.random.normal(ks[3], (B, L, K, N), jnp.float32)
    A_logs = 0.5 * jax.random.normal(ks[4], (K * d_inner, N), jnp.float32)
    A2 = -jnp.exp(A_logs)
    Ds = jax.random.normal(ks[5], (K * d_inner,), jnp.float32)
    bias = 0.1 * jnp.arange(K * d_inner, dtype=jnp.float32).reshape(K,
                                                                    d_inner)

    y_ref = selective_scan(u, dts, A2, Bs, Cs, Ds,
                           bias.reshape(-1), delta_softplus=True)

    ys = []
    for k in range(K):
        sl = slice(k * d_inner, (k + 1) * d_inner)
        ys.append(nk_scan_call(
            u[..., sl], dts[..., sl], Bs[:, :, k], Cs[:, :, k],
            jnp.swapaxes(A2[sl], 0, 1), Ds[sl].reshape(1, -1),
            bias[k].reshape(1, -1), H, W, ("row_f",), group=2,
            interpret=True))
    y_k = jnp.concatenate(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scan_mode", ["cross2d", "unidi", "bidi"])
def test_nk_scan_v2_matches_composable(scan_mode):
    """Serial-scan nk kernel (`vss_block_pallas_v2.nk_scan_from_projs_v2`)
    vs the composable oracle, multi-state (N=4), G=2 interleaved."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import nk_scan_from_projs_v2
    B, H, W, D, K, N = 2, 4, 8, 16, 4, 4
    x, dts, Bs, Cs, A, Dmat, bias = _projs(3, B, H, W, D, K, N)
    y_ref = ss2d_core_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                                 scan_mode=scan_mode,
                                 scan_impl=selective_scan)
    y_k = nk_scan_from_projs_v2(x, dts, Bs, Cs, A, Dmat, bias,
                                scan_mode=scan_mode, group=2,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scan_mode", ["cross2d", "unidi"])
def test_nk_scan_v2r_rank_form_matches_composable(scan_mode):
    """Rank-form kernel (`nk_scan_call_v2r`: in-kernel rank→D Δ stage +
    folded out-norm) vs the composable oracle followed by the same LN."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import nk_scan_call_v2r
    B, H, W, D, K, N, R = 2, 4, 8, 16, 4, 4, 6
    x, _, Bs, Cs, A, Dmat, bias = _projs(5, B, H, W, D, K, N)
    ks = jax.random.split(jax.random.PRNGKey(77), 4)
    ranks = 0.3 * jax.random.normal(ks[0], (B, H, W, K, R), jnp.float32)
    w_dt = 0.2 * jax.random.normal(ks[1], (K, D, R), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(ks[2], (D,), jnp.float32)
    shift = 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)

    dts = jnp.einsum("bhwkr,kdr->bhwkd", ranks, w_dt)
    y_raw = ss2d_core_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                                 scan_mode=scan_mode,
                                 scan_impl=selective_scan)
    mu = y_raw.mean(-1, keepdims=True)
    var = ((y_raw - mu) ** 2).mean(-1, keepdims=True)
    y_ref = (y_raw - mu) * jax.lax.rsqrt(var + 1e-5) * scale + shift

    kinds = dict(cross2d=("row_f", "col_f", "row_r", "col_r"),
                 unidi=("row_f",) * K)[scan_mode]
    L = H * W
    w_dt_p = jnp.concatenate(
        [jnp.swapaxes(w_dt[k], 0, 1) for k in range(K)], axis=0)
    A_p = jnp.swapaxes(A, 1, 2).reshape(K * N, D)
    lno = jnp.stack([scale, shift])
    y_k = nk_scan_call_v2r(
        x.reshape(B, L, D), ranks.reshape(B, L, K * R),
        Bs.reshape(B, L, K * N), Cs.reshape(B, L, K * N),
        w_dt_p, A_p, Dmat, bias, lno, H, W, kinds, group=2,
        interpret=True)
    np.testing.assert_allclose(np.asarray(y_k.reshape(B, H, W, D)),
                               np.asarray(y_ref), rtol=3e-4, atol=3e-4)


def test_nk_scan_v2_shallowfuse_pattern():
    """K=1 flat forward chains (the ShallowFuse per-k call) via the v2
    serial kernel vs the selective_scan oracle."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import nk_scan_call_v2
    B, H, W, d_inner, N = 2, 4, 8, 12, 4
    K = 2
    L = H * W
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    u = jax.random.normal(ks[0], (B, L, K * d_inner), jnp.float32)
    dts = 0.3 * jax.random.normal(ks[1], (B, L, K * d_inner), jnp.float32)
    Bs = jax.random.normal(ks[2], (B, L, K, N), jnp.float32)
    Cs = jax.random.normal(ks[3], (B, L, K, N), jnp.float32)
    A2 = -jnp.exp(0.5 * jax.random.normal(ks[4], (K * d_inner, N),
                                          jnp.float32))
    Ds = jax.random.normal(ks[5], (K * d_inner,), jnp.float32)
    bias = 0.1 * jnp.arange(K * d_inner,
                            dtype=jnp.float32).reshape(K, d_inner)

    y_ref = selective_scan(u, dts, A2, Bs, Cs, Ds,
                           bias.reshape(-1), delta_softplus=True)
    ys = []
    for k in range(K):
        sl = slice(k * d_inner, (k + 1) * d_inner)
        ys.append(nk_scan_call_v2(
            u[..., sl], dts[..., sl], Bs[:, :, k], Cs[:, :, k],
            jnp.swapaxes(A2[sl], 0, 1), Ds[sl].reshape(1, -1),
            bias[k].reshape(1, -1), H, W, ("row_f",), group=2,
            interpret=True))
    y_k = jnp.concatenate(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scan_mode", ["cross2d", "unidi", "bidi"])
def test_nk_scan_v3_matches_composable(scan_mode):
    """Wide-state nk kernel (`nk_scan_wide.nk_scan_call_v3`: all N states in
    one lane-folded chain) vs the composable oracle at a 128-aligned D."""
    from xfmamba_tpu.ops.ablations.nk_scan_wide import nk_scan_call_v3
    B, H, W, D, K, N = 2, 4, 8, 128, 4, 4
    L = H * W
    x, dts, Bs, Cs, A, Dmat, bias = _projs(7, B, H, W, D, K, N)
    y_ref = ss2d_core_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                                 scan_mode=scan_mode,
                                 scan_impl=selective_scan)
    if scan_mode == "cross2d":
        kinds = ("row_f", "col_f", "row_r", "col_r")
    elif scan_mode == "unidi":
        kinds = ("row_f",) * K
    else:
        kinds = ("row_f", "row_f", "row_r", "row_r")
    A_p = jnp.swapaxes(A, 1, 2).reshape(K * N, D)
    y_k = nk_scan_call_v3(x.reshape(B, L, D),
                          dts.reshape(B, L, K * D).reshape(B, L, K * D),
                          Bs.reshape(B, L, K * N), Cs.reshape(B, L, K * N),
                          A_p, Dmat, bias, H, W, kinds, group=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(y_k).reshape(B, H, W, D),
                               np.asarray(y_ref), rtol=2e-4, atol=2e-4)


def test_nk_scan_v3_group_isolation():
    """G=4 wide kernel must not leak state across grouped images."""
    from xfmamba_tpu.ops.ablations.nk_scan_wide import nk_scan_call_v3
    B, H, W, D, K, N = 4, 2, 4, 128, 4, 2
    L = H * W
    x, dts, Bs, Cs, A, Dmat, bias = _projs(8, B, H, W, D, K, N)
    kinds = ("row_f", "col_f", "row_r", "col_r")
    A_p = jnp.swapaxes(A, 1, 2).reshape(K * N, D)
    args = (x.reshape(B, L, D), dts.reshape(B, L, K * D),
            Bs.reshape(B, L, K * N), Cs.reshape(B, L, K * N),
            A_p, Dmat, bias, H, W, kinds)
    y1 = nk_scan_call_v3(*args, group=1, interpret=True)
    y4 = nk_scan_call_v3(*args, group=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scan_mode", ["cross2d", "unidi", "bidi"])
def test_nk_scan_v4_matches_composable(scan_mode):
    """Inline-a/b nk kernel (`nk_scan_v4.nk_scan_from_projs` path via the
    v2 dispatcher at G=8) vs the composable oracle, N=4."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import nk_scan_from_projs_v2
    import xfmamba_tpu.ops.ablations.nk_scan_v4 as V4
    B, H, W, D, K, N = 8, 4, 8, 16, 4, 4
    x, dts, Bs, Cs, A, Dmat, bias = _projs(7, B, H, W, D, K, N)
    y_ref = ss2d_core_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                                 scan_mode=scan_mode,
                                 scan_impl=selective_scan)
    V4.FUSED_V4 = True
    try:
        y_k = nk_scan_from_projs_v2(x, dts, Bs, Cs, A, Dmat, bias,
                                    scan_mode=scan_mode, group=8,
                                    interpret=True)
    finally:
        V4.FUSED_V4 = False
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
