"""Pallas TPU kernel for the Mamba-2 / SSD chunked scan.

TPU-performance counterpart of the reference's Triton package
(`/root/reference/models/mamba2/ssd_combined.py:302-569`,
`ssd_chunk_scan.py:1229`, `ssd_chunk_state.py:635`,
`ssd_state_passing.py:194`, `ssd_bmm.py:163`): one fused kernel per
(batch, direction-group, head-tile) replaces the five-kernel Triton
pipeline.  The XLA einsum formulation (`ops/ssd.py:ssd_chunk_scan`) is the
semantics oracle; its weakness at scale is that XLA materializes the
(b, h, nc, l, l) decay mask and the (b, nc, h, p, n) chunk states in HBM —
here every intermediate lives in VMEM and the MXU does all the quadratic
work.

Algorithm per (batch b, group k, head tile of R_t heads), chunks serial,
per head h in the tile:

    dt     = softplus(dt_raw + bias_h) * [row < L]     (c, 1)
    w      = A_h * dt
    cums   = LT_ones @ w                (MXU cumsum)   (c, 1)
    CB     = C_c @ B_c^T                (MXU, shared over the tile)
    M      = CB * exp(cums_i - cums_j) * [i >= j]      (c, c)
    Y_h    = M @ (dt*x)_h  +  (C_c @ stateT_h) * exp(cums)
    stateT_h' = exp(w_tot) * stateT_h
                + B_c^T @ ((dt*x)_h * exp(w_tot - cums))

Layouts are head-major so every Pallas block keeps its trailing dims equal
to the array dims (Mosaic requirement): x/y (b, KR, Lp, P), dt
(b, KR, Lp, 1), B/C (b, K, Lp, N), states (R_t*N, P) stacked on sublanes.
States are carried transposed — stateT (N, P) — so both the read-out
(C @ stateT) and the update (B^T @ dtx, a dot_general contracting rows)
are MXU ops with no in-kernel transposes; the (c, c) outer differences
come from two rank-1 dot_generals on the cumsum column.

Sequence lengths that don't divide the chunk are zero-padded in-kernel
(dt rows past L are masked to 0 → decay 1, contribution 0), so the 2-D
scan geometries (L = 49/196/784) keep the full 64-wide chunk instead of
degrading to chunk 1/4/16 like the reference's halving rule.

Forward-only: the model-level dispatch keeps the XLA formulation for
training (`ops/ssd.py`), whose autodiff is the tested gradient path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import _softplus

# kill switch: route ssd_chunk_scan through the Pallas kernel on TPU
FUSED_SSD = True

_NEG = -1e30


def _head_tile(R: int, P: int) -> int:
    """Largest divisor of R with R_t * P <= 512 lanes-equivalent of VMEM
    per-tile working set (tiles are processed per-head; R_t only sets how
    many heads share one grid step)."""
    for t in (8, 6, 4, 3, 2, 1):
        if R % t == 0 and t * P <= 512:
            return t
    return 1


def _ssd_kernel(L, c, P, N, R_t, out_dtype,
                x_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                init_ref, y_ref, fin_ref, state_ref):
    """One grid step = R_t heads of one direction group, all chunks serial.

    Block shapes:
      x_ref/y_ref (1, R_t, Lp, P)    dt_ref (1, R_t, Lp, 1)
      B_ref/C_ref (1, 1, Lp, N)      A_ref/bias_ref (1, 1, R_t)
      D_ref (1, R_t, P)              init_ref/fin_ref (1, R_t*N, P)
      state_ref VMEM scratch (R_t*N, P) f32
    """
    f32 = jnp.float32
    Lp = x_ref.shape[2]
    nc = Lp // c

    state_ref[...] = init_ref[0].astype(f32)

    ri = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    lt = ri >= ci
    lt_ones = lt.astype(f32)                      # inclusive-cumsum matrix
    ones_col = jnp.ones((c, 1), f32)
    ones_row = jnp.ones((1, c), f32)

    def chunk_body(i, _):
        off = pl.multiple_of(i * c, c)
        row = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) + off
        valid = (row < L).astype(f32)             # (c, 1)

        Bc = B_ref[0, 0, pl.ds(off, c), :].astype(f32)          # (c, N)
        Cc = C_ref[0, 0, pl.ds(off, c), :].astype(f32)          # (c, N)
        CB = jax.lax.dot_general(Cc, Bc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)    # (c, c)

        # Precision: the cumsum and outer-difference dots feed an EXPONENT
        # (decay sums can reach ~50) — single-pass-bf16 MXU quantization
        # there turns into ~10% multiplicative error, so they run at
        # HIGHEST (Mosaic supports only DEFAULT/HIGHEST).  The data dots
        # (CB, M@dtx, C@state, B^T@dtx) stay at the MXU's native pass
        # precision, matching the reference Triton kernels' tensor-core
        # matmuls (~2e-3 on y, bounded by the on-device parity test).
        for h in range(R_t):
            ssl = slice(h * N, (h + 1) * N)
            dt_raw = dt_ref[0, h, pl.ds(off, c), :].astype(f32)  # (c, 1)
            dt = _softplus(
                dt_raw + bias_ref[0, 0:1, h:h + 1].astype(f32)) * valid
            w = dt * A_ref[0, 0:1, h:h + 1].astype(f32)          # (c, 1)
            ch = jax.lax.dot(lt_ones, w, preferred_element_type=f32,
                                  precision=jax.lax.Precision.HIGHEST)
            wt = ch[c - 1:c, :]                                  # (1, 1)
            # outer differences without transposes: cums_i - cums_j
            S = (jax.lax.dot(ch, ones_row, preferred_element_type=f32,
                                  precision=jax.lax.Precision.HIGHEST)
                 - jax.lax.dot_general(ones_col, ch,
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32,
                                  precision=jax.lax.Precision.HIGHEST))
            M = CB * jnp.exp(jnp.where(lt, S, _NEG))             # (c, c)

            xc = x_ref[0, h, pl.ds(off, c), :].astype(f32)       # (c, P)
            dtx = xc * dt                                        # (c, P)
            y_h = jax.lax.dot(M, dtx, preferred_element_type=f32)
            st_h = state_ref[ssl, :]                             # (N, P)
            y_h = y_h + jax.lax.dot(Cc, st_h,
                                    preferred_element_type=f32) \
                * jnp.exp(ch)
            # state update (contract over chunk rows; no transpose).
            # (1,1)->(N,1) then lane-broadcast: Mosaic has no dual-axis
            # broadcast of a scalar vector.
            e_wt = jnp.exp(jnp.broadcast_to(wt, (N, 1)))
            state_ref[ssl, :] = st_h * e_wt \
                + jax.lax.dot_general(Bc, dtx * jnp.exp(wt - ch),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
            y_h = y_h + xc * D_ref[0, h:h + 1, :].astype(f32)
            y_ref[0, h, pl.ds(off, c), :] = y_h.astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)
    fin_ref[0] = state_ref[...]


@functools.partial(jax.jit, static_argnames=("K", "R_t", "chunk",
                                              "interpret", "vmem_mb"))
def _ssd_call(x, dt, Bg, Cg, A2, bias2, D2, initT, K, R_t, chunk,
              interpret=False, vmem_mb=100):
    """Head-major entry.

    x     (b, KR, L, P)
    dt    (b, KR, L, 1)
    Bg/Cg (b, K, L, N)
    A2/bias2 (K*nt, 1, R_t)
    D2    (K*nt, R_t, P)
    initT (b*K*nt, R_t*N, P)
    Returns y (b, KR, L, P) in x.dtype, fin (b*K*nt, R_t*N, P) f32.
    """
    b, KR, L, P = x.shape
    R = KR // K
    nt = R // R_t
    N = Bg.shape[3]
    Lp = ((L + chunk - 1) // chunk) * chunk
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        Bg = jnp.pad(Bg, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        Cg = jnp.pad(Cg, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    kernel = functools.partial(_ssd_kernel, L, chunk, P, N, R_t, x.dtype)
    blk_x = pl.BlockSpec((1, R_t, Lp, P),
                         lambda bb, k, t: (bb, k * nt + t, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_dt = pl.BlockSpec((1, R_t, Lp, 1),
                          lambda bb, k, t: (bb, k * nt + t, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_BC = pl.BlockSpec((1, 1, Lp, N), lambda bb, k, t: (bb, k, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_A = pl.BlockSpec((1, 1, R_t), lambda bb, k, t: (k * nt + t, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_D = pl.BlockSpec((1, R_t, P), lambda bb, k, t: (k * nt + t, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_st = pl.BlockSpec((1, R_t * N, P),
                          lambda bb, k, t: (bb * K * nt + k * nt + t, 0, 0),
                          memory_space=pltpu.VMEM)

    y, fin = pl.pallas_call(
        kernel,
        grid=(b, K, nt),
        in_specs=[blk_x, blk_dt, blk_BC, blk_BC, blk_A, blk_A, blk_D,
                  blk_st],
        out_specs=[blk_x, blk_st],
        out_shape=[jax.ShapeDtypeStruct((b, KR, Lp, P), x.dtype),
                   jax.ShapeDtypeStruct((b * K * nt, R_t * N, P),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((R_t * N, P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, dt, Bg, Cg, A2, bias2, D2, initT)
    return y[:, :, :L, :], fin


def ssd_supported(L, h, p, n, g, chunk=64):
    """Geometry gate for the Pallas path."""
    if h % g or n % 8 or n > 512 or p % 8 or p > 128 or chunk % 8:
        return False
    R = h // g
    R_t = _head_tile(R, p)
    Lp = ((L + chunk - 1) // chunk) * chunk
    # per-grid-step working set: x/y head tiles + B/C + state
    est = (2 * Lp * R_t * p + 2 * Lp * n + R_t * n * p) * 4
    return est < 60 * 1024 * 1024


def ssd_chunk_scan_pallas(x, dt, A, B, C, chunk_size, D=None, dt_bias=None,
                          initial_states=None, interpret=False):
    """Pallas forward for `ssd.ssd_chunk_scan` (the shipped m0_noz surface:
    no z-gate, dt_softplus=True, default dt_limit).  Shapes as in
    `ssd.ssd_chunk_scan`: x (b, s, h, p); dt (b, s, h); A (h,);
    B/C (b, s, g, n); D (h,) or (h, p); initial_states (b, h, p, n).
    Returns (y (b, s, h, p) in x.dtype, final_state (b, h, p, n) f32)."""
    b, s, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    assert h % g == 0
    R = h // g
    R_t = _head_tile(R, p)
    nt = R // R_t

    Dm = jnp.zeros((h, p), jnp.float32) if D is None else (
        jnp.broadcast_to(D.astype(jnp.float32)[:, None], (h, p))
        if D.ndim == 1 else D.astype(jnp.float32))
    biasv = (jnp.zeros((h,), jnp.float32) if dt_bias is None
             else dt_bias.astype(jnp.float32))
    init = (jnp.zeros((b, h, p, n), jnp.float32) if initial_states is None
            else initial_states.astype(jnp.float32))

    # stateT layout: heads stacked on sublanes, (b*K*nt, R_t*N, P)
    initT = jnp.swapaxes(init, 2, 3)                    # (b, h, n, p)
    initT = initT.reshape(b * g * nt, R_t * n, p)

    y, fin = _ssd_call(
        jnp.swapaxes(x, 1, 2),                          # (b, h, s, p)
        jnp.swapaxes(dt, 1, 2)[..., None],              # (b, h, s, 1)
        jnp.swapaxes(B, 1, 2),                          # (b, g, s, n)
        jnp.swapaxes(C, 1, 2),
        A.astype(jnp.float32).reshape(g * nt, 1, R_t),
        biasv.reshape(g * nt, 1, R_t),
        Dm.reshape(g * nt, R_t, p),
        initT, K=g, R_t=R_t, chunk=chunk_size, interpret=interpret)

    fin = fin.reshape(b, h, n, p)
    fin = jnp.swapaxes(fin, 2, 3)                       # (b, h, p, n)
    return jnp.swapaxes(y, 1, 2), fin
