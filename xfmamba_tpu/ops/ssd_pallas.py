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

Training: `ssd_chunk_scan_pallas_train` (custom_vjp) pairs the same
forward (plus chunk-state checkpoints) with a reverse-chunk Pallas
adjoint kernel — the TPU counterpart of the reference Triton backward
(`ssd_combined.py:351`, `ssd_chunk_scan.py:1333-1703`).  The XLA einsum
formulation (`ops/ssd.py`) remains the semantics/gradient oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops import fast_math as _fm
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


def _ssd_kernel(L, c, P, N, R_t, out_dtype, save_states,
                *refs):
    """One grid step = R_t heads of one direction group, all chunks serial.

    Block shapes:
      x_ref/y_ref (1, R_t, Lp, P)    dt_ref (1, R_t, Lp, 1)
      B_ref/C_ref (1, 1, Lp, N)      A_ref/bias_ref (1, 1, R_t)
      D_ref (1, R_t, P)              init_ref/fin_ref (1, R_t*N, P)
      state_ref VMEM scratch (R_t*N, P) f32
    With ``save_states`` (the training forward) an extra output block
    (1, nc, R_t*N, P) receives each chunk's START state — the checkpoints
    the adjoint kernel scans back from (the TPU analogue of the Triton
    bwd's saved `states`, `ssd_combined.py:351`).
    """
    if save_states:
        (x_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
         init_ref, y_ref, fin_ref, states_out_ref, state_ref) = refs
    else:
        (x_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
         init_ref, y_ref, fin_ref, state_ref) = refs
        states_out_ref = None
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
        if save_states:
            states_out_ref[0, pl.ds(i, 1)] = state_ref[...][None]

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
            M = CB * _fm.exp(jnp.where(lt, S, _NEG))             # (c, c)

            xc = x_ref[0, h, pl.ds(off, c), :].astype(f32)       # (c, P)
            dtx = xc * dt                                        # (c, P)
            y_h = jax.lax.dot(M, dtx, preferred_element_type=f32)
            st_h = state_ref[ssl, :]                             # (N, P)
            y_h = y_h + jax.lax.dot(Cc, st_h,
                                    preferred_element_type=f32) \
                * _fm.exp(ch)
            # state update (contract over chunk rows; no transpose).
            # (1,1)->(N,1) then lane-broadcast: Mosaic has no dual-axis
            # broadcast of a scalar vector.
            e_wt = _fm.exp(jnp.broadcast_to(wt, (N, 1)))
            state_ref[ssl, :] = st_h * e_wt \
                + jax.lax.dot_general(Bc, dtx * _fm.exp(wt - ch),
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

    kernel = functools.partial(_ssd_kernel, L, chunk, P, N, R_t, x.dtype,
                               False)
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


# ---------------------------------------------------------------------
# training path: forward with chunk-state checkpoints + adjoint kernel
# (VERDICT r2 item 5 — the TPU counterpart of the reference Triton
# backward `ssd_combined.py:351` `_mamba_chunk_scan_combined_bwd` /
# the 8 bwd kernels of `ssd_chunk_scan.py:1333-1703`)
# ---------------------------------------------------------------------

# kill switch: m0 training routes through the Pallas fwd+bwd pair instead
# of the HBM-heavy XLA einsum autodiff path
FUSED_SSD_TRAIN = True

# interpret-mode toggle for the custom_vjp train path (CPU tests flip it;
# custom_vjp can't thread a keyword through defvjp)
INTERPRET_TRAIN = False


@functools.partial(jax.jit, static_argnames=("K", "R_t", "chunk",
                                              "interpret", "vmem_mb"))
def _ssd_call_train(x, dt, Bg, Cg, A2, bias2, D2, initT, K, R_t, chunk,
                    interpret=False, vmem_mb=100):
    """Like `_ssd_call` but also returns the per-chunk START states
    (b*K*nt, nc, R_t*N, P) f32 — the bwd kernel's checkpoints."""
    b, KR, L, P = x.shape
    R = KR // K
    nt = R // R_t
    N = Bg.shape[3]
    Lp = ((L + chunk - 1) // chunk) * chunk
    nc = Lp // chunk
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        Bg = jnp.pad(Bg, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        Cg = jnp.pad(Cg, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    kernel = functools.partial(_ssd_kernel, L, chunk, P, N, R_t, x.dtype,
                               True)
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
    blk_cs = pl.BlockSpec((1, nc, R_t * N, P),
                          lambda bb, k, t: (bb * K * nt + k * nt + t,
                                            0, 0, 0),
                          memory_space=pltpu.VMEM)

    y, fin, cs = pl.pallas_call(
        kernel,
        grid=(b, K, nt),
        in_specs=[blk_x, blk_dt, blk_BC, blk_BC, blk_A, blk_A, blk_D,
                  blk_st],
        out_specs=[blk_x, blk_st, blk_cs],
        out_shape=[jax.ShapeDtypeStruct((b, KR, Lp, P), x.dtype),
                   jax.ShapeDtypeStruct((b * K * nt, R_t * N, P),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((b * K * nt, nc, R_t * N, P),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((R_t * N, P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, dt, Bg, Cg, A2, bias2, D2, initT)
    return y[:, :, :L, :], fin, cs


def _ssd_bwd_kernel(L, c, P, N, R_t, nt,
                    x_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                    cs_ref, dy_ref, dfin_ref,
                    dx_ref, ddt_ref, dB_ref, dC_ref, dA_ref, dbias_ref,
                    dD_ref, dinit_ref, ds_ref):
    """Reverse-chunk adjoint.  Recomputes every intra-chunk quantity from
    the checkpointed chunk-start states (cs_ref) and carries the state
    adjoint (N, P) backwards; every contraction is an MXU dot shaped like
    its forward counterpart.

    dB/dC blocks are indexed (bb, k) — independent of the innermost grid
    axis t — so heads tiles accumulate in-place across consecutive grid
    steps (zeroed at t == 0).  dA/dbias/dD keep a batch axis and are
    summed over it by the caller (the b axis is outermost, so in-kernel
    accumulation over it is not legal block reuse).
    """
    f32 = jnp.float32
    Lp = x_ref.shape[2]
    nc = Lp // c
    t_idx = pl.program_id(2)

    @pl.when(t_idx == 0)
    def _():
        dB_ref[...] = jnp.zeros_like(dB_ref)
        dC_ref[...] = jnp.zeros_like(dC_ref)

    # dD accumulates across the chunk loop within this grid step; output
    # blocks start uninitialized
    dD_ref[...] = jnp.zeros_like(dD_ref)

    dA_acc = jnp.zeros((1, R_t), f32)
    dbias_acc = jnp.zeros((1, R_t), f32)

    ds_ref[...] = dfin_ref[0]

    ri = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    lt = ri >= ci
    lt_ones = lt.astype(f32)
    ones_col = jnp.ones((c, 1), f32)
    ones_P = jnp.ones((P, 1), f32)
    HI = jax.lax.Precision.HIGHEST

    def rsum(v):  # (c, X) -> (c, 1) row sums over lanes
        # HIGHEST: these reductions feed the scalar dA/dbias accumulators;
        # a single-pass-bf16 quantization of the summands costs ~3e-2
        # there (measured on-chip), HIGHEST brings it to ~1e-3 for free
        # (rank-1 dots).
        return jax.lax.dot(v, jnp.ones((v.shape[1], 1), f32),
                           preferred_element_type=f32, precision=HI)

    def chunk_body(j, carry):
        dA_acc, dbias_acc = carry
        i = nc - 1 - j
        off = pl.multiple_of(i * c, c)
        row = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) + off
        valid = (row < L).astype(f32)

        Bc = B_ref[0, 0, pl.ds(off, c), :].astype(f32)           # (c, N)
        Cc = C_ref[0, 0, pl.ds(off, c), :].astype(f32)
        CB = jax.lax.dot_general(Cc, Bc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)     # (c, c)
        dB_c = jnp.zeros((c, N), f32)
        dC_c = jnp.zeros((c, N), f32)
        dCB = jnp.zeros((c, c), f32)

        for h in range(R_t):
            ssl = slice(h * N, (h + 1) * N)
            # --- recompute forward intra-chunk quantities (matches
            # _ssd_kernel op-for-op, incl. HIGHEST on the exponent dots)
            z_raw = dt_ref[0, h, pl.ds(off, c), :].astype(f32) \
                + bias_ref[0, 0:1, h:h + 1].astype(f32)
            dt = _softplus(z_raw) * valid
            A_h = A_ref[0, 0:1, h:h + 1].astype(f32)
            w = dt * A_h
            ch = jax.lax.dot(lt_ones, w, preferred_element_type=f32,
                             precision=HI)
            wt = ch[c - 1:c, :]                                   # (1, 1)
            S = (jax.lax.dot(ch, jnp.ones((1, c), f32),
                             preferred_element_type=f32, precision=HI)
                 - jax.lax.dot_general(ones_col, ch,
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32,
                                       precision=HI))
            E = _fm.exp(jnp.where(lt, S, _NEG))                  # (c, c)
            M = CB * E
            xc = x_ref[0, h, pl.ds(off, c), :].astype(f32)        # (c, P)
            dtx = xc * dt
            e_ch = _fm.exp(ch)                                    # (c, 1)
            e_wc = _fm.exp(wt - ch)                               # (c, 1)
            G = dtx * e_wc
            st = cs_ref[0, i, ssl, :]                             # (N, P)

            dy = dy_ref[0, h, pl.ds(off, c), :].astype(f32)       # (c, P)
            ds = ds_ref[ssl, :]                                   # (N, P)

            # --- readout adjoints: y = M@dtx + (Cc@st)*e_ch + D*x
            dye = dy * e_ch
            dM = jax.lax.dot_general(dy, dtx, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)  # (c, c)
            d_dtx = jax.lax.dot_general(M, dy, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32)
            Cst = jax.lax.dot(Cc, st, preferred_element_type=f32)  # (c, P)
            dch = rsum(dy * Cst) * e_ch                            # (c, 1)
            dC_h = jax.lax.dot_general(dye, st, (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32)  # (c,N)
            dst = jax.lax.dot_general(Cc, dye, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)  # (N, P)

            # --- state-update adjoints: st' = st*e^wt + Bc^T @ G
            e_wt_N = _fm.exp(jnp.broadcast_to(wt, (N, 1)))
            dst = dst + ds * e_wt_N
            dG = jax.lax.dot(Bc, ds, preferred_element_type=f32)   # (c, P)
            d_dtx = d_dtx + dG * e_wc
            dB_h = jax.lax.dot_general(G, ds, (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32)  # (c,N)
            t_r = rsum(dG * G)                                     # (c, 1)
            dch = dch - t_r
            dwt = jnp.sum(t_r) + jnp.sum(
                ds * st * jnp.broadcast_to(e_wt_N, (N, P)))

            # --- M = CB * E decomposition
            dCB = dCB + dM * E
            dS = dM * M
            dch = dch + rsum(dS) \
                - jax.lax.dot_general(dS, ones_col, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32,
                                      precision=HI)

            # --- cumsum adjoint: ch = LT @ w; wt = sum(w)
            dw = jax.lax.dot_general(lt_ones, dch, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32,
                                     precision=HI)                 # (c, 1)
            dw = dw + dwt

            # --- leaf gradients
            D_h = D_ref[0, h:h + 1, :].astype(f32)                 # (1, P)
            dD_ref[0, h:h + 1, :] = dD_ref[0, h:h + 1, :] + \
                jax.lax.dot_general(dy * xc, ones_col,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32).reshape(1, P)
            dx = d_dtx * dt + dy * D_h
            ddt = rsum(d_dtx * xc) + dw * A_h                      # (c, 1)
            # one-hot accumulate (``.at[].add`` lowers to a scatter whose
            # index constants Pallas cannot capture); h is a Python int
            hsel = (jax.lax.broadcasted_iota(jnp.int32, (1, R_t), 1)
                    == h)
            dA_acc = dA_acc + jnp.where(hsel, jnp.sum(dw * dt), 0.0)
            sig = jnp.where(z_raw > 20.0, 1.0,
                            1.0 / (1.0 + _fm.exp(-z_raw)))
            dsp = ddt * valid * sig
            dbias_acc = dbias_acc + jnp.where(hsel, jnp.sum(dsp), 0.0)

            dx_ref[0, h, pl.ds(off, c), :] = dx
            ddt_ref[0, h, pl.ds(off, c), :] = dsp
            dB_c = dB_c + dB_h
            dC_c = dC_c + dC_h
            ds_ref[ssl, :] = dst

        # CB = Cc @ Bc^T, shared across the tile's heads
        dC_c = dC_c + jax.lax.dot(dCB, Bc, preferred_element_type=f32)
        dB_c = dB_c + jax.lax.dot_general(dCB, Cc, (((0,), (0,)), ((), ())),
                                          preferred_element_type=f32)
        dB_ref[0, 0, pl.ds(off, c), :] = dB_ref[0, 0, pl.ds(off, c), :] + dB_c
        dC_ref[0, 0, pl.ds(off, c), :] = dC_ref[0, 0, pl.ds(off, c), :] + dC_c
        return dA_acc, dbias_acc

    dA_acc, dbias_acc = jax.lax.fori_loop(0, nc, chunk_body,
                                          (dA_acc, dbias_acc))
    dA_ref[0] = dA_acc
    dbias_ref[0] = dbias_acc
    dinit_ref[0] = ds_ref[...]


@functools.partial(jax.jit, static_argnames=("K", "R_t", "chunk",
                                              "interpret", "vmem_mb"))
def _ssd_bwd_call(x, dt, Bg, Cg, A2, bias2, D2, cs, dy, dfin, K, R_t, chunk,
                  interpret=False, vmem_mb=100):
    """Adjoint entry (head-major layouts as `_ssd_call`).  Returns
    (dx, ddt, dB, dC, dA2, dbias2, dD2, dinitT) with dA2/dbias2/dD2
    carrying a leading batch axis to sum on the host side."""
    b, KR, L, P = x.shape
    R = KR // K
    nt = R // R_t
    N = Bg.shape[3]
    Lp = ((L + chunk - 1) // chunk) * chunk
    nc = Lp // chunk
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        x = jnp.pad(x, pad)
        dt = jnp.pad(dt, pad)
        Bg = jnp.pad(Bg, pad)
        Cg = jnp.pad(Cg, pad)
        dy = jnp.pad(dy, pad)

    kernel = functools.partial(_ssd_bwd_kernel, L, chunk, P, N, R_t, nt)
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
    blk_cs = pl.BlockSpec((1, nc, R_t * N, P),
                          lambda bb, k, t: (bb * K * nt + k * nt + t,
                                            0, 0, 0),
                          memory_space=pltpu.VMEM)
    # (b*K*nt, 1, R_t): the blocked axis must be leading — Mosaic requires
    # the last two block dims to equal the array dims (or tile 8/128)
    blk_Ab = pl.BlockSpec((1, 1, R_t),
                          lambda bb, k, t: (bb * K * nt + k * nt + t, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_Db = pl.BlockSpec((1, R_t, P),
                          lambda bb, k, t: (bb * K * nt + k * nt + t, 0, 0),
                          memory_space=pltpu.VMEM)

    f32 = jnp.float32
    dx, ddt, dB, dC, dA, dbias, dD, dinit = pl.pallas_call(
        kernel,
        grid=(b, K, nt),
        in_specs=[blk_x, blk_dt, blk_BC, blk_BC, blk_A, blk_A, blk_D,
                  blk_cs, blk_x, blk_st],
        out_specs=[blk_x, blk_dt, blk_BC, blk_BC, blk_Ab, blk_Ab, blk_Db,
                   blk_st],
        out_shape=[jax.ShapeDtypeStruct((b, KR, Lp, P), f32),
                   jax.ShapeDtypeStruct((b, KR, Lp, 1), f32),
                   jax.ShapeDtypeStruct((b, K, Lp, N), f32),
                   jax.ShapeDtypeStruct((b, K, Lp, N), f32),
                   jax.ShapeDtypeStruct((b * K * nt, 1, R_t), f32),
                   jax.ShapeDtypeStruct((b * K * nt, 1, R_t), f32),
                   jax.ShapeDtypeStruct((b * K * nt, R_t, P), f32),
                   jax.ShapeDtypeStruct((b * K * nt, R_t * N, P), f32)],
        scratch_shapes=[pltpu.VMEM((R_t * N, P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, dt, Bg, Cg, A2, bias2, D2, cs, dy, dfin)
    return (dx[:, :, :L, :], ddt[:, :, :L, :], dB[:, :, :L, :],
            dC[:, :, :L, :], dA, dbias, dD, dinit)


def _pack_args(x, dt, A, B, C, chunk_size, D, dt_bias, initial_states):
    """Shared layout transform (public shapes -> head-major kernel args)."""
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
    initT = jnp.swapaxes(init, 2, 3).reshape(b * g * nt, R_t * n, p)
    return (jnp.swapaxes(x, 1, 2), jnp.swapaxes(dt, 1, 2)[..., None],
            jnp.swapaxes(B, 1, 2), jnp.swapaxes(C, 1, 2),
            A.astype(jnp.float32).reshape(g * nt, 1, R_t),
            biasv.reshape(g * nt, 1, R_t),
            Dm.reshape(g * nt, R_t, p), initT, g, R_t, nt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ssd_chunk_scan_pallas_train(x, dt, A, B, C, chunk_size, D, dt_bias,
                                initial_states):
    """Differentiable Pallas SSD scan: fused forward with chunk-state
    checkpoints + reverse-chunk adjoint kernel (replaces the XLA einsum
    autodiff path that materializes the (b, h, nc, l, l) decay mask in
    HBM).  Same contract as `ssd_chunk_scan_pallas`; optional args must be
    passed positionally (custom_vjp).  Returns (y, final_state)."""
    y, fin, _ = _ssd_train_fwd_impl(x, dt, A, B, C, chunk_size, D, dt_bias,
                                    initial_states)
    return y, fin


def _ssd_train_fwd_impl(x, dt, A, B, C, chunk_size, D, dt_bias,
                        initial_states):
    b, s, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    (xh, dth, Bh, Ch, A2, bias2, D2, initT, K, R_t, nt) = _pack_args(
        x, dt, A, B, C, chunk_size, D, dt_bias, initial_states)
    y, fin, cs = _ssd_call_train(xh, dth, Bh, Ch, A2, bias2, D2, initT,
                                 K=K, R_t=R_t, chunk=chunk_size,
                                 interpret=INTERPRET_TRAIN)
    fin = jnp.swapaxes(fin.reshape(b, h, n, p), 2, 3)
    return jnp.swapaxes(y, 1, 2), fin, cs


def _ssd_train_fwd(x, dt, A, B, C, chunk_size, D, dt_bias, initial_states):
    y, fin, cs = _ssd_train_fwd_impl(x, dt, A, B, C, chunk_size, D, dt_bias,
                                     initial_states)
    res = (x, dt, A, B, C, D, dt_bias, initial_states, cs)
    return (y, fin), res


def _ssd_train_bwd(chunk_size, res, cts):
    x, dt, A, B, C, D, dt_bias, initial_states, cs = res
    dy, dfin = cts
    b, s, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    (xh, dth, Bh, Ch, A2, bias2, D2, _initT, K, R_t, nt) = _pack_args(
        x, dt, A, B, C, chunk_size, D, dt_bias, initial_states)
    dyh = jnp.swapaxes(dy, 1, 2)
    dfinT = jnp.swapaxes(dfin.astype(jnp.float32), 2, 3) \
        .reshape(b * g * nt, R_t * n, p)
    dxh, ddth, dBh, dCh, dA, dbias, dD, dinitT = _ssd_bwd_call(
        xh, dth, Bh, Ch, A2, bias2, D2, cs, dyh, dfinT,
        K=K, R_t=R_t, chunk=chunk_size, interpret=INTERPRET_TRAIN)
    dx = jnp.swapaxes(dxh, 1, 2).astype(x.dtype)
    ddt = jnp.swapaxes(ddth[..., 0], 1, 2).astype(dt.dtype)
    dB = jnp.swapaxes(dBh, 1, 2).astype(B.dtype)
    dC = jnp.swapaxes(dCh, 1, 2).astype(C.dtype)
    dAv = dA.reshape(b, h).sum(axis=0).astype(A.dtype)
    dD_full = dD.reshape(b, g * nt, R_t, p).sum(axis=0).reshape(h, p)
    if D is None:
        dDv = None
    elif D.ndim == 1:
        dDv = dD_full.sum(axis=1).astype(D.dtype)
    else:
        dDv = dD_full.astype(D.dtype)
    dbiasv = (None if dt_bias is None
              else dbias.reshape(b, h).sum(axis=0).astype(dt_bias.dtype))
    dinit = (None if initial_states is None
             else jnp.swapaxes(dinitT.reshape(b, h, n, p), 2, 3)
             .astype(initial_states.dtype))
    return dx, ddt, dAv, dB, dC, dDv, dbiasv, dinit


ssd_chunk_scan_pallas_train.defvjp(_ssd_train_fwd, _ssd_train_bwd)
