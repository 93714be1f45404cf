"""Fused Pallas TPU kernel for the 4-direction SS2D selective scan.

This is the TPU-native replacement for the reference's CUDA/Triton hot path
(`selective_scan_fwd_kernel.cuh` + `triton_cross_scan_flex`): one kernel
fuses softplus(Δ)+bias, the exp(Δ·A)/Δ·B·u prologue, the chunked
first-order-recurrence scan (Hillis-Steele in VMEM, fp32 state, running
carry across chunks — the VMEM analogue of the CUDA kernel's 2048-element
chunking with cub BlockScan prefix, `selective_scan.cpp:225`), the C·h + D·u
epilogue, and the forward+reverse direction pair.

Direction handling (cross2d): reversed traversals are *reverse scans inside
the kernel* (chunks walked right-to-left, shifts mirrored) — no data flips
anywhere; column-major traversals take a pre-transposed copy of x prepared
by XLA (one cheap transpose) so every kernel access is contiguous.

Layouts:
  u2    (B, 2, L, D)   row-major x and column-major x   (bf16/f32)
  dts   (B, 4, L, D)   per-direction Δ (k=1,3 in column-major order)
  Bs,Cs (B, 4, L, N)
  A     (4, D, N) f32  (= -exp(A_logs), pre-negated outside)
  Dsk   (4, D) f32, bias (4, D) f32
Returns yf, yr: (B, 2, L, D) f32 — per-pair forward/reverse partial sums;
the caller merges (y_row = yf[:,0]+yr[:,0]; y_col transposed back).

Grid: (B, 2 pairs, n_chunks); chunk axis innermost so the per-(batch, pair)
carry lives in VMEM scratch across grid steps.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops import fast_math as _fm


def _shift_fwd(x, off, fill):
    """Read x[t-off] (identity-padded at the left edge)."""
    pad = jnp.full((off,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-off]], axis=0)


def _shift_rev(x, off, fill):
    """Read x[t+off] (identity-padded at the right edge)."""
    pad = jnp.full((off,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[off:], pad], axis=0)


def _hillis_steele(a, b, chunk, reverse):
    """Inclusive scan of the recurrence pairs (a, b) along axis 0 in VMEM.

    combine(prev, cur) = (a_p*a_c, a_c*b_p + b_c); log2(chunk) stages of
    vectorized shift-multiply-add (the VPU analogue of cub::BlockScan).
    """
    shift = _shift_rev if reverse else _shift_fwd
    stages = max(1, math.ceil(math.log2(chunk)))
    for s in range(stages):
        off = 1 << s
        if off >= chunk:
            break
        a_sh = shift(a, off, 1.0)
        b_sh = shift(b, off, 0.0)
        b = b + a * b_sh
        a = a * a_sh
    return a, b


def _scan_kernel(L, N, chunk, n_chunks,
                 u_f_ref, u_r_ref, dt_f_ref, dt_r_ref,
                 B_f_ref, B_r_ref, C_f_ref, C_r_ref,
                 A_ref, Dsk_ref, bias_ref,
                 yf_ref, yr_ref,
                 carry_f, carry_r):
    p = pl.program_id(1)          # direction pair: 0 row-major, 1 col-major
    c = pl.program_id(2)          # forward chunk index
    rc = n_chunks - 1 - c         # reverse chunk index (data position)

    @pl.when(c == 0)
    def _():
        carry_f[...] = jnp.zeros_like(carry_f)
        carry_r[...] = jnp.zeros_like(carry_r)

    D = u_f_ref.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, D), 0)

    def one_direction(u_ref, dt_ref, B_ref, C_ref, k, base, carry, reverse,
                      y_ref):
        u = u_ref[0, 0].astype(jnp.float32)              # (chunk, D)
        dt = dt_ref[0, 0].astype(jnp.float32)
        bias = bias_ref[pl.ds(k, 1), :].astype(jnp.float32)   # (1, D)
        dt = jax.nn.softplus(dt + bias)
        valid = (base + row) < L                          # (chunk, D)

        dsk = Dsk_ref[pl.ds(k, 1), :].astype(jnp.float32)     # (1, D)
        # last valid row of this chunk (only the final data chunk is padded)
        last = jnp.minimum(chunk - 1, L - 1 - base)

        Bfull = B_ref[0, 0].astype(jnp.float32)           # (chunk, N)
        Cfull = C_ref[0, 0].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, Bfull.shape, 1)

        # fori_loop over the state dimension keeps one n's buffers live at a
        # time (an unrolled python loop at N=16, D=1536 blows the VMEM
        # stack).  Column n of B/C is picked by masked lane-reduction and
        # A (pre-transposed to (4, N, D)) by dynamic sublane index — Mosaic
        # has no dynamic *lane* indexing.
        def n_body(n, y):
            a_n = A_ref[pl.ds(k, 1), pl.ds(n, 1), :].astype(
                jnp.float32).reshape(1, -1)                    # (1, D)
            Bn = jnp.sum(jnp.where(lane == n, Bfull, 0.0), axis=1,
                         keepdims=True)                        # (chunk, 1)
            Cn = jnp.sum(jnp.where(lane == n, Cfull, 0.0), axis=1,
                         keepdims=True)
            a = _fm.exp(dt * a_n)
            b = dt * u * Bn
            a = jnp.where(valid, a, 1.0)
            b = jnp.where(valid, b, 0.0)
            a, b = _hillis_steele(a, b, chunk, reverse)
            h = b + a * carry[pl.ds(n, 1), :]             # (chunk, D)
            if reverse:
                carry[pl.ds(n, 1), :] = h[0:1, :]
            else:
                # row `last` of h via masked reduce (Mosaic has no
                # dynamic_slice on values)
                carry[pl.ds(n, 1), :] = jnp.sum(
                    jnp.where(row == last, h, 0.0), axis=0, keepdims=True)
            return y + Cn * h

        y = jax.lax.fori_loop(0, N, n_body, u * dsk)
        y_ref[0, 0] = y

    one_direction(u_f_ref, dt_f_ref, B_f_ref, C_f_ref, p, c * chunk,
                  carry_f, False, yf_ref)
    one_direction(u_r_ref, dt_r_ref, B_r_ref, C_r_ref, p + 2, rc * chunk,
                  carry_r, True, yr_ref)


def _pick_chunk(L: int, D: int, N: int) -> int:
    """Chunk length: bounded by a ~4 MB VMEM working-set budget (cf. the
    CUDA kernel's fixed 2048, `selective_scan.cpp:225`; Mosaic
    double-buffers input blocks, so stay well under the 16 MB VMEM)."""
    d_pad = max(128, ((D + 127) // 128) * 128)
    budget = 6 * 1024 * 1024
    # the N==1 fast kernel keeps fewer live f32 arrays per step
    n_bufs = 8 if N == 1 else 10 + 2 * N
    max_chunk = budget // (d_pad * 4 * n_bufs)
    # Hillis-Steele VPU work grows as chunk*log2(chunk): beyond ~128 the
    # extra log stages cost more than the saved per-step overhead (measured
    # sweep: chunk 128 best at stage-1 geometry, flat at stage 0)
    max_chunk = max(64, min(128, (max_chunk // 8) * 8))
    # balance: equal-size chunks rounded to sublanes, minimizing tail padding
    n_chunks = -(-L // max_chunk)
    return ((-(-L // n_chunks) + 7) // 8) * 8


def _scan_kernel_n1(L, chunk, n_chunks, out_dtype,
                    u_f_ref, u_r_ref, dt_f_ref, dt_r_ref,
                    B_f_ref, B_r_ref, C_f_ref, C_r_ref,
                    A_ref, Dsk_ref, bias_ref,
                    yf_ref, yr_ref,
                    carry_f, carry_r):
    """d_state==1 fast path (the shipped VMamba configs, `vmamba.py:2480`).

    Specializations vs the general kernel: no fori over N, no masked lane
    reductions (B/C are (chunk, 1) broadcasts), carries read with *static*
    slices — the identity-padded tail (a=1, b=0) already propagates the last
    valid state to the chunk edge, so h[-1] / h[0] are the correct carries.
    These cut the per-grid-step cost ~10x (measured 10us -> ~1us/step).
    """
    p = pl.program_id(1)          # direction pair: 0 row-major, 1 col-major
    c = pl.program_id(2)          # forward chunk index
    rc = n_chunks - 1 - c         # reverse chunk index (data position)

    @pl.when(c == 0)
    def _():
        carry_f[...] = jnp.zeros_like(carry_f)
        carry_r[...] = jnp.zeros_like(carry_r)

    D = u_f_ref.shape[-1]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def one(u_ref, dt_ref, B_ref, C_ref, k, base, carry, reverse, y_ref):
        u = u_ref[0, 0].astype(jnp.float32)               # (chunk, D)
        dt = dt_ref[0, 0].astype(jnp.float32)
        bias = bias_ref[pl.ds(k, 1), :].astype(jnp.float32)   # (1, D)
        dt = jax.nn.softplus(dt + bias)
        a_row = A_ref[pl.ds(k, 1), :].astype(jnp.float32)     # (1, D)
        dsk = Dsk_ref[pl.ds(k, 1), :].astype(jnp.float32)
        Bn = B_ref[0, 0].astype(jnp.float32)              # (chunk, 1)
        Cn = C_ref[0, 0].astype(jnp.float32)
        valid = (base + row1) < L                          # (chunk, 1)

        a = jnp.where(valid, _fm.exp(dt * a_row), 1.0)
        b = jnp.where(valid, dt * u * Bn, 0.0)
        a, b = _hillis_steele(a, b, chunk, reverse)
        h = b + a * carry[...]                             # (chunk, D)
        if reverse:
            carry[...] = h[0:1, :]
        else:
            carry[...] = h[chunk - 1:chunk, :]
        y_ref[0, 0] = (Cn * h + u * dsk).astype(out_dtype)

    one(u_f_ref, dt_f_ref, B_f_ref, C_f_ref, p, c * chunk,
        carry_f, False, yf_ref)
    one(u_r_ref, dt_r_ref, B_r_ref, C_r_ref, p + 2, rc * chunk,
        carry_r, True, yr_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def fused_cross_scan(u2, dts, Bs, Cs, A, Dsk, bias, interpret=False,
                     chunk=None):
    """Run the fused 4-direction scan.  Shapes per module docstring."""
    B, _, L, D = u2.shape
    N = A.shape[-1]
    chunk = chunk or _pick_chunk(L, D, N)
    n_chunks = pl.cdiv(L, chunk)

    if N == 1:
        # fast path: A as (4, D) rows; outputs in the input dtype (the
        # reference's oflex output-dtype semantics, `csms6s.py:76-78`)
        A = A.astype(jnp.float32).reshape(4, D)
        out_dtype = u2.dtype
        scratch_n = 1
    else:
        # (4, D, N) -> (4, N, D): dynamic n-index must land on a sublane dim
        A = jnp.swapaxes(A.astype(jnp.float32), 1, 2)
        out_dtype = jnp.float32
        scratch_n = N
    Dsk = Dsk.astype(jnp.float32)
    bias = bias.astype(jnp.float32)

    grid = (B, 2, n_chunks)

    def im_fwd(b, p, c):
        return (b, p, c, 0)

    def im_rev(b, p, c):
        return (b, p, n_chunks - 1 - c, 0)

    def im_dt_fwd(b, p, c):
        return (b, p, c, 0)

    def im_dt_rev(b, p, c):
        return (b, p + 2, n_chunks - 1 - c, 0)

    blk_u = pl.BlockSpec((1, 1, chunk, D), im_fwd, memory_space=pltpu.VMEM)
    blk_u_r = pl.BlockSpec((1, 1, chunk, D), im_rev, memory_space=pltpu.VMEM)
    blk_dt_f = pl.BlockSpec((1, 1, chunk, D), im_dt_fwd,
                            memory_space=pltpu.VMEM)
    blk_dt_r = pl.BlockSpec((1, 1, chunk, D), im_dt_rev,
                            memory_space=pltpu.VMEM)
    blk_bn_f = pl.BlockSpec((1, 1, chunk, N), im_dt_fwd,
                            memory_space=pltpu.VMEM)
    blk_bn_r = pl.BlockSpec((1, 1, chunk, N), im_dt_rev,
                            memory_space=pltpu.VMEM)
    blk_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((B, 2, L, D), out_dtype),
        jax.ShapeDtypeStruct((B, 2, L, D), out_dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, chunk, D), im_fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, chunk, D), im_rev, memory_space=pltpu.VMEM),
    ]

    if N == 1:
        kernel = functools.partial(_scan_kernel_n1, L, chunk, n_chunks,
                                   out_dtype)
    else:
        kernel = functools.partial(_scan_kernel, L, N, chunk, n_chunks)
    yf, yr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_u, blk_u_r, blk_dt_f, blk_dt_r,
                  blk_bn_f, blk_bn_r, blk_bn_f, blk_bn_r,
                  blk_full, blk_full, blk_full],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((scratch_n, D), jnp.float32),
            pltpu.VMEM((scratch_n, D), jnp.float32),
        ],
        interpret=interpret,
    )(u2, u2, dts, dts, Bs, Bs, Cs, Cs, A, Dsk, bias)
    return yf, yr


# =====================================================================
# N=1 fused path with in-kernel dt projection
# =====================================================================

def _scan_kernel_n1p(L, R, chunk, n_chunks, out_dtype,
                     u_f_ref, u_r_ref, xd_f_ref, xd_r_ref,
                     dtw_f_ref, dtw_r_ref, A_ref, Dsk_ref, bias_ref,
                     yf_ref, yr_ref, cf_ref, cr_ref,
                     carry_f, carry_r):
    """d_state==1 kernel, both direction pairs packed along lanes.

    Each grid step processes the forward chunk of BOTH pairs (row- and
    column-major, lanes [0:D] / [D:2D]) and the reverse chunk of both — four
    directions per step.  The dt rank->D expansion is fused in (one MXU
    matmul against a (2R, 2D) block-diagonal weight): the (B, 4, L, D) dts
    intermediate (the largest tensor in the reference dataflow,
    `vmamba.py:605-608`) never exists.  Lane packing also removes the
    128-lane padding waste at D=192 (stage 0) and halves the grid.
    """
    c = pl.program_id(1)
    rc = n_chunks - 1 - c
    D2 = u_f_ref.shape[-1]
    D = D2 // 2

    @pl.when(c == 0)
    def _():
        carry_f[...] = jnp.zeros_like(carry_f)
        carry_r[...] = jnp.zeros_like(carry_r)

    row1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def one(u_ref, xd_ref, dtw_ref, j, base, carry, reverse, y_ref,
            carr_ref):
        # checkpoint the incoming state (the CUDA kernel's x_ptr,
        # `fwd_kernel.cuh:183`) for the backward kernel's h-recompute
        # (row 0 of an 8-sublane-padded slot — Mosaic block minimum)
        carr_ref[0, 0, 0:1, :] = carry[...]
        u = u_ref[0].astype(jnp.float32)                   # (chunk, 2D)
        xd = xd_ref[0]                                     # (chunk, 2R+4)
        dt = jnp.dot(xd[:, :2 * R], dtw_ref[...],
                     preferred_element_type=jnp.float32)   # (chunk, 2D)
        bias = bias_ref[pl.ds(j, 1), :].astype(jnp.float32)
        dt = jax.nn.softplus(dt + bias)
        a_row = A_ref[pl.ds(j, 1), :].astype(jnp.float32)  # (1, 2D)
        dsk = Dsk_ref[pl.ds(j, 1), :].astype(jnp.float32)
        bc = xd[:, 2 * R:].astype(jnp.float32)             # (chunk, 4)
        Bn = jnp.concatenate(
            [jnp.broadcast_to(bc[:, 0:1], (chunk, D)),
             jnp.broadcast_to(bc[:, 2:3], (chunk, D))], axis=1)
        Cn = jnp.concatenate(
            [jnp.broadcast_to(bc[:, 1:2], (chunk, D)),
             jnp.broadcast_to(bc[:, 3:4], (chunk, D))], axis=1)
        valid = (base + row1) < L

        a = jnp.where(valid, _fm.exp(dt * a_row), 1.0)
        b = jnp.where(valid, dt * u * Bn, 0.0)
        a, b = _hillis_steele(a, b, chunk, reverse)
        h = b + a * carry[...]
        if reverse:
            carry[...] = h[0:1, :]
        else:
            carry[...] = h[chunk - 1:chunk, :]
        y_ref[0] = (Cn * h + u * dsk).astype(out_dtype)

    one(u_f_ref, xd_f_ref, dtw_f_ref, 0, c * chunk, carry_f, False, yf_ref,
        cf_ref)
    one(u_r_ref, xd_r_ref, dtw_r_ref, 1, rc * chunk, carry_r, True, yr_ref,
        cr_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def fused_cross_scan_proj(u2, xd_f, xd_r, dtw_f, dtw_r, A2, Dsk2, bias2,
                          interpret=False, chunk=None):
    """N=1 fused scan, pair-packed lanes, in-kernel dt projection.

    u2     (B, L, 2D)      [row-major x | col-major x] lanes
    xd_f   (B, L, 2R+4)    [rank_k0 | rank_k1 | B0 C0 B1 C1]
    xd_r   (B, L, 2R+4)    same for the reversed directions k2, k3
    dtw_f  (2R, 2D)        block-diagonal [dt_w0; dt_w1]
    dtw_r  (2R, 2D)        block-diagonal [dt_w2; dt_w3]
    A2/Dsk2/bias2 (2, 2D)  rows: fwd [k0|k1], rev [k2|k3]
    Returns yf, yr (B, L, 2D) in u2.dtype, plus the per-chunk incoming
    state checkpoints cf, cr (B, n_chunks, 2D) f32 consumed by the
    backward kernel (indexed by data-chunk position).
    """
    B, L, D2 = u2.shape
    R = dtw_f.shape[0] // 2
    chunk = chunk or _pick_chunk(L, D2, 1)
    n_chunks = pl.cdiv(L, chunk)
    Rc = xd_f.shape[-1]

    A2 = A2.astype(jnp.float32)
    Dsk2 = Dsk2.astype(jnp.float32)
    bias2 = bias2.astype(jnp.float32)
    dtw_f = dtw_f.astype(u2.dtype)
    dtw_r = dtw_r.astype(u2.dtype)

    grid = (B, n_chunks)

    def im_fwd(b, c):
        return (b, c, 0)

    def im_rev(b, c):
        return (b, n_chunks - 1 - c, 0)

    blk_u = pl.BlockSpec((1, chunk, D2), im_fwd, memory_space=pltpu.VMEM)
    blk_u_r = pl.BlockSpec((1, chunk, D2), im_rev, memory_space=pltpu.VMEM)
    blk_xd_f = pl.BlockSpec((1, chunk, Rc), im_fwd, memory_space=pltpu.VMEM)
    blk_xd_r = pl.BlockSpec((1, chunk, Rc), im_rev, memory_space=pltpu.VMEM)
    blk_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def im_c_fwd(b, c):
        return (b, c, 0, 0)

    def im_c_rev(b, c):
        return (b, n_chunks - 1 - c, 0, 0)

    out_dtype = u2.dtype
    kernel = functools.partial(_scan_kernel_n1p, L, R, chunk, n_chunks,
                               out_dtype)
    yf, yr, cf, cr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_u, blk_u_r, blk_xd_f, blk_xd_r,
                  blk_full, blk_full, blk_full, blk_full, blk_full],
        out_specs=[
            pl.BlockSpec((1, chunk, D2), im_fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, D2), im_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, D2), im_c_fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, D2), im_c_rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D2), out_dtype),
            jax.ShapeDtypeStruct((B, L, D2), out_dtype),
            jax.ShapeDtypeStruct((B, n_chunks, 8, D2), jnp.float32),
            jax.ShapeDtypeStruct((B, n_chunks, 8, D2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, D2), jnp.float32),
            pltpu.VMEM((1, D2), jnp.float32),
        ],
        interpret=interpret,
    )(u2, u2, xd_f, xd_r, dtw_f, dtw_r, A2, Dsk2, bias2)
    return yf, yr, cf, cr


def _scan_kernel_n1p_bwd(L, R, chunk, n_chunks,
                         u_f_ref, u_r_ref, xd_f_ref, xd_r_ref,
                         dy_f_ref, dy_r_ref, cf_ref, cr_ref,
                         dtw_f_ref, dtw_r_ref, A_ref, Dsk_ref, bias_ref,
                         du_f_ref, du_r_ref, dxd_f_ref, dxd_r_ref,
                         dw_ref, dbias_ref, dA_ref, dDsk_ref,
                         lam_f, lam_r, aedge_f, aedge_r,
                         dw_acc, dbias_acc, dA_acc, dDsk_acc):
    """Backward of `_scan_kernel_n1p`: recomputes h from the chunk-state
    checkpoints (`cf/cr`), runs the adjoint recurrence
    λ[t] = C·dy[t] + a[t±1]·λ[t∓1] as a postfix/prefix pair-scan (the TPU
    counterpart of `selective_scan_bwd_kernel.cuh` + `reverse_scan.cuh`),
    and emits du, d(x_dbl) per position plus the weight-gradient
    accumulators (dt_w, bias, A, D) reduced across the whole grid in VMEM.

    Grid (B, n_chunks): step c handles the forward directions' data chunk
    n_chunks-1-c (adjoint flows right-to-left) and the reverse directions'
    data chunk c.
    """
    b_idx = pl.program_id(0)
    c = pl.program_id(1)
    rc = n_chunks - 1 - c
    D2 = u_f_ref.shape[-1]
    D = D2 // 2
    nb = pl.num_programs(0)

    @pl.when(jnp.logical_and(b_idx == 0, c == 0))
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        dbias_acc[...] = jnp.zeros_like(dbias_acc)
        dA_acc[...] = jnp.zeros_like(dA_acc)
        dDsk_acc[...] = jnp.zeros_like(dDsk_acc)

    @pl.when(c == 0)
    def _():
        lam_f[...] = jnp.zeros_like(lam_f)
        lam_r[...] = jnp.zeros_like(lam_r)
        aedge_f[...] = jnp.zeros_like(aedge_f)
        aedge_r[...] = jnp.zeros_like(aedge_r)

    row1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def one(u_ref, xd_ref, dy_ref, c_ref, dtw_ref, j, base, reverse,
            lam, aedge, du_ref, dxd_ref):
        valid = (base + row1) < L
        # mask padded-tail rows at load: out-of-bounds block reads are
        # garbage and NaN*0 = NaN would poison the whole-grid contractions
        u = jnp.where(valid, u_ref[0].astype(jnp.float32), 0.0)
        xd = jnp.where(valid, xd_ref[0].astype(jnp.float32), 0.0)
        dyv = jnp.where(valid, dy_ref[0].astype(jnp.float32), 0.0)

        xdr = xd[:, :2 * R]
        dt_pre = jnp.dot(xdr, dtw_ref[...],
                         preferred_element_type=jnp.float32)
        bias = bias_ref[pl.ds(j, 1), :].astype(jnp.float32)
        dt_pre = dt_pre + bias
        dt = jax.nn.softplus(dt_pre)
        a_row = A_ref[pl.ds(j, 1), :].astype(jnp.float32)
        dsk = Dsk_ref[pl.ds(j, 1), :].astype(jnp.float32)
        bc = xd[:, 2 * R:].astype(jnp.float32)
        Bn = jnp.concatenate(
            [jnp.broadcast_to(bc[:, 0:1], (chunk, D)),
             jnp.broadcast_to(bc[:, 2:3], (chunk, D))], axis=1)
        Cn = jnp.concatenate(
            [jnp.broadcast_to(bc[:, 1:2], (chunk, D)),
             jnp.broadcast_to(bc[:, 3:4], (chunk, D))], axis=1)

        a = jnp.where(valid, _fm.exp(dt * a_row), 1.0)
        bvec = jnp.where(valid, dt * u * Bn, 0.0)

        # recompute h within the chunk from the checkpointed incoming state
        carry_in = c_ref[0, 0, 0:1, :]                     # (1, 2D)
        a_s, b_s = _hillis_steele(a, bvec, chunk, reverse)
        h = b_s + a_s * carry_in
        if reverse:       # h[t] = a[t] h[t+1] + b[t]
            h_prev = jnp.concatenate([h[1:], carry_in], axis=0)
        else:
            h_prev = jnp.concatenate([carry_in, h[:-1]], axis=0)

        # adjoint scan: λ[t] = C·dy[t] + a_sh[t]·λ[t∓1]
        cvec = dyv * Cn
        if reverse:       # λ flows forward in time
            a_sh = jnp.concatenate([aedge[...], a[:-1]], axis=0)
        else:             # λ flows backward in time
            a_sh = jnp.concatenate([a[1:], aedge[...]], axis=0)
        ga, gb = _hillis_steele(a_sh, cvec, chunk, not reverse)
        gh = gb + ga * lam[...]
        if reverse:
            lam[...] = gh[chunk - 1:chunk, :]
            aedge[...] = a[chunk - 1:chunk, :]
        else:
            lam[...] = gh[0:1, :]
            aedge[...] = a[0:1, :]

        # gradients
        du = dyv * dsk + gh * dt * Bn
        dexp = gh * h_prev * a                 # d/d(dt·A) of exp
        ddt = gh * u * Bn + dexp * a_row
        dpre = ddt * jax.nn.sigmoid(dt_pre)
        dpre = jnp.where(valid, dpre, 0.0)

        dxdr = jnp.dot(dpre, dtw_ref[...].T,
                       preferred_element_type=jnp.float32)   # (chunk, 2R)
        ghdtu = gh * dt * u
        dyh = dyv * h
        dB0 = jnp.sum(ghdtu[:, :D], axis=1, keepdims=True)
        dB1 = jnp.sum(ghdtu[:, D:], axis=1, keepdims=True)
        dC0 = jnp.sum(dyh[:, :D], axis=1, keepdims=True)
        dC1 = jnp.sum(dyh[:, D:], axis=1, keepdims=True)

        du_ref[0] = du
        dxd_ref[0] = jnp.concatenate([dxdr, dB0, dC0, dB1, dC1], axis=1)

        # whole-grid weight-gradient accumulation
        dw_acc[pl.ds(j, 1)] += jax.lax.dot_general(
            xdr.astype(jnp.float32), dpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]
        dbias_acc[pl.ds(j, 1), :] += jnp.sum(dpre, axis=0, keepdims=True)
        dA_acc[pl.ds(j, 1), :] += jnp.sum(dexp * dt, axis=0, keepdims=True)
        dDsk_acc[pl.ds(j, 1), :] += jnp.sum(dyv * u, axis=0, keepdims=True)

    one(u_f_ref, xd_f_ref, dy_f_ref, cf_ref, dtw_f_ref, 0, rc * chunk,
        False, lam_f, aedge_f, du_f_ref, dxd_f_ref)
    one(u_r_ref, xd_r_ref, dy_r_ref, cr_ref, dtw_r_ref, 1, c * chunk,
        True, lam_r, aedge_r, du_r_ref, dxd_r_ref)

    # keep the single-block weight-grad outputs current every step (they
    # flush once, at the end of the grid)
    dw_ref[...] = dw_acc[...]
    dbias_ref[...] = dbias_acc[...]
    dA_ref[...] = dA_acc[...]
    dDsk_ref[...] = dDsk_acc[...]


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def fused_cross_scan_proj_bwd(u2, xd_f, xd_r, dy, cf, cr, dtw_f, dtw_r,
                              A2, Dsk2, bias2, interpret=False, chunk=None):
    """Run the backward kernel.  dy (B, L, 2D) is the cotangent of
    yf + yr (both pairs packed).  Returns (du_f, du_r, dxd_f, dxd_r,
    dW (2, 2R, 2D), dbias (2, 2D), dA (2, 2D), dDsk (2, 2D)), all f32."""
    B, L, D2 = u2.shape
    R = dtw_f.shape[0] // 2
    chunk = chunk or _pick_chunk(L, D2, 1)
    n_chunks = pl.cdiv(L, chunk)
    Rc = xd_f.shape[-1]

    A2 = A2.astype(jnp.float32)
    Dsk2 = Dsk2.astype(jnp.float32)
    bias2 = bias2.astype(jnp.float32)
    dtw_f = dtw_f.astype(jnp.float32)
    dtw_r = dtw_r.astype(jnp.float32)

    grid = (B, n_chunks)

    def im_fwdd(b, c):     # forward dirs walk data right-to-left
        return (b, n_chunks - 1 - c, 0)

    def im_revd(b, c):     # reverse dirs walk data left-to-right
        return (b, c, 0)

    def full(*_):
        return (0, 0, 0)

    blk_u_f = pl.BlockSpec((1, chunk, D2), im_fwdd, memory_space=pltpu.VMEM)
    blk_u_r = pl.BlockSpec((1, chunk, D2), im_revd, memory_space=pltpu.VMEM)
    blk_xd_f = pl.BlockSpec((1, chunk, Rc), im_fwdd, memory_space=pltpu.VMEM)
    blk_xd_r = pl.BlockSpec((1, chunk, Rc), im_revd, memory_space=pltpu.VMEM)
    def im_cfwdd(b, c):
        return (b, n_chunks - 1 - c, 0, 0)

    def im_crevd(b, c):
        return (b, c, 0, 0)

    blk_c_f = pl.BlockSpec((1, 1, 8, D2), im_cfwdd, memory_space=pltpu.VMEM)
    blk_c_r = pl.BlockSpec((1, 1, 8, D2), im_crevd, memory_space=pltpu.VMEM)
    blk_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_scan_kernel_n1p_bwd, L, R, chunk, n_chunks)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_u_f, blk_u_r, blk_xd_f, blk_xd_r,
                  blk_u_f, blk_u_r, blk_c_f, blk_c_r,
                  blk_full, blk_full, blk_full, blk_full, blk_full],
        out_specs=[
            pl.BlockSpec((1, chunk, D2), im_fwdd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, D2), im_revd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, Rc), im_fwdd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, Rc), im_revd, memory_space=pltpu.VMEM),
            blk_full, blk_full, blk_full, blk_full,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D2), jnp.float32),
            jax.ShapeDtypeStruct((B, L, D2), jnp.float32),
            jax.ShapeDtypeStruct((B, L, Rc), jnp.float32),
            jax.ShapeDtypeStruct((B, L, Rc), jnp.float32),
            jax.ShapeDtypeStruct((2, 2 * R, D2), jnp.float32),
            jax.ShapeDtypeStruct((2, D2), jnp.float32),
            jax.ShapeDtypeStruct((2, D2), jnp.float32),
            jax.ShapeDtypeStruct((2, D2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, D2), jnp.float32),
            pltpu.VMEM((1, D2), jnp.float32),
            pltpu.VMEM((1, D2), jnp.float32),
            pltpu.VMEM((1, D2), jnp.float32),
            pltpu.VMEM((2, 2 * R, D2), jnp.float32),
            pltpu.VMEM((2, D2), jnp.float32),
            pltpu.VMEM((2, D2), jnp.float32),
            pltpu.VMEM((2, D2), jnp.float32),
        ],
        interpret=interpret,
    )(u2, u2, xd_f, xd_r, dy, dy, cf, cr,
      dtw_f, dtw_r, A2, Dsk2, bias2)
    return outs


def _core_fused_proj_impl(x, x_proj_weight, dt_projs_weight, dt_projs_bias,
                          A_logs, Ds, interpret=False, chunk=None):
    """Full SS2D cross2d core for d_state==1: projections in kernel layout
    (no (B, H, W, 4, ·) intermediates), fused kernel, f32 merge.
    Semantics identical to `ss2d_core(..., backend='xla')` with N=1."""
    y, _ = _core_fused_proj_parts(x, x_proj_weight, dt_projs_weight,
                                  dt_projs_bias, A_logs, Ds,
                                  interpret=interpret, chunk=chunk)
    return y


def _pack_n1_inputs(x, x_proj_weight, dt_projs_weight, dt_projs_bias,
                    A_logs, Ds):
    B, H, W, D = x.shape
    L = H * W
    R = dt_projs_weight.shape[-1]

    xr = x.reshape(B, L, D)
    xt = jnp.swapaxes(x, 1, 2).reshape(B, L, D)
    u2 = jnp.concatenate([xr, xt], axis=-1)              # (B, L, 2D)

    Wc = x_proj_weight.astype(x.dtype)                   # (4, R+2, D)
    xdbl_row = jnp.einsum("bld,kcd->bklc", xr, Wc[jnp.array([0, 2])])
    xdbl_col = jnp.einsum("bld,kcd->bklc", xt, Wc[jnp.array([1, 3])])

    def pack(a, b):   # -> [rank_a | rank_b | B_a C_a | B_b C_b]
        return jnp.concatenate([a[..., :R], b[..., :R],
                                a[..., R:], b[..., R:]], axis=-1)

    xd_f = pack(xdbl_row[:, 0], xdbl_col[:, 0])          # k0, k1
    xd_r = pack(xdbl_row[:, 1], xdbl_col[:, 1])          # k2, k3

    A = -jnp.exp(A_logs.astype(jnp.float32)).reshape(4, D)
    Dsk = Ds.astype(jnp.float32).reshape(4, D)
    bias = dt_projs_bias.astype(jnp.float32).reshape(4, D)

    def pack2(t):     # (4, D) -> (2, 2D): rows [k0|k1], [k2|k3]
        return jnp.stack([jnp.concatenate([t[0], t[1]]),
                          jnp.concatenate([t[2], t[3]])])

    dtw = jnp.swapaxes(dt_projs_weight, 1, 2)            # (4, R, D)
    zero = jnp.zeros((R, D), dtw.dtype)

    def blockdiag(w_a, w_b):
        return jnp.concatenate(
            [jnp.concatenate([w_a, zero], axis=1),
             jnp.concatenate([zero, w_b], axis=1)], axis=0)   # (2R, 2D)

    return (u2, xd_f, xd_r, blockdiag(dtw[0], dtw[1]),
            blockdiag(dtw[2], dtw[3]), pack2(A), pack2(Dsk), pack2(bias))


def _core_fused_proj_parts(x, x_proj_weight, dt_projs_weight, dt_projs_bias,
                           A_logs, Ds, interpret=False, chunk=None):
    B, H, W, D = x.shape
    L = H * W
    packed = _pack_n1_inputs(x, x_proj_weight, dt_projs_weight,
                             dt_projs_bias, A_logs, Ds)
    u2, xd_f, xd_r = packed[:3]
    yf, yr, cf, cr = fused_cross_scan_proj(*packed, interpret=interpret,
                                           chunk=chunk)
    y_row = (yf[..., :D].astype(jnp.float32)
             + yr[..., :D].astype(jnp.float32))
    y_col = (yf[..., D:].astype(jnp.float32)
             + yr[..., D:].astype(jnp.float32)).reshape(B, W, H, D)
    y_col = jnp.swapaxes(y_col, 1, 2).reshape(B, L, D)
    y = (y_row + y_col).reshape(B, H, W, D)
    return y, (xd_f, xd_r, cf, cr)


def _core_fused_proj_bwd_impl(x, x_proj_weight, dt_projs_weight,
                              dt_projs_bias, A_logs, Ds,
                              xd_f, xd_r, cf, cr, g,
                              interpret=False, chunk=None):
    """XLA glue around the backward kernel: builds the packed cotangent,
    runs the kernel, unpacks/chains the outer einsum and reparameterization
    gradients.  Returns grads for the six primal arguments."""
    B, H, W, D = x.shape
    L = H * W
    R = dt_projs_weight.shape[-1]
    (u2, _, _, dtw_f, dtw_r, A2, Dsk2, bias2) = _pack_n1_inputs(
        x, x_proj_weight, dt_projs_weight, dt_projs_bias, A_logs, Ds)

    gf = g.astype(jnp.float32).reshape(B, L, D)
    gt = jnp.swapaxes(g.astype(jnp.float32), 1, 2).reshape(B, L, D)
    dy = jnp.concatenate([gf, gt], axis=-1)              # (B, L, 2D)

    (du_f, du_r, dxd_f, dxd_r, dW2, dbias2, dA2, dDsk2) = \
        fused_cross_scan_proj_bwd(u2, xd_f, xd_r, dy, cf, cr,
                                  dtw_f, dtw_r, A2, Dsk2, bias2,
                                  interpret=interpret, chunk=chunk)

    du = du_f + du_r                                     # (B, L, 2D)
    dxr = du[..., :D]                                    # grads w.r.t. xr
    dxt_ = du[..., D:]                                   # grads w.r.t. xt

    # unpack per-direction x_dbl cotangents [rank | B C]
    def unpack(dxd, half):
        s = half * R
        rank = dxd[..., s:s + R]
        bc = dxd[..., 2 * R + 2 * half:2 * R + 2 * half + 2]
        return jnp.concatenate([rank, bc], axis=-1)      # (B, L, R+2)

    d_k = [unpack(dxd_f, 0), unpack(dxd_r, 0),           # k0, k2 (row)
           unpack(dxd_f, 1), unpack(dxd_r, 1)]           # k1, k3 (col)

    xr = x.astype(jnp.float32).reshape(B, L, D)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2).reshape(B, L, D)
    Wf = x_proj_weight.astype(jnp.float32)

    # chain through xdbl = src @ W^T : dsrc += dxd @ W ; dW = dxd^T @ src
    dWc = []
    for kk, (src_idx, k_orig) in enumerate([(0, 0), (0, 2), (1, 1), (1, 3)]):
        src = xr if src_idx == 0 else xt
        dxd_k = d_k[kk]
        if src_idx == 0:
            dxr = dxr + jnp.einsum("blc,cd->bld", dxd_k, Wf[k_orig])
        else:
            dxt_ = dxt_ + jnp.einsum("blc,cd->bld", dxd_k, Wf[k_orig])
        dWc.append(jnp.einsum("blc,bld->cd", dxd_k, src))
    dW_full = jnp.stack([dWc[0], dWc[2], dWc[1], dWc[3]])    # k order 0..3

    dx = (dxr + jnp.swapaxes(dxt_.reshape(B, W, H, D), 1, 2)
          .reshape(B, L, D)).reshape(B, H, W, D).astype(x.dtype)

    # dt_w grads: diagonal blocks of the packed (2R, 2D) accumulators,
    # transposed back to the (4, D, R) parameter layout
    dtw_g = jnp.stack([
        dW2[0, :R, :D], dW2[1, :R, :D],
        dW2[0, R:, D:], dW2[1, R:, D:],
    ])                                                    # [k0, k2, k1, k3]
    dtw_g = dtw_g[jnp.array([0, 2, 1, 3])]                # -> k order
    d_dtw = jnp.swapaxes(dtw_g, 1, 2)                     # (4, D, R)

    def unpack2(t2):  # (2, 2D) -> (4, D) rows k0..k3
        return jnp.stack([t2[0, :D], t2[0, D:], t2[1, :D], t2[1, D:]])

    d_bias = unpack2(dbias2)                              # (4, D)
    dA4 = unpack2(dA2)
    dDsk4 = unpack2(dDsk2)

    # A = -exp(A_logs)  =>  dA_logs = dA * A
    A4 = -jnp.exp(A_logs.astype(jnp.float32)).reshape(4, D)
    dA_logs = (dA4 * A4).reshape(A_logs.shape)
    dDs = dDsk4.reshape(Ds.shape)

    return (dx, dW_full.astype(x_proj_weight.dtype),
            d_dtw.astype(dt_projs_weight.dtype),
            d_bias.reshape(dt_projs_bias.shape).astype(dt_projs_bias.dtype),
            dA_logs.astype(A_logs.dtype), dDs.astype(Ds.dtype))


@jax.custom_vjp
def ss2d_core_pallas_n1(x, x_proj_weight, dt_projs_weight, dt_projs_bias,
                        A_logs, Ds):
    """Fused-projection d_state==1 SS2D core with a dedicated Pallas
    backward kernel (reverse/forward adjoint pair-scans from chunk-state
    checkpoints — the TPU counterpart of `selective_scan_bwd_kernel.cuh`)."""
    return _core_fused_proj_impl(x, x_proj_weight, dt_projs_weight,
                                 dt_projs_bias, A_logs, Ds)


def _n1_fwd(x, xw, dw, bias, A_logs, Ds):
    y, (xd_f, xd_r, cf, cr) = _core_fused_proj_parts(x, xw, dw, bias,
                                                     A_logs, Ds)
    return y, (x, xw, dw, bias, A_logs, Ds, xd_f, xd_r, cf, cr)


def _n1_bwd(res, g):
    x, xw, dw, bias, A_logs, Ds, xd_f, xd_r, cf, cr = res
    return _core_fused_proj_bwd_impl(x, xw, dw, bias, A_logs, Ds,
                                     xd_f, xd_r, cf, cr, g)


ss2d_core_pallas_n1.defvjp(_n1_fwd, _n1_bwd)


# =====================================================================
# grouped selective scan: arbitrary (K, N), one direction
# =====================================================================

def _grouped_scan_kernel(L, chunk, n_chunks, N, out_dtype, reverse,
                         u_ref, dt_ref, B_ref, C_ref,
                         A_ref, Dsk_ref, bias_ref,
                         y_ref, carr_ref, carry, dt_s, acc):
    """One direction of the selective scan for K channel groups and N state
    dims.  Grid (B, K, n_chunks, N) — N innermost so the per-chunk output
    accumulates across state dims in the VMEM scratch `acc`; the carry
    scratch holds one (1, C) state row per n.  dt (softplus+bias) is
    computed once per chunk (at n==0) into `dt_s`.
    """
    k = pl.program_id(1)
    c = pl.program_id(2)
    n = pl.program_id(3)
    base = (n_chunks - 1 - c) * chunk if reverse else c * chunk

    row1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    valid = (base + row1) < L

    @pl.when(n == 0)
    def _():
        dt = dt_ref[0, 0].astype(jnp.float32)
        b_k = bias_ref[pl.ds(k, 1), :].astype(jnp.float32)
        dt_s[...] = jax.nn.softplus(dt + b_k)
        dsk = Dsk_ref[pl.ds(k, 1), :].astype(jnp.float32)
        acc[...] = u_ref[0, 0].astype(jnp.float32) * dsk

    @pl.when(c == 0)
    def _():
        carry[pl.ds(n, 1), :] = jnp.zeros_like(carry[pl.ds(n, 1), :])

    # checkpoint the incoming state for the backward kernel (x_ptr analogue)
    carr_ref[0, 0, 0, pl.ds(n, 1), :] = carry[pl.ds(n, 1), :]

    u = u_ref[0, 0].astype(jnp.float32)                  # (chunk, C)
    dt = dt_s[...]
    a_n = A_ref[pl.ds(k, 1), pl.ds(n, 1), :].astype(
        jnp.float32).reshape(1, -1)                      # (1, C)

    Bfull = B_ref[0, 0].astype(jnp.float32)              # (chunk, N)
    Cfull = C_ref[0, 0].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, Bfull.shape, 1)
    Bn = jnp.sum(jnp.where(lane == n, Bfull, 0.0), axis=1, keepdims=True)
    Cn = jnp.sum(jnp.where(lane == n, Cfull, 0.0), axis=1, keepdims=True)

    a = jnp.where(valid, _fm.exp(dt * a_n), 1.0)
    b = jnp.where(valid, dt * u * Bn, 0.0)
    a, b = _hillis_steele(a, b, chunk, reverse)
    h = b + a * carry[pl.ds(n, 1), :]
    if reverse:
        carry[pl.ds(n, 1), :] = h[0:1, :]
    else:
        carry[pl.ds(n, 1), :] = h[chunk - 1:chunk, :]
    acc[...] = acc[...] + Cn * h

    @pl.when(n == N - 1)
    def _():
        y_ref[0, 0] = acc[...].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("delta_softplus", "reverse",
                                    "interpret", "chunk"))
def grouped_scan_pallas_fwd(u, delta, A, Bmat, Cmat, Dvec, delta_bias,
                            delta_softplus=True, reverse=False,
                            interpret=False, chunk=None):
    """Pallas selective scan, `ops.selective_scan` semantics/layout:
    u/delta (B, L, K*C); A (K*C, N); Bmat/Cmat (B, L, K, N); Dvec (K*C,);
    delta_bias (K*C,).  Returns y (B, L, K*C) in u.dtype.

    This is the general-(K, N) TPU kernel used by ShallowFuse (K=2 swap
    scan, `fusion_vmamba.py:831-833`) and the per-direction N>1 cross2d
    composition (Cross_SS2Dv5, d_state=16)."""
    assert delta_softplus, "kernel fuses softplus (reference always sets it)"
    Bsz, L, KC = u.shape
    K = Bmat.shape[2]
    N = A.shape[-1]
    C = KC // K

    # group-major channel layout -> (B, K, L, C) blocks
    u4 = jnp.swapaxes(u.reshape(Bsz, L, K, C), 1, 2)
    dt4 = jnp.swapaxes(delta.reshape(Bsz, L, K, C), 1, 2)
    B4 = jnp.swapaxes(Bmat, 1, 2)                    # (B, K, L, N)
    C4 = jnp.swapaxes(Cmat, 1, 2)
    A_k = jnp.swapaxes(A.astype(jnp.float32).reshape(K, C, N), 1, 2)
    Dsk = (Dvec if Dvec is not None else jnp.zeros((KC,))) \
        .astype(jnp.float32).reshape(K, C)
    bias = (delta_bias if delta_bias is not None else jnp.zeros((KC,))) \
        .astype(jnp.float32).reshape(K, C)

    if chunk is None:
        # this kernel keeps ~10 live f32 (chunk, C) arrays regardless of N
        c_pad = max(128, ((C + 127) // 128) * 128)
        chunk = (6 * 1024 * 1024) // (c_pad * 4 * 10)
        chunk = max(128, 1 << int(math.floor(math.log2(max(chunk, 128)))))
        chunk = min(chunk, 256)
        if L <= chunk:
            chunk = ((L + 7) // 8) * 8
    n_chunks = pl.cdiv(L, chunk)
    grid = (Bsz, K, n_chunks, N)

    def im_data(b, k, c, n):
        cc = n_chunks - 1 - c if reverse else c
        return (b, k, cc, 0)

    blk_u = pl.BlockSpec((1, 1, chunk, C), im_data, memory_space=pltpu.VMEM)
    blk_bn = pl.BlockSpec((1, 1, chunk, N), im_data, memory_space=pltpu.VMEM)
    blk_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    Np = max(8, ((N + 7) // 8) * 8)

    def im_carr(b, k, c, n):
        cc = n_chunks - 1 - c if reverse else c
        return (b, k, cc, 0, 0)

    kernel = functools.partial(_grouped_scan_kernel, L, chunk, n_chunks, N,
                               u.dtype, reverse)
    y4, carr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_u, blk_u, blk_bn, blk_bn,
                  blk_full, blk_full, blk_full],
        out_specs=[
            pl.BlockSpec((1, 1, chunk, C), im_data,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Np, C), im_carr,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, K, L, C), u.dtype),
            jax.ShapeDtypeStruct((Bsz, K, n_chunks, Np, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, C), jnp.float32),
            pltpu.VMEM((chunk, C), jnp.float32),
            pltpu.VMEM((chunk, C), jnp.float32),
        ],
        interpret=interpret,
    )(u4, dt4, B4, C4, A_k, Dsk, bias)
    return jnp.swapaxes(y4, 1, 2).reshape(Bsz, L, KC), carr


def _grouped_scan_kernel_bwd(L, chunk, n_chunks, K, N, reverse,
                             u_ref, dt_ref, B_ref, C_ref, dy_ref, carr_ref,
                             A_ref, Dsk_ref, bias_ref,
                             du_ref, ddt_ref, dB_ref, dC_ref,
                             dA_ref, dD_ref, dbias_ref,
                             lam, aedge, du_acc, ddt_acc, dB_acc, dC_acc,
                             dA_acc, dD_acc, dbias_acc, dt_s, sig_s):
    """Backward of `_grouped_scan_kernel`: same grid (B, K, nc, N) with the
    chunk axis walked in the adjoint direction; per-(k, n) λ pair-scans from
    the forward's state checkpoints; du/d(delta)/dB/dC accumulate across n
    in VMEM; dA/dD/dbias accumulate across the whole grid."""
    b_idx = pl.program_id(0)
    k = pl.program_id(1)
    c = pl.program_id(2)
    n = pl.program_id(3)
    base = (c if reverse else n_chunks - 1 - c) * chunk

    row1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    valid = (base + row1) < L

    @pl.when(jnp.logical_and(jnp.logical_and(b_idx == 0, c == 0),
                             jnp.logical_and(k == 0, n == 0)))
    def _():
        dA_acc[...] = jnp.zeros_like(dA_acc)
        dD_acc[...] = jnp.zeros_like(dD_acc)
        dbias_acc[...] = jnp.zeros_like(dbias_acc)

    @pl.when(c == 0)
    def _():
        lam[pl.ds(n, 1), :] = jnp.zeros_like(lam[pl.ds(n, 1), :])
        aedge[pl.ds(n, 1), :] = jnp.zeros_like(aedge[pl.ds(n, 1), :])

    u = jnp.where(valid, u_ref[0, 0].astype(jnp.float32), 0.0)
    dyv = jnp.where(valid, dy_ref[0, 0].astype(jnp.float32), 0.0)
    Bfull = jnp.where(valid, B_ref[0, 0].astype(jnp.float32), 0.0)
    Cfull = jnp.where(valid, C_ref[0, 0].astype(jnp.float32), 0.0)

    @pl.when(n == 0)
    def _():
        dt_raw = jnp.where(valid, dt_ref[0, 0].astype(jnp.float32), 0.0)
        b_k = bias_ref[pl.ds(k, 1), :].astype(jnp.float32)
        pre = dt_raw + b_k
        dt_s[...] = jax.nn.softplus(pre)
        sig_s[...] = jax.nn.sigmoid(pre)
        dsk = Dsk_ref[pl.ds(k, 1), :].astype(jnp.float32)
        du_acc[...] = dyv * dsk
        ddt_acc[...] = jnp.zeros_like(ddt_acc)
        dB_acc[...] = jnp.zeros_like(dB_acc)
        dC_acc[...] = jnp.zeros_like(dC_acc)
        dD_acc[pl.ds(k, 1), :] += jnp.sum(dyv * u, axis=0, keepdims=True)

    dt = dt_s[...]
    a_n = A_ref[pl.ds(k, 1), pl.ds(n, 1), :].astype(
        jnp.float32).reshape(1, -1)                      # (1, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, Bfull.shape, 1)
    Bn = jnp.sum(jnp.where(lane == n, Bfull, 0.0), axis=1, keepdims=True)
    Cn = jnp.sum(jnp.where(lane == n, Cfull, 0.0), axis=1, keepdims=True)

    a = jnp.where(valid, _fm.exp(dt * a_n), 1.0)
    bvec = jnp.where(valid, dt * u * Bn, 0.0)
    carry_in = carr_ref[0, 0, 0, pl.ds(n, 1), :]          # (1, C)
    a_s, b_s = _hillis_steele(a, bvec, chunk, reverse)
    h = b_s + a_s * carry_in
    if reverse:
        h_prev = jnp.concatenate([h[1:], carry_in], axis=0)
    else:
        h_prev = jnp.concatenate([carry_in, h[:-1]], axis=0)

    cvec = dyv * Cn
    an_edge = aedge[pl.ds(n, 1), :]
    if reverse:
        a_sh = jnp.concatenate([an_edge, a[:-1]], axis=0)
    else:
        a_sh = jnp.concatenate([a[1:], an_edge], axis=0)
    ga, gb = _hillis_steele(a_sh, cvec, chunk, not reverse)
    gh = gb + ga * lam[pl.ds(n, 1), :]
    if reverse:
        lam[pl.ds(n, 1), :] = gh[chunk - 1:chunk, :]
        aedge[pl.ds(n, 1), :] = a[chunk - 1:chunk, :]
    else:
        lam[pl.ds(n, 1), :] = gh[0:1, :]
        aedge[pl.ds(n, 1), :] = a[0:1, :]

    dexp = gh * h_prev * a
    du_acc[...] += gh * dt * Bn
    ddt_acc[...] += gh * u * Bn + dexp * a_n
    ghdtu_sum = jnp.sum(gh * dt * u, axis=1, keepdims=True)  # (chunk, 1)
    dyh_sum = jnp.sum(dyv * h, axis=1, keepdims=True)
    laneN = jax.lax.broadcasted_iota(jnp.int32, dB_acc.shape, 1)
    dB_acc[...] += jnp.where(laneN == n, ghdtu_sum, 0.0)
    dC_acc[...] += jnp.where(laneN == n, dyh_sum, 0.0)
    dA_acc[pl.ds(k * N + n, 1), :] += jnp.sum(dexp * dt, axis=0,
                                              keepdims=True)

    @pl.when(n == N - 1)
    def _():
        d_delta = ddt_acc[...] * sig_s[...]
        du_ref[0, 0] = du_acc[...]
        ddt_ref[0, 0] = d_delta
        dB_ref[0, 0] = dB_acc[...]
        dC_ref[0, 0] = dC_acc[...]
        dbias_acc[pl.ds(k, 1), :] += jnp.sum(d_delta, axis=0, keepdims=True)

    dA_ref[...] = dA_acc[...]
    dD_ref[...] = dD_acc[...]
    dbias_ref[...] = dbias_acc[...]


@functools.partial(jax.jit, static_argnames=("reverse", "interpret",
                                             "chunk"))
def grouped_scan_pallas_bwd(u, delta, A, Bmat, Cmat, Dvec, delta_bias,
                            carr, dy, reverse=False, interpret=False,
                            chunk=None):
    """Run the grouped backward kernel.  Layouts as the forward; dy is the
    cotangent (B, L, K*C).  Returns (du, d_delta, dA, dB, dC, dD, dbias)."""
    Bsz, L, KC = u.shape
    K = Bmat.shape[2]
    N = A.shape[-1]
    C = KC // K

    u4 = jnp.swapaxes(u.reshape(Bsz, L, K, C), 1, 2)
    dt4 = jnp.swapaxes(delta.reshape(Bsz, L, K, C), 1, 2)
    dy4 = jnp.swapaxes(dy.astype(jnp.float32).reshape(Bsz, L, K, C), 1, 2)
    B4 = jnp.swapaxes(Bmat, 1, 2)
    C4 = jnp.swapaxes(Cmat, 1, 2)
    A_k = jnp.swapaxes(A.astype(jnp.float32).reshape(K, C, N), 1, 2)
    Dsk = (Dvec if Dvec is not None else jnp.zeros((KC,))) \
        .astype(jnp.float32).reshape(K, C)
    bias = (delta_bias if delta_bias is not None else jnp.zeros((KC,))) \
        .astype(jnp.float32).reshape(K, C)

    if chunk is None:
        c_pad = max(128, ((C + 127) // 128) * 128)
        chunk = (6 * 1024 * 1024) // (c_pad * 4 * 10)
        chunk = max(128, 1 << int(math.floor(math.log2(max(chunk, 128)))))
        chunk = min(chunk, 256)
        if L <= chunk:
            chunk = ((L + 7) // 8) * 8
    n_chunks = pl.cdiv(L, chunk)
    Np = max(8, ((N + 7) // 8) * 8)
    grid = (Bsz, K, n_chunks, N)

    def im_adj(b, k, c, n):    # adjoint walks opposite to the forward
        cc = c if reverse else n_chunks - 1 - c
        return (b, k, cc, 0)

    def im_carr(b, k, c, n):
        cc = c if reverse else n_chunks - 1 - c
        return (b, k, cc, 0, 0)

    blk_u = pl.BlockSpec((1, 1, chunk, C), im_adj, memory_space=pltpu.VMEM)
    blk_bn = pl.BlockSpec((1, 1, chunk, N), im_adj, memory_space=pltpu.VMEM)
    blk_carr = pl.BlockSpec((1, 1, 1, Np, C), im_carr,
                            memory_space=pltpu.VMEM)
    blk_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_grouped_scan_kernel_bwd, L, chunk, n_chunks,
                               K, N, reverse)
    (du4, ddt4, dB4, dC4, dA_kn, dD_k, dbias_k) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_u, blk_u, blk_bn, blk_bn, blk_u, blk_carr,
                  blk_full, blk_full, blk_full],
        out_specs=[
            blk_u, blk_u, blk_bn, blk_bn,
            blk_full, blk_full, blk_full,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, K, L, C), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, K, L, C), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, K, L, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, K, L, N), jnp.float32),
            jax.ShapeDtypeStruct((K * N, C), jnp.float32),
            jax.ShapeDtypeStruct((K, C), jnp.float32),
            jax.ShapeDtypeStruct((K, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, C), jnp.float32),      # lam
            pltpu.VMEM((N, C), jnp.float32),      # aedge
            pltpu.VMEM((chunk, C), jnp.float32),  # du_acc
            pltpu.VMEM((chunk, C), jnp.float32),  # ddt_acc
            pltpu.VMEM((chunk, N), jnp.float32),  # dB_acc
            pltpu.VMEM((chunk, N), jnp.float32),  # dC_acc
            pltpu.VMEM((K * N, C), jnp.float32),  # dA_acc
            pltpu.VMEM((K, C), jnp.float32),      # dD_acc
            pltpu.VMEM((K, C), jnp.float32),      # dbias_acc
            pltpu.VMEM((chunk, C), jnp.float32),  # dt_s
            pltpu.VMEM((chunk, C), jnp.float32),  # sig_s
        ],
        interpret=interpret,
    )(u4, dt4, B4, C4, dy4, carr, A_k, Dsk, bias)

    du = jnp.swapaxes(du4, 1, 2).reshape(Bsz, L, KC).astype(u.dtype)
    d_delta = jnp.swapaxes(ddt4, 1, 2).reshape(Bsz, L, KC) \
        .astype(delta.dtype)
    dB = jnp.swapaxes(dB4, 1, 2).astype(Bmat.dtype)
    dC = jnp.swapaxes(dC4, 1, 2).astype(Cmat.dtype)
    dA = jnp.swapaxes(dA_kn.reshape(K, N, C), 1, 2).reshape(KC, N) \
        .astype(A.dtype)
    dD = dD_k.reshape(KC)
    dbias = dbias_k.reshape(KC)
    return du, d_delta, dA, dB, dC, dD, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def selective_scan_grouped_pallas(u, delta, A, Bmat, Cmat, Dvec, delta_bias,
                                  delta_softplus=True, reverse=False):
    """`ops.selective_scan`-compatible Pallas path (fp32 state, output in
    u.dtype); backward runs the dedicated Pallas adjoint kernel."""
    return grouped_scan_pallas_fwd(u, delta, A, Bmat, Cmat, Dvec,
                                   delta_bias,
                                   delta_softplus=delta_softplus,
                                   reverse=reverse)[0]


def _grouped_fwd(u, delta, A, Bmat, Cmat, Dvec, delta_bias,
                 delta_softplus, reverse):
    y, carr = grouped_scan_pallas_fwd(u, delta, A, Bmat, Cmat, Dvec,
                                      delta_bias,
                                      delta_softplus=delta_softplus,
                                      reverse=reverse)
    return y, (u, delta, A, Bmat, Cmat, Dvec, delta_bias, carr)


def _grouped_bwd(delta_softplus, reverse, res, g):
    assert delta_softplus
    u, delta, A, Bmat, Cmat, Dvec, delta_bias, carr = res
    du, d_delta, dA, dB, dC, dD, dbias = grouped_scan_pallas_bwd(
        u, delta, A, Bmat, Cmat, Dvec, delta_bias, carr, g,
        reverse=reverse)
    return (du, d_delta, dA, dB, dC,
            None if Dvec is None else dD.astype(Dvec.dtype),
            None if delta_bias is None else dbias.astype(delta_bias.dtype))


selective_scan_grouped_pallas.defvjp(_grouped_fwd, _grouped_bwd)


def selective_scan_auto(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                        delta_softplus=True, reverse=False, unroll=1):
    """Drop-in for `ops.selective_scan`: Pallas kernel on TPU, XLA
    associative scan elsewhere."""
    from xfmamba_tpu.ops.selective_scan import selective_scan
    if jax.default_backend() == "cpu":
        return selective_scan(u, delta, A, Bmat, Cmat, D, delta_bias,
                              delta_softplus=delta_softplus, reverse=reverse)
    y = selective_scan_grouped_pallas(u, delta, A, Bmat, Cmat, D,
                                      delta_bias, delta_softplus, reverse)
    return y.astype(jnp.float32)


def _core_pallas_fwd_impl(x, dts, Bs, Cs, A, Dmat, bias, interpret=False,
                          chunk=None):
    """cross2d SS2D core via the fused kernel.

    x (B,H,W,D); dts (B,H,W,4,D); Bs/Cs (B,H,W,4,N); A (4,D,N) (negative);
    Dmat/bias (4,D).  Returns y (B, H, W, D) f32 — identical semantics to
    `ss2d_core_from_projs(..., scan_mode="cross2d")`.
    """
    B, H, W, D = x.shape
    N = A.shape[-1]
    L = H * W
    xt = jnp.swapaxes(x, 1, 2)
    u2 = jnp.stack([x.reshape(B, L, D), xt.reshape(B, L, D)], axis=1)

    def karr(t, k, transposed):
        v = t[..., k, :]
        if transposed:
            v = jnp.swapaxes(v, 1, 2)
        return v.reshape(B, L, t.shape[-1])

    dts4 = jnp.stack([karr(dts, 0, False), karr(dts, 1, True),
                      karr(dts, 2, False), karr(dts, 3, True)], axis=1)
    Bs4 = jnp.stack([karr(Bs, 0, False), karr(Bs, 1, True),
                     karr(Bs, 2, False), karr(Bs, 3, True)], axis=1)
    Cs4 = jnp.stack([karr(Cs, 0, False), karr(Cs, 1, True),
                     karr(Cs, 2, False), karr(Cs, 3, True)], axis=1)

    yf, yr = fused_cross_scan(u2, dts4, Bs4, Cs4, A, Dmat, bias,
                              interpret=interpret, chunk=chunk)
    # merge in f32 regardless of the kernel's output dtype (bf16 on the
    # d_state==1 fast path) — summation order matches cross_merge
    y_row = yf[:, 0].astype(jnp.float32) + yr[:, 0].astype(jnp.float32)
    y_col = (yf[:, 1].astype(jnp.float32) + yr[:, 1].astype(jnp.float32)
             ).reshape(B, W, H, D)
    y_col = jnp.swapaxes(y_col, 1, 2).reshape(B, L, D)
    return (y_row + y_col).reshape(B, H, W, D)


@jax.custom_vjp
def ss2d_core_pallas(x, dts, Bs, Cs, A, Dmat, bias):
    """Pallas cross2d core with an XLA-autodiff backward (the forward runs
    the fused kernel; the VJP rematerializes through the associative-scan
    formulation — a dedicated Pallas backward kernel is the next step)."""
    return _core_pallas_fwd_impl(x, dts, Bs, Cs, A, Dmat, bias)


def _pallas_fwd(x, dts, Bs, Cs, A, Dmat, bias):
    y = _core_pallas_fwd_impl(x, dts, Bs, Cs, A, Dmat, bias)
    return y, (x, dts, Bs, Cs, A, Dmat, bias)


def _pallas_bwd(res, g):
    from xfmamba_tpu.models.ss2d import ss2d_core_from_projs
    x, dts, Bs, Cs, A, Dmat, bias = res
    _, vjp = jax.vjp(
        lambda *args: ss2d_core_from_projs(*args, scan_mode="cross2d"),
        x, dts, Bs, Cs, A, Dmat, bias)
    return vjp(g.astype(jnp.float32))


ss2d_core_pallas.defvjp(_pallas_fwd, _pallas_bwd)
