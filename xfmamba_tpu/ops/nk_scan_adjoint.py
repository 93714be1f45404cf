"""Whole-map adjoint kernel for the multi-state (K, N) "nk" scan — the
training backward of the fusion ops (CrossSS2Dv5 / ShallowFuse).

The inference path already runs the whole-map serial kernel
(`vss_block_pallas_v2._nk_scan_kernel_v2`: one grid step per G-image
group, every (k, n) state a latency-amortized serial chain).  Training
previously fell back to the per-direction *grouped* (K, N) kernels
(`selective_scan_pallas._grouped_scan_kernel{,_bwd}`: grid B*K steps,
per-step (L, N) layout) — measured ~2x the cost of an nk-style whole-map
adjoint at the CrossSS2Dv5 geometry (NOTES r4 train decomposition).

This module is that adjoint: one Pallas kernel recomputes the forward
chains per (k, n), runs the adjoint recurrence

    g[t] = C[t]*gy[t] + a[t+1]*g[t+1]

as the mirrored slot of the same (fwd, rev) pair chains the forward
uses, and produces every gradient: du, d(dts), dBs, dCs in batch-blocked
outputs plus dA / dD / dbias accumulated across grid steps.  Exposed as
`nk_scan_train` (custom_vjp over `nk_scan_call_v2`) and the
`core_dispatch`-shaped `nk_scan_train_from_projs`.

Reference being replaced: the CUDA backward
(`csrc/selective_scan/selective_scan_bwd_kernel.cuh:307`) runs one
(batch, dim) block per direction with chunked reverse scans; here the
whole (Lg, D) map of all K*N states shares one VMEM-resident grid step.

Gradient-parity oracle: XLA autodiff of the composable path
(tests/test_nk_adjoint.py, interpret mode; on-chip tier compiles it at
the production CrossSS2Dv5 geometry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import _exp, _shift0, _softplus
from xfmamba_tpu.ops.vss_block_pallas_v2 import (
    _serial_col_pair_cols, _serial_row_pair_cols, nk_scan_call_v2,
    nk_scan_v2_kind_pairs)
from xfmamba_tpu.ops.vss_block_v2_adjoint import (
    _colsum, _pred_col, _pred_flat, _succ_col, _succ_flat)

# kill switch: fusion-op training backward via this whole-map adjoint
# (False -> the grouped (K, N) custom_vjp kernels, the r1-r4 path)
NK_TRAIN = True


def _nk_scan_bwd_kernel(H, W, G, K, N, kinds,
                        u_ref, dts_ref, Bs_ref, Cs_ref, A_ref, Dsum_ref,
                        bias_ref, g_ref,
                        du_ref, ddts_ref, dBs_ref, dCs_ref, dA_ref, dD_ref,
                        dbias_ref,
                        ab_ref, bb_ref, hf_ref, hr_ref, gf_ref, gr_ref):
    f32 = jnp.float32
    L = H * W
    Lg = L * G
    first = pl.program_id(0) == 0

    u = u_ref[0].astype(f32)
    gy = g_ref[0].astype(f32)
    D = u.shape[1]
    lpos = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) // G
    onescol = jnp.ones((D, 1), f32)

    dts_l = []
    for k in range(K):
        z = dts_ref[0][:, k * D:(k + 1) * D].astype(f32) \
            + bias_ref[k:k + 1, :].astype(f32)
        dts_l.append(_softplus(z))

    du = gy * Dsum_ref[...].astype(f32)
    dD_row = _colsum(gy * u)

    ddt_acc = [jnp.zeros((Lg, D), f32) for _ in range(K)]
    dA_rows = [None] * (K * N)
    dB_cols = [None] * (K * N)
    dC_cols = [None] * (K * N)

    def Bcol(k, n):
        return Bs_ref[0][:, k * N + n:k * N + n + 1].astype(f32)

    def Ccol(k, n):
        return Cs_ref[0][:, k * N + n:k * N + n + 1].astype(f32)

    def Arow(k, n):
        return A_ref[k * N + n:k * N + n + 1, :].astype(f32)

    def finish_dir(k, n, g, h_prev, a, h, Bc, Ar):
        nonlocal du
        dt = dts_l[k]
        t1 = g * (dt * u)
        dB_cols[k * N + n] = jax.lax.dot(t1, onescol,
                                         preferred_element_type=f32)
        t2 = g * Bc
        du = du + t2 * dt
        da_a = (g * h_prev) * a
        ddt_acc[k] = ddt_acc[k] + t2 * u + da_a * Ar
        dA_rows[k * N + n] = _colsum(da_a * dt)
        dC_cols[k * N + n] = jax.lax.dot(gy * h, onescol,
                                         preferred_element_type=f32)

    zerosD = jnp.zeros((Lg, D), f32)
    pairs = nk_scan_v2_kind_pairs(kinds)
    for (kf, kr, fam) in pairs:
        for n in range(N):
            # ---- forward recompute of the pair's state sequences
            Ar_f = Arow(kf, n)
            Bc_f = Bcol(kf, n)
            a_f = _exp(dts_l[kf] * Ar_f)
            b_f = (dts_l[kf] * u) * Bc_f
            if kr is not None:
                Ar_r = Arow(kr, n)
                Bc_r = Bcol(kr, n)
                a_r = _exp(dts_l[kr] * Ar_r)
                b_r = (dts_l[kr] * u) * Bc_r
            else:
                a_r = a_f
                b_r = zerosD
            ab_ref[...] = jnp.concatenate([a_f, a_r], axis=1)
            bb_ref[...] = jnp.concatenate([b_f, b_r], axis=1)
            if fam == "col":
                _serial_col_pair_cols(ab_ref, bb_ref, H, W, G, hf_ref,
                                      hr_ref)
            else:
                _serial_row_pair_cols(ab_ref, bb_ref, H, W, G, hf_ref,
                                      hr_ref)
            h_f = hf_ref[...]
            h_r = hr_ref[...]

            # ---- adjoint chains: the adjoint of the forward-traversal
            # direction kf is a REVERSE chain (multiplier a[t+1]); the
            # adjoint of the reverse-traversal kr is a FORWARD chain —
            # so they again form one (fwd, rev) pair with roles swapped
            if fam == "col":
                a_adj_r = _succ_col(a_f, H, W, G, lpos)
                h_prev_f = _pred_col(h_f, H, W, G, lpos)
                if kr is not None:
                    a_adj_f = _pred_col(a_r, H, W, G, lpos)
                    h_prev_r = _succ_col(h_r, H, W, G, lpos)
            else:
                a_adj_r = _succ_flat(a_f, G, Lg)
                h_prev_f = _pred_flat(h_f, G)
                if kr is not None:
                    a_adj_f = _pred_flat(a_r, G)
                    h_prev_r = _succ_flat(h_r, G, Lg)
            if kr is None:
                a_adj_f = zerosD
                b_adj_f = zerosD
            else:
                b_adj_f = gy * Ccol(kr, n)
            ab_ref[...] = jnp.concatenate([a_adj_f, a_adj_r], axis=1)
            bb_ref[...] = jnp.concatenate([b_adj_f, gy * Ccol(kf, n)],
                                          axis=1)
            if fam == "col":
                _serial_col_pair_cols(ab_ref, bb_ref, H, W, G, gf_ref,
                                      gr_ref)
            else:
                _serial_row_pair_cols(ab_ref, bb_ref, H, W, G, gf_ref,
                                      gr_ref)
            finish_dir(kf, n, gr_ref[...], h_prev_f, a_f, h_f, Bc_f, Ar_f)
            if kr is not None:
                finish_dir(kr, n, gf_ref[...], h_prev_r, a_r, h_r, Bc_r,
                           Ar_r)

    du_ref[0] = du
    dBs_ref[0] = jnp.concatenate(dB_cols, axis=1)
    dCs_ref[0] = jnp.concatenate(dC_cols, axis=1)

    dbias_rows = [None] * K
    ddts_out = [None] * K
    for k in range(K):
        z = dts_ref[0][:, k * D:(k + 1) * D].astype(f32) \
            + bias_ref[k:k + 1, :].astype(f32)
        dz = ddt_acc[k] * jax.nn.sigmoid(z)
        ddts_out[k] = dz
        dbias_rows[k] = _colsum(dz)
    ddts_ref[0] = jnp.concatenate(ddts_out, axis=1)

    dA_full = jnp.concatenate(dA_rows, axis=0)
    dbias_full = jnp.concatenate(dbias_rows, axis=0)

    def accum(ref, val):
        @pl.when(first)
        def _init():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _acc():
            ref[...] = ref[...] + val

    accum(dA_ref, dA_full)
    accum(dD_ref, dD_row)
    accum(dbias_ref, dbias_full)


def nk_bwd_vmem_estimate(L, D, K, N, G):
    """Peak VMEM of the adjoint kernel in bytes.  Counted in f32
    (Lg, D)-map units: 8 scratch (ab/bb are 2-wide) + 3+2K persistent
    values (u/gy/du, K dt maps, K ddt accumulators) + ~6 transient temps
    in the (k, n) loop body — the stack part gets the Mosaic allocation
    fudge (1.8x, CALIBRATED on-chip: Mosaic reported a 122.44 MB scoped
    allocation at the CrossSS2Dv5 bs16 geometry L=49 D=1536 K=4 N=16 G=8,
    where the analytic stack is 60.2 MB + 16.3 MB of windows; cf. the
    block adjoint's measured 1.62x); the batch-blocked in/outs (u/dts/gy
    at input dtype, du/ddts f32) are double-buffered windows, counted
    unfudged.  NOTE: at the 7x7 geometry only G=8 satisfies the 8 | L*G
    alignment, so the budget must admit ~125 MB there (real 122.44 fits
    under the 127 MB hardware-practical cap with ~4.5 MB headroom) — the
    on-chip tier compile-checks it."""
    Lg = L * G

    def pad128(n):
        return ((n + 127) // 128) * 128

    unit = Lg * pad128(D) * 4
    stack = (8 + 3 + 2 * K + 6) * unit
    io = (1.5 + 0.5 * K) * unit * 0.5 + (1 + K) * unit
    return int(1.8 * stack + io)


_NK_BWD_BUDGET = 126 * 1024 * 1024


def pick_nk_train_group(B, L, W, D, K, N,
                        budget_bytes=_NK_BWD_BUDGET):
    """Largest aligned group whose adjoint fits the VMEM budget."""
    for g in (8, 4, 2, 1):
        if B % g == 0 and (L * g) % 8 == 0 and (W * g) % 8 == 0 \
                and nk_bwd_vmem_estimate(L, D, K, N, g) < budget_bytes:
            return g
    return None


@functools.partial(jax.jit, static_argnames=("H", "W", "kinds", "group",
                                             "interpret", "vmem_mb"))
def nk_scan_bwd_call(u, dts, Bs, Cs, A, Dvec, bias, gy, H, W, kinds,
                     group=8, interpret=False, vmem_mb=None):
    """Raw adjoint call.  Contract mirrors `nk_scan_call_v2` plus the
    cotangent ``gy (B, L, D)``; returns
    (du, ddts, dBs, dCs, dA (K*N, D), dD_row (1, D), dbias (K, D))."""
    B, L, D = u.shape
    K = len(kinds)
    N = A.shape[0] // K
    G = group
    assert B % G == 0 and (L * G) % 8 == 0 and (W * G) % 8 == 0
    Lg = L * G
    if vmem_mb is None:
        est_mb = nk_bwd_vmem_estimate(L, D, K, N, G) // (1024 * 1024)
        vmem_mb = min(127, max(64, est_mb + max(7, est_mb // 12)))
    Dsum = Dvec.astype(jnp.float32).sum(axis=0, keepdims=True)

    def inter(z):
        Bz, Lz, Cz = z.shape
        z = z.reshape(Bz // G, G, Lz, Cz)
        return jnp.swapaxes(z, 1, 2).reshape(Bz // G, Lz * G, Cz)

    def deinter(z, dtype=None):
        Bg, _, Cz = z.shape
        z = z.reshape(Bg, L, G, Cz)
        out = jnp.swapaxes(z, 1, 2).reshape(Bg * G, L, Cz)
        return out if dtype is None else out.astype(dtype)

    kernel = functools.partial(_nk_scan_bwd_kernel, H, W, G, K, N, kinds)
    blk = lambda c: pl.BlockSpec((1, Lg, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    acc = lambda shape: (pl.BlockSpec(shape, lambda b: (0, 0),
                                      memory_space=pltpu.VMEM),
                         jax.ShapeDtypeStruct(shape, f32))
    accA, shA = acc((K * N, D))
    accD, shD = acc((1, D))
    accb, shb = acc((K, D))
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(D), blk(K * D), blk(K * N), blk(K * N),
                  full, full, full, blk(D)],
        out_specs=[blk(D), blk(K * D), blk(K * N), blk(K * N),
                   accA, accD, accb],
        out_shape=[jax.ShapeDtypeStruct((B // G, Lg, D), f32),
                   jax.ShapeDtypeStruct((B // G, Lg, K * D), f32),
                   jax.ShapeDtypeStruct((B // G, Lg, K * N), f32),
                   jax.ShapeDtypeStruct((B // G, Lg, K * N), f32),
                   shA, shD, shb],
        scratch_shapes=[pltpu.VMEM((Lg, 2 * D), f32),
                        pltpu.VMEM((Lg, 2 * D), f32),
                        pltpu.VMEM((Lg, D), f32),
                        pltpu.VMEM((Lg, D), f32),
                        pltpu.VMEM((Lg, D), f32),
                        pltpu.VMEM((Lg, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(inter(u), inter(dts), inter(Bs), inter(Cs), A, Dsum,
      bias.astype(jnp.float32), inter(gy.astype(u.dtype)))
    du, ddts, dBs, dCs, dA, dD, dbias = outs
    return (deinter(du), deinter(ddts), deinter(dBs), deinter(dCs),
            dA, dD, dbias)


# ---------------------------------------------------------------------
# custom-vjp training op at the nk_scan_call_v2 contract level
# ---------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def nk_scan_train(H, W, kinds, group, interpret,
                  u, dts, Bs, Cs, A, Dvec, bias):
    """Training nk scan: whole-map serial forward kernel + whole-map
    adjoint backward.  Same contract as `nk_scan_call_v2`."""
    return nk_scan_call_v2(u, dts, Bs, Cs, A, Dvec, bias, H, W, kinds,
                           group=group, interpret=interpret)


def _nk_train_fwd(H, W, kinds, group, interpret, u, dts, Bs, Cs, A, Dvec,
                  bias):
    y = nk_scan_train(H, W, kinds, group, interpret, u, dts, Bs, Cs, A,
                      Dvec, bias)
    return y, (u, dts, Bs, Cs, A, Dvec, bias)


def _nk_train_bwd(H, W, kinds, group, interpret, res, gy):
    u, dts, Bs, Cs, A, Dvec, bias = res
    du, ddts, dBs, dCs, dA, dD, dbias = nk_scan_bwd_call(
        u, dts, Bs, Cs, A, Dvec, bias, gy, H, W, kinds, group=group,
        interpret=interpret)
    K = len(kinds)
    return (du.astype(u.dtype), ddts.astype(dts.dtype),
            dBs.astype(Bs.dtype), dCs.astype(Cs.dtype),
            dA.astype(A.dtype),
            jnp.broadcast_to(dD, (K, dD.shape[1])).astype(Dvec.dtype),
            dbias.astype(bias.dtype))


nk_scan_train.defvjp(_nk_train_fwd, _nk_train_bwd)


def nk_train_supported(B, L, W, D, K, N, scan_mode):
    if scan_mode not in ("cross2d", "unidi", "bidi"):
        return None
    if jax.default_backend() == "cpu" or not NK_TRAIN:
        return None
    return pick_nk_train_group(B, L, W, D, K, N)


def nk_scan_train_from_projs(x, dts, Bs, Cs, A, Dmat, bias,
                             scan_mode="cross2d", group=None,
                             interpret=False):
    """`core_dispatch`-shaped training entry (mirrors
    `nk_scan_from_projs_v2`): x (B, H, W, D); dts (B, H, W, K, D) or
    (B, L, K*D); Bs/Cs (B, H, W, K, N)-shaped; A (K, D, N); Dmat (K, D);
    bias (K, D).  Returns (B, H, W, D) f32."""
    B, H, W, D = x.shape
    K = A.shape[0]
    N = A.shape[-1]
    L = H * W
    if scan_mode == "cross2d":
        kinds = ("row_f", "col_f", "row_r", "col_r")
    elif scan_mode == "unidi":
        kinds = ("row_f",) * K
    elif scan_mode == "bidi":
        kinds = ("row_f", "row_f", "row_r", "row_r")
    else:
        raise ValueError(scan_mode)
    if group is None:
        group = pick_nk_train_group(B, L, W, D, K, N)
    assert group is not None
    u = x.reshape(B, L, D)
    A_p = jnp.swapaxes(A, 1, 2).reshape(K * N, D)
    y = nk_scan_train(H, W, kinds, group, interpret,
                      u, dts.reshape(B, L, K * D),
                      Bs.reshape(B, L, K * N), Cs.reshape(B, L, K * N),
                      A_p, Dmat, bias)
    return y.astype(jnp.float32).reshape(B, H, W, D)
