"""Whole-VSSBlock megakernel v2: g-interleaved layout + serial scans.

Same semantics as `vss_block_pallas._vss_block_call` (one Pallas kernel per
VSSBlock, v05_noz / d_state=1 / cross2d — the shipped backbone config,
reference `vmamba.py:1955-2042` + `fwd_kernel.cuh`), but a different data
layout and scan algorithm:

* **g-interleaved layout**: G images share one grid step with rows ordered
  ``r = l*G + g`` (position-major, image fastest).  Every spatial shift
  becomes a multiple of G sublanes, and a contiguous (8, C) sublane tile
  holds 8/G consecutive scan steps of all G images.

* **serial scans**: the scan recurrence ``h[t] = a[t]*h[t-1] + b[t]`` runs
  as L dependent tile FMAs instead of log2(L) masked Hillis-Steele stages
  over the whole map.  Critical path = L * fma-latency (amortized over the
  G images and the two interleaved directions of a pair), which measures
  4-9x less VPU time than the HS scheme on every stage geometry
  (`scripts/probe_serial_scan.py`).

  - row directions (flat row-major traversals, k=0 fwd / k=2 rev): one
    fori loop walks (8, C) tiles; the two directions interleave in a
    single loop (mirrored tiles) to hide FMA latency.
  - column directions (k=1 fwd / k=3 rev): one fori loop walks whole-row
    slabs (W*G, C); all W*G columns advance one h-step per iteration; a
    small Hillis-Steele chain over the W per-column (A, B) exit pairs
    supplies the cross-column carries of the flat column-major traversal,
    injected as the initial state of a second slab pass (no prefix-product
    storage, no fix-up).

Alignment requirements (asserted in the host wrapper): G in {1,2,4,8},
8 | L*G and 8 | W*G.

The depthwise 3x3 conv is restructured as 3 horizontal taps shared across
the 3 vertical offsets (2 shifts + 9 FMAs + 2 vertical shifts instead of 8
shifted-and-masked taps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import (
    _exp, _gelu_exact, _layer_norm, _shift0, _softplus,
    pack_vss_block_params)

# kill switches: v2 inference path (falls back to the v1 megakernel) and
# the fused training path (megakernel fwd + block-level adjoint bwd)
FUSED_V2 = True
FUSED_TRAIN = True
# whole-stage stacked kernel (weights streamed via grid, x in scratch)
FUSED_STAGE = True
# stage-stacked TRAIN forward (MLP fused in-kernel, per-block saves;
# backward = per-block adjoint kernel + XLA MLP-half vjp)
FUSED_STAGE_TRAIN = True
# packed-bf16 whole-map arithmetic on the INFERENCE path (fold_ln=True):
# MEASURED DEAD END — default OFF.  The theory (bf16 tile (16,128) = two
# sublanes per f32 vreg, packed mul/add at ~2x issue rate) does not
# survive contact with the surrounding kernel: Mosaic requires 32-bit
# matmul accumulators and f32 transcendentals (logistic/exp can't emit
# bf16 vectors), so every bf16 map segment is bracketed by whole-map
# casts/relayouts that cost more than the packed issue saves.  On-chip
# one-process A/B (scripts/ab_bf16_maps.py, 2026-08-20): stage0 0.73x,
# stage1 0.88x, stage2 0.86x, stage3 1.01x, model bs64 986.9 vs
# 1155.1 img/s.  Kept as a tested, gated ablation (interpret-mode test
# pins numerics); do not retry without a layout-level change.
BF16_MAPS = False
# bf16 scan-chain scratch on the INFERENCE path (fold_ln): the serial
# scans' per-iteration dynamic-slice loads/stores are the expensive part
# of the loop (see ROW_MACRO); storing the (a, b) maps and the h state
# sequences as bf16 halves that VMEM traffic.  The FMA chain still
# accumulates in f32 registers (jnp promotion) — only the STORED maps are
# rounded once, so the error does not compound along the chain the way a
# bf16-state scan would.  MEASURED DEAD END — default OFF.  The first
# on-chip A/B (ab_bf16_scratch.py, 2026-08-21) showed a phantom 1.49x at
# stage0 that the re-measure (probe_bf16_model.py, same day, real inited
# params, one process) could not reproduce: stage0 iso 15.45 (f32) vs
# 15.51 ms (bf16), model bs64 55.36 vs 55.42 ms.  Root cause of the
# phantom: chain_timer measured all t1 reps back-to-back, and a tunnel
# stall window inflated the bf16 arm's t1, faking a fast per-step
# (chain_timer now interleaves t1/tk reps).  Physics: the serial-loop
# cost is VPU *issue*-bound (see ROW_SEG/ROW_MACRO), not VMEM-traffic-
# bound, so halving scratch bytes moves nothing at stages 0-2.  The ONE
# real win is the stage-3 geometry (Lg=392, di=1536): its short chains
# over lane-WIDE rows are slice-load/store-bound, not issue-bound —
# measured 2.47 -> 2.05-2.09 ms consistently across both timer versions
# (ab_bf16_scratch + ab_stage0_bf16_group, 2026-08-21; stage-level
# rel-err 4.0e-3, e2e 4.8e-3 vs the 2e-2 budget in ONCHIP_r04.json).
# Tri-state: None = per-geometry auto (stage-3 only), True/False = force
# everywhere.
BF16_SCRATCH = None


def _bf16_scratch_auto(L, d):
    """Per-geometry default (see BF16_SCRATCH): ON only at the stage-3
    geometry class (short chains, lane-wide rows) where the halved
    slice traffic is a measured ~1.2x; OFF elsewhere (stage0's apparent
    1.49x was a timing artifact; stages 1-2 are a wash)."""
    return L <= 64 and d >= 768
# wide-state (lane-folded N) nk scan kernel for the fusion ops.  Measured
# EQUAL to the v2 serial pair-chains at the CrossSS2Dv5 geometry
# (scripts/ab_nk.py: v2 3.09-3.44 ms vs v3 3.24-3.32 ms, B=96 L=49 N=16) —
# the kernel sits at a VMEM-traffic/exp floor that chain widening does not
# move; kept as a tested ablation, off by default.
FUSED_V3 = False


def _interleave(x, G):
    """(B, L, d) image-major -> (B//G, L*G, d) position-major/g-fastest."""
    B, L, d = x.shape
    x = x.reshape(B // G, G, L, d)
    return jnp.swapaxes(x, 1, 2).reshape(B // G, L * G, d)


def _deinterleave(y, G, L):
    Bg, Lg, d = y.shape
    y = y.reshape(Bg, L, G, d)
    return jnp.swapaxes(y, 1, 2).reshape(Bg * G, L, d)


# tiles per macro block in the row scans: the per-iteration dynamic-slice
# loads/stores are the expensive part of the serial loop (their count is
# G-invariant, which is why raising G barely moved stage-0), so each
# iteration loads/stores ROW_MACRO (8, C) tiles at once and the substep
# FMAs slice the loaded VALUES statically.
ROW_MACRO = 8
# two-segment row scans (4 independent chains/loop): measured-WORSE
# ablation, extracted to ops/ablations/row_seg.py (see its docstring).
ROW_SEG = False


def _serial_row_pair(af, bf, ar, br, L, G, out_f, out_r):
    """Interleaved forward+reverse flat serial scans.

    af/bf/ar/br: (L*G, C) VMEM *refs* (dynamic sublane slicing needs refs).
    Writes the full state sequence h into out_f / out_r refs.

    NOTE: the ROW_SEG ablation clobbers `af`/`ar` (every caller rewrites
    them afterwards).
    """
    S = 8 // G            # time steps per (8, C) tile
    T = (L * G) // 8      # tiles
    C = af.shape[1]
    f32 = jnp.float32
    zero = jnp.zeros((G, C), f32)

    M = ROW_MACRO
    while M > 1 and T % (2 * M):
        M //= 2
    if not ROW_SEG or T % (2 * M) or T < 8:
        # single-segment fallback (odd tile counts / tiny maps)
        while T % M:
            M //= 2
        TM = T // M

        def body1(i, carry):
            hf, hr = carry
            base_f = pl.multiple_of(i * 8 * M, 8)
            base_r = pl.multiple_of((TM - 1 - i) * 8 * M, 8)
            a_f = af[pl.ds(base_f, 8 * M), :]
            b_f = bf[pl.ds(base_f, 8 * M), :]
            a_r = ar[pl.ds(base_r, 8 * M), :]
            b_r = br[pl.ds(base_r, 8 * M), :]
            outs_f = []
            outs_r = []
            for t in range(M * S):
                sf = slice(t * G, (t + 1) * G)
                j = M * S - 1 - t
                sr = slice(j * G, (j + 1) * G)
                # bf16 scratch loads promote to the f32 carry (BF16_SCRATCH)
                hf = a_f[sf] * hf + b_f[sf]
                hr = a_r[sr] * hr + b_r[sr]
                outs_f.append(hf)
                outs_r.insert(0, hr)
            odt = out_f.dtype
            out_f[pl.ds(base_f, 8 * M), :] = (
                jnp.concatenate(outs_f, axis=0) if M * S > 1
                else outs_f[0]).astype(odt)
            out_r[pl.ds(base_r, 8 * M), :] = (
                jnp.concatenate(outs_r, axis=0) if M * S > 1
                else outs_r[0]).astype(odt)
            return hf, hr

        jax.lax.fori_loop(0, TM, body1, (zero, zero))
        return

    from xfmamba_tpu.ops.ablations.row_seg import serial_row_pair_segmented
    serial_row_pair_segmented(af, bf, ar, br, out_f, out_r, T, M, S, G)


def _serial_col_pair(af, bf, ar, br, H, W, G, out_f, out_r):
    """Per-column serial scans for both column directions in two passes.

    Pass 1 computes only the per-column (A, B) exit pairs (total product +
    zero-init exit state, H FMAs per slab); the cross-column carries of the
    flat column-major traversal come from a small Hillis-Steele chain over
    those pairs; pass 2 re-runs the H slab steps with the carry as the
    *initial* state, writing the exact flat-traversal states directly —
    no prefix-product arrays, no fix-up passes.  Slab = (W*G, C) rows."""
    WG = W * G
    C = af.shape[1]
    f32 = jnp.float32
    zero = jnp.zeros((WG, C), f32)
    one = jnp.ones((WG, C), f32)

    def pass1(h, carry):
        hf, pf, hr, pr = carry
        off_f = pl.multiple_of(h * WG, 8)
        off_r = pl.multiple_of((H - 1 - h) * WG, 8)
        a_f = af[pl.ds(off_f, WG), :].astype(f32)
        a_r = ar[pl.ds(off_r, WG), :].astype(f32)
        hf = a_f * hf + bf[pl.ds(off_f, WG), :]
        pf = a_f * pf
        hr = a_r * hr + br[pl.ds(off_r, WG), :]
        pr = a_r * pr
        return hf, pf, hr, pr

    B_cf, A_cf, B_cr, A_cr = jax.lax.fori_loop(
        0, H, pass1, (zero, one, zero, one))

    widx = jax.lax.broadcasted_iota(jnp.int32, (WG, 1), 0) // G
    c_f = _chain_cols(A_cf, B_cf, W, G, widx, False)
    c_r = _chain_cols(A_cr, B_cr, W, G, widx, True)

    def pass2(h, carry):
        hf, hr = carry
        off_f = pl.multiple_of(h * WG, 8)
        off_r = pl.multiple_of((H - 1 - h) * WG, 8)
        hf = af[pl.ds(off_f, WG), :] * hf + bf[pl.ds(off_f, WG), :]
        hr = ar[pl.ds(off_r, WG), :] * hr + br[pl.ds(off_r, WG), :]
        out_f[pl.ds(off_f, WG), :] = hf.astype(out_f.dtype)
        out_r[pl.ds(off_r, WG), :] = hr.astype(out_r.dtype)
        return hf, hr

    jax.lax.fori_loop(0, H, pass2, (c_f, c_r))


def _chain_cols(A_c, B_c, W, G, widx, reverse):
    """Inclusive Hillis-Steele over the W per-column (A, B) pairs of each
    image (rows = w*G+g), then the *exclusive* carry (state entering each
    column under the flat column-major traversal)."""
    off = 1
    while off < W:
        sh = off * G
        A_sh = _shift0(A_c, sh, reverse, False)
        B_sh = _shift0(B_c, sh, reverse, False)
        m = (widx + off) <= (W - 1) if reverse else widx >= off
        A_sh = jnp.where(m, A_sh, 1.0)
        B_sh = jnp.where(m, B_sh, 0.0)
        B_c = B_c + A_c * B_sh
        A_c = A_c * A_sh
        off *= 2
    # exclusive shift by one column
    sh = _shift0(B_c, G, reverse, False)
    edge = (widx == W - 1) if reverse else (widx == 0)
    return jnp.where(edge, 0.0, sh)


def _block_body(H, W, R, G, conv_bias, fuse_mlp, fold_ln, bf16_maps,
                mm_dtype,
                x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
                lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2, m1, m2,
                hf_ref, hr_ref, af_ref, bf_ref, ar_ref, br_ref,
                want_mid=False):
    """One whole VSSBlock on an f32 (Lg, d) VALUE; weights as values, scan
    scratch as refs.  Shared by the per-block kernel and the stage-stacked
    kernel (`_vss_stage_kernel_v2`).  Returns the f32 residual output (or,
    with ``want_mid``, the (post-SS2D-half, final) pair — the stage-stacked
    TRAIN kernel saves the mid-point for the MLP-half backward).

    NOTE (r3 measured dead end): writing the scan h sequences IN PLACE
    over their own a/b scratch (4 maps instead of 6) regressed every
    stage 2-7% — Mosaic cannot prove the loop's dynamic-slice loads and
    stores disjoint and serializes the load pipeline.  Keep h in
    separate scratch."""
    f32 = jnp.float32
    L = H * W
    Lg = L * G
    WG = W * G
    # packed-bf16 maps on the inference path only (see BF16_MAPS above):
    # fold_ln is the inference-only flag, so the train forward (which the
    # block-level adjoint recomputes op-for-op in f32) is untouched.
    cdt = jnp.bfloat16 if (bf16_maps and fold_ln
                           and mm_dtype == jnp.bfloat16) else f32

    if fold_ln:
        # ln1's affine is folded into w_in; ln1 carries the (1, di) bias row
        h1 = _layer_norm(x, None, None, use_mxu=True)
        # Mosaic requires a 32-bit matmul accumulator; accumulate f32 and
        # cast the MAP down to cdt so the VPU ops that follow run packed.
        xin = jax.lax.dot(h1.astype(mm_dtype), w_in,
                          preferred_element_type=f32).astype(cdt) \
            + ln1.astype(cdt)                                   # (Lg, di)
    else:
        h1 = _layer_norm(x, ln1[0:1, :].astype(f32),
                         ln1[1:2, :].astype(f32), use_mxu=True)
        xin = jax.lax.dot(h1.astype(mm_dtype), w_in,
                          preferred_element_type=f32)           # (Lg, di)

    # ---- depthwise 3x3 SAME conv, horizontal-taps-first decomposition.
    # l = r // G; shifts move whole positions (multiples of G sublanes) so
    # images never mix; edge masks kill cross-row/image wraps.
    row_r = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0)
    lpos = row_r // G                                           # (Lg, 1)
    wmod = lpos % W
    sh_l = jnp.where(wmod >= 1, _shift0(xin, G, False, False),
                     jnp.asarray(0.0, cdt))
    sh_r = jnp.where(wmod <= W - 2, _shift0(xin, G, True, False),
                     jnp.asarray(0.0, cdt))
    w_c = w_conv.astype(cdt)
    hrow = []
    for i in range(3):
        hrow.append(sh_l * w_c[3 * i + 0:3 * i + 1, :]
                    + xin * w_c[3 * i + 1:3 * i + 2, :]
                    + sh_r * w_c[3 * i + 2:3 * i + 3, :])
    # vertical taps: no edge mask needed — _shift0 zero-pads the vacated
    # rows, which are exactly the rows the lpos bounds would mask
    acc = hrow[1]
    acc = acc + _shift0(hrow[0], WG, False, False)
    acc = acc + _shift0(hrow[2], WG, True, False)
    if conv_bias:
        acc = acc + b_conv.astype(cdt)
    # SiLU; Mosaic's logistic lowering can't emit bf16 vectors (f32 const
    # broadcast), so the transcendental runs f32 and the mul stays packed.
    u = acc * jax.nn.sigmoid(acc.astype(f32)).astype(cdt)

    u_mm = u.astype(mm_dtype)
    if cdt != f32:
        u = u.astype(f32)  # scan b / D·u epilogue accumulate in f32
    xdbl = jax.lax.dot(u_mm, w_xp,
                       preferred_element_type=f32)              # (Lg, 4R+8)
    xdbl_mm = xdbl.astype(mm_dtype)

    def dir_ab(k):
        rank_k = xdbl_mm[:, k * R:(k + 1) * R]
        dt = jax.lax.dot(rank_k, w_dt[k * R:(k + 1) * R, :],
                         preferred_element_type=f32)
        dt = _softplus(dt + b_dt[k:k + 1, :].astype(f32))
        Bk = xdbl[:, 4 * R + 2 * k:4 * R + 2 * k + 1]
        a = _exp(dt * A[k:k + 1, :].astype(f32))
        b = dt * u * Bk
        return a, b

    def Ck(k):
        return xdbl[:, 4 * R + 2 * k + 1:4 * R + 2 * k + 2]

    y_acc = u * Dsum.astype(f32)

    sdt = af_ref.dtype  # f32, or bf16 under BF16_SCRATCH

    # ---- row directions (k=0 forward, k=2 reverse): flat serial chains
    a_f, b_f = dir_ab(0)
    a_r, b_r = dir_ab(2)
    af_ref[...], bf_ref[...] = a_f.astype(sdt), b_f.astype(sdt)
    ar_ref[...], br_ref[...] = a_r.astype(sdt), b_r.astype(sdt)
    _serial_row_pair(af_ref, bf_ref, ar_ref, br_ref, L, G, hf_ref, hr_ref)
    y_acc = (y_acc + Ck(0) * hf_ref[...].astype(f32)
             + Ck(2) * hr_ref[...].astype(f32))

    # ---- column directions (k=1 forward, k=3 reverse): two-pass slab
    # serial scans (carry-init second pass writes exact flat states)
    a_f, b_f = dir_ab(1)
    a_r, b_r = dir_ab(3)
    af_ref[...], bf_ref[...] = a_f.astype(sdt), b_f.astype(sdt)
    ar_ref[...], br_ref[...] = a_r.astype(sdt), b_r.astype(sdt)
    _serial_col_pair(af_ref, bf_ref, ar_ref, br_ref, H, W, G, hf_ref,
                     hr_ref)
    y_acc = (y_acc + Ck(1) * hf_ref[...].astype(f32)
             + Ck(3) * hr_ref[...].astype(f32))

    if fold_ln:
        y = _layer_norm(y_acc, None, None, use_mxu=True)
        out = jax.lax.dot(y.astype(mm_dtype), w_out,
                          preferred_element_type=f32) \
            + lno.astype(f32)                                   # (Lg, d)
    else:
        y = _layer_norm(y_acc, lno[0:1, :].astype(f32),
                        lno[1:2, :].astype(f32), use_mxu=True)
        out = jax.lax.dot(y.astype(mm_dtype), w_out,
                          preferred_element_type=f32)           # (Lg, d)
    if m1 is not None:
        out = out * m1[:, 0:1].astype(f32)
    res = x + out
    mid = res

    if fuse_mlp:
        if fold_ln:
            # ln2 folded into w_fc1/b_fc1; ln2 operand is a dummy
            h2 = _layer_norm(res, None, None, use_mxu=True)
        else:
            h2 = _layer_norm(res, ln2[0:1, :].astype(f32),
                             ln2[1:2, :].astype(f32), use_mxu=True)
        f1 = jax.lax.dot(h2.astype(mm_dtype), w_fc1,
                         preferred_element_type=f32).astype(cdt)
        f1 = _gelu_exact(f1 + b_fc1.astype(cdt))
        f2 = jax.lax.dot(f1.astype(mm_dtype), w_fc2,
                         preferred_element_type=f32) \
            + b_fc2.astype(f32)
        if m2 is not None:
            f2 = f2 * m2[:, 0:1].astype(f32)
        res = res + f2

    if want_mid:
        return mid, res
    return res


def _vss_block_kernel_v2(H, W, R, G, conv_bias, fuse_mlp, fold_ln,
                         bf16_maps, mm_dtype, out_dtype, with_masks,
                         *refs):
    if with_masks:
        (x_ref, ln1_ref, w_in_ref, w_conv_ref, b_conv_ref,
         w_xp_ref, w_dt_ref, b_dt_ref, A_ref, Dsum_ref,
         lno_ref, w_out_ref, ln2_ref,
         w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
         m1_ref, m2_ref,
         y_ref, hf_ref, hr_ref,
         af_ref, bf_ref, ar_ref, br_ref) = refs
    else:
        (x_ref, ln1_ref, w_in_ref, w_conv_ref, b_conv_ref,
         w_xp_ref, w_dt_ref, b_dt_ref, A_ref, Dsum_ref,
         lno_ref, w_out_ref, ln2_ref,
         w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
         y_ref, hf_ref, hr_ref,
         af_ref, bf_ref, ar_ref, br_ref) = refs
        m1_ref = m2_ref = None
    res = _block_body(
        H, W, R, G, conv_bias, fuse_mlp, fold_ln, bf16_maps, mm_dtype,
        x_ref[0].astype(jnp.float32), ln1_ref[...], w_in_ref[...],
        w_conv_ref[...], b_conv_ref[...], w_xp_ref[...], w_dt_ref[...],
        b_dt_ref[...], A_ref[...], Dsum_ref[...], lno_ref[...],
        w_out_ref[...], ln2_ref[...], w_fc1_ref[...], b_fc1_ref[...],
        w_fc2_ref[...], b_fc2_ref[...],
        m1_ref[0] if with_masks else None,
        m2_ref[0] if with_masks else None,
        hf_ref, hr_ref, af_ref, bf_ref, ar_ref, br_ref)
    y_ref[0] = res.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "conv_bias",
                                              "fuse_mlp", "interpret",
                                              "vmem_mb", "group",
                                              "interleaved", "fold_ln",
                                              "bf16_maps", "bf16_scratch"))
def _vss_block_call_v2_jit(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A,
                           Dsum, lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2,
                           H, W, conv_bias, fuse_mlp, interpret=False,
                           vmem_mb=100, group=8, interleaved=False,
                           m1=None, m2=None, fold_ln=False, bf16_maps=False,
                           bf16_scratch=False):
    """v2 entry.  x (B, L, d); returns (B, L, d).  With ``interleaved``,
    x is already (B//G, L*G, d) position-major and stays so on return
    (stage-level callers hoist the layout change outside the block loop)."""
    if interleaved:
        Bg, Lg, d = x.shape
        G = group
        B = Bg * G
        L = Lg // G
    else:
        B, L, d = x.shape
        G = group if B % group == 0 else 1
    assert G in (1, 2, 4, 8) and (L * G) % 8 == 0 and (W * G) % 8 == 0, \
        (L, W, G)
    R = w_dt.shape[0] // 4
    di = w_in.shape[1]
    mm_dtype = w_in.dtype
    if not interleaved:
        x = _interleave(x, G)
    with_masks = m1 is not None
    assert not (fold_ln and with_masks)  # fold is inference-only
    kernel = functools.partial(
        _vss_block_kernel_v2, H, W, R, G, conv_bias, fuse_mlp, fold_ln,
        bf16_maps, mm_dtype, x.dtype, with_masks)
    blk_x = pl.BlockSpec((1, L * G, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_m = pl.BlockSpec((1, L * G, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    operands = [x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
                lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2]
    in_specs = [blk_x] + [full] * 16
    if with_masks:
        operands += [_interleave(m1.astype(f32), G) if not interleaved
                     else m1,
                     _interleave(m2.astype(f32), G) if not interleaved
                     else m2]
        in_specs += [blk_m, blk_m]
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((B // G, L * G, d), x.dtype),
        scratch_shapes=[pltpu.VMEM(
            (L * G, di),
            jnp.bfloat16 if (bf16_scratch and fold_ln) else f32)
            for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if not interleaved:
        y = _deinterleave(y, G, L).reshape(B, L, d)
    return y


def _vss_block_call_v2(*args, bf16_maps=None, bf16_scratch=None, **kw):
    """Call-time wrapper: resolves the module-level ``BF16_MAPS`` /
    ``BF16_SCRATCH`` flags into STATIC jit arguments so flag flips
    recompile instead of silently returning stale-compiled results (the
    jit cache keys on them)."""
    if bf16_maps is None:
        bf16_maps = BF16_MAPS
    if bf16_scratch is None:
        bf16_scratch = BF16_SCRATCH
    if bf16_scratch is None:
        bf16_scratch = _bf16_scratch_auto(kw["H"] * kw["W"],
                                          args[0].shape[-1])
    return _vss_block_call_v2_jit(*args, bf16_maps=bf16_maps,
                                  bf16_scratch=bf16_scratch, **kw)


_vss_block_call_v2.clear_cache = _vss_block_call_v2_jit.clear_cache


def vss_block_fused_v2(x, p, H, W, conv_bias, fuse_mlp, group=8):
    """Convenience wrapper mirroring `vss_block_fused` (inference only)."""
    args = pack_vss_block_params(p, x.dtype, fuse_mlp, fold_ln=True)
    return _vss_block_call_v2(x, *args, H=H, W=W, conv_bias=conv_bias,
                              fuse_mlp=fuse_mlp, group=group, fold_ln=True)


# ---------------------------------------------------------------------
# stage-stacked megakernel: a whole stage of VSSBlocks per pallas_call
# ---------------------------------------------------------------------

def _vss_stage_kernel_v2(H, W, R, G, conv_bias, fuse_mlp, fold_ln,
                         bf16_maps, mm_dtype, out_dtype,
                         x_ref, ln1_ref, w_in_ref, w_conv_ref, b_conv_ref,
                         w_xp_ref, w_dt_ref, b_dt_ref, A_ref, Dsum_ref,
                         lno_ref, w_out_ref, ln2_ref,
                         w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
                         y_ref, xs_ref, hf_ref, hr_ref,
                         af_ref, bf_ref, ar_ref, br_ref):
    """grid = (B//G, depth): for each image group the blocks of a stage run
    back-to-back with the activation carried in VMEM scratch (`xs_ref`) —
    no HBM round-trip or kernel ramp between blocks.  Block j's weights
    arrive via grid-indexed BlockSpecs (leading depth axis), double-buffered
    by Pallas while block j-1 computes."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xs_ref[...] = x_ref[0]

    res = _block_body(
        H, W, R, G, conv_bias, fuse_mlp, fold_ln, bf16_maps, mm_dtype,
        xs_ref[...].astype(jnp.float32), ln1_ref[0], w_in_ref[0],
        w_conv_ref[0], b_conv_ref[0], w_xp_ref[0], w_dt_ref[0],
        b_dt_ref[0], A_ref[0], Dsum_ref[0], lno_ref[0], w_out_ref[0],
        ln2_ref[0], w_fc1_ref[0], b_fc1_ref[0], w_fc2_ref[0],
        b_fc2_ref[0], None, None,
        hf_ref, hr_ref, af_ref, bf_ref, ar_ref, br_ref)
    out = res.astype(out_dtype)
    xs_ref[...] = out
    y_ref[0] = out


def pack_vss_stage_params(ps, mm_dtype, fuse_mlp, fold_ln=False):
    """Stack per-block operand lists along a leading depth axis."""
    packed = [pack_vss_block_params(p, mm_dtype, fuse_mlp, fold_ln=fold_ln)
              for p in ps]
    return tuple(jnp.stack(ws) for ws in zip(*packed))


@functools.partial(jax.jit, static_argnames=("H", "W", "conv_bias",
                                              "fuse_mlp", "interpret",
                                              "vmem_mb", "group",
                                              "fold_ln", "bf16_maps",
                                              "bf16_scratch"))
def _vss_stage_call_v2_jit(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A,
                           Dsum, lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2,
                           H, W, conv_bias, fuse_mlp, interpret=False,
                           vmem_mb=100, group=8, fold_ln=False,
                           bf16_maps=False, bf16_scratch=False):
    """Stage entry.  x (B, L, d); weights carry a leading depth axis;
    returns (B, L, d) after all `depth` blocks."""
    B, L, d = x.shape
    G = group if B % group == 0 else 1
    assert G in (1, 2, 4, 8) and (L * G) % 8 == 0 and (W * G) % 8 == 0, \
        (L, W, G)
    depth = ln1.shape[0]
    R = w_dt.shape[1] // 4
    di = w_in.shape[2]
    mm_dtype = w_in.dtype
    x = _interleave(x, G)
    kernel = functools.partial(
        _vss_stage_kernel_v2, H, W, R, G, conv_bias, fuse_mlp, fold_ln,
        bf16_maps, mm_dtype, x.dtype)
    Lg = L * G
    blk_x = pl.BlockSpec((1, Lg, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    weights = [ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
               lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2]

    def wspec(w):
        s = w.shape[1:]
        return pl.BlockSpec((1,) + s, lambda b, j: (j,) + (0,) * len(s),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    y = pl.pallas_call(
        kernel,
        grid=(B // G, depth),
        in_specs=[blk_x] + [wspec(w) for w in weights],
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((B // G, Lg, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((Lg, d), x.dtype)]
        + [pltpu.VMEM(
            (Lg, di),
            jnp.bfloat16 if (bf16_scratch and fold_ln) else f32)
            for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, *weights)
    return _deinterleave(y, G, L).reshape(B, L, d)


def _vss_stage_call_v2(*args, bf16_maps=None, bf16_scratch=None, **kw):
    """Call-time wrapper: see `_vss_block_call_v2`."""
    if bf16_maps is None:
        bf16_maps = BF16_MAPS
    if bf16_scratch is None:
        bf16_scratch = BF16_SCRATCH
    if bf16_scratch is None:
        bf16_scratch = _bf16_scratch_auto(kw["H"] * kw["W"],
                                          args[0].shape[-1])
    return _vss_stage_call_v2_jit(*args, bf16_maps=bf16_maps,
                                  bf16_scratch=bf16_scratch, **kw)


_vss_stage_call_v2.clear_cache = _vss_stage_call_v2_jit.clear_cache


# ---------------------------------------------------------------------
# stage-stacked TRAIN forward: whole stage per pallas_call, MLP fused,
# per-block drop-path masks, per-block (input, mid) saves for the
# backward (SS2D half -> block adjoint kernel, MLP half -> XLA vjp).
# The custom-vjp wiring lives in `ops/vss_stage_train.py`.
# ---------------------------------------------------------------------

def _vss_stage_train_kernel_v2(H, W, R, G, conv_bias, mm_dtype, out_dtype,
                               x_ref, ln1_ref, w_in_ref, w_conv_ref,
                               b_conv_ref, w_xp_ref, w_dt_ref, b_dt_ref,
                               A_ref, Dsum_ref, lno_ref, w_out_ref, ln2_ref,
                               w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
                               m1_ref, m2_ref,
                               y_ref, xsv_ref, midsv_ref,
                               xs_ref, hf_ref, hr_ref,
                               af_ref, bf_ref, ar_ref, br_ref):
    """grid = (B//G, depth): like `_vss_stage_kernel_v2` but train-mode —
    fold_ln off (param grads need the unfolded form), per-block masks, and
    the block input + post-SS2D mid-point written out for the backward."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xs_ref[...] = x_ref[0]

    xin = xs_ref[...]
    xsv_ref[0, 0] = xin
    mid, res = _block_body(
        H, W, R, G, conv_bias, True, False, False, mm_dtype,
        xin.astype(jnp.float32), ln1_ref[0], w_in_ref[0],
        w_conv_ref[0], b_conv_ref[0], w_xp_ref[0], w_dt_ref[0],
        b_dt_ref[0], A_ref[0], Dsum_ref[0], lno_ref[0], w_out_ref[0],
        ln2_ref[0], w_fc1_ref[0], b_fc1_ref[0], w_fc2_ref[0],
        b_fc2_ref[0], m1_ref[0, 0], m2_ref[0, 0],
        hf_ref, hr_ref, af_ref, bf_ref, ar_ref, br_ref, want_mid=True)
    midsv_ref[0, 0] = mid.astype(out_dtype)
    out = res.astype(out_dtype)
    xs_ref[...] = out
    y_ref[0] = out


@functools.partial(jax.jit, static_argnames=("H", "W", "conv_bias",
                                              "interpret", "vmem_mb",
                                              "group"))
def _vss_stage_train_call(x, m1, m2, ln1, w_in, w_conv, b_conv, w_xp, w_dt,
                          b_dt, A, Dsum, lno, w_out, ln2, w_fc1, b_fc1,
                          w_fc2, b_fc2,
                          H, W, conv_bias, interpret=False, vmem_mb=100,
                          group=8):
    """Stage-train entry.  x (B, L, d); m1/m2 (depth, B, L, 1) drop-path
    keep masks; weights depth-stacked.  Returns
    (y (B, L, d), xsaves (depth, B, L, d), mids (depth, B, L, d))."""
    B, L, d = x.shape
    G = group if B % group == 0 else 1
    assert G in (1, 2, 4, 8) and (L * G) % 8 == 0 and (W * G) % 8 == 0, \
        (L, W, G)
    depth = ln1.shape[0]
    R = w_dt.shape[1] // 4
    di = w_in.shape[2]
    mm_dtype = w_in.dtype
    f32 = jnp.float32
    xi = _interleave(x, G)
    m1i = jax.vmap(_interleave, in_axes=(0, None))(m1.astype(f32), G)
    m2i = jax.vmap(_interleave, in_axes=(0, None))(m2.astype(f32), G)
    kernel = functools.partial(
        _vss_stage_train_kernel_v2, H, W, R, G, conv_bias, mm_dtype,
        x.dtype)
    Lg = L * G
    blk_x = pl.BlockSpec((1, Lg, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_m = pl.BlockSpec((1, 1, Lg, 1), lambda b, j: (j, b, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_sv = pl.BlockSpec((1, 1, Lg, d), lambda b, j: (j, b, 0, 0),
                          memory_space=pltpu.VMEM)
    weights = [ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
               lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2]

    def wspec(w):
        s = w.shape[1:]
        return pl.BlockSpec((1,) + s, lambda b, j: (j,) + (0,) * len(s),
                            memory_space=pltpu.VMEM)

    y, xsv, midsv = pl.pallas_call(
        kernel,
        grid=(B // G, depth),
        in_specs=[blk_x] + [wspec(w) for w in weights] + [blk_m, blk_m],
        out_specs=[blk_x, blk_sv, blk_sv],
        out_shape=[jax.ShapeDtypeStruct((B // G, Lg, d), x.dtype),
                   jax.ShapeDtypeStruct((depth, B // G, Lg, d), x.dtype),
                   jax.ShapeDtypeStruct((depth, B // G, Lg, d), x.dtype)],
        scratch_shapes=[pltpu.VMEM((Lg, d), x.dtype)]
        + [pltpu.VMEM((Lg, di), f32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(xi, *weights, m1i, m2i)
    deint = lambda a: _deinterleave(a, G, L).reshape(B, L, d)
    return (deint(y),
            jax.vmap(lambda a: deint(a))(xsv),
            jax.vmap(lambda a: deint(a))(midsv))


def vss_stage_fused_v2(x, ps, H, W, conv_bias, fuse_mlp, group=8):
    """Run a whole stage (list of VSSBlock param dicts) in one kernel."""
    args = pack_vss_stage_params(ps, x.dtype, fuse_mlp, fold_ln=True)
    return _vss_stage_call_v2(x, *args, H=H, W=W, conv_bias=conv_bias,
                              fuse_mlp=fuse_mlp, group=group, fold_ln=True)


_VMEM_BUDGET_V2 = 80 * 1024 * 1024


def _vmem_estimate_v2(L, d, di, hd, G, fuse_mlp):
    """Working set: 6 f32 (L*G, di) scratch arrays, ~4 live f32 (L*G, di)
    values (u, xdbl-derived, y_acc, conv temps), the x/res (L*G, d) buffers,
    and the bf16 matmul weights."""

    def pad128(n):
        return ((n + 127) // 128) * 128

    Lg = L * G
    acts = 10 * Lg * pad128(di) * 4 + 3 * Lg * pad128(d) * 4
    weights = 2 * (d * di * 2) + di * 4
    if fuse_mlp:
        weights += 2 * (d * hd * 2)
        acts += Lg * pad128(hd) * 2
    return acts + weights


def pick_group_v2(B, H, W, d, di, hd, fuse_mlp=True,
                  budget_bytes=_VMEM_BUDGET_V2):
    """Group size for the v2 kernel, or None when no valid choice exists
    (caller falls back to v1).  Preference order from measured per-stage
    optima on v5e (`scripts/ab_v1_v2.py`): big maps want small G (VMEM
    pressure), small maps want G=8 (serial-chain latency amortization)."""
    L = H * W
    if L >= 2048:
        prefs = (1, 2)
    elif L >= 512:
        # r3 re-measure (scripts/ab_stage0_group.py): stage-1 geometry now
        # prefers G=4 (4.52 vs 5.45 ms for the depth-2 stage at B=128) —
        # the serial-chain amortization beat the VMEM pressure once
        # ROW_MACRO landed.  stage-0 (L>=2048) re-measured and stays small.
        prefs = (4, 2, 1)
    elif L >= 128:
        prefs = (4, 8, 2)
    else:
        prefs = (8, 4, 2)
    for G in prefs:
        if B % G:
            continue
        if (L * G) % 8 or (W * G) % 8:
            continue
        if _vmem_estimate_v2(L, d, di, hd, G, fuse_mlp) < budget_bytes:
            return G
    return None


# ---------------------------------------------------------------------
# whole-map multi-state scan v2 (fusion ops: Cross_SS2Dv5, ShallowFuse)
# ---------------------------------------------------------------------

def _serial_row_pair_cols(ab, bb, H, W, G, out_f, out_r):
    """Like `_serial_row_pair` but fwd/rev share one (Lg, 2C) scratch pair
    (fwd in lanes [:C], rev in [C:])."""
    L = H * W
    S = 8 // G
    T = (L * G) // 8
    C = ab.shape[1] // 2
    f32 = jnp.float32
    hf0 = jnp.zeros((G, C), f32)
    hr0 = jnp.zeros((G, C), f32)

    def body(i, carry):
        hf, hr = carry
        base_f = pl.multiple_of(i * 8, 8)
        base_r = pl.multiple_of((T - 1 - i) * 8, 8)
        a_f = ab[pl.ds(base_f, 8), :]
        b_f = bb[pl.ds(base_f, 8), :]
        a_r = ab[pl.ds(base_r, 8), :]
        b_r = bb[pl.ds(base_r, 8), :]
        outs_f, outs_r = [], []
        for u in range(S):
            sf = slice(u * G, (u + 1) * G)
            sr = slice((S - 1 - u) * G, (S - u) * G)
            hf = a_f[sf, :C] * hf + b_f[sf, :C]
            hr = a_r[sr, C:] * hr + b_r[sr, C:]
            outs_f.append(hf)
            outs_r.insert(0, hr)
        out_f[pl.ds(base_f, 8), :] = (jnp.concatenate(outs_f, axis=0)
                                      if S > 1 else outs_f[0])
        out_r[pl.ds(base_r, 8), :] = (jnp.concatenate(outs_r, axis=0)
                                      if S > 1 else outs_r[0])
        return hf, hr

    jax.lax.fori_loop(0, T, body, (hf0, hr0))


def _serial_col_pair_cols(ab, bb, H, W, G, out_f, out_r):
    """Two-pass column scans with fwd/rev sharing one (Lg, 2C) pair."""
    WG = W * G
    C = ab.shape[1] // 2
    f32 = jnp.float32
    zero = jnp.zeros((WG, C), f32)
    one = jnp.ones((WG, C), f32)

    def pass1(h, carry):
        hf, pf, hr, pr = carry
        off_f = pl.multiple_of(h * WG, 8)
        off_r = pl.multiple_of((H - 1 - h) * WG, 8)
        a_f = ab[pl.ds(off_f, WG), :]
        b_f = bb[pl.ds(off_f, WG), :]
        a_r = ab[pl.ds(off_r, WG), :]
        b_r = bb[pl.ds(off_r, WG), :]
        hf = a_f[:, :C] * hf + b_f[:, :C]
        pf = a_f[:, :C] * pf
        hr = a_r[:, C:] * hr + b_r[:, C:]
        pr = a_r[:, C:] * pr
        return hf, pf, hr, pr

    B_cf, A_cf, B_cr, A_cr = jax.lax.fori_loop(
        0, H, pass1, (zero, one, zero, one))
    widx = jax.lax.broadcasted_iota(jnp.int32, (WG, 1), 0) // G
    c_f = _chain_cols(A_cf, B_cf, W, G, widx, False)
    c_r = _chain_cols(A_cr, B_cr, W, G, widx, True)

    def pass2(h, carry):
        hf, hr = carry
        off_f = pl.multiple_of(h * WG, 8)
        off_r = pl.multiple_of((H - 1 - h) * WG, 8)
        hf = ab[pl.ds(off_f, WG), :C] * hf + bb[pl.ds(off_f, WG), :C]
        hr = ab[pl.ds(off_r, WG), C:] * hr + bb[pl.ds(off_r, WG), C:]
        out_f[pl.ds(off_f, WG), :] = hf
        out_r[pl.ds(off_r, WG), :] = hr
        return hf, hr

    jax.lax.fori_loop(0, H, pass2, (c_f, c_r))


def _nk_scan_kernel_v2(H, W, G, K, N, kinds, out_dtype,
                       u_ref, dts_ref, Bs_ref, Cs_ref,
                       A_ref, Dsum_ref, bias_ref, y_ref,
                       ab_ref, bb_ref, hf_ref, hr_ref):
    """Serial-scan version of `_nk_scan_kernel`: each (k, n) state is one
    latency-amortized serial chain; chains pair (forward, reverse) of the
    same traversal family to interleave in one loop.

    Requires kinds grouped as matching (fwd, rev) pairs or all-forward
    (unidi); see `nk_scan_v2_kind_pairs`."""
    f32 = jnp.float32
    u = u_ref[0].astype(f32)                                    # (Lg, D)
    D = u.shape[1]
    y = u * Dsum_ref[...].astype(f32)

    dtus = []
    dts = []
    for k in range(K):
        dt = dts_ref[0][:, k * D:(k + 1) * D].astype(f32)
        dt = _softplus(dt + bias_ref[k:k + 1, :].astype(f32))
        dts.append(dt)
        dtus.append(dt * u)

    pairs = nk_scan_v2_kind_pairs(kinds)
    for (kf, kr, fam) in pairs:
        for n in range(N):
            a_f = _exp(dts[kf] * A_ref[kf * N + n:kf * N + n + 1, :]
                          .astype(f32))
            b_f = dtus[kf] * Bs_ref[0][:, kf * N + n:kf * N + n + 1] \
                .astype(f32)
            if kr is not None:
                a_r = _exp(dts[kr] * A_ref[kr * N + n:kr * N + n + 1, :]
                              .astype(f32))
                b_r = dtus[kr] * Bs_ref[0][:, kr * N + n:kr * N + n + 1] \
                    .astype(f32)
            else:  # all-forward family: run the same chain twice-as-wide
                a_r = a_f
                b_r = jnp.zeros_like(b_f)
            ab_ref[...] = jnp.concatenate([a_f, a_r], axis=1)
            bb_ref[...] = jnp.concatenate([b_f, b_r], axis=1)
            if fam == "col":
                _serial_col_pair_cols(ab_ref, bb_ref, H, W, G, hf_ref,
                                      hr_ref)
            else:
                _serial_row_pair_cols(ab_ref, bb_ref, H, W, G, hf_ref,
                                      hr_ref)
            y = y + Cs_ref[0][:, kf * N + n:kf * N + n + 1].astype(f32) \
                * hf_ref[...]
            if kr is not None:
                y = y + Cs_ref[0][:, kr * N + n:kr * N + n + 1] \
                    .astype(f32) * hr_ref[...]
    y_ref[0] = y.astype(out_dtype)


def _nk_scan_x_kernel_v2(H, W, G, K, N, R, kinds, out_dtype,
                         u_ref, rank_ref, Bs_ref, Cs_ref,
                         w_dt_ref, A_ref, Dsum_ref, bias_ref, lno_ref,
                         y_ref, ab_ref, bb_ref, hf_ref, hr_ref):
    """Rank-form variant of `_nk_scan_kernel_v2`: the Δ projections'
    SECOND stage (rank→D, the only K·D-wide tensor of the op) runs
    in-kernel from the (Lg, K·R) rank activations, and the out-norm
    LayerNorm is folded into the epilogue.  At the CSSF geometry
    (3B=192, L=49, D=1536, K=4) this removes the (B, L, K·D) dts HBM
    round-trip (~115 MB each way at bs64) plus XLA's separate dt-einsum
    and LN passes."""
    f32 = jnp.float32
    u = u_ref[0].astype(f32)                                    # (Lg, D)
    D = u.shape[1]
    y = u * Dsum_ref[...].astype(f32)

    dtus = []
    dts = []
    for k in range(K):
        z = jax.lax.dot(rank_ref[0][:, k * R:(k + 1) * R],
                        w_dt_ref[k * R:(k + 1) * R, :],
                        preferred_element_type=f32)
        dt = _softplus(z + bias_ref[k:k + 1, :].astype(f32))
        dts.append(dt)
        dtus.append(dt * u)

    pairs = nk_scan_v2_kind_pairs(kinds)
    for (kf, kr, fam) in pairs:
        for n in range(N):
            a_f = _exp(dts[kf] * A_ref[kf * N + n:kf * N + n + 1, :]
                          .astype(f32))
            b_f = dtus[kf] * Bs_ref[0][:, kf * N + n:kf * N + n + 1] \
                .astype(f32)
            if kr is not None:
                a_r = _exp(dts[kr] * A_ref[kr * N + n:kr * N + n + 1, :]
                              .astype(f32))
                b_r = dtus[kr] * Bs_ref[0][:, kr * N + n:kr * N + n + 1] \
                    .astype(f32)
            else:
                a_r = a_f
                b_r = jnp.zeros_like(b_f)
            ab_ref[...] = jnp.concatenate([a_f, a_r], axis=1)
            bb_ref[...] = jnp.concatenate([b_f, b_r], axis=1)
            if fam == "col":
                _serial_col_pair_cols(ab_ref, bb_ref, H, W, G, hf_ref,
                                      hr_ref)
            else:
                _serial_row_pair_cols(ab_ref, bb_ref, H, W, G, hf_ref,
                                      hr_ref)
            y = y + Cs_ref[0][:, kf * N + n:kf * N + n + 1].astype(f32) \
                * hf_ref[...]
            if kr is not None:
                y = y + Cs_ref[0][:, kr * N + n:kr * N + n + 1] \
                    .astype(f32) * hr_ref[...]
    yn = _layer_norm(y, lno_ref[0:1, :].astype(f32),
                     lno_ref[1:2, :].astype(f32), use_mxu=True)
    y_ref[0] = yn.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "kinds", "group",
                                              "interpret", "vmem_mb"))
def nk_scan_call_v2r(u, ranks, Bs, Cs, w_dt, A, Dvec, bias, lno, H, W,
                     kinds, group=8, interpret=False, vmem_mb=100):
    """Rank-form nk scan + folded out-norm.  u (B, L, D); ranks
    (B, L, K·R); Bs/Cs (B, L, K·N); w_dt (K·R, D) in u.dtype; A (K·N, D)
    rows in (k, n) order; Dvec (K, D); bias (K, D); lno (2, D) out-norm
    scale/bias.  Returns LN(y) (B, L, D) in u.dtype."""
    B, L, D = u.shape
    K = len(kinds)
    N = A.shape[0] // K
    R = w_dt.shape[0] // K
    G = group if (B % group == 0 and (L * group) % 8 == 0
                  and (W * group) % 8 == 0) else 1
    assert (L * G) % 8 == 0 and (W * G) % 8 == 0, (L, W, G)
    Lg = G * L
    Dsum = Dvec.astype(jnp.float32).sum(axis=0, keepdims=True)

    def inter(z):
        Bz, Lz, Cz = z.shape
        z = z.reshape(Bz // G, G, Lz, Cz)
        return jnp.swapaxes(z, 1, 2).reshape(Bz // G, Lz * G, Cz)

    kernel = functools.partial(_nk_scan_x_kernel_v2, H, W, G, K, N, R,
                               kinds, u.dtype)
    blk = lambda c: pl.BlockSpec((1, Lg, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(D), blk(K * R), blk(K * N), blk(K * N),
                  full, full, full, full, full],
        out_specs=blk(D),
        out_shape=jax.ShapeDtypeStruct((B // G, Lg, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((Lg, 2 * D), f32),
                        pltpu.VMEM((Lg, 2 * D), f32),
                        pltpu.VMEM((Lg, D), f32),
                        pltpu.VMEM((Lg, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(inter(u), inter(ranks), inter(Bs), inter(Cs),
      w_dt, A, Dsum, bias.astype(f32), lno.astype(f32))
    y = y.reshape(B // G, L, G, D)
    return jnp.swapaxes(y, 1, 2).reshape(B, L, D)


def nk_scan_v2_kind_pairs(kinds):
    """Group per-k traversals into (fwd_k, rev_k, family) chain pairs.
    cross2d: (row_f, row_r) + (col_f, col_r); unidi/flat: forward-only
    pairs with kr=None; bidi: (row_f, row_r) x2."""
    fwd = {"row_f": "row", "flat_f": "row", "col_f": "col"}
    rev = {"row_r": "row", "flat_r": "row", "col_r": "col"}
    unpaired_f = [(i, fwd[k]) for i, k in enumerate(kinds) if k in fwd]
    unpaired_r = [(i, rev[k]) for i, k in enumerate(kinds) if k in rev]
    pairs = []
    for (i, fam) in unpaired_f:
        match = next(((j, famr) for (j, famr) in unpaired_r if famr == fam),
                     None)
        if match is not None:
            unpaired_r.remove(match)
            pairs.append((i, match[0], fam))
        else:
            pairs.append((i, None, fam))
    if unpaired_r:
        raise ValueError(f"unpaired reverse traversals in {kinds}")
    return pairs


@functools.partial(jax.jit, static_argnames=("H", "W", "kinds", "group",
                                              "interpret", "vmem_mb"))
def nk_scan_call_v2(u, dts, Bs, Cs, A, Dvec, bias, H, W, kinds, group=8,
                    interpret=False, vmem_mb=100):
    """Serial-scan drop-in for `nk_scan_call` (same contract: u (B, L, D);
    dts (B, L, K*D); Bs/Cs (B, L, K*N); A (K*N, D) rows in (k, n) order;
    Dvec (K, D); bias (K, D); returns (B, L, D) in u.dtype)."""
    B, L, D = u.shape
    K = len(kinds)
    N = A.shape[0] // K
    G = group if (B % group == 0 and (L * group) % 8 == 0
                  and (W * group) % 8 == 0) else 1
    if (L * G) % 8 or (W * G) % 8:
        from xfmamba_tpu.ops.vss_block_pallas import nk_scan_call
        return nk_scan_call(u, dts, Bs, Cs, A, Dvec, bias, H, W, kinds,
                            group=group, interpret=interpret)
    from xfmamba_tpu.ops.ablations import nk_scan_v4 as _v4
    if _v4.FUSED_V4 and _v4.nk_scan_v4_supported(L, W, G, kinds):
        return _v4.nk_scan_call_v4(u, dts, Bs, Cs, A, Dvec, bias, H, W,
                                   kinds, group=G, interpret=interpret,
                                   vmem_mb=vmem_mb)
    from xfmamba_tpu.ops.ablations import nk_scan_wide as _w
    if FUSED_V3 and _w.nk_scan_v3_supported(L, W, D, K, N, G, kinds):
        return _w.nk_scan_call_v3(u, dts, Bs, Cs, A, Dvec, bias, H, W,
                                  kinds, group=G, interpret=interpret)
    Lg = G * L
    Dsum = Dvec.astype(jnp.float32).sum(axis=0, keepdims=True)

    def inter(z):
        Bz, Lz, Cz = z.shape
        z = z.reshape(Bz // G, G, Lz, Cz)
        return jnp.swapaxes(z, 1, 2).reshape(Bz // G, Lz * G, Cz)

    kernel = functools.partial(_nk_scan_kernel_v2, H, W, G, K, N, kinds,
                               u.dtype)
    blk = lambda c: pl.BlockSpec((1, Lg, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(D), blk(K * D), blk(K * N), blk(K * N),
                  full, full, full],
        out_specs=blk(D),
        out_shape=jax.ShapeDtypeStruct((B // G, Lg, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((Lg, 2 * D), f32),
                        pltpu.VMEM((Lg, 2 * D), f32),
                        pltpu.VMEM((Lg, D), f32),
                        pltpu.VMEM((Lg, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(inter(u), inter(dts), inter(Bs), inter(Cs), A, Dsum,
      bias.astype(jnp.float32))
    y = y.reshape(B // G, L, G, D)
    return jnp.swapaxes(y, 1, 2).reshape(B, L, D)


def nk_scan_from_projs_v2(x, dts, Bs, Cs, A, Dmat, bias,
                          scan_mode="cross2d", group=None, interpret=False):
    """Serial-scan drop-in for `nk_scan_from_projs` (same contract)."""
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
        group = next((g for g in (8, 4, 2) if B % g == 0
                      and (L * g) % 8 == 0 and (W * g) % 8 == 0), 1)
    u = x.reshape(B, L, D)
    A_p = jnp.swapaxes(A.astype(jnp.float32), 1, 2).reshape(K * N, D)
    y = nk_scan_call_v2(u, dts.reshape(B, L, K * D),
                        Bs.reshape(B, L, K * N), Cs.reshape(B, L, K * N),
                        A_p, Dmat, bias, H, W, kinds, group=group,
                        interpret=interpret)
    return y.astype(jnp.float32).reshape(B, H, W, D)
