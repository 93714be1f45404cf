"""Block-level adjoint megakernel for the v2 VSSBlock forward.

One Pallas kernel computes the ENTIRE backward of a VSSBlock (the
counterpart of the reference's `selective_scan_bwd_kernel.cuh` — but at
whole-block granularity): it recomputes the forward in VMEM (serial scans,
cheap under the v2 design), runs the adjoint scan recurrences

    g[t] = dh[t] + a[t+1] * g[t+1]

as reverse serial chains, and accumulates every weight gradient on the MXU
(X^T @ dY contractions / ones-row reductions), summing across grid steps in
revisited output blocks.  Layout and alignment rules match
`vss_block_pallas_v2` (g-interleaved, G in {1,2,4,8}, 8 | L*G, 8 | W*G).

Gradient-parity oracle: `jax.vjp` through `vss_block_pallas.vss_block_ref`
(tests/test_vss_block_v2_grad.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops import fast_math as _fm
from xfmamba_tpu.ops.vss_block_pallas import (
    _erf_approx, _gelu_exact, _shift0, _softplus)
from xfmamba_tpu.ops import vss_block_pallas as _vbp
from xfmamba_tpu.ops.vss_block_pallas_v2 import (
    _chain_cols, _serial_col_pair, _serial_row_pair)


def _ln_fwd_cache(x, scale, bias):
    """LayerNorm forward returning (y, xhat, rstd) for the backward."""
    n = x.shape[1]
    ones = jnp.ones((n, 1), jnp.float32)
    mu = jax.lax.dot(x, ones, preferred_element_type=jnp.float32) / n
    xc = x - mu
    var = jax.lax.dot(xc * xc, ones, preferred_element_type=jnp.float32) / n
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = xc * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(g, xhat, rstd, scale):
    """dx for y = xhat*scale + bias; also returns (dscale, dbias) as
    (1, C) rows (summed over positions)."""
    n = g.shape[1]
    ones = jnp.ones((n, 1), jnp.float32)
    gg = g * scale
    m1 = jax.lax.dot(gg, ones, preferred_element_type=jnp.float32) / n
    m2 = jax.lax.dot(gg * xhat, ones,
                     preferred_element_type=jnp.float32) / n
    dx = (gg - m1 - xhat * m2) * rstd
    rows = g.shape[0]
    onesr = jnp.ones((1, rows), jnp.float32)
    dscale = jax.lax.dot(onesr, g * xhat, preferred_element_type=jnp.float32)
    dbias = jax.lax.dot(onesr, g, preferred_element_type=jnp.float32)
    return dx, dscale, dbias


def _colsum(x):
    """(rows, C) -> (1, C) via an MXU ones-row dot."""
    onesr = jnp.ones((1, x.shape[0]), jnp.float32)
    return jax.lax.dot(onesr, x, preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a^T @ b with f32 accumulation: (rows, M)^T x (rows, N) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gelu_grad(z):
    """d/dz of the fwd kernel's GELU (branches on `GELU_TANH` so fwd and
    bwd always use the same nonlinearity)."""
    if _vbp.GELU_TANH:
        # gelu(z) = 0.5 z (1 + t), t = tanh(u), u = c1 z + c2 z^3
        c1, c2 = 0.7978845608028654, 0.03567740814059205
        t = 1.0 - 2.0 / (jnp.exp(2.0 * (z * (c1 + c2 * (z * z)))) + 1.0)
        du = c1 + 3.0 * c2 * (z * z)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du
    inv_sqrt2 = 2.0 ** -0.5
    cdf = 0.5 * (1.0 + _erf_approx(z * inv_sqrt2))
    pdf = jnp.exp(-0.5 * z * z) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    return cdf + z * pdf


def _succ_flat(x, G, Lg):
    """x[t+1] in flat traversal order (zero past the end): shift UP."""
    return _shift0(x, G, True, False)


def _pred_flat(x, G):
    """x[t-1] in flat order (zero before start): shift DOWN."""
    return _shift0(x, G, False, False)


def _succ_col(x, H, W, G, lpos):
    """x at the col-major successor position (zero past the very end).

    (h, w) -> (h+1, w) for h < H-1 (shift up by W*G rows);
    (H-1, w) -> (0, w+1)  (shift down by ((H-1)*W - 1)*G rows)."""
    WG = W * G
    up = _shift0(x, WG, True, False)
    dn = _shift0(x, ((H - 1) * W - 1) * G, False, False)
    hpos = lpos // W
    wpos = lpos % W
    # at h=H-1 use the cross-column value; the (H-1, W-1) entry must be 0
    cross = jnp.where(wpos <= W - 2, dn, 0.0)
    return jnp.where(hpos <= H - 2, up, cross)


def _pred_col(x, H, W, G, lpos):
    """x at the col-major predecessor (zero before the very start)."""
    WG = W * G
    dn = _shift0(x, WG, False, False)
    up = _shift0(x, ((H - 1) * W - 1) * G, True, False)
    hpos = lpos // W
    wpos = lpos % W
    cross = jnp.where(wpos >= 1, up, 0.0)
    return jnp.where(hpos >= 1, dn, cross)


def _vss_block_bwd_kernel(H, W, R, G, conv_bias, fuse_mlp, mm_dtype,
                          x_ref, ln1_ref, w_in_ref, w_conv_ref, b_conv_ref,
                          w_xp_ref, w_dt_ref, b_dt_ref, A_ref, Dsum_ref,
                          lno_ref, w_out_ref, ln2_ref,
                          w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
                          m1_ref, m2_ref, g_ref,
                          # outputs
                          dx_ref, dln1_ref, dw_in_ref, dw_conv_ref,
                          db_conv_ref, dw_xp_ref, dw_dt_ref, db_dt_ref,
                          dA_ref, dD_ref, dlno_ref, dw_out_ref, dln2_ref,
                          dw_fc1_ref, db_fc1_ref, dw_fc2_ref, db_fc2_ref,
                          # scratch
                          hf_ref, hr_ref, af_ref, bf_ref, ar_ref, br_ref,
                          gf_ref, gr_ref):
    f32 = jnp.float32
    L = H * W
    Lg = L * G
    WG = W * G
    first = pl.program_id(0) == 0

    # ================= forward recompute (matches the v2 fwd kernel)
    x = x_ref[0].astype(f32)
    h1, xhat1, rstd1 = _ln_fwd_cache(x, ln1_ref[0:1, :].astype(f32),
                                     ln1_ref[1:2, :].astype(f32))
    w_in = w_in_ref[...]
    xin = jax.lax.dot(h1.astype(mm_dtype), w_in, preferred_element_type=f32)

    row_r = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0)
    lpos = row_r // G
    wmod = lpos % W
    sh_l = jnp.where(wmod >= 1, _shift0(xin, G, False, False), 0.0)
    sh_r = jnp.where(wmod <= W - 2, _shift0(xin, G, True, False), 0.0)
    w_c = w_conv_ref[...].astype(f32)
    hrow = [sh_l * w_c[3 * i + 0:3 * i + 1, :]
            + xin * w_c[3 * i + 1:3 * i + 2, :]
            + sh_r * w_c[3 * i + 2:3 * i + 3, :] for i in range(3)]
    acc = hrow[1]
    acc = acc + jnp.where(lpos >= W, _shift0(hrow[0], WG, False, False), 0.0)
    acc = acc + jnp.where(lpos <= L - W - 1,
                          _shift0(hrow[2], WG, True, False), 0.0)
    if conv_bias:
        acc = acc + b_conv_ref[...].astype(f32)
    u = acc * jax.nn.sigmoid(acc)
    sh_l = sh_r = hrow = None   # free the conv temps (recomputed in bwd)

    u_mm = u.astype(mm_dtype)
    xdbl = jax.lax.dot(u_mm, w_xp_ref[...], preferred_element_type=f32)
    xdbl_mm = xdbl.astype(mm_dtype)

    def dir_parts(k):
        rank_k = xdbl_mm[:, k * R:(k + 1) * R]
        z = jax.lax.dot(rank_k, w_dt_ref[k * R:(k + 1) * R, :],
                        preferred_element_type=f32) \
            + b_dt_ref[k:k + 1, :].astype(f32)
        dt = _softplus(z)
        Bk = xdbl[:, 4 * R + 2 * k:4 * R + 2 * k + 1]
        Ak = A_ref[k:k + 1, :].astype(f32)
        a = _fm.exp(dt * Ak)
        b = dt * u * Bk
        return z, dt, Bk, Ak, a, b

    def Ck(k):
        return xdbl[:, 4 * R + 2 * k + 1:4 * R + 2 * k + 2]

    # row scans (k=0 fwd, k=2 rev) -> h0 in hf, h2 in hr
    _, _, _, _, a0, b0 = dir_parts(0)
    _, _, _, _, a2, b2 = dir_parts(2)
    af_ref[...], bf_ref[...] = a0, b0
    ar_ref[...], br_ref[...] = a2, b2
    _serial_row_pair(af_ref, bf_ref, ar_ref, br_ref, L, G, hf_ref, hr_ref)
    # col scans (k=1 fwd, k=3 rev) -> h1 in gf, h3 in gr
    _, _, _, _, a1, b1 = dir_parts(1)
    _, _, _, _, a3, b3 = dir_parts(3)
    af_ref[...], bf_ref[...] = a1, b1
    ar_ref[...], br_ref[...] = a3, b3
    _serial_col_pair(af_ref, bf_ref, ar_ref, br_ref, H, W, G, gf_ref,
                     gr_ref)

    Dsum = Dsum_ref[...].astype(f32)
    y_acc = u * Dsum + Ck(0) * hf_ref[...] + Ck(2) * hr_ref[...] \
        + Ck(1) * gf_ref[...] + Ck(3) * gr_ref[...]
    yn, xhato, rstdo = _ln_fwd_cache(y_acc, lno_ref[0:1, :].astype(f32),
                                     lno_ref[1:2, :].astype(f32))
    out = jax.lax.dot(yn.astype(mm_dtype), w_out_ref[...],
                      preferred_element_type=f32)
    m1 = m1_ref[0][:, 0:1].astype(f32)
    res = x + m1 * out

    # ================= backward
    g = g_ref[0].astype(f32)
    dres = g
    if fuse_mlp:
        h2n, xhat2, rstd2 = _ln_fwd_cache(res, ln2_ref[0:1, :].astype(f32),
                                          ln2_ref[1:2, :].astype(f32))
        zf1 = jax.lax.dot(h2n.astype(mm_dtype), w_fc1_ref[...],
                          preferred_element_type=f32) \
            + b_fc1_ref[...].astype(f32)
        f1 = _gelu_exact(zf1)
        m2 = m2_ref[0][:, 0:1].astype(f32)
        df2 = g * m2
        db_fc2 = _colsum(df2)
        dw_fc2 = _mm_t(f1.astype(mm_dtype), df2.astype(mm_dtype))
        df1 = jax.lax.dot(df2.astype(mm_dtype),
                          jnp.swapaxes(w_fc2_ref[...], 0, 1),
                          preferred_element_type=f32) * _gelu_grad(zf1)
        db_fc1 = _colsum(df1)
        dw_fc1 = _mm_t(h2n.astype(mm_dtype), df1.astype(mm_dtype))
        dh2 = jax.lax.dot(df1.astype(mm_dtype),
                          jnp.swapaxes(w_fc1_ref[...], 0, 1),
                          preferred_element_type=f32)
        dres_ln2, dsc2, dbi2 = _ln_bwd(dh2, xhat2, rstd2,
                                       ln2_ref[0:1, :].astype(f32))
        dres = dres + dres_ln2
        dln2 = jnp.concatenate([dsc2, dbi2], axis=0)
    else:
        dln2 = jnp.zeros(dln2_ref.shape, f32)
        dw_fc1 = jnp.zeros(dw_fc1_ref.shape, f32)
        db_fc1 = jnp.zeros(db_fc1_ref.shape, f32)
        dw_fc2 = jnp.zeros(dw_fc2_ref.shape, f32)
        db_fc2 = jnp.zeros(db_fc2_ref.shape, f32)

    dx = dres
    dout = dres * m1
    dw_out = _mm_t(yn.astype(mm_dtype), dout.astype(mm_dtype))
    dyn = jax.lax.dot(dout.astype(mm_dtype),
                      jnp.swapaxes(w_out_ref[...], 0, 1),
                      preferred_element_type=f32)
    dy, dsco, dbio = _ln_bwd(dyn, xhato, rstdo, lno_ref[0:1, :].astype(f32))
    dlno = jnp.concatenate([dsco, dbio], axis=0)

    du = dy * Dsum
    dD_total = _colsum(dy * u)      # same row for every k (Dsum packing)
    onescol = jnp.ones((u.shape[1], 1), f32)

    dranks = [None] * 4
    dBC = [None] * 8
    dA_rows = [None] * 4
    db_dt_rows = [None] * 4
    dw_dt_blocks = [None] * 4

    def finish_dir(k, gk, h_prev, z, dt, Bk, Ak, a, hk):
        nonlocal du
        da = gk * h_prev
        db = gk
        ddt = db * u * Bk + da * a * Ak
        du_k = db * dt * Bk
        dB_col = jax.lax.dot(db * dt * u, onescol,
                             preferred_element_type=f32)
        dC_col = jax.lax.dot(dy * hk, onescol, preferred_element_type=f32)
        dA_rows[k] = _colsum(da * a * dt)
        dz = ddt * jax.nn.sigmoid(z)
        db_dt_rows[k] = _colsum(dz)
        dranks[k] = jax.lax.dot(
            dz.astype(mm_dtype),
            jnp.swapaxes(w_dt_ref[k * R:(k + 1) * R, :], 0, 1),
            preferred_element_type=f32)
        dw_dt_blocks[k] = _mm_t(xdbl_mm[:, k * R:(k + 1) * R],
                                dz.astype(mm_dtype))
        dBC[2 * k] = dB_col
        dBC[2 * k + 1] = dC_col
        du = du + du_k

    # ---- column adjoints first (consume gf/gr, then reuse them as outputs)
    z1, dt1, B1, A1, a1, _ = dir_parts(1)
    z3, dt3, B3, A3, a3, _ = dir_parts(3)
    h1s = gf_ref[...]
    h3 = gr_ref[...]
    h_prev1 = _pred_col(h1s, H, W, G, lpos)
    h_prev3 = _succ_col(h3, H, W, G, lpos)
    # adjoint of col_f (k=1): reverse col chain with a(t+1); adjoint of
    # col_r (k=3): forward col chain with a(t-1)
    af_ref[...] = _pred_col(a3, H, W, G, lpos)
    bf_ref[...] = dy * Ck(3)
    ar_ref[...] = _succ_col(a1, H, W, G, lpos)
    br_ref[...] = dy * Ck(1)
    _serial_col_pair(af_ref, bf_ref, ar_ref, br_ref, H, W, G, gf_ref,
                     gr_ref)
    finish_dir(3, gf_ref[...], h_prev3, z3, dt3, B3, A3, a3, h3)
    finish_dir(1, gr_ref[...], h_prev1, z1, dt1, B1, A1, a1, h1s)

    # ---- row adjoints (consume hf/hr, reuse as outputs)
    z0, dt0, B0, A0, a0, _ = dir_parts(0)
    z2, dt2, B2, A2k, a2, _ = dir_parts(2)
    h0 = hf_ref[...]
    h2s = hr_ref[...]
    h_prev0 = _pred_flat(h0, G)
    h_prev2 = _succ_flat(h2s, G, Lg)
    af_ref[...] = _pred_flat(a2, G)
    bf_ref[...] = dy * Ck(2)
    ar_ref[...] = _succ_flat(a0, G, Lg)
    br_ref[...] = dy * Ck(0)
    _serial_row_pair(af_ref, bf_ref, ar_ref, br_ref, L, G, hf_ref, hr_ref)
    finish_dir(2, hf_ref[...], h_prev2, z2, dt2, B2, A2k, a2, h2s)
    finish_dir(0, hr_ref[...], h_prev0, z0, dt0, B0, A0, a0, h0)

    dxdbl = jnp.concatenate(dranks + dBC, axis=1)       # (Lg, 4R+8)
    dw_xp = _mm_t(u_mm, dxdbl.astype(mm_dtype))
    du = du + jax.lax.dot(dxdbl.astype(mm_dtype),
                          jnp.swapaxes(w_xp_ref[...], 0, 1),
                          preferred_element_type=f32)

    # silu backward (sigmoid recomputed: cheaper than retaining it)
    sig = jax.nn.sigmoid(acc)
    dacc = du * (sig * (1.0 + acc * (1.0 - sig)))
    if conv_bias:
        db_conv = _colsum(dacc)
    else:
        db_conv = jnp.zeros(db_conv_ref.shape, f32)

    # conv backward (adjoints of the vertical shifts carry no masks: the
    # forward masks are implied by the zero-filled shifts)
    dacc0 = _shift0(dacc, WG, True, False)
    dacc2 = _shift0(dacc, WG, False, False)
    dxin = jnp.zeros_like(xin)
    dw_conv_rows = []
    sh_l2 = jnp.where(wmod >= 1, _shift0(xin, G, False, False), 0.0)
    sh_r2 = jnp.where(wmod <= W - 2, _shift0(xin, G, True, False), 0.0)
    srcs = [sh_l2, xin, sh_r2]
    for i, dacc_i in enumerate([dacc0, dacc, dacc2]):
        d_l = jnp.where(wmod <= W - 2, _shift0(dacc_i, G, True, False), 0.0)
        d_r = jnp.where(wmod >= 1, _shift0(dacc_i, G, False, False), 0.0)
        dxin = dxin + d_l * w_c[3 * i + 0:3 * i + 1, :] \
            + dacc_i * w_c[3 * i + 1:3 * i + 2, :] \
            + d_r * w_c[3 * i + 2:3 * i + 3, :]
        for src in srcs:
            dw_conv_rows.append(_colsum(src * dacc_i))
    dw_conv = jnp.concatenate(dw_conv_rows, axis=0)     # (9, di)

    dw_in = _mm_t(h1.astype(mm_dtype), dxin.astype(mm_dtype))
    dh1 = jax.lax.dot(dxin.astype(mm_dtype),
                      jnp.swapaxes(w_in, 0, 1), preferred_element_type=f32)
    dx_ln1, dsc1, dbi1 = _ln_bwd(dh1, xhat1, rstd1,
                                 ln1_ref[0:1, :].astype(f32))
    dx = dx + dx_ln1
    dln1 = jnp.concatenate([dsc1, dbi1], axis=0)

    dA_full = jnp.concatenate(dA_rows, axis=0)          # (4, di)
    db_dt_full = jnp.concatenate(db_dt_rows, axis=0)    # (4, di)
    dw_dt_full = jnp.concatenate(dw_dt_blocks, axis=0)  # (4R, di)

    dx_ref[0] = dx.astype(dx_ref.dtype)

    def accum(ref, val):
        @pl.when(first)
        def _init():
            ref[...] = val.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _acc():
            ref[...] = ref[...] + val.astype(ref.dtype)

    accum(dln1_ref, dln1)
    accum(dw_in_ref, dw_in)
    accum(dw_conv_ref, dw_conv)
    accum(db_conv_ref, db_conv)
    accum(dw_xp_ref, dw_xp)
    accum(dw_dt_ref, dw_dt_full)
    accum(db_dt_ref, db_dt_full)
    accum(dA_ref, dA_full)
    accum(dD_ref, dD_total)
    accum(dlno_ref, dlno)
    accum(dw_out_ref, dw_out)
    accum(dln2_ref, dln2)
    accum(dw_fc1_ref, dw_fc1)
    accum(db_fc1_ref, db_fc1)
    accum(dw_fc2_ref, dw_fc2)
    accum(db_fc2_ref, db_fc2)


@functools.partial(jax.jit, static_argnames=("H", "W", "conv_bias",
                                              "fuse_mlp", "interpret",
                                              "vmem_mb", "group"))
def vss_block_bwd_call(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A,
                       Dsum, lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2,
                       m1, m2, g,
                       H, W, conv_bias, fuse_mlp, interpret=False,
                       vmem_mb=None, group=8):
    """Backward of the v2 block.  x, g: (B, L, d); m1/m2: (B, L, 1)
    drop-path keep/scale masks (ones when not training with droppath).
    Returns (dx, d<each packed param operand>).

    ``vmem_mb=None`` sizes the Mosaic VMEM limit to the kernel's actual
    footprint instead of pinning 127: declaring the loose bound makes the
    scheduler measurably slower (r4 probe_stage0_adjoint: stage-2 adjoint
    0.83 -> 0.60 ms at 100 MB, stage-0 5.25 -> 4.85 at 118)."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import (_deinterleave,
                                                     _interleave)
    B, L, d = x.shape
    G = group if B % group == 0 else 1
    assert G in (1, 2, 4, 8) and (L * G) % 8 == 0 and (W * G) % 8 == 0
    R = w_dt.shape[0] // 4
    di = w_in.shape[1]
    mm_dtype = w_in.dtype
    if vmem_mb is None:
        # footprint estimate + margin, floored at the tested 100 MB
        # (stage-0's 111 MB estimate needs 118: 100 fails to compile).
        # The margin grows ~8% with the estimate: est+7 had zero measured
        # headroom at stage-0 (real footprint in (100, 118]) and a small
        # compiler shift would turn that into a Mosaic failure; the
        # tight-vs-loose perf cliff is 127-vs-tight, so a couple extra MB
        # keep the r4 probe win.  test_tpu_onchip.py compile-smokes every
        # production geometry against this sizing.
        est_mb = bwd_vmem_estimate(L, d, di, G) // (1024 * 1024)
        margin = max(7, (est_mb * 2 + 12) // 25)
        vmem_mb = min(127, max(100, est_mb + margin))
    xi = _interleave(x, G)
    gi = _interleave(g.astype(x.dtype), G)
    m1i = _interleave(m1.astype(jnp.float32), G)
    m2i = _interleave(m2.astype(jnp.float32), G)
    kernel = functools.partial(
        _vss_block_bwd_kernel, H, W, R, G, conv_bias, fuse_mlp, mm_dtype)
    blk = lambda c: pl.BlockSpec((1, L * G, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    acc_spec = lambda shape: (
        pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct(shape, f32))
    out_specs = [blk(d)]
    out_shapes = [jax.ShapeDtypeStruct((B // G, L * G, d), f32)]
    for shape in [(2, d), (d, di), (9, di), (1, di), (di, 4 * R + 8),
                  (4 * R, di), (4, di), (4, di), (1, di), (2, di),
                  (di, d), (2, d),
                  (d, w_fc1.shape[1]), (1, w_fc1.shape[1]),
                  (w_fc2.shape[0], d), (1, d)]:
        spec, shp = acc_spec(shape)
        out_specs.append(spec)
        out_shapes.append(shp)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(d)] + [full] * 16 + [blk(1), blk(1), blk(d)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((L * G, di), f32) for _ in range(8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xi, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
      lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2, m1i, m2i, gi)
    dx = _deinterleave(outs[0], G, L).reshape(B, L, d)
    return (dx,) + tuple(outs[1:])


# ---------------------------------------------------------------------
# custom-vjp training op (packed-operand level: `pack_vss_block_params`
# stays outside, so autodiff chains the packing transforms itself)
# ---------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def vss_block_train_v2(H, W, conv_bias, fuse_mlp, group,
                       x, m1, m2,
                       ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A,
                       Dsum, lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2):
    """Training forward of one VSSBlock via the v2 megakernel with
    drop-path keep masks m1/m2 (B, L, 1); backward runs the block-level
    adjoint kernel (`vss_block_bwd_call`)."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import _vss_block_call_v2
    return _vss_block_call_v2(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt,
                              b_dt, A, Dsum, lno, w_out, ln2, w_fc1, b_fc1,
                              w_fc2, b_fc2, H=H, W=W, conv_bias=conv_bias,
                              fuse_mlp=fuse_mlp, group=group, m1=m1, m2=m2)


def _train_v2_fwd(H, W, conv_bias, fuse_mlp, group, x, m1, m2, *packed):
    y = vss_block_train_v2(H, W, conv_bias, fuse_mlp, group, x, m1, m2,
                           *packed)
    return y, (x, m1, m2) + tuple(packed)


def _train_v2_bwd(H, W, conv_bias, fuse_mlp, group, res, g):
    x, m1, m2 = res[:3]
    packed = res[3:]
    outs = vss_block_bwd_call(x, *packed, m1, m2, g,
                              H=H, W=W, conv_bias=conv_bias,
                              fuse_mlp=fuse_mlp, group=group)
    dx = outs[0].astype(x.dtype)
    dpacked = tuple(dp.astype(p.dtype) for dp, p in zip(outs[1:], packed))
    return (dx, jnp.zeros_like(m1), jnp.zeros_like(m2)) + dpacked


vss_block_train_v2.defvjp(_train_v2_fwd, _train_v2_bwd)


_BWD_VMEM_BUDGET = 127 * 1024 * 1024


def bwd_vmem_estimate(L, d, di, G):
    """Peak VMEM of the adjoint kernel: 8 f32 (L*G, di) scratch arrays plus
    ~12 live (L*G, di) f32 values across the recompute/adjoint phases, and
    the (L*G, d) x/dx/dres buffers.  The 1.62x factor calibrates the
    analytic count to Mosaic's measured stack allocation (116.93 MB at
    stage-0 geometry L=3136, d=96, di=192, G=1 vs 72.2 MB analytic)."""

    def pad128(n):
        return ((n + 127) // 128) * 128

    Lg = L * G
    analytic = (20 * Lg * pad128(di) * 4 + 5 * Lg * pad128(d) * 4
                + 2 * (d * di * 2))
    return int(1.62 * analytic)


def fused_train_supported(L, d, di, G, budget_bytes=_BWD_VMEM_BUDGET):
    return bwd_vmem_estimate(L, d, di, G) < budget_bytes


def pick_train_group(B, H, W, d, di):
    """Largest aligned interleave group whose FORWARD (v2 megakernel) and
    BACKWARD (adjoint kernel) both fit their VMEM budgets; None if none.

    The adjoint budget binds tighter than the forward's — r4 bug: at bs16
    stage-1 the forward picked G=4, only G=2 fits the adjoint, and the
    whole block silently fell back to composable autodiff (5.2 vs ~1.5
    ms/block).  Single source of truth for the train path (`models/vssm.py
    _fused_train_path`) and the on-chip compile smoke test."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import pick_group_v2
    g2 = pick_group_v2(B, H, W, d, di, 8, fuse_mlp=False)
    if g2 is None:
        return None
    L = H * W
    while g2 >= 1 and not (B % g2 == 0 and (L * g2) % 8 == 0
                           and (W * g2) % 8 == 0
                           and fused_train_supported(L, d, di, g2)):
        g2 //= 2
    return g2 if g2 >= 1 else None
