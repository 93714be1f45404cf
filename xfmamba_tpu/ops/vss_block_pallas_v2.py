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
    applied with the stored prefix-product P.

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
    _gelu_exact, _layer_norm, _shift0, pack_vss_block_params)


def _interleave(x, G):
    """(B, L, d) image-major -> (B//G, L*G, d) position-major/g-fastest."""
    B, L, d = x.shape
    x = x.reshape(B // G, G, L, d)
    return jnp.swapaxes(x, 1, 2).reshape(B // G, L * G, d)


def _deinterleave(y, G, L):
    Bg, Lg, d = y.shape
    y = y.reshape(Bg, L, G, d)
    return jnp.swapaxes(y, 1, 2).reshape(Bg * G, L, d)


def _serial_row_pair(af, bf, ar, br, L, G, out_f, out_r):
    """Interleaved forward+reverse flat serial scans.

    af/bf/ar/br: (L*G, C) VMEM *refs* (dynamic sublane slicing needs refs).
    Writes the full state sequence h into out_f / out_r refs.
    """
    S = 8 // G            # time steps per (8, C) tile
    T = (L * G) // 8      # tiles
    C = af.shape[1]
    f32 = jnp.float32
    hf0 = jnp.zeros((G, C), f32)
    hr0 = jnp.zeros((G, C), f32)

    def body(i, carry):
        hf, hr = carry
        base_f = pl.multiple_of(i * 8, 8)
        base_r = pl.multiple_of((T - 1 - i) * 8, 8)
        a_f = af[pl.ds(base_f, 8), :]
        b_f = bf[pl.ds(base_f, 8), :]
        a_r = ar[pl.ds(base_r, 8), :]
        b_r = br[pl.ds(base_r, 8), :]
        outs_f = []
        outs_r = []
        for u in range(S):
            sf = slice(u * G, (u + 1) * G)
            sr = slice((S - 1 - u) * G, (S - u) * G)
            hf = a_f[sf] * hf + b_f[sf]
            hr = a_r[sr] * hr + b_r[sr]
            outs_f.append(hf)
            outs_r.insert(0, hr)
        out_f[pl.ds(base_f, 8), :] = (jnp.concatenate(outs_f, axis=0)
                                      if S > 1 else outs_f[0])
        out_r[pl.ds(base_r, 8), :] = (jnp.concatenate(outs_r, axis=0)
                                      if S > 1 else outs_r[0])
        return hf, hr

    jax.lax.fori_loop(0, T, body, (hf0, hr0))


def _serial_col_pair(af, bf, ar, br, H, W, G, out_f, pf_ref, out_r, pr_ref):
    """Per-column serial scans for both column directions (zero init), also
    storing the running prefix products P (needed to apply cross-column
    carries afterwards).  Slab = one image row = (W*G, C) rows."""
    WG = W * G
    C = af.shape[1]
    f32 = jnp.float32
    h_f0 = jnp.zeros((WG, C), f32)
    p_f0 = jnp.ones((WG, C), f32)
    h_r0 = jnp.zeros((WG, C), f32)
    p_r0 = jnp.ones((WG, C), f32)

    def body(h, carry):
        hf, pf, hr, pr = carry
        off_f = pl.multiple_of(h * WG, 8)
        off_r = pl.multiple_of((H - 1 - h) * WG, 8)
        a_f = af[pl.ds(off_f, WG), :]
        b_f = bf[pl.ds(off_f, WG), :]
        a_r = ar[pl.ds(off_r, WG), :]
        b_r = br[pl.ds(off_r, WG), :]
        hf = a_f * hf + b_f
        pf = a_f * pf
        hr = a_r * hr + b_r
        pr = a_r * pr
        out_f[pl.ds(off_f, WG), :] = hf
        pf_ref[pl.ds(off_f, WG), :] = pf
        out_r[pl.ds(off_r, WG), :] = hr
        pr_ref[pl.ds(off_r, WG), :] = pr
        return hf, pf, hr, pr

    jax.lax.fori_loop(0, H, body, (h_f0, p_f0, h_r0, p_r0))


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


def _vss_block_kernel_v2(H, W, R, G, conv_bias, fuse_mlp, mm_dtype,
                         out_dtype,
                         x_ref, ln1_ref, w_in_ref, w_conv_ref, b_conv_ref,
                         w_xp_ref, w_dt_ref, b_dt_ref, A_ref, Dsum_ref,
                         lno_ref, w_out_ref, ln2_ref,
                         w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
                         y_ref, hf_ref, hr_ref, pf_ref, pr_ref,
                         af_ref, bf_ref, ar_ref, br_ref):
    f32 = jnp.float32
    L = H * W
    Lg = L * G
    WG = W * G

    x = x_ref[0].astype(f32)                                    # (Lg, d)
    h1 = _layer_norm(x, ln1_ref[0:1, :].astype(f32),
                     ln1_ref[1:2, :].astype(f32), use_mxu=True)
    xin = jax.lax.dot(h1.astype(mm_dtype), w_in_ref[...],
                      preferred_element_type=f32)               # (Lg, di)

    # ---- depthwise 3x3 SAME conv, horizontal-taps-first decomposition.
    # l = r // G; shifts move whole positions (multiples of G sublanes) so
    # images never mix; edge masks kill cross-row/image wraps.
    row_r = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0)
    lpos = row_r // G                                           # (Lg, 1)
    wmod = lpos % W
    sh_l = jnp.where(wmod >= 1, _shift0(xin, G, False, False), 0.0)
    sh_r = jnp.where(wmod <= W - 2, _shift0(xin, G, True, False), 0.0)
    w_c = w_conv_ref[...].astype(f32)
    hrow = []
    for i in range(3):
        hrow.append(sh_l * w_c[3 * i + 0:3 * i + 1, :]
                    + xin * w_c[3 * i + 1:3 * i + 2, :]
                    + sh_r * w_c[3 * i + 2:3 * i + 3, :])
    acc = hrow[1]
    acc = acc + jnp.where(lpos >= W, _shift0(hrow[0], WG, False, False), 0.0)
    acc = acc + jnp.where(lpos <= L - W - 1,
                          _shift0(hrow[2], WG, True, False), 0.0)
    if conv_bias:
        acc = acc + b_conv_ref[...].astype(f32)
    u = acc * jax.nn.sigmoid(acc)                               # SiLU

    u_mm = u.astype(mm_dtype)
    xdbl = jax.lax.dot(u_mm, w_xp_ref[...],
                       preferred_element_type=f32)              # (Lg, 4R+8)
    xdbl_mm = xdbl.astype(mm_dtype)

    def dir_ab(k):
        rank_k = xdbl_mm[:, k * R:(k + 1) * R]
        dt = jax.lax.dot(rank_k, w_dt_ref[k * R:(k + 1) * R, :],
                         preferred_element_type=f32)
        dt = jax.nn.softplus(dt + b_dt_ref[k:k + 1, :].astype(f32))
        Bk = xdbl[:, 4 * R + 2 * k:4 * R + 2 * k + 1]
        a = jnp.exp(dt * A_ref[k:k + 1, :].astype(f32))
        b = dt * u * Bk
        return a, b

    def Ck(k):
        return xdbl[:, 4 * R + 2 * k + 1:4 * R + 2 * k + 2]

    y_acc = u * Dsum_ref[...].astype(f32)

    # ---- row directions (k=0 forward, k=2 reverse): flat serial chains
    a_f, b_f = dir_ab(0)
    a_r, b_r = dir_ab(2)
    af_ref[...], bf_ref[...] = a_f, b_f
    ar_ref[...], br_ref[...] = a_r, b_r
    _serial_row_pair(af_ref, bf_ref, ar_ref, br_ref, L, G, hf_ref, hr_ref)
    y_acc = y_acc + Ck(0) * hf_ref[...] + Ck(2) * hr_ref[...]

    # ---- column directions (k=1 forward, k=3 reverse): slab serial scans
    # + cross-column carry chain
    a_f, b_f = dir_ab(1)
    a_r, b_r = dir_ab(3)
    af_ref[...], bf_ref[...] = a_f, b_f
    ar_ref[...], br_ref[...] = a_r, b_r
    _serial_col_pair(af_ref, bf_ref, ar_ref, br_ref, H, W, G, hf_ref,
                     pf_ref, hr_ref, pr_ref)
    widx = jax.lax.broadcasted_iota(jnp.int32, (WG, 1), 0) // G
    # forward: exits at the bottom slab (h = H-1)
    A_cf = pf_ref[pl.ds((H - 1) * WG, WG), :]
    B_cf = hf_ref[pl.ds((H - 1) * WG, WG), :]
    c_f = _chain_cols(A_cf, B_cf, W, G, widx, False)            # (WG, C)
    # reverse: exits at the top slab (h = 0)
    A_cr = pr_ref[pl.ds(0, WG), :]
    B_cr = hr_ref[pl.ds(0, WG), :]
    c_r = _chain_cols(A_cr, B_cr, W, G, widx, True)
    cb_f = jnp.broadcast_to(c_f[None], (H, WG, a_f.shape[1])) \
        .reshape(Lg, a_f.shape[1])
    cb_r = jnp.broadcast_to(c_r[None], (H, WG, a_f.shape[1])) \
        .reshape(Lg, a_f.shape[1])
    y_acc = y_acc + Ck(1) * (hf_ref[...] + pf_ref[...] * cb_f)
    y_acc = y_acc + Ck(3) * (hr_ref[...] + pr_ref[...] * cb_r)

    y = _layer_norm(y_acc, lno_ref[0:1, :].astype(f32),
                    lno_ref[1:2, :].astype(f32), use_mxu=True)
    out = jax.lax.dot(y.astype(mm_dtype), w_out_ref[...],
                      preferred_element_type=f32)               # (Lg, d)
    res = x + out

    if fuse_mlp:
        h2 = _layer_norm(res, ln2_ref[0:1, :].astype(f32),
                         ln2_ref[1:2, :].astype(f32), use_mxu=True)
        f1 = jax.lax.dot(h2.astype(mm_dtype), w_fc1_ref[...],
                         preferred_element_type=f32)
        f1 = _gelu_exact(f1 + b_fc1_ref[...].astype(f32))
        f2 = jax.lax.dot(f1.astype(mm_dtype), w_fc2_ref[...],
                         preferred_element_type=f32)
        res = res + f2 + b_fc2_ref[...].astype(f32)

    y_ref[0] = res.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "conv_bias",
                                              "fuse_mlp", "interpret",
                                              "vmem_mb", "group",
                                              "interleaved"))
def _vss_block_call_v2(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A,
                       Dsum, lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2,
                       H, W, conv_bias, fuse_mlp, interpret=False,
                       vmem_mb=100, group=8, interleaved=False):
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
    kernel = functools.partial(
        _vss_block_kernel_v2, H, W, R, G, conv_bias, fuse_mlp, mm_dtype,
        x.dtype)
    blk_x = pl.BlockSpec((1, L * G, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk_x] + [full] * 16,
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((B // G, L * G, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((L * G, di), f32) for _ in range(8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
      lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2)
    if not interleaved:
        y = _deinterleave(y, G, L).reshape(B, L, d)
    return y


def vss_block_fused_v2(x, p, H, W, conv_bias, fuse_mlp, group=8):
    """Convenience wrapper mirroring `vss_block_fused` (inference only)."""
    args = pack_vss_block_params(p, x.dtype, fuse_mlp)
    return _vss_block_call_v2(x, *args, H=H, W=W, conv_bias=conv_bias,
                              fuse_mlp=fuse_mlp, group=group)
