"""Whole-VSSBlock megakernel for the v05_noz / d_state=1 backbone hot path.

One Pallas kernel executes an ENTIRE VSSBlock (`vmamba.py:1955-2042` in the
reference: prenorm LN -> SS2D(in_proj -> dwconv3x3 -> SiLU -> 4-direction
selective scan -> out-LN) -> out_proj -> residual -> LN -> MLP -> residual)
per batch element, with the full (L, C) feature map resident in VMEM.  This
removes every HBM round-trip between the block's ~12 ops (the LN/residual
chains are pure memory traffic under XLA) and overlaps the MXU (projections,
MLP) with the VPU (scan stages) inside the Mosaic pipeline.

Scans use a two-level scheme in the *row-major* layout — no transposed data
copies anywhere (the fused 4-direction kernel in `selective_scan_pallas.py`
still needs a column-major copy of x):

  * row-major directions: level 1 = masked Hillis-Steele shifts confined to
    image rows (log2(W) stages); level 2 = pair-scan of the H row-states
    (extracted/broadcast via one-hot MXU matmuls).
  * column-major directions: level 1 = stride-W sublane shifts (log2(H)
    stages, columns never interleave so no masks); level 2 = pair-scan of
    the W column-states (contiguous slice, one-hot broadcast back).

This is also work-efficient: log2(W)+log2(H) = log2(L) stages split so that
only the level-1 half runs on the full (L, C) array.

Semantics match `VSSBlock` with forward_type="v05_noz", d_state=1, cross2d,
silu act, LN out-norm, gelu MLP (the configuration of every shipped XFMamba
backbone, `fusion_vmamba.py:1653-1663`).  fp32 scan state / LN statistics,
bf16 matmuls — the same mixed-precision contract as the reference CUDA path
(`selective_scan.cpp:16-28`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops import fast_math as _fm

# global kill switch for every fused inference path (megakernel + nk scan);
# lets tests/debugging A/B the composable implementations on TPU
FUSED_INFERENCE = True


# ---------------------------------------------------------------------
# in-kernel scan helpers (all pure functions of VMEM-resident values)
# ---------------------------------------------------------------------

def _pair_hs(a, b, length, reverse):
    """Plain Hillis-Steele inclusive pair-scan along axis 0 (small arrays)."""
    off = 1
    while off < length:
        if reverse:
            a_sh = jnp.concatenate(
                [a[off:], jnp.ones((off, a.shape[1]), a.dtype)], axis=0)
            b_sh = jnp.concatenate(
                [b[off:], jnp.zeros((off, b.shape[1]), b.dtype)], axis=0)
        else:
            a_sh = jnp.concatenate(
                [jnp.ones((off, a.shape[1]), a.dtype), a[:-off]], axis=0)
            b_sh = jnp.concatenate(
                [jnp.zeros((off, b.shape[1]), b.dtype), b[:-off]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
        off *= 2
    return a, b


def _shift0(x, off, reverse, use_roll):
    """x shifted along axis 0 by `off` rows (towards higher indices when
    forward).  With use_roll the vacated rows WRAP (pltpu.roll is ~3x
    cheaper on TPU than a misaligned concatenate) — callers' segment masks
    provably cover every wrapped row, because a wrapped row's within-segment
    index always fails the same bound the segment edge does."""
    if use_roll:
        rows = x.shape[0]
        return pltpu.roll(x, (rows - off) if reverse else off, 0)
    if reverse:
        return jnp.concatenate(
            [x[off:], jnp.zeros((off, x.shape[1]), x.dtype)], axis=0)
    return jnp.concatenate(
        [jnp.zeros((off, x.shape[1]), x.dtype), x[:-off]], axis=0)


def _pair_hs_seg(a, b, W, wmod, reverse, use_roll=False):
    """Hillis-Steele pair-scan along axis 0, confined to segments of length
    W (image rows of the flattened (L, C) map).  `wmod` is the (L, 1)
    within-row index; shifted-in values from another row are masked to the
    identity (1, 0)."""
    off = 1
    while off < W:
        a_sh = _shift0(a, off, reverse, use_roll)
        b_sh = _shift0(b, off, reverse, use_roll)
        m = (wmod + off) <= (W - 1) if reverse else wmod >= off
        a_sh = jnp.where(m, a_sh, 1.0)
        b_sh = jnp.where(m, b_sh, 0.0)
        b = b + a * b_sh
        a = a * a_sh
        off *= 2
    return a, b


def _pair_hs_stride(a, b, stride, nsteps, lmod, L, reverse, use_roll=False):
    """Hillis-Steele pair-scan along axis 0 with step `stride` (column
    traversals of the row-major map: vertical neighbours are `W` sublanes
    apart and columns never interleave).  `lmod` (rows, 1) is the
    within-image position; shifted-in values from another image are masked
    to the identity."""
    off = stride
    while off < stride * nsteps:
        a_sh = _shift0(a, off, reverse, use_roll)
        b_sh = _shift0(b, off, reverse, use_roll)
        m = (lmod + off) <= (L - 1) if reverse else lmod >= off
        a_sh = jnp.where(m, a_sh, 1.0)
        b_sh = jnp.where(m, b_sh, 0.0)
        b = b + a * b_sh
        a = a * a_sh
        off *= 2
    return a, b


def _exclusive(x, smod, seg, reverse):
    """Exclusive shift along axis 0 confined to segments of length `seg`
    (`smod` = within-segment index, (rows, 1))."""
    z = jnp.zeros((1, x.shape[1]), x.dtype)
    if reverse:
        sh = jnp.concatenate([x[1:], z], axis=0)
        return jnp.where(smod == seg - 1, 0.0, sh)
    sh = jnp.concatenate([z, x[:-1]], axis=0)
    return jnp.where(smod == 0, 0.0, sh)


def _scan_direction(a, b, H, W, G, kind, use_roll=False):
    """Full inclusive pair-scan of (a, b) over G stacked flattened (L=H*W, C)
    maps (each image scanned independently) for one cross2d traversal.
    kind: row_f | row_r | col_f | col_r.  Returns h (G*L, C) f32 — the
    recurrence state at every position.

    Two levels: level 1 scans every row (or column) of every image in
    parallel with masked sublane shifts; level 2 pair-scans the per-row (or
    per-column) exit states — extracted and broadcast back with one-hot MXU
    matmuls — to chain segments the way the flat traversal does."""
    L = H * W
    Lg = G * L
    f32 = jnp.float32
    row_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0)
    lmod = row_l % L

    if kind in ("flat_f", "flat_r"):
        # plain flattened-L scan per image (the reference's 1-D selective
        # scan, e.g. the K=2 swap-scan of ShallowFuse): single-level masked
        # HS — the lmod mask confines flow to each image
        _, b1 = _pair_hs_stride(a, b, 1, L, lmod, L, kind == "flat_r",
                                use_roll)
        return b1

    if kind in ("row_f", "row_r"):
        rev = kind == "row_r"
        wmod = row_l % W
        a1, b1 = _pair_hs_seg(a, b, W, wmod, rev, use_roll)
        # row states live at the row's exit position (w=W-1 fwd / w=0 rev)
        exit_w = 0 if rev else W - 1
        GH = G * H
        rows_h = jax.lax.broadcasted_iota(jnp.int32, (GH, Lg), 0)
        cols_h = jax.lax.broadcasted_iota(jnp.int32, (GH, Lg), 1)
        sel = (cols_h == rows_h * W + exit_w).astype(f32)       # (GH, Lg)
        A_r = jax.lax.dot(sel, a1, preferred_element_type=f32)  # (GH, C)
        B_r = jax.lax.dot(sel, b1, preferred_element_type=f32)
        hmod = jax.lax.broadcasted_iota(jnp.int32, (GH, 1), 0) % H
        A_s, B_s = _pair_hs_seg(A_r, B_r, H, hmod, rev)  # small level-2
        carry = _exclusive(B_s, hmod, H, rev)                   # (GH, C)
        rows_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, GH), 0)
        cols_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, GH), 1)
        bcast = (cols_l == rows_l // W).astype(f32)             # (Lg, GH)
        cpos = jax.lax.dot(bcast, carry, preferred_element_type=f32)
        return b1 + a1 * cpos

    rev = kind == "col_r"
    a1, b1 = _pair_hs_stride(a, b, W, H, lmod, L, rev, use_roll)
    # column states: bottom row (fwd) / top row (rev) of each image
    GW = G * W
    exit_h = 0 if rev else H - 1
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (GW, Lg), 0)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (GW, Lg), 1)
    sel = (cols_w == (rows_w // W) * L + exit_h * W + rows_w % W) \
        .astype(f32)                                            # (GW, Lg)
    A_c = jax.lax.dot(sel, a1, preferred_element_type=f32)      # (GW, C)
    B_c = jax.lax.dot(sel, b1, preferred_element_type=f32)
    wmod2 = jax.lax.broadcasted_iota(jnp.int32, (GW, 1), 0) % W
    A_s, B_s = _pair_hs_seg(A_c, B_c, W, wmod2, rev)
    carry = _exclusive(B_s, wmod2, W, rev)                      # (GW, C)
    rows_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, GW), 0)
    cols_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, GW), 1)
    bcast = (cols_l == (rows_l // L) * W + rows_l % W).astype(f32)
    cpos = jax.lax.dot(bcast, carry, preferred_element_type=f32)
    return b1 + a1 * cpos


_DIR_KINDS = ("row_f", "col_f", "row_r", "col_r")  # cross2d k=0..3 order


def _layer_norm(x, scale, bias, eps=1e-5, use_mxu=False):
    """LayerNorm over lanes.  With scale=None the affine part is skipped
    (the caller folded scale into the next matmul's weights and bias into
    its output row — see `pack_vss_block_params(fold_ln=True)`)."""
    if use_mxu:
        # lane reductions on big maps are VPU-slow; a dot against a ones
        # column computes the same sums on the (otherwise idle) MXU
        n = x.shape[1]
        ones = jnp.ones((n, 1), jnp.float32)
        mu = jax.lax.dot(x, ones, preferred_element_type=jnp.float32) / n
        xc = x - mu
        var = jax.lax.dot(xc * xc, ones,
                          preferred_element_type=jnp.float32) / n
    else:
        mu = jnp.mean(x, axis=1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    if scale is None:
        return xn
    return xn * scale + bias


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — f32-accurate).
    Mosaic has no erf lowering; exp it has."""
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    y = 1.0 - ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t * jnp.exp(-x * x)
    return jnp.sign(x) * y


# tanh-form GELU in the fused kernels (the erf rational costs ~18 VPU ops
# on the 4x-wide MLP hidden — the single largest VPU item at stage-2 —
# vs ~6 for the tanh form; max abs deviation from exact GELU ~3e-4, far
# below bf16 I/O noise).  Flip off to restore the f32-accurate erf form.
GELU_TANH = True


def _gelu_tanh(x):
    """PyTorch ``approximate='tanh'`` GELU: 0.5x(1+tanh(√(2/π)(x+0.044715x³)))
    via the EXACT identity 0.5(1+tanh(u)) = σ(2u) = 1/(1+e^{-2u})
    (Mosaic-safe: inf-clean at both tails, and ~3 fewer whole-map ops on
    the 4x-wide MLP hidden than the explicit tanh form)."""
    nu2 = x * (-1.5957691216057308 - 0.07135481627159839 * (x * x))  # -2u
    if x.dtype == jnp.bfloat16:
        # transcendental + reciprocal in f32 (Mosaic can't emit bf16
        # logistic/div vectors); polynomial prep and final mul stay packed
        return x * (1.0 / (1.0 + _fm.exp(nu2.astype(jnp.float32)))
                    ).astype(x.dtype)
    return x / (1.0 + _fm.exp(nu2))


def _gelu_exact(x):
    if GELU_TANH:
        return _gelu_tanh(x)
    if x.dtype == jnp.bfloat16:
        # mirror _gelu_tanh's bf16 branch: the erf rational's exp and
        # divides cannot lower as bf16 vectors on Mosaic — run the whole
        # approximation in f32 and cast the final map back down.
        x32 = x.astype(jnp.float32)
        return (0.5 * x32 * (1.0 + _erf_approx(x32 * (2.0 ** -0.5)))
                ).astype(x.dtype)
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _softplus(z):
    """``torch.nn.functional.softplus`` semantics (threshold 20): the
    reference CUDA/Triton kernels compute exactly ``z if z > 20 else
    log1p(exp(z))`` (`selective_scan_fwd_kernel.cuh`), ~3 Mosaic ops
    cheaper than ``jax.nn.softplus``'s logaddexp lowering (measured
    3.2 ms over the 15-block stage-2 pass at bs64).  Routed through the
    `fast_math` dispatcher; its polynomial form measured 2x SLOWER than
    the builtins (see `fast_math` docstring), so `FAST_EXP` is False and
    this is the builtin threshold form."""
    return _fm.softplus(z)


def _exp(z):
    """Decay exponential `exp(dt*A)` via the `fast_math` dispatcher
    (`FAST_EXP=False`: Mosaic builtin; the polynomial exp2f-trick
    analogue of `selective_scan_fwd_kernel.cuh:147-148` measured 2x
    slower — see `fast_math`)."""
    return _fm.exp(z)


# ---------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------

def _vss_block_kernel(H, W, R, G, conv_bias, fuse_mlp, mm_dtype, out_dtype,
                      use_roll,
                      x_ref, ln1_ref, w_in_ref, w_conv_ref, b_conv_ref,
                      w_xp_ref, w_dt_ref, b_dt_ref, A_ref, Dsum_ref,
                      lno_ref, w_out_ref, ln2_ref,
                      w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref,
                      y_ref):
    f32 = jnp.float32
    L = H * W
    Lg = G * L

    x = x_ref[0].astype(f32)                                    # (Lg, d)
    h1 = _layer_norm(x, ln1_ref[0:1, :].astype(f32),
                     ln1_ref[1:2, :].astype(f32), use_mxu=use_roll)
    xin = jax.lax.dot(h1.astype(mm_dtype), w_in_ref[...],
                      preferred_element_type=f32)               # (Lg, di)

    # depthwise 3x3 'SAME' conv: 9 shifted FMAs.  Taps are masked wherever
    # the source pixel falls outside the tap's image: the column mask
    # catches horizontal wraps, the lmod mask vertical ones (incl. across
    # the G stacked images).
    row_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0)
    wmod = row_l % W
    lmod = row_l % L
    acc = jnp.zeros_like(xin)
    for i in range(3):
        for j in range(3):
            off = (i - 1) * W + (j - 1)
            if off > 0:
                sh = _shift0(xin, off, True, use_roll)
            elif off < 0:
                sh = _shift0(xin, -off, False, use_roll)
            else:
                sh = xin
            if j == 0:
                sh = jnp.where(wmod >= 1, sh, 0.0)
            elif j == 2:
                sh = jnp.where(wmod <= W - 2, sh, 0.0)
            if i == 0:
                sh = jnp.where(lmod >= W, sh, 0.0)
            elif i == 2:
                sh = jnp.where(lmod <= L - W - 1, sh, 0.0)
            acc = acc + sh * w_conv_ref[3 * i + j:3 * i + j + 1, :] \
                .astype(f32)
    if conv_bias:
        acc = acc + b_conv_ref[...].astype(f32)
    u = acc * jax.nn.sigmoid(acc)                               # SiLU, (Lg,di)

    # all-direction projections in one MXU pass (projection is pointwise in
    # space so it commutes with the traversals, `csm_triton.py:26-29`)
    u_mm = u.astype(mm_dtype)
    xdbl = jax.lax.dot(u_mm, w_xp_ref[...],
                       preferred_element_type=f32)              # (L, 4R+8)
    xdbl_mm = xdbl.astype(mm_dtype)

    y_acc = u * Dsum_ref[...].astype(f32)
    for k in range(4):
        rank_k = xdbl_mm[:, k * R:(k + 1) * R]                  # (L, R)
        dt = jax.lax.dot(rank_k, w_dt_ref[k * R:(k + 1) * R, :],
                         preferred_element_type=f32)            # (L, di)
        dt = _softplus(dt + b_dt_ref[k:k + 1, :].astype(f32))
        Bk = jnp.broadcast_to(xdbl[:, 4 * R + 2 * k:4 * R + 2 * k + 1],
                              u.shape)
        Ck = jnp.broadcast_to(xdbl[:, 4 * R + 2 * k + 1:4 * R + 2 * k + 2],
                              u.shape)
        a = _exp(dt * A_ref[k:k + 1, :].astype(f32))
        b = dt * u * Bk
        h = _scan_direction(a, b, H, W, G, _DIR_KINDS[k], use_roll)
        y_acc = y_acc + Ck * h

    y = _layer_norm(y_acc, lno_ref[0:1, :].astype(f32),
                    lno_ref[1:2, :].astype(f32), use_mxu=use_roll)
    out = jax.lax.dot(y.astype(mm_dtype), w_out_ref[...],
                      preferred_element_type=f32)               # (L, d)
    res = x + out

    if fuse_mlp:
        h2 = _layer_norm(res, ln2_ref[0:1, :].astype(f32),
                         ln2_ref[1:2, :].astype(f32), use_mxu=use_roll)
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
                                              "use_roll"))
def _vss_block_call(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
                    lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2,
                    H, W, conv_bias, fuse_mlp, interpret=False, vmem_mb=100,
                    group=1, use_roll=None):
    B, L, d = x.shape
    R = w_dt.shape[0] // 4
    mm_dtype = w_in.dtype
    G = group if B % group == 0 else 1
    x = x.reshape(B // G, G * L, d)
    if use_roll is None:
        use_roll = not interpret
    kernel = functools.partial(
        _vss_block_kernel, H, W, R, G, conv_bias, fuse_mlp, mm_dtype,
        x.dtype, use_roll)
    blk_x = pl.BlockSpec((1, G * L, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk_x] + [full] * 16,
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((B // G, G * L, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
      lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2)
    return y.reshape(B, L, d)


# ---------------------------------------------------------------------
# operand packing from the VSSBlock param tree
# ---------------------------------------------------------------------

def pack_vss_block_params(p, mm_dtype, fuse_mlp, fold_ln=False):
    """Build the kernel operand list from a VSSBlock param dict
    (`{"norm", "op", "norm2", "mlp"}` as created by
    `xfmamba_tpu.models.vssm.VSSBlock`).  Matmul weights are cast to
    `mm_dtype`; normalization/state parameters stay fp32.

    With ``fold_ln`` (inference-only; the v2 kernels take a matching
    static flag) each LayerNorm's affine is folded into the matmul it
    feeds: scale into the weight rows, bias into a constant output row —
    ln1 -> w_in (row returned in the ln1 slot, shape (1, di)),
    out_norm -> w_out (lno slot, (1, d)), ln2 -> w_fc1 (bias absorbed
    into b_fc1; ln2 slot becomes a (1, 1) dummy).  Saves ~4 whole-map
    VPU ops per block at zero MXU cost."""
    f32 = jnp.float32
    op = p["op"]
    xw = op["x_proj_weight"]                    # (4, R+2, di)
    dtw = op["dt_projs_weight"]                 # (4, di, R)
    K, _, di = xw.shape
    R = dtw.shape[-1]
    assert K == 4

    w_in_f = op["in_proj"]["kernel"].astype(f32)                # (d, di)
    if fold_ln:
        s1 = p["norm"]["scale"].astype(f32)
        b1 = p["norm"]["bias"].astype(f32)
        w_in = (w_in_f * s1[:, None]).astype(mm_dtype)
        ln1 = (b1[None, :] @ w_in_f)                            # (1, di)
    else:
        ln1 = jnp.stack([p["norm"]["scale"],
                         p["norm"]["bias"]]).astype(f32)
        w_in = w_in_f.astype(mm_dtype)
    conv = p["op"]["conv2d"]["conv"]
    w_conv = conv["kernel"].reshape(9, di).astype(f32)          # (3,3,1,di)
    b_conv = (conv["bias"].reshape(1, di).astype(f32)
              if "bias" in conv else jnp.zeros((1, di), f32))
    # packed projection: lanes [rank_0|..|rank_3 | B0 C0 B1 C1 B2 C2 B3 C3]
    xw_t = jnp.swapaxes(xw, 1, 2)                               # (4, di, R+2)
    w_xp = jnp.concatenate(
        [xw_t[k][:, :R] for k in range(4)]
        + [xw_t[k][:, R:] for k in range(4)], axis=1).astype(mm_dtype)
    w_dt = jnp.concatenate(
        [jnp.swapaxes(dtw[k], 0, 1) for k in range(4)],
        axis=0).astype(mm_dtype)                                # (4R, di)
    b_dt = op["dt_projs_bias"].astype(f32)                      # (4, di)
    A = -jnp.exp(op["A_logs"].astype(f32)).reshape(4, di)
    Dsum = op["Ds"].astype(f32).reshape(4, di).sum(axis=0, keepdims=True)
    w_out_f = op["out_proj"]["kernel"].astype(f32)              # (di, d)
    if fold_ln:
        so = op["out_norm"]["norm"]["scale"].astype(f32)
        bo = op["out_norm"]["norm"]["bias"].astype(f32)
        w_out = (w_out_f * so[:, None]).astype(mm_dtype)
        lno = (bo[None, :] @ w_out_f)                           # (1, d)
    else:
        lno = jnp.stack([op["out_norm"]["norm"]["scale"],
                         op["out_norm"]["norm"]["bias"]]).astype(f32)
        w_out = w_out_f.astype(mm_dtype)

    d = w_in.shape[0]
    if fuse_mlp:
        mlp = p["mlp"]
        w_fc1_f = mlp["fc1"]["kernel"].astype(f32)
        b_fc1 = mlp["fc1"]["bias"].reshape(1, -1).astype(f32)
        if fold_ln:
            s2 = p["norm2"]["scale"].astype(f32)
            b2 = p["norm2"]["bias"].astype(f32)
            w_fc1 = (w_fc1_f * s2[:, None]).astype(mm_dtype)
            b_fc1 = b_fc1 + b2[None, :] @ w_fc1_f
            ln2 = jnp.zeros((1, 1), f32)
        else:
            ln2 = jnp.stack([p["norm2"]["scale"],
                             p["norm2"]["bias"]]).astype(f32)
            w_fc1 = w_fc1_f.astype(mm_dtype)
        w_fc2 = mlp["fc2"]["kernel"].astype(mm_dtype)
        b_fc2 = mlp["fc2"]["bias"].reshape(1, -1).astype(f32)
    else:
        ln2 = jnp.zeros((1, 1), f32) if fold_ln else jnp.zeros((2, d), f32)
        w_fc1 = jnp.zeros((d, 8), mm_dtype)
        b_fc1 = jnp.zeros((1, 8), f32)
        w_fc2 = jnp.zeros((8, d), mm_dtype)
        b_fc2 = jnp.zeros((1, d), f32)
    return (ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
            lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2)


# ---------------------------------------------------------------------
# reference composition (oracle + custom-vjp backward)
# ---------------------------------------------------------------------

def vss_block_ref(x, p, H, W, conv_bias, fuse_mlp, mm_dtype=None,
                  m1=None, m2=None):
    """Pure-jnp mirror of the kernel's math (same op order, same casts) on
    (B, L, d).  Used as the test oracle and as the recompute path of the
    custom VJP.  m1/m2: optional (B, L, 1) drop-path keep masks applied to
    the SS2D and MLP residual branches (the v2 training semantics)."""
    mm_dtype = mm_dtype or x.dtype
    (ln1, w_in, w_conv, b_conv, w_xp, w_dt, b_dt, A, Dsum,
     lno, w_out, ln2, w_fc1, b_fc1, w_fc2, b_fc2) = pack_vss_block_params(
        p, mm_dtype, fuse_mlp)
    f32 = jnp.float32
    B, L, d = x.shape
    R = w_dt.shape[0] // 4
    di = w_in.shape[1]

    def ln(v, sb):
        mu = v.mean(axis=-1, keepdims=True)
        vc = v - mu
        var = (vc * vc).mean(axis=-1, keepdims=True)
        return vc * jax.lax.rsqrt(var + 1e-5) * sb[0] + sb[1]

    xf = x.astype(f32)
    h1 = ln(xf, ln1)
    xin = jnp.einsum("bld,de->ble", h1.astype(mm_dtype), w_in,
                     preferred_element_type=f32)
    # depthwise conv via explicit padding (matches the kernel's shifts)
    xs = xin.reshape(B, H, W, di)
    xs = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, di), f32)
    for i in range(3):
        for j in range(3):
            acc = acc + xs[:, i:i + H, j:j + W, :] \
                * w_conv[3 * i + j].astype(f32)
    if conv_bias:
        acc = acc + b_conv.astype(f32)
    acc = acc.reshape(B, L, di)
    u = acc * jax.nn.sigmoid(acc)

    xdbl = jnp.einsum("ble,ec->blc", u.astype(mm_dtype), w_xp,
                      preferred_element_type=f32)
    y_acc = u * Dsum
    for k, kind in enumerate(_DIR_KINDS):
        dt = jnp.einsum("blr,re->ble",
                        xdbl[:, :, k * R:(k + 1) * R].astype(mm_dtype),
                        w_dt[k * R:(k + 1) * R], preferred_element_type=f32)
        dt = _softplus(dt + b_dt[k])
        Bk = xdbl[:, :, 4 * R + 2 * k:4 * R + 2 * k + 1]
        Ck = xdbl[:, :, 4 * R + 2 * k + 1:4 * R + 2 * k + 2]
        a = _exp(dt * A[k])
        b = dt * u * Bk

        # oracle scan: reorder to the traversal, lax.associative_scan, undo
        if kind in ("col_f", "col_r"):
            a_t = jnp.swapaxes(a.reshape(B, H, W, di), 1, 2) \
                .reshape(B, L, di)
            b_t = jnp.swapaxes(b.reshape(B, H, W, di), 1, 2) \
                .reshape(B, L, di)
        else:
            a_t, b_t = a, b
        rev = kind in ("row_r", "col_r")

        def comb(l, r):
            al, bl = l
            ar, br = r
            return al * ar, ar * bl + br

        ab = (jnp.flip(a_t, 1), jnp.flip(b_t, 1)) if rev else (a_t, b_t)
        _, h = jax.lax.associative_scan(comb, ab, axis=1)
        if rev:
            h = jnp.flip(h, 1)
        if kind in ("col_f", "col_r"):
            h = jnp.swapaxes(h.reshape(B, W, H, di), 1, 2).reshape(B, L, di)
        y_acc = y_acc + Ck * h

    y = ln(y_acc, lno)
    out = jnp.einsum("ble,ed->bld", y.astype(mm_dtype), w_out,
                     preferred_element_type=f32)
    if m1 is not None:
        out = out * m1.astype(f32)
    res = xf + out
    if fuse_mlp:
        h2 = ln(res, ln2)
        f1 = jnp.einsum("bld,dh->blh", h2.astype(mm_dtype), w_fc1,
                        preferred_element_type=f32) + b_fc1
        f1 = 0.5 * f1 * (1.0 + jax.lax.erf(f1 * (2.0 ** -0.5)))
        f2 = jnp.einsum("blh,hd->bld", f1.astype(mm_dtype), w_fc2,
                        preferred_element_type=f32) + b_fc2
        if m2 is not None:
            f2 = f2 * m2.astype(f32)
        res = res + f2
    return res.astype(x.dtype)


# ---------------------------------------------------------------------
# public entry: custom-vjp wrapper
# ---------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def vss_block_fused(x, p, H, W, conv_bias, fuse_mlp, group=1):
    """Run one VSSBlock on x (B, L, d) via the megakernel.  `p` is the
    block's param dict.  Backward recomputes through the pure-jnp mirror
    (the fused path is inference-first; training uses stochastic depth and
    takes the composable path)."""
    args = pack_vss_block_params(p, x.dtype, fuse_mlp)
    return _vss_block_call(x, *args, H=H, W=W, conv_bias=conv_bias,
                           fuse_mlp=fuse_mlp, group=group)


def _fused_fwd(x, p, H, W, conv_bias, fuse_mlp, group):
    return vss_block_fused(x, p, H, W, conv_bias, fuse_mlp, group), (x, p)


def _fused_bwd(H, W, conv_bias, fuse_mlp, group, res, g):
    x, p = res
    _, vjp = jax.vjp(
        lambda xx, pp: vss_block_ref(xx, pp, H, W, conv_bias, fuse_mlp), x, p)
    return vjp(g)


vss_block_fused.defvjp(_fused_fwd, _fused_bwd)


_VMEM_BUDGET = 44 * 1024 * 1024  # scoped-vmem request is 64 MB; keep slack


def _vmem_estimate(H, W, d, di, hd, G, fuse_mlp):
    """Rough VMEM working set: ~6 live f32 (G*L, di) arrays during a
    direction's scan, the x/residual (G*L, d) buffers, the one-hot
    selection matrices, and the matmul weights (bf16)."""
    L = H * W

    def pad128(n):
        return ((n + 127) // 128) * 128

    R = -(-d // 16)
    Lg = G * L
    acts = 6 * Lg * pad128(di) * 4 + 3 * Lg * pad128(d) * 4 \
        + 2 * Lg * pad128(4 * R + 8) * 4 \
        + 3 * Lg * pad128(G * max(H, W)) * 4
    weights = 2 * (d * di * 2) + di * 4
    if fuse_mlp:
        weights += 2 * (d * hd * 2)
        acts += Lg * pad128(hd) * 2
    return acts + weights


def fused_vss_block_supported(H, W, d, di, hd, fuse_mlp=True,
                              budget_bytes=_VMEM_BUDGET):
    """Static feasibility check: does the whole-map working set fit VMEM?"""
    if H * W < 8 or H < 2 or W < 2:
        return False
    return _vmem_estimate(H, W, d, di, hd, 1, fuse_mlp) < budget_bytes


def pick_group(B, H, W, d, di, hd, fuse_mlp=True,
               budget_bytes=_VMEM_BUDGET):
    """Images per grid step.  Measured on v5e (chained 50-step timings per
    block, bs 32): large maps want G=1 (the map already fills the MXU M
    dimension and VMEM pressure hurts), L=196 wants G=2, L<=64 wants G=4;
    beyond that the working set outgrows VMEM bandwidth."""
    L = H * W
    if L <= 64:
        prefs = (4, 2, 1)
    elif L <= 256:
        prefs = (2, 1)
    else:
        prefs = (1,)
    for G in prefs:
        if B % G:
            continue
        if _vmem_estimate(H, W, d, di, hd, G, fuse_mlp) < budget_bytes:
            return G
    return 1


# ---------------------------------------------------------------------
# whole-map multi-state scan (the fusion ops: Cross_SS2Dv5, ShallowFuse)
# ---------------------------------------------------------------------

def _nk_scan_kernel(H, W, G, K, N, kinds, use_roll, out_dtype,
                    u_ref, dts_ref, Bs_ref, Cs_ref,
                    A_ref, Dsum_ref, bias_ref, y_ref):
    """One grid step: G stacked maps, all K directions x N state dims.

    The d_state>1 fusion scans are VPU-bound (N multiplies the recurrence
    work); this kernel removes the B*K*N-step grid and XLA glue of the
    grouped kernel (`selective_scan_pallas.py`) — each (k, n) runs as a
    two-level whole-map scan over VMEM-resident data."""
    f32 = jnp.float32
    u = u_ref[0].astype(f32)                                    # (Lg, D)
    D = u.shape[1]
    y = u * Dsum_ref[...].astype(f32)
    for k in range(K):
        dt = dts_ref[0][:, k * D:(k + 1) * D].astype(f32)
        dt = _softplus(dt + bias_ref[k:k + 1, :].astype(f32))
        dtu = dt * u
        for n in range(N):
            a_row = A_ref[k * N + n:k * N + n + 1, :].astype(f32)  # (1, D)
            Bkn = Bs_ref[0][:, k * N + n:k * N + n + 1].astype(f32)
            Ckn = Cs_ref[0][:, k * N + n:k * N + n + 1].astype(f32)
            a = _exp(dt * a_row)
            b = dtu * Bkn
            h = _scan_direction(a, b, H, W, G, kinds[k], use_roll)
            y = y + Ckn * h
    y_ref[0] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "kinds", "group",
                                              "interpret", "vmem_mb"))
def nk_scan_call(u, dts, Bs, Cs, A, Dvec, bias, H, W, kinds, group=1,
                 interpret=False, vmem_mb=100):
    """Whole-map selective scan for K direction groups and N state dims.

    u (B, L, D); dts (B, L, K*D); Bs/Cs (B, L, K*N); A (K*N, D) rows in
    (k, n) order; Dvec (K, D); bias (K, D).  kinds: per-k traversal, e.g.
    ("row_f", "col_f", "row_r", "col_r") for cross2d or ("flat_f",)*K for
    flat scans.  Returns y (B, L, D) = sum_k [C_k h_k] + u * sum_k D_k in
    u.dtype (fp32 recurrence inside)."""
    B, L, D = u.shape
    K = len(kinds)
    N = A.shape[0] // K
    G = group if B % group == 0 else 1
    Lg = G * L
    Dsum = Dvec.astype(jnp.float32).sum(axis=0, keepdims=True)
    kernel = functools.partial(_nk_scan_kernel, H, W, G, K, N, kinds,
                               not interpret, u.dtype)
    blk = lambda c: pl.BlockSpec((1, Lg, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(D), blk(K * D), blk(K * N), blk(K * N),
                  full, full, full],
        out_specs=blk(D),
        out_shape=jax.ShapeDtypeStruct((B // G, Lg, D), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(u.reshape(B // G, Lg, D), dts.reshape(B // G, Lg, K * D),
      Bs.reshape(B // G, Lg, K * N), Cs.reshape(B // G, Lg, K * N),
      A, Dsum, bias.astype(jnp.float32))
    return y.reshape(B, L, D)


def nk_scan_from_projs(x, dts, Bs, Cs, A, Dmat, bias, scan_mode="cross2d",
                       group=None, interpret=False):
    """Drop-in for `ss2d_core_from_projs` (inference): x (B, H, W, D);
    dts (B, H, W, K, D); Bs/Cs (B, H, W, K, N); A (K, D, N); Dmat/bias
    (K, D).  Returns (B, H, W, D) f32."""
    B, H, W, D = x.shape
    K = A.shape[0]
    N = A.shape[-1]
    L = H * W
    if scan_mode == "cross2d":
        kinds = ("row_f", "col_f", "row_r", "col_r")
    elif scan_mode == "unidi":
        # flat row-major scan == row_f (the level-2 chain crosses rows)
        kinds = ("row_f",) * K
    elif scan_mode == "bidi":
        kinds = ("row_f", "row_f", "row_r", "row_r")
    else:
        raise ValueError(scan_mode)
    if group is None:
        group = 1
        for g in (8, 4, 2):
            if B % g == 0 and g * L <= 4096:
                group = g
                break
    u = x.reshape(B, L, D)
    dts_p = dts.reshape(B, L, K * D)
    Bs_p = Bs.reshape(B, L, K * N)
    Cs_p = Cs.reshape(B, L, K * N)
    # A rows to (k*N+n, D)
    A_p = jnp.swapaxes(A.astype(jnp.float32), 1, 2).reshape(K * N, D)
    y = nk_scan_call(u, dts_p, Bs_p, Cs_p, A_p, Dmat, bias, H, W, kinds,
                     group=group, interpret=interpret)
    return y.astype(jnp.float32).reshape(B, H, W, D)
