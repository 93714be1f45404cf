"""XFMamba cross-view fusion ops and blocks.

Reference: ``/root/reference/models/fusion_vmamba.py`` —
SwappingScan/Merge (:189-241), ConcatScan/Merge (:244-286),
Cross_SS2Dv5 (:360-610), FusionBlock_v5/CSSFVSSLayer_v5 (:613-690),
ShallowFuse_SS2Dv4 (:693-876), ShallowFusionBlock_v4 (:879-920).

Everything channel-last (B, H, W, C).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xfmamba_tpu.models.layers import (
    LN_EPS, Conv2dSame, Dense, DropPath, trunc_normal_init)
from xfmamba_tpu.models.ss2d import (
    _project_kdirs, a_log_init, core_dispatch, dt_proj_bias_init,
    dt_proj_weight_init)
from xfmamba_tpu.ops.selective_scan import selective_scan


# =====================================================================
# swap-scan: channel-interleaved two-view exchange
# =====================================================================

@jax.custom_vjp
def swapping_scan(x, x2):
    """Exchange even-indexed channels between the two views
    (`fusion_vmamba.py:189-214`): out_x takes x2's even channels, out_x2
    takes x's.  Returns (swapped_x, swapped_x2), same shapes as inputs.

    The custom VJP reproduces the reference's *straight-through* backward
    (`:216-221`): gradients are passed through un-swapped — deliberately
    matching the reference's training semantics rather than the true adjoint.
    """
    return _swap_fwd(x, x2)


def _swap_fwd(x, x2):
    C = x.shape[-1]
    even = (jnp.arange(C) % 2) == 0
    out_x = jnp.where(even, x2, x)
    out_x2 = jnp.where(even, x, x2)
    return out_x, out_x2


def _swap_fwd_vjp(x, x2):
    return _swap_fwd(x, x2), None


def _swap_bwd_vjp(_, g):
    g1, g2 = g
    return g1, g2  # straight-through, NOT the adjoint (reference behavior)


swapping_scan.defvjp(_swap_fwd_vjp, _swap_bwd_vjp)


def swapping_scan_adjoint(x, x2):
    """The mathematically-faithful variant (gradient swaps back); available
    for experiments where correct adjoints matter."""
    return _swap_fwd(x, x2)


def concat_scan(x, x2):
    """Two views as one length-2L sequence + its reverse (K=2 traversals,
    `fusion_vmamba.py:244-262`).  x, x2: (B, H, W, C) ->
    (seq, seq_reversed) each (B, 2L, C)."""
    B, H, W, C = x.shape
    seq = jnp.concatenate([x.reshape(B, -1, C), x2.reshape(B, -1, C)], axis=1)
    return seq, seq[:, ::-1]


def concat_merge(y_fwd, y_rev, H, W):
    """Inverse of `concat_scan` (`fusion_vmamba.py:265-273`): sum the two
    traversals and split back into per-view maps."""
    B, L2, C = y_fwd.shape
    L = L2 // 2
    y = y_fwd + y_rev[:, ::-1]
    return (y[:, :L].reshape(B, H, W, C), y[:, L:].reshape(B, H, W, C))


# =====================================================================
# ShallowFuse_SS2Dv4: swap-scan K=2 SSM + cross squeeze-excitation
# =====================================================================

class ShallowFuseSS2Dv4(nn.Module):
    """Shallow two-view fusion (`fusion_vmamba.py:693-876`).

    Pipeline per view: in_proj → dwconv → SiLU; then the two views'
    even-channels are swapped, a K=2 selective scan runs over both swapped
    streams, outputs are un-swapped (split), out-normed, and cross-gated by
    the *other* view's squeeze-excitation of its pre-conv projection.
    """
    d_model: int
    d_state: int = 4
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    act: Callable = nn.silu
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    dtype: Any = jnp.float32
    scan_impl: Callable = selective_scan

    @nn.compact
    def __call__(self, x, x2, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = (int(math.ceil(self.d_model / 16))
                   if self.dt_rank == "auto" else int(self.dt_rank))
        K, N, R = 2, self.d_state, dt_rank
        B, H, W, _ = x.shape
        L = H * W

        in_proj = Dense(d_inner, use_bias=self.bias, dtype=self.dtype,
                        kernel_init=trunc_normal_init(), name="in_proj")
        conv = Conv2dSame(d_inner, (self.d_conv, self.d_conv),
                          feature_group_count=d_inner,
                          use_bias=self.conv_bias, dtype=self.dtype,
                          name="conv2d")
        # batch both views through the shared projection + dwconv
        p_cat = in_proj(jnp.concatenate([x, x2], axis=0))
        x_p, x2_p = jnp.split(p_cat, 2, axis=0)
        c_cat = self.act(conv(p_cat))
        x_c, x2_c = jnp.split(c_cat, 2, axis=0)

        # --- scan parameters (K=2 groups)
        x_proj_weight = self.param("x_proj_weight", trunc_normal_init(),
                                   (K, R + 2 * N, d_inner))
        dt_projs_weight = self.param(
            "dt_projs_weight",
            dt_proj_weight_init(R, self.dt_scale, self.dt_init),
            (K, d_inner, R))
        dt_projs_bias = self.param(
            "dt_projs_bias",
            dt_proj_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (K, d_inner))
        A_logs = self.param("A_logs", a_log_init(N), (K * d_inner, N))
        Ds = self.param("Ds",
                        lambda key, shape, dtype=jnp.float32:
                        jnp.ones(shape, dtype),
                        (K * d_inner,))

        sx, sx2 = swapping_scan(x_c, x2_c)
        xs = jnp.stack([sx.reshape(B, L, d_inner),
                        sx2.reshape(B, L, d_inner)], axis=2)  # (B,L,2,D)
        x_dbl = jnp.einsum("blkd,kcd->blkc", xs,
                           x_proj_weight.astype(xs.dtype))
        dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
        dts = jnp.einsum("blkr,kdr->blkd", dts,
                         dt_projs_weight.astype(xs.dtype))

        u = xs.reshape(B, L, K * d_inner)
        from xfmamba_tpu.ops import vss_block_pallas as _vbp
        if deterministic and jax.default_backend() != "cpu" \
                and _vbp.FUSED_INFERENCE \
                and self.scan_impl is selective_scan:
            # inference: whole-map multi-state kernel, both groups scanned
            # forward over flattened L (`fusion_vmamba.py:831-833`).  The
            # K*D channel layout maps to kernel D with K folded into
            # lanes: treat as K groups of D channels via one call per k.
            from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
            from xfmamba_tpu.ops.vss_block_pallas import nk_scan_call
            group = max([g for g in (8, 4, 2, 1)
                         if B % g == 0 and g * L <= 4096] or [1])
            scan_call = (_v2.nk_scan_call_v2
                         if _v2.FUSED_V2 and (L * group) % 8 == 0
                         and (W * group) % 8 == 0 else nk_scan_call)
            A2 = -jnp.exp(A_logs.astype(jnp.float32))     # (K*D, N)
            ys = []
            for k in range(K):
                sl = slice(k * d_inner, (k + 1) * d_inner)
                ys.append(scan_call(
                    u[..., sl], dts.reshape(B, L, K * d_inner)[..., sl],
                    Bs[:, :, k], Cs[:, :, k],
                    jnp.swapaxes(A2[sl], 0, 1),           # (N, D)
                    Ds[sl].reshape(1, -1),
                    dt_projs_bias[k].reshape(1, -1),
                    H, W, ("row_f",), group=group))
            ys = jnp.concatenate(ys, axis=-1)
        else:
            from xfmamba_tpu.ops import nk_scan_adjoint as _nka
            g_nk = (_nka.nk_train_supported(B, L, W, d_inner, 1, N, "unidi")
                    if self.scan_impl is selective_scan else None)
            if g_nk is not None:
                # training: whole-map nk kernel pair per group (serial fwd
                # + whole-map adjoint bwd) instead of the grouped kernels
                A2 = -jnp.exp(A_logs.astype(jnp.float32))
                ys_k = []
                for k in range(K):
                    sl = slice(k * d_inner, (k + 1) * d_inner)
                    ys_k.append(_nka.nk_scan_train(
                        H, W, ("row_f",), g_nk, False,
                        u[..., sl],
                        dts.reshape(B, L, K * d_inner)[..., sl],
                        Bs[:, :, k], Cs[:, :, k],
                        jnp.swapaxes(A2[sl], 0, 1),
                        Ds[sl].reshape(1, -1),
                        dt_projs_bias[k].reshape(1, -1)))
                ys = jnp.concatenate(ys_k, axis=-1)
            else:
                scan_impl = self.scan_impl
                if scan_impl is selective_scan \
                        and jax.default_backend() != "cpu":
                    from xfmamba_tpu.ops.selective_scan_pallas import (
                        selective_scan_auto)
                    scan_impl = selective_scan_auto
                ys = scan_impl(
                    u, dts.reshape(B, L, K * d_inner),
                    -jnp.exp(A_logs.astype(jnp.float32)),
                    Bs, Cs, Ds, dt_projs_bias.reshape(-1),
                    delta_softplus=True)
        # SwappingMerge: split back (true adjoint under autodiff,
        # `fusion_vmamba.py:224-241`)
        y1 = ys[..., :d_inner].reshape(B, H, W, d_inner).astype(x.dtype)
        y2 = ys[..., d_inner:].reshape(B, H, W, d_inner).astype(x.dtype)

        out_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="out_norm")
        y1 = out_norm(y1)
        y2 = out_norm(y2)

        # cross squeeze-excitation (`fusion_vmamba.py:769-775, 866-871`):
        # y1 is gated by x2's excitation and vice versa
        se_fc1 = Dense(d_inner // 16, use_bias=False, dtype=self.dtype,
                       name="fc1_reduce")
        se_fc2 = Dense(d_inner, use_bias=False, dtype=self.dtype,
                       name="fc1_expand")

        def excite(v):
            s = v.mean(axis=(1, 2))
            return jax.nn.sigmoid(se_fc2(nn.silu(se_fc1(s))))[:, None, None]

        y1 = y1 * excite(x2_p)
        y2 = y2 * excite(x_p)

        out_proj = Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                         kernel_init=trunc_normal_init(), name="out_proj")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        return drop(out_proj(y1)), drop(out_proj(y2))


class ShallowFusionBlock(nn.Module):
    """Pre-norm residual wrapper (`fusion_vmamba.py:879-920`): shared norm,
    per-view residual x_i + shallowfuse(x_i).  The reference's default norm
    is **BatchNorm2d** (`:884`) — which is what TwoViewXFMambaTop uses."""
    hidden_dim: int
    drop_path: float = 0.0
    attn_drop_rate: float = 0.0
    d_state: int = 4
    dt_rank: Any = "auto"
    ssm_ratio: float = 2.0
    norm_type: str = "bn"  # "bn" (reference default) | "ln"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        if self.norm_type == "bn":
            # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1
            # (flax momentum 0.9 == torch 0.1 for the running average)
            norm = nn.BatchNorm(use_running_average=deterministic,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name="norm")
        else:
            norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="norm")
        y1, y2 = ShallowFuseSS2Dv4(
            d_model=self.hidden_dim, d_state=self.d_state,
            ssm_ratio=self.ssm_ratio, dt_rank=self.dt_rank,
            dropout=self.attn_drop_rate, dtype=self.dtype,
            name="shallowfuseSS2D")(norm(x1), norm(x2),
                                    deterministic=deterministic)
        dp = DropPath(self.drop_path)
        y1, y2 = dp((y1, y2), deterministic=deterministic)
        return x1 + y1, x2 + y2


# =====================================================================
# Cross_SS2Dv5: deep cross-fusion (Cs_fuse conditions both views)
# =====================================================================

class CrossSS2Dv5(nn.Module):
    """Deep fusion op (`fusion_vmamba.py:360-610`).

    ``x_fuse = (x + x2) / 2``; all three streams share ``in_proj_sec``,
    dwconv and act; the fused stream scans normally while the two views scan
    with the fused stream's C projections substituted for their own (:537,
    :568).  The gate ``z = act(in_proj_sec(x_fuse))`` multiplies every
    stream's output; out = out_proj(y + y2 + y_fuse).

    The reference also *constructs* an unused ``in_proj`` (d_model→2·d_inner,
    :399); we do not instantiate dead parameters — the checkpoint converter
    drops that tensor explicitly.
    """
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    act: Callable = nn.silu
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    initialize: str = "v0"
    scan_mode: str = "cross2d"
    dtype: Any = jnp.float32
    scan_impl: Callable = selective_scan
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x, x2, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = (int(math.ceil(self.d_model / 16))
                   if self.dt_rank == "auto" else int(self.dt_rank))
        K, N, R = 4, self.d_state, dt_rank

        x_fuse = (x + x2) / 2

        in_proj_sec = Dense(d_inner, use_bias=self.bias, dtype=self.dtype,
                            kernel_init=trunc_normal_init(),
                            name="in_proj_sec")
        # batch the three streams through the shared projection + dwconv:
        # one matmul and one conv instead of three (identical math per row)
        Bv = x.shape[0]
        xcat0 = jnp.concatenate([x_fuse, x, x2], axis=0)
        xp_cat = in_proj_sec(xcat0)

        z = self.act(xp_cat[:Bv])

        if self.d_conv > 1:
            conv = Conv2dSame(d_inner, (self.d_conv, self.d_conv),
                              feature_group_count=d_inner,
                              use_bias=self.conv_bias, dtype=self.dtype,
                              name="conv2d")
            xp_cat = conv(xp_cat)
        xcat = self.act(xp_cat)        # (3B, H, W, di): [fused, x, x2]

        x_proj_weight = self.param("x_proj_weight", trunc_normal_init(),
                                   (K, R + 2 * N, d_inner))
        dt_projs_weight = self.param(
            "dt_projs_weight",
            dt_proj_weight_init(R, self.dt_scale, self.dt_init),
            (K, d_inner, R))
        dt_projs_bias = self.param(
            "dt_projs_bias",
            dt_proj_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (K, d_inner))
        A_logs = self.param("A_logs", a_log_init(N), (K * d_inner, N))
        Ds = self.param("Ds",
                        lambda key, shape, dtype=jnp.float32:
                        jnp.ones(shape, dtype),
                        (K * d_inner,))

        A = -jnp.exp(A_logs.astype(jnp.float32)).reshape(K, d_inner, N)
        Dmat = Ds.astype(jnp.float32).reshape(K, d_inner)
        bias = dt_projs_bias.astype(jnp.float32)

        out_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="out_norm")

        # the three streams (fused, x, x2) stay batched on the batch axis:
        # one projection einsum and ONE scan-kernel invocation instead of
        # three; the fused stream's Cs substitute for each view's own
        # (`:537,:568`)
        from xfmamba_tpu.ops import vss_block_pallas as _vbp
        from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
        Hc, Wc = xcat.shape[1], xcat.shape[2]
        Bc = xcat.shape[0]
        fused_ok = (deterministic and jax.default_backend() != "cpu"
                    and _vbp.FUSED_INFERENCE
                    and self.scan_backend in ("auto", "pallas")
                    and self.scan_impl is selective_scan
                    and self.scan_mode in ("cross2d", "unidi", "bidi"))
        group = next((g for g in (8, 4, 2)
                      if Bc % g == 0 and (Hc * Wc * g) % 8 == 0
                      and (Wc * g) % 8 == 0), None)
        if (fused_ok and _v2.FUSED_V2 and group is not None
                and not self.is_initializing()):
            # rank-form v2 kernel: the Δ projections' rank→D stage and the
            # out-norm run IN-KERNEL, so the (B, L, K·D) dts tensor never
            # touches HBM and XLA's dt-einsum + LN passes disappear
            x_dbl = jnp.einsum("bhwd,kcd->bhwkc", xcat,
                               x_proj_weight.astype(xcat.dtype))
            ranks = x_dbl[..., :R]
            Bs_c = x_dbl[..., R:R + N]
            Cs_f = x_dbl[:Bv, ..., R + N:]
            Cs_sub = jnp.concatenate([Cs_f, Cs_f, Cs_f], axis=0)
            kinds = dict(cross2d=("row_f", "col_f", "row_r", "col_r"),
                         unidi=("row_f",) * K,
                         bidi=("row_f", "row_f", "row_r", "row_r")
                         )[self.scan_mode]
            L = Hc * Wc
            w_dt_p = jnp.concatenate(
                [jnp.swapaxes(dt_projs_weight[k], 0, 1) for k in range(K)],
                axis=0).astype(xcat.dtype)
            A_p = jnp.swapaxes(A, 1, 2).reshape(K * N, d_inner)
            pn = self.variables["params"]["out_norm"]
            lno = jnp.stack([pn["scale"], pn["bias"]]).astype(jnp.float32)
            y3 = _v2.nk_scan_call_v2r(
                xcat.reshape(Bc, L, d_inner),
                ranks.reshape(Bc, L, K * R),
                Bs_c.reshape(Bc, L, K * N),
                Cs_sub.reshape(Bc, L, K * N),
                w_dt_p, A_p, Dmat, bias, lno, Hc, Wc, kinds, group=group)
            y3 = y3.reshape(Bc, Hc, Wc, d_inner)
        else:
            dts_c, Bs_c, Cs_c = _project_kdirs(xcat, x_proj_weight,
                                               dt_projs_weight, R, N)
            Cs_f = Cs_c[:Bv]
            Cs_sub = jnp.concatenate([Cs_f, Cs_f, Cs_f], axis=0)
            if fused_ok:
                from xfmamba_tpu.ops.vss_block_pallas import (
                    nk_scan_from_projs)
                y3 = nk_scan_from_projs(xcat, dts_c, Bs_c, Cs_sub, A, Dmat,
                                        bias, scan_mode=self.scan_mode)
            else:
                y3 = core_dispatch(xcat, dts_c, Bs_c, Cs_sub, A, Dmat, bias,
                                   scan_mode=self.scan_mode,
                                   backend=self.scan_backend,
                                   scan_impl=self.scan_impl)
            y3 = out_norm(y3.astype(x.dtype))
        y_fuse, y, y2 = jnp.split(y3, 3, axis=0)

        y_fusion3 = (y + y2 + y_fuse) * z
        out = Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                    kernel_init=trunc_normal_init(),
                    name="out_proj")(y_fusion3)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class CrossSS2Dv2(nn.Module):
    """Superseded 2-input fusion op (`vmamba.py:715-1005`): x goes through
    ``in_proj`` (2·d_inner, chunked into x/z), x2 through ``in_proj_sec``
    (d_inner); shared dwconv; each stream runs a *normal* SS2D core with its
    own C; both outputs gated by z (from x); out = out_proj(y + y2)."""
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    act: Callable = nn.silu
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    scan_mode: str = "cross2d"
    dtype: Any = jnp.float32
    scan_impl: Callable = selective_scan
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x, x2, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = (int(math.ceil(self.d_model / 16))
                   if self.dt_rank == "auto" else int(self.dt_rank))
        K, N, R = 4, self.d_state, dt_rank

        xz = Dense(2 * d_inner, use_bias=self.bias, dtype=self.dtype,
                   kernel_init=trunc_normal_init(), name="in_proj")(x)
        x_p, z = jnp.split(xz, 2, axis=-1)
        z = self.act(z)
        x2_p = Dense(d_inner, use_bias=self.bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="in_proj_sec")(x2)

        if self.d_conv > 1:
            conv = Conv2dSame(d_inner, (self.d_conv, self.d_conv),
                              feature_group_count=d_inner,
                              use_bias=self.conv_bias, dtype=self.dtype,
                              name="conv2d")
            x_p, x2_p = conv(x_p), conv(x2_p)
        x_p, x2_p = self.act(x_p), self.act(x2_p)

        x_proj_weight = self.param("x_proj_weight", trunc_normal_init(),
                                   (K, R + 2 * N, d_inner))
        dt_projs_weight = self.param(
            "dt_projs_weight",
            dt_proj_weight_init(R, self.dt_scale, self.dt_init),
            (K, d_inner, R))
        dt_projs_bias = self.param(
            "dt_projs_bias",
            dt_proj_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (K, d_inner))
        A_logs = self.param("A_logs", a_log_init(N), (K * d_inner, N))
        Ds = self.param("Ds",
                        lambda key, shape, dtype=jnp.float32:
                        jnp.ones(shape, dtype),
                        (K * d_inner,))
        A = -jnp.exp(A_logs.astype(jnp.float32)).reshape(K, d_inner, N)
        Dmat = Ds.astype(jnp.float32).reshape(K, d_inner)
        bias = dt_projs_bias.astype(jnp.float32)
        out_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="out_norm")

        def core(v):
            dts, Bs, Cs = _project_kdirs(v, x_proj_weight, dt_projs_weight,
                                         R, N)
            y = core_dispatch(v, dts, Bs, Cs, A, Dmat, bias,
                              scan_mode=self.scan_mode,
                              backend=self.scan_backend,
                              scan_impl=self.scan_impl)
            return out_norm(y.astype(x.dtype))

        y = core(x_p) * z
        y2 = core(x2_p) * z
        out = Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="out_proj")(y + y2)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class CrossSS2Dv3(nn.Module):
    """Superseded 3-stream fusion op (`vmamba.py:1134-1436`):
    ``x_fuse = x + x2`` (sum, not mean); all three streams through the shared
    ``in_proj_sec``/dwconv; three *independent* normal SS2D cores (no Cs_fuse
    substitution — that is the v5 refinement); gate z = act(in_proj_sec(
    x_fuse)); out = out_proj((y + y2 + y_fuse) * z-applied-per-stream)."""
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    act: Callable = nn.silu
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    scan_mode: str = "cross2d"
    dtype: Any = jnp.float32
    scan_impl: Callable = selective_scan
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x, x2, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = (int(math.ceil(self.d_model / 16))
                   if self.dt_rank == "auto" else int(self.dt_rank))
        K, N, R = 4, self.d_state, dt_rank

        x_fuse = x + x2
        in_proj_sec = Dense(d_inner, use_bias=self.bias, dtype=self.dtype,
                            kernel_init=trunc_normal_init(),
                            name="in_proj_sec")
        x_p, x2_p, xf_p = in_proj_sec(x), in_proj_sec(x2), in_proj_sec(x_fuse)
        z = self.act(xf_p)

        if self.d_conv > 1:
            conv = Conv2dSame(d_inner, (self.d_conv, self.d_conv),
                              feature_group_count=d_inner,
                              use_bias=self.conv_bias, dtype=self.dtype,
                              name="conv2d")
            x_p, x2_p, xf_p = conv(x_p), conv(x2_p), conv(xf_p)
        x_p, x2_p, xf_p = self.act(x_p), self.act(x2_p), self.act(xf_p)

        x_proj_weight = self.param("x_proj_weight", trunc_normal_init(),
                                   (K, R + 2 * N, d_inner))
        dt_projs_weight = self.param(
            "dt_projs_weight",
            dt_proj_weight_init(R, self.dt_scale, self.dt_init),
            (K, d_inner, R))
        dt_projs_bias = self.param(
            "dt_projs_bias",
            dt_proj_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (K, d_inner))
        A_logs = self.param("A_logs", a_log_init(N), (K * d_inner, N))
        Ds = self.param("Ds",
                        lambda key, shape, dtype=jnp.float32:
                        jnp.ones(shape, dtype),
                        (K * d_inner,))
        A = -jnp.exp(A_logs.astype(jnp.float32)).reshape(K, d_inner, N)
        Dmat = Ds.astype(jnp.float32).reshape(K, d_inner)
        bias = dt_projs_bias.astype(jnp.float32)
        out_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="out_norm")

        def core(v):
            dts, Bs, Cs = _project_kdirs(v, x_proj_weight, dt_projs_weight,
                                         R, N)
            y = core_dispatch(v, dts, Bs, Cs, A, Dmat, bias,
                              scan_mode=self.scan_mode,
                              backend=self.scan_backend,
                              scan_impl=self.scan_impl)
            return out_norm(y.astype(x.dtype))

        y_sum = (core(x_p) + core(x2_p) + core(xf_p)) * z
        out = Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="out_proj")(y_sum)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class FusionBlock(nn.Module):
    """Pre-norm cross-fusion block (`fusion_vmamba.py:613-643`): shared norm,
    Cross_SS2Dv5, droppath; residual x1 + x2 + attn(x1, x2)."""
    hidden_dim: int
    drop_path: float = 0.0
    attn_drop_rate: float = 0.0
    d_state: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")
        y = CrossSS2Dv5(d_model=self.hidden_dim, d_state=self.d_state,
                        dropout=self.attn_drop_rate, dtype=self.dtype,
                        name="self_attention")(norm(x1), norm(x2),
                                               deterministic=deterministic)
        y = DropPath(self.drop_path)(y, deterministic=deterministic)
        return x1 + x2 + y


class CSSFVSSLayer(nn.Module):
    """Stack of FusionBlocks (`fusion_vmamba.py:646-690`); depth 1 in the
    shipped XFMamba top.  The second view is held fixed across blocks."""
    hidden_dim: int
    depth: int = 1
    drop_path: Any = 0.0
    attn_drop_rate: float = 0.0
    d_state: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        for i in range(self.depth):
            dp = (self.drop_path[i] if isinstance(self.drop_path, (list,
                                                                   tuple))
                  else self.drop_path)
            x1 = FusionBlock(hidden_dim=self.hidden_dim, drop_path=float(dp),
                             attn_drop_rate=self.attn_drop_rate,
                             d_state=self.d_state, dtype=self.dtype,
                             name=f"block{i}")(x1, x2,
                                               deterministic=deterministic)
        return x1
