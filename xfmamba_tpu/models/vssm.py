"""VSSM backbone: hierarchical 4-stage visual state-space model.

Mirrors the reference architecture (``/root/reference/models/vmamba.py``):
VSSBlock (:1955-2042), VSSM (:2045-2372), Backbone_VSSM (:2376-2429 and the
XFMamba variant ``fusion_vmamba.py:1653-1724``) and the model factories
(:2433-2602) — rebuilt channel-last for TPU.  ``norm_layer`` ln/ln2d/bn only
changes the *external* layout in the reference; here everything is NHWC and
the converter absorbs layout differences.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xfmamba_tpu.models.layers import (
    LN_EPS, Conv2dSame, Dense, DropPath, GMlp, Mlp, PatchMerging2D,
    gelu, trunc_normal_init)
from xfmamba_tpu.models.ss2d import SS2D

_ACTS = dict(silu=nn.silu, gelu=gelu, relu=nn.relu,
             sigmoid=jax.nn.sigmoid)


def _gelu_pe(x):
    """Patch-embed GELU: tanh form on the TPU bf16 path under the same
    `GELU_TANH` policy the fused block kernels ship (NOTES r2s3: logits
    bitwise-equal at bf16 output precision; max abs dev ~3e-4), exact erf
    elsewhere.  Measured on-chip at the (128,112,112,48) embed map
    (scripts/ab_seg_ln.py follow-up, 2026-08-21): LN+erf 2.24 ms fwd /
    3.30 grad vs LN+tanh 1.11-1.24 / 2.13-2.15 — the erf rational is
    ~half the patch-embed glue.  Pallas/packed-layout LN alternatives
    measured WORSE (`ops/ablations/seg_ln.py` for the numbers)."""
    from xfmamba_tpu.ops import vss_block_pallas as _vbp
    if _vbp.GELU_TANH and jax.default_backend() == "tpu":
        return jax.nn.gelu(x, approximate=True)
    return gelu(x)


class PatchEmbedV1(nn.Module):
    """Single conv stride-4 patchify (`vmamba.py:2196-2202`)."""
    embed_dim: int
    patch_size: int = 4
    patch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Conv2dSame(self.embed_dim,
                       (self.patch_size, self.patch_size),
                       strides=(self.patch_size, self.patch_size),
                       padding="VALID", dtype=self.dtype, name="proj")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        return x


class PatchEmbedV2(nn.Module):
    """Two stride-2 convs with GELU between (`vmamba.py:2204-2219`).

    The XLA lowering multi-passes the LN(+GELU) between the convs (~2.0 of
    the embed's 2.4 ms at bs64); a Pallas fusion of those passes was built
    and MEASURED SLOWER (2.6x at C=48 lane occupancy) — it lives as a gated
    ablation in `ops/ablations/pe_fused.py` with the numbers."""
    embed_dim: int
    patch_size: int = 4
    patch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        stride = self.patch_size // 2
        k = stride + 1
        x = Conv2dSame(self.embed_dim // 2, (k, k), strides=(stride, stride),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv1")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm1")(x)
        x = _gelu_pe(x)
        x = Conv2dSame(self.embed_dim, (k, k), strides=(stride, stride),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv2")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm2")(x)
        return x


class DownsampleV2(nn.Module):
    """conv 2x2 stride 2 + norm (`vmamba.py:2221-2229`)."""
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2dSame(self.out_dim, (2, 2), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)


class DownsampleV3(nn.Module):
    """conv 3x3 stride 2 pad 1 + norm (`vmamba.py:2231-2239`) — the default
    for all shipped v05_noz configs."""
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2dSame(self.out_dim, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)


class VSSBlock(nn.Module):
    """Residual SS2D + optional MLP branch (`vmamba.py:1955-2042`)."""
    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v2"
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    post_norm: bool = False
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    def _fused_path(self, x, deterministic: bool):
        """Whole-block Pallas megakernel (TPU, bf16, v05_noz/d_state=1 —
        the shipped backbone config).  Returns None when not applicable;
        init-time always takes the composable path so the param tree is
        identical either way."""
        if self.is_initializing() or not deterministic:
            return None
        if (self.forward_type != "v05_noz" or self.ssm_d_state != 1
                or self.ssm_ratio <= 0 or self.ssm_act != "silu"
                or self.ssm_conv != 3 or self.post_norm or self.gmlp
                or self.mlp_act != "gelu" or self.dtype != jnp.bfloat16
                or jax.default_backend() == "cpu"):
            return None
        from xfmamba_tpu.ops import vss_block_pallas as _vbp
        from xfmamba_tpu.ops.vss_block_pallas import (
            fused_vss_block_supported, pick_group, vss_block_fused)
        if not _vbp.FUSED_INFERENCE:
            return None
        B, H, W, d = x.shape
        di = int(self.ssm_ratio * d)
        hd = int(self.hidden_dim * self.mlp_ratio)
        fuse_mlp = self.mlp_ratio > 0
        if not fused_vss_block_supported(H, W, d, di, hd, fuse_mlp):
            return None
        p = self.variables["params"]
        if "bias" in p["op"]["in_proj"] or "out_norm" not in p["op"] \
                or "norm" not in p["op"]["out_norm"]:
            return None
        from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
        if _v2.FUSED_V2:
            g2 = _v2.pick_group_v2(B, H, W, d, di, hd, fuse_mlp)
            if g2 is not None:
                y = _v2.vss_block_fused_v2(x.reshape(B, H * W, d), p, H, W,
                                           self.ssm_conv_bias, fuse_mlp, g2)
                return y.reshape(B, H, W, d)
        g = pick_group(B, H, W, d, di, hd, fuse_mlp)
        y = vss_block_fused(x.reshape(B, H * W, d), p, H, W,
                            self.ssm_conv_bias, fuse_mlp, g)
        return y.reshape(B, H, W, d)

    def _fused_train_path(self, x):
        """Fused TRAINING step for the SS2D half: v2 megakernel forward
        with the drop-path keep mask + the block-level adjoint kernel
        backward (`ops/vss_block_v2_adjoint.py`).  The MLP half stays
        composable — its fwd/bwd is pure MXU matmul work that XLA already
        runs at roofline, and fusing its weight-grad accumulators would
        blow the VMEM budget at stage-3 geometry.  Returns the SS2D-half
        output (x + droppath(SS2D(LN(x)))) or None when not applicable."""
        if self.is_initializing():
            return None
        if (self.forward_type != "v05_noz" or self.ssm_d_state != 1
                or self.ssm_ratio <= 0 or self.ssm_act != "silu"
                or self.ssm_conv != 3 or self.post_norm or self.gmlp
                or self.mlp_act != "gelu" or self.dtype != jnp.bfloat16
                or self.ssm_drop_rate != 0.0 or self.mlp_drop_rate != 0.0
                or jax.default_backend() == "cpu"):
            return None
        from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
        if not (_v2.FUSED_V2 and _v2.FUSED_TRAIN):
            return None
        B, H, W, d = x.shape
        di = int(self.ssm_ratio * d)
        # largest group whose forward AND adjoint both fit VMEM — the
        # shared helper is also compile-smoked per geometry on-chip
        from xfmamba_tpu.ops.vss_block_v2_adjoint import pick_train_group
        g2 = pick_train_group(B, H, W, d, di)
        if g2 is None:
            return None
        p = self.variables["params"]
        if "bias" in p["op"]["in_proj"] or "out_norm" not in p["op"] \
                or "norm" not in p["op"]["out_norm"]:
            return None
        from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params
        from xfmamba_tpu.ops.vss_block_v2_adjoint import vss_block_train_v2
        L = H * W
        if self.drop_path > 0.0:
            keep = 1.0 - self.drop_path
            m1 = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                      (B,)) / keep
        else:
            m1 = jnp.ones((B,), jnp.float32)
        m1 = jnp.broadcast_to(m1.astype(jnp.float32)[:, None, None],
                              (B, L, 1))
        m2 = jnp.ones((B, L, 1), jnp.float32)
        packed = pack_vss_block_params(p, x.dtype, fuse_mlp=False)
        y = vss_block_train_v2(H, W, self.ssm_conv_bias, False, g2,
                               x.reshape(B, L, d), m1, m2, *packed)
        return y.reshape(B, H, W, d)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fused = self._fused_path(x, deterministic)
        if fused is not None:
            return fused
        fused_ssm = (self._fused_train_path(x)
                     if not deterministic else None)

        def body(x):
            if fused_ssm is not None:
                x = fused_ssm
            elif self.ssm_ratio > 0:
                h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                 name="norm")(x)
                h = SS2D(d_model=self.hidden_dim, d_state=self.ssm_d_state,
                         ssm_ratio=self.ssm_ratio, dt_rank=self.ssm_dt_rank,
                         act=_ACTS[self.ssm_act], d_conv=self.ssm_conv,
                         conv_bias=self.ssm_conv_bias,
                         dropout=self.ssm_drop_rate,
                         initialize=self.ssm_init,
                         forward_type=self.forward_type, dtype=self.dtype,
                         name="op")(h, deterministic=deterministic)
                if self.post_norm:
                    h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                     name="norm")(h)
                x = x + DropPath(self.drop_path)(h,
                                                 deterministic=deterministic)
            if self.mlp_ratio > 0:
                h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                 name="norm2")(x)
                MLP = GMlp if self.gmlp else Mlp
                h = MLP(hidden_features=int(self.hidden_dim * self.mlp_ratio),
                        out_features=self.hidden_dim, act=_ACTS[self.mlp_act],
                        drop_rate=self.mlp_drop_rate, dtype=self.dtype,
                        name="mlp")(h, deterministic=deterministic)
                x = x + DropPath(self.drop_path)(h,
                                                 deterministic=deterministic)
            return x

        return body(x)


class VSSM(nn.Module):
    """4-stage hierarchical backbone + classifier (`vmamba.py:2045-2307`).

    At inference on TPU (bf16, v05_noz/d_state=1), whole stages run as ONE
    stage-stacked Pallas kernel (`vss_block_pallas_v2._vss_stage_call_v2`):
    block weights stream through the grid while the activation stays in
    VMEM scratch — no HBM round-trip or kernel ramp between blocks."""
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Any = 96
    num_classes: int = 1000
    patch_size: int = 4
    in_chans: int = 3
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = False
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v0"
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    downsample_version: str = "v3"
    patchembed_version: str = "v2"
    use_checkpoint: bool = False
    posembed: bool = False
    imgsize: int = 224
    # backbone mode: return per-stage features instead of logits
    out_indices: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @property
    def stage_dims(self):
        if isinstance(self.dims, int):
            return [self.dims * 2 ** i for i in range(len(self.depths))]
        return list(self.dims)

    def _fused_stage_path(self, x, i, depth, deterministic):
        """Whole-stage stacked megakernel (inference, TPU, bf16, the
        shipped v05_noz/d_state=1 config).  Returns None when not
        applicable; init always takes the composable path so the param
        tree is identical either way."""
        if self.is_initializing() or not deterministic or depth < 2:
            return None
        if (self.forward_type != "v05_noz" or self.ssm_d_state != 1
                or self.ssm_ratio <= 0 or self.ssm_act != "silu"
                or self.ssm_conv != 3 or self.gmlp
                or self.mlp_act != "gelu" or self.dtype != jnp.bfloat16
                or jax.default_backend() == "cpu"):
            return None
        from xfmamba_tpu.ops import vss_block_pallas as _vbp
        from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
        if not (_vbp.FUSED_INFERENCE and _v2.FUSED_V2 and _v2.FUSED_STAGE):
            return None
        B, H, W, d = x.shape
        di = int(self.ssm_ratio * d)
        hd = int(d * self.mlp_ratio)
        fuse_mlp = self.mlp_ratio > 0
        # leave headroom for the double-buffered per-block weight windows
        wbytes = 2 * (2 * d * di + (2 * d * hd if fuse_mlp else 0)
                      + 3 * di * di // 4) * 2
        g2 = _v2.pick_group_v2(
            B, H, W, d, di, hd, fuse_mlp,
            budget_bytes=_v2._VMEM_BUDGET_V2 - wbytes)
        if g2 is None:
            return None
        params = self.variables["params"]
        ps = []
        for j in range(depth):
            p = params.get(f"stage{i}_block{j}")
            if (p is None or "bias" in p["op"]["in_proj"]
                    or "out_norm" not in p["op"]
                    or "norm" not in p["op"]["out_norm"]):
                return None
            ps.append(p)
        y = _v2.vss_stage_fused_v2(x.reshape(B, H * W, d), ps, H, W,
                                   self.ssm_conv_bias, fuse_mlp, g2)
        return y.reshape(B, H, W, d)

    def _fused_stage_train_path(self, x, i, depth, dprs):
        """Stage-stacked TRAINING forward (`ops/vss_stage_train.py`): one
        kernel per stage with the MLP halves fused and per-block drop-path
        masks; backward = per-block adjoint kernel + XLA MLP-half vjp from
        the kernel-saved mid-points.  Returns None when not applicable."""
        if self.is_initializing() or depth < 2 or self.use_checkpoint:
            return None
        if (self.forward_type != "v05_noz" or self.ssm_d_state != 1
                or self.ssm_ratio <= 0 or self.ssm_act != "silu"
                or self.ssm_conv != 3 or self.gmlp or self.mlp_ratio <= 0
                or self.mlp_act != "gelu" or self.dtype != jnp.bfloat16
                or self.ssm_drop_rate != 0.0 or self.mlp_drop_rate != 0.0
                or jax.default_backend() == "cpu"):
            return None
        from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
        if not (_v2.FUSED_V2 and _v2.FUSED_TRAIN and _v2.FUSED_STAGE_TRAIN):
            return None
        B, H, W, d = x.shape
        di = int(self.ssm_ratio * d)
        hd = int(d * self.mlp_ratio)
        from xfmamba_tpu.ops.vss_stage_train import (
            pick_stage_train_groups, vss_stage_train)
        groups = pick_stage_train_groups(B, H, W, d, di, hd)
        if groups is None:
            return None
        params = self.variables["params"]
        ps = []
        for j in range(depth):
            p = params.get(f"stage{i}_block{j}")
            if (p is None or "bias" in p["op"]["in_proj"]
                    or "out_norm" not in p["op"]
                    or "norm" not in p["op"]["out_norm"]):
                return None
            ps.append(p)
        from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params
        packed = [pack_vss_block_params(p, x.dtype, fuse_mlp=True)
                  for p in ps]
        stacked = tuple(jnp.stack(ws) for ws in zip(*packed))
        L = H * W
        masks = []
        for rate in dprs:
            pair = []
            for _ in range(2):   # SS2D-half and MLP-half draws (DropPath)
                if rate > 0.0:
                    keep = 1.0 - rate
                    m = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                             (B,)) / keep
                else:
                    m = jnp.ones((B,), jnp.float32)
                pair.append(jnp.broadcast_to(
                    m.astype(jnp.float32)[:, None, None], (B, L, 1)))
            masks.append(pair)
        m1 = jnp.stack([p[0] for p in masks])
        m2 = jnp.stack([p[1] for p in masks])
        y = vss_stage_train(H, W, self.ssm_conv_bias, groups[0], groups[1],
                            x.reshape(B, L, d), m1, m2, *stacked)
        return y.reshape(B, H, W, d)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dims = self.stage_dims
        num_layers = len(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))

        PE = dict(v1=PatchEmbedV1, v2=PatchEmbedV2)[self.patchembed_version]
        x = PE(embed_dim=dims[0], patch_size=self.patch_size,
               patch_norm=self.patch_norm, dtype=self.dtype,
               name="patch_embed")(x, deterministic=deterministic)

        if self.posembed:
            hp = wp = self.imgsize // self.patch_size
            pos = self.param("pos_embed", trunc_normal_init(),
                             (1, hp, wp, dims[0]))
            x = x + pos

        # activation rematerialization: recompute each block's activations in
        # the backward pass (the TPU analogue of torch.utils.checkpoint at
        # `vmamba.py:2038-2042`), trading FLOPs for HBM.
        Block = (nn.remat(VSSBlock, static_argnums=(2,))
                 if self.use_checkpoint else VSSBlock)

        outs = []
        for i in range(num_layers):
            fused_stage = self._fused_stage_path(x, i, self.depths[i],
                                                 deterministic)
            if fused_stage is None and not deterministic:
                dprs = [float(dpr[sum(self.depths[:i]) + j])
                        for j in range(self.depths[i])]
                fused_stage = self._fused_stage_train_path(
                    x, i, self.depths[i], dprs)
            if fused_stage is not None:
                x = fused_stage
            for j in range(self.depths[i] if fused_stage is None else 0):
                x = Block(
                    hidden_dim=dims[i],
                    drop_path=float(dpr[sum(self.depths[:i]) + j]),
                    ssm_d_state=self.ssm_d_state, ssm_ratio=self.ssm_ratio,
                    ssm_dt_rank=self.ssm_dt_rank, ssm_act=self.ssm_act,
                    ssm_conv=self.ssm_conv,
                    ssm_conv_bias=self.ssm_conv_bias,
                    ssm_drop_rate=self.ssm_drop_rate,
                    ssm_init=self.ssm_init, forward_type=self.forward_type,
                    mlp_ratio=self.mlp_ratio, mlp_act=self.mlp_act,
                    mlp_drop_rate=self.mlp_drop_rate, gmlp=self.gmlp,
                    use_checkpoint=self.use_checkpoint, dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, deterministic=deterministic)
            if self.out_indices is not None and i in self.out_indices:
                o = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                 name=f"outnorm{i}")(x)
                outs.append(o)
            if i < num_layers - 1:
                if self.downsample_version == "v1":
                    x = PatchMerging2D(out_dim=dims[i + 1], dtype=self.dtype,
                                       name=f"downsample{i}")(x)
                elif self.downsample_version == "v2":
                    x = DownsampleV2(out_dim=dims[i + 1], dtype=self.dtype,
                                     name=f"downsample{i}")(x)
                elif self.downsample_version == "v3":
                    x = DownsampleV3(out_dim=dims[i + 1], dtype=self.dtype,
                                     name=f"downsample{i}")(x)
                elif self.downsample_version == "none":
                    pass
                else:
                    raise ValueError(self.downsample_version)

        if self.out_indices is not None:
            return outs

        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                         name="classifier_norm")(x)
        x = x.mean(axis=(1, 2))
        x = Dense(self.num_classes, dtype=self.dtype,
                  kernel_init=trunc_normal_init(),
                  name="classifier_head")(x)
        return x


def backbone_vssm(depths=(2, 2, 15, 2), dims=96, drop_path_rate=0.3,
                  ssm_ratio=2.0, out_indices=(0, 1, 2, 3), **kw):
    """Feature-pyramid backbone with XFMamba's defaults
    (`fusion_vmamba.py:1653-1663`: VMamba-S geometry, d_state=1, v05_noz)."""
    defaults = dict(
        ssm_d_state=1, ssm_dt_rank="auto", ssm_act="silu", ssm_conv=3,
        ssm_conv_bias=False, ssm_drop_rate=0.0, ssm_init="v0",
        forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
        mlp_drop_rate=0.0, gmlp=False, patch_norm=True,
        downsample_version="v3", patchembed_version="v2", posembed=False,
        imgsize=224,
    )
    defaults.update(kw)
    return VSSM(depths=depths, dims=dims, drop_path_rate=drop_path_rate,
                ssm_ratio=ssm_ratio, out_indices=out_indices, **defaults)


# =====================================================================
# model factories (`vmamba.py:2433-2602`)
# =====================================================================

def _vssm(depths, dims, dpr, d_state, ratio, ftype, down, pe, conv_bias,
          mlp_ratio, num_classes=1000, ssm_init="v0", ssm_act="silu"):
    return VSSM(depths=depths, dims=dims, drop_path_rate=dpr,
                num_classes=num_classes, ssm_d_state=d_state,
                ssm_ratio=ratio, ssm_act=ssm_act, ssm_conv=3,
                ssm_conv_bias=conv_bias, ssm_init=ssm_init,
                forward_type=ftype, mlp_ratio=mlp_ratio,
                downsample_version=down, patchembed_version=pe)


def vanilla_vmamba_tiny(num_classes=1000):
    return _vssm((2, 2, 9, 2), 96, 0.2, 16, 2.0, "v0", "v1", "v1", True, 0.0,
                 num_classes)


def vanilla_vmamba_small(num_classes=1000):
    return _vssm((2, 2, 27, 2), 96, 0.3, 16, 2.0, "v0", "v1", "v1", True,
                 0.0, num_classes)


def vanilla_vmamba_base(num_classes=1000):
    return _vssm((2, 2, 27, 2), 128, 0.6, 16, 2.0, "v0", "v1", "v1", True,
                 0.0, num_classes)


def vmamba_tiny_s2l5(num_classes=1000):
    return _vssm((2, 2, 5, 2), 96, 0.2, 1, 2.0, "v05_noz", "v3", "v2", False,
                 4.0, num_classes)


def vmamba_small_s2l15(num_classes=1000):
    return _vssm((2, 2, 15, 2), 96, 0.3, 1, 2.0, "v05_noz", "v3", "v2",
                 False, 4.0, num_classes)


def vmamba_base_s2l15(num_classes=1000):
    return _vssm((2, 2, 15, 2), 128, 0.6, 1, 2.0, "v05_noz", "v3", "v2",
                 False, 4.0, num_classes)


def vmamba_tiny_s1l8(num_classes=1000):
    return _vssm((2, 2, 8, 2), 96, 0.2, 1, 1.0, "v05_noz", "v3", "v2", False,
                 4.0, num_classes)


def vmamba_small_s1l20(num_classes=1000):
    return _vssm((2, 2, 20, 2), 96, 0.3, 1, 1.0, "v05_noz", "v3", "v2",
                 False, 4.0, num_classes)


def vmamba_base_s1l20(num_classes=1000):
    return _vssm((2, 2, 20, 2), 128, 0.5, 1, 1.0, "v05_noz", "v3", "v2",
                 False, 4.0, num_classes)


def vmamba_tiny_m2(num_classes=1000):
    """Mamba-2 (SSD) tiny (`vmamba.py:2570-2582`): d_state 64, GELU,
    forward_type m0_noz, ssm_init v2."""
    return _vssm((2, 2, 4, 2), 96, 0.2, 64, 1.0, "m0_noz", "v3", "v2", False,
                 4.0, num_classes, ssm_init="v2", ssm_act="gelu")


def vmamba_small_m2(num_classes=1000):
    return _vssm((2, 2, 12, 2), 96, 0.3, 64, 1.0, "m0_noz", "v3", "v2",
                 False, 4.0, num_classes, ssm_init="v2", ssm_act="gelu")


def vmamba_base_m2(num_classes=1000):
    return _vssm((2, 2, 12, 2), 128, 0.3, 64, 1.0, "m0_noz", "v3", "v2",
                 False, 4.0, num_classes, ssm_init="v2", ssm_act="gelu")


def build_model(num_classes=1000):
    """`models/__init__.py:50-53` — the default backbone is VMamba-S s2l15."""
    return vmamba_small_s2l15(num_classes=num_classes)


def single_channel_feature_extract_mamba(num_classes=2):
    """`fusion_vmamba.py:1728-1739`."""
    return vmamba_small_s2l15(num_classes=num_classes)
