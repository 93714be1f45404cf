"""Multi-view model tops (reference: ``/root/reference/net_fusionmamba.py``).

All tops take single-channel views (B, H, W, 1) channel-last and return
logits.  ``TwoViewXFMamba`` is THE XFMamba model (:141-210): shared
Backbone_VSSM, stage-3 features, shallow swap-fusion, deep cross-fusion,
1x1 conv, avgpool+linear classifier.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xfmamba_tpu.models.fusion import (
    CSSFVSSLayer, ShallowFusionBlock)
from xfmamba_tpu.models.layers import Conv2dSame, Dense, trunc_normal_init
from xfmamba_tpu.models.vssm import VSSM, build_model

# Backbone geometry per model size (`net_fusionmamba.py:151-159`)
_BACKBONE_CFG = dict(
    small=dict(depths=(2, 2, 15, 2), dims=96, drop_path_rate=0.3,
               ssm_ratio=2.0),
    base=dict(depths=(2, 2, 15, 2), dims=128, drop_path_rate=0.6,
              ssm_ratio=2.0),
    tiny=dict(depths=(2, 2, 8, 2), dims=96, drop_path_rate=0.2,
              ssm_ratio=1.0),
)

_BACKBONE_DEFAULTS = dict(
    ssm_d_state=1, ssm_dt_rank="auto", ssm_act="silu", ssm_conv=3,
    ssm_conv_bias=False, ssm_drop_rate=0.0, ssm_init="v0",
    forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
    mlp_drop_rate=0.0, gmlp=False, patch_norm=True,
    downsample_version="v3", patchembed_version="v2", posembed=False,
    out_indices=(0, 1, 2, 3),
)


def _make_backbone(model_type: str, dtype, use_checkpoint: bool = False,
                   overrides=None):
    cfg = dict(_BACKBONE_DEFAULTS)
    cfg.update(_BACKBONE_CFG[model_type])
    if overrides:
        cfg.update(overrides)
    return VSSM(dtype=dtype, use_checkpoint=use_checkpoint,
                name="mamba_feature_extrac", **cfg)


def _expand_gray(x):
    """1-channel -> 3-channel expand (`net_fusionmamba.py:59,:194-195`)."""
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    return x


class SingleViewMamba(nn.Module):
    """Full VSSM classifier on one view (`net_fusionmamba.py:29-62`)."""
    outputs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = _expand_gray(x)
        model = build_model(num_classes=self.outputs).clone(
            dtype=self.dtype, name="singleviewmamba", parent=self.scope)
        return model(x, deterministic=deterministic)


class TwoViewLateJoinMamba(nn.Module):
    """Shared backbone, concat stage-3 features, avgpool+linear
    (`net_fusionmamba.py:64-96`)."""
    outputs: int = 2
    hidden_dim: int = 768 * 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_a, x_b, deterministic: bool = True):
        backbone = _make_backbone("small", self.dtype)
        Bv = x_a.shape[0]
        zcat = backbone(jnp.concatenate(
            [_expand_gray(x_a), _expand_gray(x_b)], axis=0),
            deterministic=deterministic)[3]
        z_a, z_b = zcat[:Bv], zcat[Bv:]
        z = jnp.concatenate([z_a, z_b], axis=-1)
        z = z.mean(axis=(1, 2))
        return Dense(self.outputs, dtype=self.dtype,
                     kernel_init=trunc_normal_init(),
                     name="classifier_head")(z)


class TwoViewEarlyFusionMamba(nn.Module):
    """Pixel-level fusion: concat 3+3 channels, 1x1 conv + BN + ReLU, one
    backbone (`net_fusionmamba.py:98-138`)."""
    outputs: int = 2
    hidden_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_a, x_b, deterministic: bool = True,
                 train_bn: bool = False):
        x = jnp.concatenate([_expand_gray(x_a), _expand_gray(x_b)], axis=-1)
        x = Conv2dSame(3, (1, 1), dtype=self.dtype, name="fusion_conv")(x)
        x = nn.BatchNorm(use_running_average=not train_bn, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype,
                         name="fusion_bn")(x)
        x = nn.relu(x)
        backbone = _make_backbone("small", self.dtype)
        z = backbone(x, deterministic=deterministic)[3]
        z = z.mean(axis=(1, 2))
        return Dense(self.outputs, dtype=self.dtype,
                     kernel_init=trunc_normal_init(),
                     name="classifier_head")(z)


class TwoViewXFMamba(nn.Module):
    """THE XFMamba model (`net_fusionmamba.py:141-210`)."""
    outputs: int = 2
    model_type: str = "small"  # 'tiny' | 'small' | 'base'
    hidden_dim: int = 768      # stage-3 dim: 768 (tiny/small), 1024 (base)
    depth: int = 1
    attn_drop_rate: float = 0.0
    d_state: int = 16
    drop_path_rate: float = 0.1
    use_checkpoint: bool = False
    # test/experiment hook: override backbone geometry (depths/dims/...)
    backbone_overrides: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_a, x_b, deterministic: bool = True):
        backbone = _make_backbone(self.model_type, self.dtype,
                                  self.use_checkpoint,
                                  self.backbone_overrides)
        # both views share backbone weights: run them as ONE batched pass
        # (identical math per image; halves kernel dispatches and compiles
        # the backbone graph once instead of twice)
        Bv = x_a.shape[0]
        zcat = backbone(jnp.concatenate(
            [_expand_gray(x_a), _expand_gray(x_b)], axis=0),
            deterministic=deterministic)[3]
        z_a, z_b = zcat[:Bv], zcat[Bv:]

        # saliency hooks (GradCAM-equivalent, `2_inference_mura.py:109-121`):
        # `sow` exposes the stage-3 feature maps via capture_intermediates;
        # `perturb` exposes their gradients via the 'perturbations' collection
        # (both no-ops unless the caller requests the collections)
        z_a = self.perturb("stage3_a", z_a)
        z_b = self.perturb("stage3_b", z_b)
        self.sow("intermediates", "stage3_a", z_a)
        self.sow("intermediates", "stage3_b", z_b)

        z_a, z_b = ShallowFusionBlock(
            hidden_dim=self.hidden_dim,
            attn_drop_rate=self.attn_drop_rate, d_state=self.d_state,
            dtype=self.dtype, name="shallow_mamba_fusion")(
                z_a, z_b, deterministic=deterministic)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        z = CSSFVSSLayer(
            hidden_dim=self.hidden_dim, depth=self.depth,
            drop_path=[float(d) for d in dpr],
            attn_drop_rate=self.attn_drop_rate, d_state=self.d_state,
            dtype=self.dtype, name="fusemamba")(
                z_a, z_b, deterministic=deterministic)

        z = Conv2dSame(self.hidden_dim, (1, 1), dtype=self.dtype,
                       name="final_conv")(z)
        z = z.mean(axis=(1, 2))
        return Dense(self.outputs, dtype=self.dtype,
                     kernel_init=trunc_normal_init(),
                     name="classifier_head")(z)


def two_view_xfmamba(size: str = "small", outputs: int = 2, **kw):
    """Factory mirroring the CLI names (`1_train_model.py:122-127`):
    twoviewxfmamba / twoviewxfmamba_tiny / twoviewxfmamba_base."""
    hidden = 1024 if size == "base" else 768
    return TwoViewXFMamba(outputs=outputs, model_type=size,
                          hidden_dim=hidden, **kw)


class ModelWrapper(nn.Module):
    """Channel-stacked single-input adapter for saliency tools
    (`net_fusionmamba.py:10-26`): splits (B, H, W, 2*C) into two views."""
    model: nn.Module
    output_index: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1] // 2
        out = self.model(x[..., :C], x[..., C:], deterministic=deterministic)
        if isinstance(out, (tuple, list)):
            return out[self.output_index]
        return out
