"""Shared layer primitives for the VSSM/XFMamba family.

Everything in this framework is **channel-last** (B, H, W, C): on TPU the
channel axis maps onto vector lanes and convs/matmuls tile onto the MXU
without layout churn.  The reference's ``Linear2d`` / ``LayerNorm2d``
channel-first machinery (``/root/reference/models/vmamba.py:42-57``) therefore
collapses to plain Dense/LayerNorm here; the distinction only survives in the
checkpoint converter, which folds the layout differences into weight
reshapes.

Initializers replicate PyTorch defaults where the reference depends on them
(`vmamba.py:2176-2183` trunc-normal Linear init; torch Conv2d kaiming-uniform
default) so from-scratch training starts from the same distribution.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch LayerNorm epsilon (flax default is 1e-6 — must match torch's 1e-5)
LN_EPS = 1e-5


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU default; flax's nn.gelu defaults to
    the tanh approximation, which breaks logit parity."""
    return jax.nn.gelu(x, approximate=False)


def trunc_normal_init(std: float = 0.02):
    """timm-style truncated normal (±2σ), used by VSSM._init_weights."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: kaiming_uniform(a=sqrt(5)) on (out,in/g,kh,kw);
    our kernels are HWIO (kh, kw, in/g, out) so fan_in = kh*kw*in/g."""
    kh, kw, in_g, out = shape
    fan_in = kh * kw * in_g
    bound = math.sqrt(6.0 / ((1 + 5) * fan_in))  # gain^2 = 2/(1+a^2) = 1/3
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default (kaiming_uniform a=sqrt(5)) on (in, out)."""
    in_f, _ = shape
    bound = math.sqrt(1.0 / in_f)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nn.Dense):
    """nn.Dense with torch-Linear default init (overridden to trunc-normal by
    backbone-level _init_weights semantics where applicable)."""
    kernel_init: Callable = torch_linear_kernel_init

    def __post_init__(self):
        super().__post_init__()


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference uses timm DropPath on the
    residual branch, `vmamba.py:2016`)."""
    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic,
                                       deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        leaves = jax.tree_util.tree_leaves(x)
        batch = leaves[0].shape[0]
        mask = jax.random.bernoulli(rng, keep, (batch,))

        def apply(v):
            shape = (batch,) + (1,) * (v.ndim - 1)
            return jnp.where(mask.reshape(shape), v / keep,
                             jnp.zeros_like(v))
        return jax.tree_util.tree_map(apply, x)


class Mlp(nn.Module):
    """Two-layer MLP (`vmamba.py:110-128`)."""
    hidden_features: int
    out_features: int
    act: Callable = gelu
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.hidden_features, dtype=self.dtype,
                  kernel_init=trunc_normal_init(), name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = Dense(self.out_features, dtype=self.dtype,
                  kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class GMlp(nn.Module):
    """Gated MLP (`vmamba.py:131-149`)."""
    hidden_features: int
    out_features: int
    act: Callable = gelu
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(2 * self.hidden_features, dtype=self.dtype,
                  kernel_init=trunc_normal_init(), name="fc1")(x)
        x, z = jnp.split(x, 2, axis=-1)
        x = Dense(self.out_features, dtype=self.dtype,
                  kernel_init=trunc_normal_init(), name="fc2")(x * self.act(z))
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class PatchMerging2D(nn.Module):
    """2x2 neighborhood concat + norm + linear reduction
    (`vmamba.py:60-98`); downsample "v1" used by the vanilla-v0 configs."""
    out_dim: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        out = self.out_dim if self.out_dim > 0 else 2 * C
        x = Dense(out, use_bias=False, dtype=self.dtype,
                  kernel_init=trunc_normal_init(), name="reduction")(x)
        return x


class Conv2dSame(nn.Module):
    """Thin wrapper over nn.Conv with torch-default init; NHWC in/out."""
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.feature_group_count
                  * self.kernel_size[0] * self.kernel_size[1])
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
            name="conv")(x)


def softmax_spatial(x):
    """Softmax over the flattened spatial axes of (B, H, W, C)
    (`vmamba.py:152-161` SoftmaxSpatial, used by the `_onsoftmax` out-norm)."""
    B, H, W, C = x.shape
    y = jax.nn.softmax(x.reshape(B, H * W, C), axis=1)
    return y.reshape(B, H, W, C)
