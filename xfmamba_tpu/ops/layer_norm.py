"""Fused dropout + residual + LayerNorm/RMSNorm (+ linear) op family.

TPU-native equivalent of the reference's Triton layer-norm package
(`/root/reference/models/mamba2/layer_norm.py`): `layer_norm_fn`
(:1063-ish public entry, ref semantics at `layer_norm_ref:19-71`),
`rms_norm_fn` (`rms_norm_ref:74-125`), and the fused
`LayerNormLinearFn` (`layer_norm.py:956`).  The reference hand-fuses
rowscale -> dropout -> parallel-branch add -> residual add -> one or two
norms (-> linear) into one Triton kernel; on TPU every step is a cheap
VPU/MXU primitive that XLA fuses into a single HBM pass by itself, so
this is deliberately an XLA lowering, not a Pallas kernel — measured at
the HBM-bandwidth roofline (see NOTES.md measurement methodology).

Unused by the XFMamba model itself (the reference only ships it inside
the vendored mamba2 package); provided for capability parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _norm(x, weight, bias, eps, is_rms_norm):
    """f32 LayerNorm/RMSNorm over the last axis; weight/bias may be None
    (None weight = identity scale, matching the reference)."""
    if is_rms_norm:
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        xhat = x * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xhat = xc * jax.lax.rsqrt(var + eps)
    if weight is not None:
        xhat = xhat * weight.astype(jnp.float32)
    if bias is not None:
        xhat = xhat + bias.astype(jnp.float32)
    return xhat


def _dropout(x, p, rng):
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0), keep


def layer_norm_fn(
    x,
    weight,
    bias=None,
    residual=None,
    x1=None,
    weight1=None,
    bias1=None,
    eps: float = 1e-6,
    dropout_p: float = 0.0,
    rowscale=None,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    is_rms_norm: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    return_dropout_mask: bool = False,
):
    """`layer_norm_ref` semantics (`layer_norm.py:19-71`):

        x = rowscale[..., None] * x            (rowscale, main branch only)
        x = dropout(x); x1 = dropout(x1)       (independent masks)
        x = x + x1                             (parallel branch)
        x = x + residual                       (residual add, f32)
        out  = norm(x, weight,  bias)
        out1 = norm(x, weight1, bias1)         (second weight set, optional)

    Returns out [, out1] [, residual_out if prenorm] [, masks if
    return_dropout_mask].  residual_out is f32 when residual_in_fp32 or an
    incoming residual is f32, else x.dtype (matching the reference's
    residual_dtype logic).
    """
    dtype = x.dtype
    res_dtype = (jnp.float32 if residual_in_fp32
                 else (residual.dtype if residual is not None else dtype))
    xf = x.astype(jnp.float32)
    x1f = x1.astype(jnp.float32) if x1 is not None else None
    if rowscale is not None:
        assert x1 is None, "rowscale unsupported with parallel LayerNorm"
        xf = xf * rowscale.astype(jnp.float32)[..., None]
    mask = mask1 = None
    if dropout_p > 0.0:
        assert dropout_rng is not None, "dropout needs dropout_rng"
        r0, r1 = jax.random.split(dropout_rng)
        xf, mask = _dropout(xf, dropout_p, r0)
        if x1f is not None:
            x1f, mask1 = _dropout(x1f, dropout_p, r1)
    if x1f is not None:
        xf = xf + x1f
    if residual is not None:
        xf = xf + residual.astype(jnp.float32)
    out = _norm(xf, weight, bias, eps, is_rms_norm).astype(dtype)
    outs = (out,)
    if weight1 is not None:
        outs += (_norm(xf, weight1, bias1, eps, is_rms_norm).astype(dtype),)
    if prenorm:
        outs += (xf.astype(res_dtype),)
    if return_dropout_mask:
        outs += (mask,) if x1 is None else (mask, mask1)
    return outs[0] if len(outs) == 1 else outs


def rms_norm_fn(x, weight, bias=None, residual=None, x1=None, weight1=None,
                bias1=None, eps: float = 1e-6, dropout_p: float = 0.0,
                rowscale=None, prenorm: bool = False,
                residual_in_fp32: bool = False,
                dropout_rng: Optional[jax.Array] = None,
                return_dropout_mask: bool = False):
    """RMSNorm variant (`layer_norm.py:74-125`, public fn :876-923)."""
    return layer_norm_fn(x, weight, bias, residual=residual, x1=x1,
                         weight1=weight1, bias1=bias1, eps=eps,
                         dropout_p=dropout_p, rowscale=rowscale,
                         prenorm=prenorm,
                         residual_in_fp32=residual_in_fp32,
                         is_rms_norm=True, dropout_rng=dropout_rng,
                         return_dropout_mask=return_dropout_mask)


def layer_norm_linear_fn(
    x,
    norm_weight,
    norm_bias,
    linear_weight,
    linear_bias=None,
    residual=None,
    eps: float = 1e-6,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    is_rms_norm: bool = False,
):
    """Fused residual-add + norm + linear (`LayerNormLinearFn`,
    `layer_norm.py:956-1061`): out = norm(x [+ residual]) @ W [+ b].

    linear_weight is (d_in, d_out) (JAX convention; the reference's
    torch Linear stores the transpose).  The matmul runs in x.dtype on
    the MXU with f32 accumulation; prenorm additionally returns the
    pre-norm residual stream.
    """
    dtype = x.dtype
    res_dtype = (jnp.float32 if residual_in_fp32
                 else (residual.dtype if residual is not None else dtype))
    xf = x.astype(jnp.float32)
    if residual is not None:
        xf = xf + residual.astype(jnp.float32)
    y = _norm(xf, norm_weight, norm_bias, eps, is_rms_norm)
    out = jnp.einsum("...d,de->...e", y.astype(dtype), linear_weight,
                     preferred_element_type=jnp.float32)
    if linear_bias is not None:
        out = out + linear_bias.astype(jnp.float32)
    out = out.astype(dtype)
    return (out, xf.astype(res_dtype)) if prenorm else out
