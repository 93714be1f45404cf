"""Fused per-position LayerNorm (+ optional tanh-GELU) for the patch-embed
and downsample glue.

Why: the composable patch embed (`models/vssm.py` PatchEmbedV2, mirroring
`/root/reference/models/vmamba.py:2204-2219`) spends ~2.0 ms of its 2.4 ms
at bs64 in the LN+GELU between the two stride-2 convs
(scripts/probe_glue2.py, 2026-08-21): XLA lowers the LN over C=48 lanes as
multiple f32 HBM passes over the (128, 112, 112, 48) map.  One Pallas pass
(moments via ones-column MXU dots, the `_ln_fwd_cache` trick from the
adjoint kernel) reads the map once and writes it once.

Inference-only: the composable path keeps exact autodiff semantics for
training and init (the standard fused-path gating pattern of this repo).

MEASURED DEAD END — default OFF.  On-chip one-process A/B
(scripts/ab_pe_fused.py, 2026-08-21): embed 2.23 ms composable vs
5.82 ms fused; model bs64 57.2 ms (regression).  The (rows, C=48)
layout runs every whole-map VPU op at 48/128 lane utilisation and the
per-image ones-column moment dots (M=12544, K=48->128, N=1->128) cost
more than the XLA passes they replace; 128 small grid steps add ramp on
top.  A sublane-major (C on sublanes, pixels on lanes) variant would
need two XLA transposes (~0.75 ms round trip) that eat the win.  Kept
as a tested, gated ablation — quarantined here (`ops/ablations/`); the
live `models/vssm.py` PatchEmbedV2 no longer dispatches to it.  To
reproduce the measurement: scripts/ab_pe_fused.py (builds the fused
embed from this module directly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import _gelu_exact

f32 = jnp.float32

# kill switch — measured slower than the composable lowering (docstring)
PE_FUSED = False


def _ln_act_kernel(C, eps, act_gelu, x_ref, sb_ref, y_ref):
    x = x_ref[0].astype(f32)                      # (rows, C)
    ones = jnp.ones((C, 1), f32)
    mu = jax.lax.dot(x, ones, preferred_element_type=f32) / C
    xc = x - mu
    var = jax.lax.dot(xc * xc, ones, preferred_element_type=f32) / C
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * sb_ref[0:1, :] + sb_ref[1:2, :]
    if act_gelu:
        y = _gelu_exact(y)
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act_gelu", "eps", "interpret",
                                             "row_block"))
def ln_act_fused(x, scale, bias, act_gelu=False, eps=1e-5, interpret=False,
                 row_block=None):
    """LayerNorm over the trailing channel dim of ``x (B, H, W, C)`` (+
    optional GELU), one VMEM pass per image.  ``scale``/``bias`` are the
    LN affine params (C,)."""
    B, H, W, C = x.shape
    rows = H * W
    rb = row_block or rows
    assert rows % rb == 0 and (rb % 8 == 0 or rb == rows)
    sb = jnp.stack([scale.astype(f32), bias.astype(f32)])
    kernel = functools.partial(_ln_act_kernel, C, eps, act_gelu)
    y = pl.pallas_call(
        kernel,
        grid=(B, rows // rb),
        in_specs=[pl.BlockSpec((1, rb, C), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rb, C), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(B, rows, C), sb)
    return y.reshape(B, H, W, C)


def ln_act_supported(x, dtype):
    """Gate mirroring the other fused paths: TPU, bf16, aligned rows —
    AND the PE_FUSED kill switch (measured slower, see module docstring)."""
    if not PE_FUSED:
        return False
    if dtype != jnp.bfloat16 or x.dtype != jnp.bfloat16:
        return False
    if jax.default_backend() != "tpu":  # the kernel is Mosaic-TPU only
        return False
    B, H, W, C = x.shape
    return (H * W) % 8 == 0 and C % 8 == 0
