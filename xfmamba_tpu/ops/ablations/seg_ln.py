"""Segment-packed LayerNorm (+ optional exact GELU) for the patch-embed /
downsample glue.

Why this exists: the patch embed (`models/vssm.py` PatchEmbedV2, mirroring
`/root/reference/models/vmamba.py:2204-2219`) spends ~2.0 of its 2.4 ms at
bs64 in the LN(+GELU) between the two stride-2 convs — XLA multi-passes the
(128, 112, 112, 48) f32 map.  The first Pallas attempt
(`ops/ablations/pe_fused.py`) kept the natural (rows, C=48) layout and was
2.6x SLOWER: every VPU op ran at 48/128 lane occupancy and the per-row
moment dots were M-huge/N-1 shaped.

The fix is LAYOUT, not fusion: since NHWC memory is C-fastest, a free
reshape packs P = lcm(C,128)/C consecutive *pixels* into one row of
width = P*C full lanes (C=48 -> 8 px x 384 lanes).  Per-pixel moments then
become two tiny MXU dots against a block-diagonal segment one-hot
((width, P) iota mask), and every elementwise op runs at full lane width.
One HBM read + one write replaces XLA's multi-pass; the custom VJP's
backward kernel does the same for the LN(+GELU) gradient (dscale/dbias
accumulated across grid steps, folded P-wise outside).

MEASURED DEAD END — quarantined here, not wired into the model.  On-chip
one-process A/B (scripts/ab_seg_ln.py, 2026-08-21, bs64 two-view):

  geometry                 XLA fwd   seg fwd   XLA grad   seg grad
  (128,112,112,48)+GELU    1.92 ms   3.07 ms   3.32 ms    4.45 ms
  (128,56,56,96)           0.06      1.09      0.12       1.44
  (128,28,28,192)          ~0        0.20      0.08       0.50

Post-mortem: (1) XLA's LN at C>=96 is effectively free — the multipass
story only holds at C=48; (2) at C=48 roughly HALF the XLA cost is the
exact-erf GELU, not the LN (LN+erf 2.24 ms vs LN+tanh 1.11-1.24 — shipped
as the `_gelu_pe` tanh policy in `models/vssm.py` instead); (3) this
kernel's per-step cost is dominated by the 4 small moment dots (M=2048,
N=8->pad128, ~3 us fixed cost each x 98 grid steps ~= 1.2 ms) plus the
~13 whole-map f32 VPU ops, which together sit ABOVE XLA's fused tanh
lowering.  A pure-XLA formulation of the same segment-packed math was 4x
worse again (4.23 ms fwd — materialized intermediates).  The correctness
tests (tests/test_seg_ln.py) stay green as the negative-record contract.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import _gelu_exact

f32 = jnp.float32

# kill switch for A/B scripts
SEG_LN = True

_ROW_BLOCK = 2048
# ~10 live (rb, width) f32 values between the fwd/bwd phases + pipelined
# bf16 I/O double buffers; the default 16 MB scoped limit is too small
_VMEM_MB = 64


def seg_pack(C: int):
    """(P, width) lane packing for channel count C, or None if C doesn't
    tile the lane dimension reasonably (width must divide into 128-lane
    tiles and stay small enough to keep the one-hot dots cheap)."""
    width = (C * 128) // math.gcd(C, 128)   # lcm
    if width > 1024:
        return None
    return width // C, width


def _seg_onehot(width, P, C, transposed):
    if transposed:
        a = jax.lax.broadcasted_iota(jnp.int32, (P, width), 0)
        b = jax.lax.broadcasted_iota(jnp.int32, (P, width), 1) // C
    else:
        a = jax.lax.broadcasted_iota(jnp.int32, (width, P), 1)
        b = jax.lax.broadcasted_iota(jnp.int32, (width, P), 0) // C
    return (a == b).astype(f32)


def _moments(x, S, ST, C):
    """Per-segment mean of x broadcast back to full width."""
    m = jax.lax.dot(x, S, preferred_element_type=f32) / C
    return jax.lax.dot(m, ST, preferred_element_type=f32)


def _ln_core(x, C, P, width, eps):
    S = _seg_onehot(width, P, C, False)
    ST = _seg_onehot(width, P, C, True)
    mu = _moments(x, S, ST, C)
    xc = x - mu
    var = _moments(xc * xc, S, ST, C)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat, rstd, S, ST


def _seg_ln_fwd_kernel(C, P, width, eps, act, x_ref, sb_ref, y_ref):
    x = x_ref[...].astype(f32)
    xhat, _, _, _ = _ln_core(x, C, P, width, eps)
    y = xhat * sb_ref[0:1, :].astype(f32) + sb_ref[1:2, :].astype(f32)
    if act:
        y = _gelu_exact(y)
    y_ref[...] = y.astype(y_ref.dtype)


def _seg_ln_bwd_kernel(C, P, width, eps, act, rows, x_ref, sb_ref, g_ref,
                       dx_ref, dsb_ref):
    x = x_ref[...].astype(f32)
    g = g_ref[...].astype(f32)
    # mask rows past the logical end: the partial last block reads garbage
    # and dsb accumulates over rows
    row0 = pl.program_id(0) * x.shape[0]
    ridx = row0 + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    valid = ridx < rows
    x = jnp.where(valid, x, 0.0)
    g = jnp.where(valid, g, 0.0)

    scale = sb_ref[0:1, :].astype(f32)
    bias = sb_ref[1:2, :].astype(f32)
    xhat, rstd, S, ST = _ln_core(x, C, P, width, eps)
    if act:
        z = xhat * scale + bias
        # d gelu_exact(z) — cdf + z * pdf
        inv_sqrt2 = 2.0 ** -0.5
        from xfmamba_tpu.ops.vss_block_pallas import _erf_approx
        cdf = 0.5 * (1.0 + _erf_approx(z * inv_sqrt2))
        pdf = jnp.exp(-0.5 * z * z) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
        g = g * (cdf + z * pdf)

    gg = g * scale
    m1 = _moments(gg, S, ST, C)
    m2 = _moments(gg * xhat, S, ST, C)
    dx = (gg - m1 - xhat * m2) * rstd
    dx_ref[...] = dx.astype(dx_ref.dtype)

    onesr = jnp.ones((1, x.shape[0]), f32)
    dscale = jax.lax.dot(onesr, g * xhat, preferred_element_type=f32)
    dbias = jax.lax.dot(onesr, g, preferred_element_type=f32)
    dsb = jnp.concatenate([dscale, dbias], axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dsb_ref[...] = dsb

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dsb_ref[...] = dsb_ref[...] + dsb


def _grid(rows):
    rb = min(_ROW_BLOCK, ((rows + 7) // 8) * 8)
    return rb, (rows + rb - 1) // rb


@functools.partial(jax.jit, static_argnames=("C", "eps", "act", "interpret"))
def _seg_ln_fwd_call(x2, sb, C, eps, act, interpret=False):
    rows, width = x2.shape
    P = width // C
    rb, steps = _grid(rows)
    return pl.pallas_call(
        functools.partial(_seg_ln_fwd_kernel, C, P, width, eps, act),
        grid=(steps,),
        in_specs=[pl.BlockSpec((rb, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, width), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024),
        interpret=interpret,
    )(x2, sb)


@functools.partial(jax.jit, static_argnames=("C", "eps", "act", "interpret"))
def _seg_ln_bwd_call(x2, sb, g2, C, eps, act, interpret=False):
    rows, width = x2.shape
    P = width // C
    rb, steps = _grid(rows)
    dx, dsb = pl.pallas_call(
        functools.partial(_seg_ln_bwd_kernel, C, P, width, eps, act, rows),
        grid=(steps,),
        in_specs=[pl.BlockSpec((rb, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((rb, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((rb, width), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, width), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, width), x2.dtype),
                   jax.ShapeDtypeStruct((2, width), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, sb, g2)
    return dx, dsb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def seg_ln_act(x, scale, bias, C, eps=1e-5, act=False):
    """LayerNorm over the trailing C channels of NHWC `x` (+ optional exact
    GELU), lane-packed P pixels per kernel row.  Differentiable (custom VJP
    with a fused backward kernel).  Caller must check `seg_ln_supported`."""
    return _seg_apply(x, scale, bias, C, eps, act)


def _pack2d(x, C):
    P, width = seg_pack(C)
    n = x.size // C
    return x.reshape(n // P, width), P, width


def _seg_apply(x, scale, bias, C, eps, act, interpret=False):
    x2, P, width = _pack2d(x, C)
    sb = jnp.stack([jnp.tile(scale.astype(f32), P),
                    jnp.tile(bias.astype(f32), P)])
    y2 = _seg_ln_fwd_call(x2, sb, C, eps, act, interpret=interpret)
    return y2.reshape(x.shape)


def _seg_fwd(x, scale, bias, C, eps, act):
    return seg_ln_act(x, scale, bias, C, eps, act), (x, scale, bias)


def _seg_bwd(C, eps, act, res, g):
    x, scale, bias = res
    x2, P, width = _pack2d(x, C)
    g2 = g.reshape(x2.shape)
    sb = jnp.stack([jnp.tile(scale.astype(f32), P),
                    jnp.tile(bias.astype(f32), P)])
    dx2, dsb = _seg_ln_bwd_call(x2, sb, g2, C, eps, act)
    dscale = dsb[0].reshape(P, C).sum(0).astype(scale.dtype)
    dbias = dsb[1].reshape(P, C).sum(0).astype(bias.dtype)
    return dx2.reshape(x.shape).astype(x.dtype), dscale, dbias


seg_ln_act.defvjp(_seg_fwd, _seg_bwd)


def seg_ln_supported(x_shape, C):
    """True when the packed layout applies: C tiles the lanes and the
    pixel count folds into whole rows."""
    if not SEG_LN:
        return False
    pack = seg_pack(C)
    if pack is None:
        return False
    P, _ = pack
    n = 1
    for s in x_shape[:-1]:
        n *= s
    return x_shape[-1] == C and n % P == 0 and n // P >= 8
