"""Stage-stacked TRAINING step for a whole VSSM stage.

Forward: ONE pallas_call runs every block of the stage back-to-back
(`vss_block_pallas_v2._vss_stage_train_call`) — activation carried in VMEM
scratch, weights streamed via the grid's depth axis, MLP halves fused
in-kernel, per-block drop-path masks applied at both residual adds.  This
closes most of the train-vs-eval forward gap (per-block kernel ramps + the
XLA LN/MLP segments between block kernels; NOTES r4 decomposition: fwd
train-mode 23.9 ms vs eval 15.1 at bs16).

Backward: the kernel additionally writes each block's INPUT and its
post-SS2D-half MID-POINT; the custom VJP walks blocks in reverse, running
the XLA vjp of a jnp replica of the MLP half from the mid-point (pure
matmul work — XLA is already at roofline there, and fusing its weight-grad
accumulators into the adjoint kernel blows the VMEM budget at stage-0/3
geometry) chained into the block-level adjoint megakernel
(`vss_block_v2_adjoint.vss_block_bwd_call`) for the SS2D half.

Counterpart being replaced: the reference trains through per-op autograd
(`selective_scan_bwd_kernel.cuh:307` + torch autograd glue); here the whole
stage forward is one kernel and each block backward is one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2
from xfmamba_tpu.ops.vss_block_pallas import _gelu_exact
from xfmamba_tpu.ops.vss_block_v2_adjoint import vss_block_bwd_call

f32 = jnp.float32

# interpret-mode switch for the CPU test tier (both the stage kernel and
# the per-block adjoint run under Pallas interpret when set)
INTERPRET = False

# packed operand order (matches pack_vss_block_params and the adjoint
# kernel's gradient outputs)
_N_PACKED = 16
_MLP_SLOTS = (11, 12, 13, 14, 15)          # ln2, w_fc1, b_fc1, w_fc2, b_fc2


def _mlp_half_ref(mid, m2, ln2, w_fc1, b_fc1, w_fc2, b_fc2):
    """jnp replica of the kernel's MLP half (same op order/casts at the
    train-path cdt=f32): y = mid + m2 * (GELU(LN(mid) @ w_fc1 + b_fc1)
    @ w_fc2 + b_fc2)."""
    mm_dtype = w_fc1.dtype
    x = mid.astype(f32)
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    h2 = xc * jax.lax.rsqrt(var + 1e-5) * ln2[0] + ln2[1]
    f1 = jnp.dot(h2.astype(mm_dtype), w_fc1, preferred_element_type=f32)
    f1 = _gelu_exact(f1 + b_fc1)
    f2 = jnp.dot(f1.astype(mm_dtype), w_fc2,
                 preferred_element_type=f32) + b_fc2
    f2 = f2 * m2.astype(f32)
    return (x + f2).astype(mid.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def vss_stage_train(H, W, conv_bias, group_fwd, group_bwd,
                    x, m1, m2, *packed):
    """Training forward of a whole stage via the stacked megakernel.

    x: (B, L, d); m1/m2: (depth, B, L, 1) drop-path keep masks; packed:
    the 16 depth-stacked `pack_vss_block_params(fuse_mlp=True)` operands.
    group_fwd sizes the stage kernel's interleave; group_bwd the per-block
    adjoint's (their VMEM budgets differ)."""
    y, _, _ = _v2._vss_stage_train_call(
        x, m1, m2, *packed, H=H, W=W, conv_bias=conv_bias, group=group_fwd,
        interpret=INTERPRET)
    return y


def _stage_fwd(H, W, conv_bias, gf, gb, x, m1, m2, *packed):
    y, xsv, midsv = _v2._vss_stage_train_call(
        x, m1, m2, *packed, H=H, W=W, conv_bias=conv_bias, group=gf,
        interpret=INTERPRET)
    return y, (m1, m2, packed, xsv, midsv)


def _stage_bwd(H, W, conv_bias, gf, gb, res, g):
    m1, m2, packed, xsv, midsv = res
    depth = xsv.shape[0]
    gcur = g.astype(xsv.dtype)
    dblocks = []
    for j in reversed(range(depth)):
        pj = tuple(w[j] for w in packed)
        ln2, w_fc1, b_fc1, w_fc2, b_fc2 = (pj[s] for s in _MLP_SLOTS)
        _, vjp_mlp = jax.vjp(
            lambda mid, l2, w1, b1, w2, b2: _mlp_half_ref(
                mid, m2[j], l2, w1, b1, w2, b2),
            midsv[j], ln2, w_fc1, b_fc1, w_fc2, b_fc2)
        gmid, dln2, dw1, db1, dw2, db2 = vjp_mlp(gcur)
        outs = vss_block_bwd_call(
            xsv[j], *pj, m1[j], m2[j], gmid,
            H=H, W=W, conv_bias=conv_bias, fuse_mlp=False, group=gb,
            interpret=INTERPRET)
        gcur = outs[0].astype(gcur.dtype)
        dj = list(outs[1:])
        for slot, dv in zip(_MLP_SLOTS, (dln2, dw1, db1, dw2, db2)):
            dj[slot] = dv
        dblocks.append([dv.astype(w.dtype) for dv, w in zip(dj, pj)])
    dblocks.reverse()
    dstacked = tuple(jnp.stack([blk[i] for blk in dblocks])
                     for i in range(_N_PACKED))
    return (gcur.astype(g.dtype), jnp.zeros_like(m1),
            jnp.zeros_like(m2)) + dstacked


vss_stage_train.defvjp(_stage_fwd, _stage_bwd)


def pick_stage_train_groups(B, H, W, d, di, hd):
    """(group_fwd, group_bwd) for the stage-train path, or None when either
    kernel doesn't fit its VMEM budget.  group_fwd adds headroom for the
    double-buffered weight windows + the two per-block save windows."""
    from xfmamba_tpu.ops.vss_block_v2_adjoint import pick_train_group
    wbytes = 2 * (2 * d * di + 2 * d * hd + 3 * di * di // 4) * 2
    save_bytes = 8 * 1024 * 1024
    gf = _v2.pick_group_v2(B, H, W, d, di, hd, True,
                           budget_bytes=_v2._VMEM_BUDGET_V2 - wbytes
                           - save_bytes)
    if gf is None:
        return None
    gb = pick_train_group(B, H, W, d, di)
    if gb is None:
        return None
    return gf, gb
