"""v2 megakernel (g-interleaved serial scans) vs the pure-jnp block mirror.

`vss_block_ref` is the same oracle used by the v1 kernel tests (itself
golden-tested against the PyTorch reference via `test_model_parity.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.vssm import VSSBlock
from xfmamba_tpu.ops.vss_block_pallas import (
    pack_vss_block_params, vss_block_ref)
from xfmamba_tpu.ops.vss_block_pallas_v2 import (
    _deinterleave, _interleave, _vss_block_call_v2)

pytestmark = pytest.mark.slow


def _make_block(d, H, W, B, conv_bias, mlp_ratio, seed=0):
    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_act="silu", ssm_conv=3, ssm_conv_bias=conv_bias,
                   ssm_init="v0", forward_type="v05_noz",
                   mlp_ratio=mlp_ratio, mlp_act="gelu", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, H, W, d),
                          jnp.float32)
    variables = blk.init(jax.random.PRNGKey(seed), x)
    return blk, variables, x


def test_interleave_roundtrip():
    x = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    for G in (1, 2):
        y = _interleave(x, G)
        back = _deinterleave(y, G, 6)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("H,W,G,d,conv_bias,mlp", [
    (6, 8, 1, 32, False, 4.0),    # G=1 degenerate (8 steps per tile)
    (4, 4, 2, 32, True, 4.0),     # small map, G=2, conv bias
    (7, 7, 8, 48, False, 4.0),    # stage-3-like odd spatial, G=8
    (6, 14, 4, 32, False, 0.0),   # stage-2-like W, no MLP branch
])
def test_v2_matches_flax_block(H, W, G, d, conv_bias, mlp):
    B = max(G, 2)
    blk, variables, x = _make_block(d, H, W, B, conv_bias, mlp)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(B, H * W, d)
    args = pack_vss_block_params(p, jnp.float32, mlp > 0)
    y_k = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=conv_bias,
                             fuse_mlp=mlp > 0, interpret=True, group=G)
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=2e-5, atol=2e-5)


def test_v2_rowseg_ablation_matches_flax_block():
    """ROW_SEG=True (two-segment row chains + cumprod fix-up, off by
    default — measured slower, see module comment) stays numerically
    correct.  Geometry chosen so the segmented path actually engages
    (T = L*G/8 even and >= 8)."""
    from xfmamba_tpu.ops import vss_block_pallas_v2 as V
    H, W, G, d = 8, 16, 1, 32
    B = 2
    blk, variables, x = _make_block(d, H, W, B, False, 4.0)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(B, H * W, d)
    args = pack_vss_block_params(p, jnp.float32, True)
    old = V.ROW_SEG
    try:
        V.ROW_SEG = True
        y_k = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=False,
                                 fuse_mlp=True, interpret=True, group=G)
    finally:
        V.ROW_SEG = old
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=2e-5, atol=2e-5)


def test_v2_matches_ref_mirror():
    """Direct comparison against vss_block_ref at a geometry where the
    column chain spans multiple HS stages (W=14)."""
    H, W, G, d = 14, 14, 4, 32
    B = 4
    blk, variables, x = _make_block(d, H, W, B, False, 4.0, seed=3)
    p = variables["params"]
    xl = x.reshape(B, H * W, d)
    y_ref = vss_block_ref(xl, p, H, W, False, True)
    args = pack_vss_block_params(p, jnp.float32, True)
    y_k = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=False,
                             fuse_mlp=True, interpret=True, group=G)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("G,mlp", [(2, 4.0), (1, 0.0)])
def test_stage_stacked_matches_sequential(G, mlp):
    """The stage-stacked kernel (one pallas_call, weights streamed via the
    grid, activation carried in scratch) must equal running the blocks
    back-to-back through the single-block kernel path."""
    H, W, d, depth = 4, 8 // G, 32, 3
    B = max(G, 2)
    blocks = [_make_block(d, H, W, B, False, mlp, seed=s)
              for s in range(depth)]
    x = blocks[0][2]
    y_seq = x
    for blk, variables, _ in blocks:
        y_seq = blk.apply(variables, y_seq)

    ps = [v["params"] for _, v, _ in blocks]
    from xfmamba_tpu.ops.vss_block_pallas_v2 import (
        _vss_stage_call_v2, pack_vss_stage_params)
    packed = pack_vss_stage_params(ps, jnp.float32, mlp > 0)
    y_k = _vss_stage_call_v2(x.reshape(B, H * W, d), *packed, H=H, W=W,
                             conv_bias=False, fuse_mlp=mlp > 0,
                             interpret=True, group=G)
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_seq.shape),
                               np.asarray(y_seq), rtol=4e-5, atol=4e-5)


@pytest.mark.parametrize("conv_bias,mlp", [(False, 4.0), (True, 0.0)])
def test_v2_fold_ln_matches_flax_block(conv_bias, mlp):
    """fold_ln=True (LN affines folded into the matmuls they feed — the
    TPU inference packing) is numerically identical to the flax block up
    to f32 reassociation."""
    H, W, G, d = 6, 14, 4, 32
    B = 4
    blk, variables, x = _make_block(d, H, W, B, conv_bias, mlp, seed=5)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(B, H * W, d)
    args = pack_vss_block_params(p, jnp.float32, mlp > 0, fold_ln=True)
    y_k = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=conv_bias,
                             fuse_mlp=mlp > 0, interpret=True, group=G,
                             fold_ln=True)
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=2e-5, atol=2e-5)


def test_v2_fold_ln_stage_matches_sequential():
    """Stage-stacked kernel with fold_ln packing == per-block fold calls."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import (
        _vss_stage_call_v2, pack_vss_stage_params)
    H, W, G, d = 4, 4, 2, 32
    B = 4
    blocks = []
    for j in range(3):
        blk, variables, x = _make_block(d, H, W, B, False, 4.0, seed=10 + j)
        blocks.append(variables["params"])
    x = jax.random.normal(jax.random.PRNGKey(99), (B, H * W, d), jnp.float32)
    y_seq = x
    for p in blocks:
        args = pack_vss_block_params(p, jnp.float32, True, fold_ln=True)
        y_seq = _vss_block_call_v2(y_seq, *args, H=H, W=W, conv_bias=False,
                                   fuse_mlp=True, interpret=True, group=G,
                                   fold_ln=True)
    args = pack_vss_stage_params(blocks, jnp.float32, True, fold_ln=True)
    y_st = _vss_stage_call_v2(x, *args, H=H, W=W, conv_bias=False,
                              fuse_mlp=True, interpret=True, group=G,
                              fold_ln=True)
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_seq),
                               rtol=4e-5, atol=4e-5)


def test_v2_bf16_maps_inference_path():
    """BF16_MAPS (packed-bf16 conv/SiLU/MLP maps on the fold_ln inference
    path) is a MEASURED DEAD END on-chip (0.73-0.88x, see NOTES.md r3s4)
    and defaults OFF; this keeps the gated ablation path compiling and
    within bf16-grade error of the f32 flax block."""
    from xfmamba_tpu.ops import vss_block_pallas_v2 as v2

    H, W, G, d = 6, 14, 4, 32
    B = 4
    blk, variables, x = _make_block(d, H, W, B, True, 4.0, seed=7)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(B, H * W, d).astype(jnp.bfloat16)
    args = pack_vss_block_params(p, jnp.bfloat16, True, fold_ln=True)
    assert not v2.BF16_MAPS  # production default: f32 maps (NOTES r3s4)
    y_k32 = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=True,
                               fuse_mlp=True, interpret=True, group=G,
                               fold_ln=True)
    ref = np.asarray(y_flax)
    scale = np.abs(ref).max()
    y32 = np.asarray(y_k32.astype(jnp.float32)).reshape(y_flax.shape)
    err32 = np.abs(y32 - ref).max() / scale
    assert err32 < 2.5e-2
    # the gated bf16-maps ablation: flag flips must clear the jit cache
    # (module-flag trap documented in NOTES.md)
    v2.BF16_MAPS = True
    _vss_block_call_v2.clear_cache()
    try:
        y_k = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=True,
                                 fuse_mlp=True, interpret=True, group=G,
                                 fold_ln=True)
    finally:
        v2.BF16_MAPS = False
        _vss_block_call_v2.clear_cache()
    y = np.asarray(y_k.astype(jnp.float32)).reshape(y_flax.shape)
    err16 = np.abs(y - ref).max() / scale
    assert err16 < 2.5e-2
    # bf16 maps may add at most ~one bf16 quantum of extra error
    assert err16 < err32 + 1.2e-2, (err16, err32)


def test_v2_bf16_scratch_inference_path():
    """BF16_SCRATCH: the serial scans' (a, b) maps and h sequences stored
    as bf16 (halving the scan loop's dynamic-slice VMEM traffic) while the
    FMA chain itself still accumulates in f32 registers.  Numerics: the
    maps are rounded ONCE (no compounding), so the error stays within the
    bf16 e2e budget of the fused inference path."""
    from xfmamba_tpu.ops import vss_block_pallas_v2 as v2

    H, W, G, d = 6, 14, 4, 32
    B = 4
    blk, variables, x = _make_block(d, H, W, B, True, 4.0, seed=11)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(B, H * W, d).astype(jnp.bfloat16)
    args = pack_vss_block_params(p, jnp.bfloat16, True, fold_ln=True)
    assert not v2.BF16_SCRATCH  # default off until the on-chip A/B says so
    ref = np.asarray(y_flax)
    scale = np.abs(ref).max()
    y_k = _vss_block_call_v2(xl, *args, H=H, W=W, conv_bias=True,
                             fuse_mlp=True, interpret=True, group=G,
                             fold_ln=True, bf16_scratch=True)
    err = np.abs(np.asarray(y_k.astype(jnp.float32)).reshape(ref.shape)
                 - ref).max() / scale
    assert err < 2.5e-2, err
    # stage-stacked variant compiles and matches too
    from xfmamba_tpu.ops.vss_block_pallas_v2 import (
        _vss_stage_call_v2, pack_vss_stage_params)
    packed = pack_vss_stage_params([p], jnp.bfloat16, True, fold_ln=True)
    y_st = _vss_stage_call_v2(xl, *packed, H=H, W=W, conv_bias=True,
                              fuse_mlp=True, interpret=True, group=G,
                              fold_ln=True, bf16_scratch=True)
    err_st = np.abs(np.asarray(y_st.astype(jnp.float32)).reshape(ref.shape)
                    - ref).max() / scale
    assert err_st < 2.5e-2, err_st


def test_bf16_scratch_auto_policy():
    """Per-geometry default: ON only at the stage-3 geometry (measured
    2.47 -> 2.05 ms across both timer versions); OFF at stages 0-2 (the
    stage0 1.49x was a chain-timer artifact, probe_bf16_model.py
    2026-08-21); see the BF16_SCRATCH comment block."""
    from xfmamba_tpu.ops.vss_block_pallas_v2 import _bf16_scratch_auto
    assert not _bf16_scratch_auto(56 * 56, 96)
    assert not _bf16_scratch_auto(28 * 28, 192)
    assert not _bf16_scratch_auto(14 * 14, 384)
    assert _bf16_scratch_auto(7 * 7, 768)
