"""Whole-VSSBlock megakernel vs the composable flax block.

Oracle strategy per SURVEY.md §4: fast kernel vs slow reference + tolerance.
The flax `VSSBlock` (itself golden-tested against the PyTorch reference in
`test_model_parity.py`) is the oracle; the kernel runs in interpret mode on
CPU.  f32 everywhere -> tight tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.vssm import VSSBlock
from xfmamba_tpu.ops.vss_block_pallas import (
    _vss_block_call, fused_vss_block_supported, pack_vss_block_params,
    vss_block_fused, vss_block_ref)

pytestmark = pytest.mark.slow


def _make_block(d, H, W, conv_bias, mlp_ratio, seed=0):
    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_act="silu", ssm_conv=3, ssm_conv_bias=conv_bias,
                   ssm_init="v0", forward_type="v05_noz",
                   mlp_ratio=mlp_ratio, mlp_act="gelu", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (2, H, W, d),
                          jnp.float32)
    variables = blk.init(jax.random.PRNGKey(seed), x)
    return blk, variables, x


@pytest.mark.parametrize("H,W,d,conv_bias", [
    (6, 10, 48, False),     # non-square, odd geometry
    (8, 8, 32, True),       # conv bias on
    (7, 7, 64, False),      # stage-3-like odd spatial
])
def test_kernel_matches_flax_block(H, W, d, conv_bias):
    blk, variables, x = _make_block(d, H, W, conv_bias, mlp_ratio=4.0)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(x.shape[0], H * W, d)
    args = pack_vss_block_params(p, jnp.float32, True)
    y_k = _vss_block_call(xl, *args, H=H, W=W, conv_bias=conv_bias,
                          fuse_mlp=True, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=2e-5, atol=2e-5)


def test_kernel_no_mlp_branch():
    """fuse_mlp=False must reproduce just the SS2D half (residual included)."""
    H, W, d = 6, 8, 32
    blk, variables, x = _make_block(d, H, W, False, mlp_ratio=0.0)
    y_flax = blk.apply(variables, x)
    p = variables["params"]
    xl = x.reshape(x.shape[0], H * W, d)
    args = pack_vss_block_params(p, jnp.float32, False)
    y_k = _vss_block_call(xl, *args, H=H, W=W, conv_bias=False,
                          fuse_mlp=False, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=2e-5, atol=2e-5)


def test_ref_matches_flax_block():
    """The pure-jnp mirror (the custom-VJP recompute path) is exact."""
    H, W, d = 6, 10, 48
    blk, variables, x = _make_block(d, H, W, False, mlp_ratio=4.0)
    y_flax = blk.apply(variables, x)
    y_ref = vss_block_ref(x.reshape(2, H * W, d), variables["params"],
                          H, W, conv_bias=False, fuse_mlp=True)
    np.testing.assert_allclose(np.asarray(y_ref).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=1e-6, atol=1e-6)


def test_fused_custom_vjp_grads():
    """Grad through the fused op (recompute path) == grad of the flax block."""
    H, W, d = 6, 8, 32
    blk, variables, x = _make_block(d, H, W, False, mlp_ratio=4.0)
    p = variables["params"]
    xl = x.reshape(2, H * W, d)

    def loss_flax(xx):
        return (blk.apply(variables, xx.reshape(2, H, W, d)) ** 2).sum()

    def loss_ref(xx):
        return (vss_block_ref(xx, p, H, W, False, True) ** 2).sum()

    g_flax = jax.grad(loss_flax)(xl)
    g_ref = jax.grad(loss_ref)(xl)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_flax),
                               rtol=1e-4, atol=1e-4)


def test_supported_geometries():
    # the three backbone stages that must take the fused path on TPU
    assert fused_vss_block_supported(28, 28, 192, 384, 768)
    assert fused_vss_block_supported(14, 14, 384, 768, 1536)
    assert fused_vss_block_supported(7, 7, 768, 1536, 3072)
    # degenerate spatial dims fall back
    assert not fused_vss_block_supported(1, 4, 64, 128, 256)
