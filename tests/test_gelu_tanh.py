"""tanh-GELU fast path: accuracy vs exact GELU + kernel equivalence.

The fused kernels default to the tanh-form GELU (`GELU_TANH=True`, ~6 VPU
ops vs ~18 for the A&S erf rational — the largest single VPU item at
stage-2 geometry).  The suite-wide conftest pins `GELU_TANH=False` so the
tight-tolerance kernel tests check exact math; this file covers the
shipped fast path at its own tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.ops import vss_block_pallas as vbp
from xfmamba_tpu.ops import vss_block_v2_adjoint as adj


@pytest.fixture
def tanh_gelu():
    old = vbp.GELU_TANH
    vbp.GELU_TANH = True
    yield
    vbp.GELU_TANH = old


def test_tanh_gelu_close_to_exact():
    x = jnp.linspace(-12.0, 12.0, 20001, dtype=jnp.float32)
    approx = vbp._gelu_tanh(x)
    exact = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                               atol=5e-4)


def test_tanh_gelu_grad_matches_autodiff(tanh_gelu):
    """The adjoint kernel's hand-written _gelu_grad must equal the autodiff
    derivative of the fwd kernel's _gelu_exact under the flag."""
    x = jnp.linspace(-8.0, 8.0, 4001, dtype=jnp.float32)
    hand = adj._gelu_grad(x)
    auto = jax.vmap(jax.grad(lambda v: vbp._gelu_exact(v)))(x)
    np.testing.assert_allclose(np.asarray(hand), np.asarray(auto),
                               rtol=1e-5, atol=1e-5)


def test_erf_gelu_grad_matches_autodiff():
    x = jnp.linspace(-8.0, 8.0, 4001, dtype=jnp.float32)
    hand = adj._gelu_grad(x)
    auto = jax.vmap(jax.grad(lambda v: vbp._gelu_exact(v)))(x)
    np.testing.assert_allclose(np.asarray(hand), np.asarray(auto),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_v2_kernel_tanh_gelu_within_tolerance(tanh_gelu):
    """Whole-block kernel with tanh GELU vs the exact-GELU flax block:
    deviation bounded by the documented approximation error (not bf16-level
    noise — this is f32 in interpret mode)."""
    from tests.test_vss_block_v2 import _make_block
    from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params
    from xfmamba_tpu.ops.vss_block_pallas_v2 import _vss_block_call_v2

    H, W, G, d = 4, 4, 2, 32
    blk, variables, x = _make_block(d, H, W, 2, True, 4.0)
    y_flax = blk.apply(variables, x)
    args = pack_vss_block_params(variables["params"], jnp.float32, True)
    y_k = _vss_block_call_v2(x.reshape(2, H * W, d), *args, H=H, W=W,
                             conv_bias=True, fuse_mlp=True, interpret=True,
                             group=G)
    np.testing.assert_allclose(np.asarray(y_k).reshape(y_flax.shape),
                               np.asarray(y_flax), rtol=2e-3, atol=2e-3)
