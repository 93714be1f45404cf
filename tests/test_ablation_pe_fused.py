"""Fused patch-embed LN(+GELU) ablation (`ops/ablations/pe_fused.py` —
measured slower than XLA, quarantined) vs the composable lowering,
interpret mode.  Kept green so the negative record stays reproducible."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from xfmamba_tpu.models.layers import LN_EPS, gelu
from xfmamba_tpu.ops.ablations.pe_fused import ln_act_fused

f32, bf16 = jnp.float32, jnp.bfloat16


def _ref(x, scale, bias, act):
    ln = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype)
    y = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    return gelu(y) if act else y


@pytest.mark.parametrize("act", [False, True])
@pytest.mark.parametrize("dtype", [f32, bf16])
def test_ln_act_fused_matches_composable(act, dtype):
    key = jax.random.key(0)
    B, H, W, C = 2, 8, 8, 48
    x = jax.random.normal(key, (B, H, W, C), f32).astype(dtype)
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C,))
    bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (C,))
    y = ln_act_fused(x, scale, bias, act_gelu=act, eps=LN_EPS,
                     interpret=True)
    ref = _ref(x, scale, bias, act)
    err = (np.abs(np.asarray(y, np.float32) - np.asarray(ref, np.float32))
           .max())
    tol = 1e-5 if dtype == f32 else 5e-2
    assert err < tol, (act, dtype, err)


def test_patch_embed_fused_path_gates_off_on_cpu():
    """The support gate must refuse on any non-TPU backend (and under the
    default PE_FUSED=False kill switch) so only ablation scripts that
    flip the switch explicitly can dispatch the kernel."""
    from xfmamba_tpu.ops.ablations import pe_fused
    x = jnp.zeros((1, 8, 8, 48), bf16)
    assert not pe_fused.ln_act_supported(x, bf16)
    old = pe_fused.PE_FUSED
    try:
        pe_fused.PE_FUSED = True
        # even with the switch on, a CPU backend must refuse
        assert not pe_fused.ln_act_supported(x, bf16)
    finally:
        pe_fused.PE_FUSED = old
