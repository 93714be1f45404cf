"""Stage-stacked training step (`ops/vss_stage_train.py`): forward and all
gradients vs `jax.vjp` through the chained packed mirror, interpret mode on
CPU, f32.  Mirrors the per-block pattern of test_vss_block_v2_grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.vssm import VSSBlock
from xfmamba_tpu.ops import vss_stage_train as VST
from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params
from test_vss_block_v2_grad import PACKED_NAMES, _packed_mirror

pytestmark = pytest.mark.slow


def _setup_stage(H, W, B, d, depth, conv_bias, seed=0):
    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_act="silu", ssm_conv=3, ssm_conv_bias=conv_bias,
                   ssm_init="v0", forward_type="v05_noz",
                   mlp_ratio=4.0, mlp_act="gelu", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, H, W, d),
                          jnp.float32)
    packed = []
    for j in range(depth):
        p = blk.init(jax.random.PRNGKey(seed + 10 * j), x)["params"]
        packed.append(pack_vss_block_params(p, jnp.float32, True))
    stacked = tuple(jnp.stack(ws) for ws in zip(*packed))
    return stacked, x.reshape(B, H * W, d)


@pytest.mark.parametrize("H,W,Gf,Gb,d,conv_bias,depth,masked", [
    (4, 4, 2, 2, 16, False, 2, False),
    (7, 7, 8, 8, 32, True, 3, True),
])
def test_stage_train_matches_chained_mirror(H, W, Gf, Gb, d, conv_bias,
                                            depth, masked):
    B = max(Gf, Gb, 2)
    L = H * W
    stacked, xl = _setup_stage(H, W, B, d, depth, conv_bias, seed=H + d)
    key = jax.random.PRNGKey(3)
    if masked:
        def draw(k):
            m = jax.random.bernoulli(k, 0.7, (B, 1, 1)) / 0.7
            return jnp.broadcast_to(m.astype(jnp.float32), (B, L, 1))
        m1 = jnp.stack([draw(jax.random.fold_in(key, 2 * j))
                        for j in range(depth)])
        m2 = jnp.stack([draw(jax.random.fold_in(key, 2 * j + 1))
                        for j in range(depth)])
    else:
        m1 = jnp.ones((depth, B, L, 1), jnp.float32)
        m2 = jnp.ones((depth, B, L, 1), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 99), (B, L, d),
                          jnp.float32)

    def mirror_stage(xx, *flat):
        pks = [dict(zip(PACKED_NAMES, flat[j::depth]))
               for j in range(depth)]
        # flat is ordered name-major (each stacked operand contributes its
        # depth slices contiguously): rebuild per-block dicts
        for j in range(depth):
            pks[j] = {name: flat[i * depth + j]
                      for i, name in enumerate(PACKED_NAMES)}
        h = xx
        for j in range(depth):
            h = _packed_mirror(h, pks[j], H, W, conv_bias, True,
                               m1[j], m2[j])
        return h

    flat = [w[j] for w in stacked for j in range(depth)]
    y_ref, vjp = jax.vjp(mirror_stage, xl, *flat)
    grads_ref = vjp(g)

    VST.INTERPRET = True
    try:
        y, f_vjp = jax.vjp(
            lambda xx, *pk: VST.vss_stage_train(
                H, W, conv_bias, Gf, Gb, xx, m1, m2, *pk),
            xl, *stacked)
        grads = f_vjp(g)
    finally:
        VST.INTERPRET = False

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grads[0]),
                               np.asarray(grads_ref[0]),
                               rtol=2e-4, atol=2e-4, err_msg="dx")
    for i, name in enumerate(PACKED_NAMES):
        got = np.asarray(grads[1 + i])          # (depth, ...)
        for j in range(depth):
            want = np.asarray(grads_ref[1 + i * depth + j])
            if name == "b_conv" and not conv_bias:
                continue
            np.testing.assert_allclose(
                got[j], want, rtol=3e-4, atol=3e-4,
                err_msg=f"grad mismatch for {name}[{j}]")
