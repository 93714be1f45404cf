"""Segment-packed LN(+GELU) kernel vs the composable flax semantics
(oracle: jnp LayerNorm in f32 + exact GELU), forward and VJP, interpret
mode.  Mirrors the repo's kernel-vs-oracle pattern (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.ops.ablations import seg_ln as SL

f32 = jnp.float32


def _oracle(x, scale, bias, act):
    xf = x.astype(f32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    y = y * scale.astype(f32) + bias.astype(f32)
    if act:
        y = jax.nn.gelu(y, approximate=False)
    return y


@pytest.mark.parametrize("C,shape", [
    (48, (2, 112, 112)),   # patch-embed norm1 geometry (tiny batch)
    (96, (2, 56, 56)),     # patch-embed norm2
    (192, (2, 28, 28)),    # downsample 0
    (384, (3, 14, 14)),    # downsample 1
])
@pytest.mark.parametrize("act", [False, True])
def test_seg_ln_fwd(C, shape, act):
    k1, k2, k3 = jax.random.split(jax.random.key(C + act), 3)
    x = jax.random.normal(k1, shape + (C,), jnp.bfloat16)
    scale = 1.0 + 0.1 * jax.random.normal(k2, (C,), f32)
    bias = 0.1 * jax.random.normal(k3, (C,), f32)
    assert SL.seg_ln_supported(x.shape, C)
    y = SL._seg_apply(x, scale, bias, C, 1e-5, act, interpret=True)
    ref = _oracle(x, scale, bias, act)
    # bf16 I/O: absolute floor for small values + relative for the tails
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=8e-3, atol=1.2e-2)


@pytest.mark.parametrize("C,shape,act", [
    (48, (2, 16, 16), True),
    (96, (2, 8, 8), False),
])
def test_seg_ln_vjp(C, shape, act):
    k1, k2, k3, k4 = jax.random.split(jax.random.key(7 * C), 4)
    x = jax.random.normal(k1, shape + (C,), f32)
    scale = 1.0 + 0.1 * jax.random.normal(k2, (C,), f32)
    bias = 0.1 * jax.random.normal(k3, (C,), f32)
    g = jax.random.normal(k4, x.shape, f32)

    ref, vjp_ref = jax.vjp(lambda x, s, b: _oracle(x, s, b, act),
                           x, scale, bias)
    dx_r, ds_r, db_r = vjp_ref(g)

    x2, P, width = SL._pack2d(x, C)
    sb = jnp.stack([jnp.tile(scale, P), jnp.tile(bias, P)])
    y2 = SL._seg_ln_fwd_call(x2, sb, C, 1e-5, act, interpret=True)
    np.testing.assert_allclose(np.asarray(y2.reshape(x.shape)),
                               np.asarray(ref), rtol=0, atol=2e-5)
    dx2, dsb = SL._seg_ln_bwd_call(x2, sb, g.reshape(x2.shape), C, 1e-5,
                                   act, interpret=True)
    np.testing.assert_allclose(np.asarray(dx2.reshape(x.shape)),
                               np.asarray(dx_r), rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dsb[0].reshape(P, C).sum(0)),
                               np.asarray(ds_r), rtol=1e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(dsb[1].reshape(P, C).sum(0)),
                               np.asarray(db_r), rtol=1e-4, atol=3e-4)


def test_seg_ln_partial_block_masking():
    """Rows that don't fill the last grid block must not poison dscale."""
    C = 48
    P, width = SL.seg_pack(C)
    # 9000 rows -> block 4096 -> partial last block
    rows = 9000
    x2 = jax.random.normal(jax.random.key(0), (rows, width), f32)
    sb = jnp.stack([jnp.ones((width,), f32), jnp.zeros((width,), f32)])
    g2 = jnp.ones((rows, width), f32)
    dx2, dsb = SL._seg_ln_bwd_call(x2, sb, g2, C, 1e-5, False,
                                   interpret=True)
    assert np.isfinite(np.asarray(dsb)).all()
    # dbias = sum of g over rows = rows for every channel
    np.testing.assert_allclose(np.asarray(dsb[1]),
                               np.full((width,), float(rows)), rtol=1e-6)


def test_seg_pack_table():
    assert SL.seg_pack(48) == (8, 384)
    assert SL.seg_pack(96) == (4, 384)
    assert SL.seg_pack(192) == (2, 384)
    assert SL.seg_pack(384) == (1, 384)
    assert SL.seg_pack(768) == (1, 768)
