"""Gradient parity: the block-level adjoint megakernel
(`ops/vss_block_v2_adjoint.py`) vs `jax.vjp` through the pure-jnp mirror
(`vss_block_ref`), interpret mode on CPU, f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.vssm import VSSBlock
from xfmamba_tpu.ops.vss_block_pallas import (
    pack_vss_block_params, vss_block_ref)
from xfmamba_tpu.ops.vss_block_v2_adjoint import vss_block_bwd_call

pytestmark = pytest.mark.slow

PACKED_NAMES = ["ln1", "w_in", "w_conv", "b_conv", "w_xp", "w_dt", "b_dt",
                "A", "Dsum", "lno", "w_out", "ln2", "w_fc1", "b_fc1",
                "w_fc2", "b_fc2"]


def _setup(H, W, B, d, conv_bias, mlp, seed=0):
    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_act="silu", ssm_conv=3, ssm_conv_bias=conv_bias,
                   ssm_init="v0", forward_type="v05_noz",
                   mlp_ratio=mlp, mlp_act="gelu", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, H, W, d),
                          jnp.float32)
    variables = blk.init(jax.random.PRNGKey(seed), x)
    p = variables["params"]
    packed = pack_vss_block_params(p, jnp.float32, mlp > 0)
    return p, packed, x.reshape(B, H * W, d)


@pytest.mark.parametrize("H,W,G,d,conv_bias,mlp,masked", [
    (4, 4, 2, 16, False, 4.0, False),
    (7, 7, 8, 32, True, 4.0, True),     # stage-3-like, droppath masks
    (6, 8, 1, 16, False, 0.0, False),   # G=1, no MLP branch
])
def test_adjoint_matches_mirror_vjp(H, W, G, d, conv_bias, mlp, masked):
    B = max(G, 2)
    L = H * W
    p, packed, xl = _setup(H, W, B, d, conv_bias, mlp, seed=H + W)
    key = jax.random.PRNGKey(7)
    if masked:
        m1 = jax.random.bernoulli(key, 0.7, (B, 1, 1)) / 0.7
        m1 = jnp.broadcast_to(m1.astype(jnp.float32), (B, L, 1))
        m2 = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.7,
                                  (B, 1, 1)) / 0.7
        m2 = jnp.broadcast_to(m2.astype(jnp.float32), (B, L, 1))
    else:
        m1 = jnp.ones((B, L, 1), jnp.float32)
        m2 = jnp.ones((B, L, 1), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 2), (B, L, d),
                          jnp.float32)

    # oracle: vjp through the mirror at the PACKED level
    def mirror_packed(xx, *pk):
        pk = dict(zip(PACKED_NAMES, pk))
        # reconstruct the mirror's path from packed operands by calling
        # vss_block_ref on the original tree is NOT equivalent (packing is
        # param-dependent); instead re-run the packed mirror inline:
        return _packed_mirror(xx, pk, H, W, conv_bias, mlp > 0, m1, m2)

    y_ref, vjp = jax.vjp(mirror_packed, xl, *packed)
    grads_ref = vjp(g)

    outs = vss_block_bwd_call(xl, *packed, m1, m2, g, H=H, W=W,
                              conv_bias=conv_bias, fuse_mlp=mlp > 0,
                              group=G, interpret=True)
    assert len(outs) == 1 + len(packed)
    for i, (got, want, name) in enumerate(
            zip(outs, grads_ref, ["x"] + PACKED_NAMES)):
        if name == "b_conv" and not conv_bias:
            continue
        if name in ("ln2", "w_fc1", "b_fc1", "w_fc2", "b_fc2") and mlp == 0:
            continue
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


def _packed_mirror(x, pk, H, W, conv_bias, fuse_mlp, m1, m2):
    """vss_block_ref's math expressed directly on packed operands."""
    f32 = jnp.float32
    B, L, d = x.shape
    R = pk["w_dt"].shape[0] // 4

    def ln(v, sb):
        mu = v.mean(axis=-1, keepdims=True)
        vc = v - mu
        var = (vc * vc).mean(axis=-1, keepdims=True)
        return vc * jax.lax.rsqrt(var + 1e-5) * sb[0] + sb[1]

    xf = x.astype(f32)
    h1 = ln(xf, pk["ln1"])
    xin = jnp.einsum("bld,de->ble", h1, pk["w_in"],
                     preferred_element_type=f32)
    di = xin.shape[-1]
    xs = jnp.pad(xin.reshape(B, H, W, di), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, di), f32)
    for i in range(3):
        for j in range(3):
            acc = acc + xs[:, i:i + H, j:j + W, :] * pk["w_conv"][3 * i + j]
    if conv_bias:
        acc = acc + pk["b_conv"]
    acc = acc.reshape(B, L, di)
    u = acc * jax.nn.sigmoid(acc)
    xdbl = jnp.einsum("ble,ec->blc", u, pk["w_xp"],
                      preferred_element_type=f32)
    y_acc = u * pk["Dsum"]
    from xfmamba_tpu.ops.vss_block_pallas import _DIR_KINDS
    for k, kind in enumerate(_DIR_KINDS):
        dt = jnp.einsum("blr,re->ble", xdbl[:, :, k * R:(k + 1) * R],
                        pk["w_dt"][k * R:(k + 1) * R],
                        preferred_element_type=f32)
        dt = jax.nn.softplus(dt + pk["b_dt"][k])
        Bk = xdbl[:, :, 4 * R + 2 * k:4 * R + 2 * k + 1]
        Ckc = xdbl[:, :, 4 * R + 2 * k + 1:4 * R + 2 * k + 2]
        a = jnp.exp(dt * pk["A"][k])
        b = dt * u * Bk
        if kind in ("col_f", "col_r"):
            a_t = jnp.swapaxes(a.reshape(B, H, W, di), 1, 2).reshape(B, L,
                                                                     di)
            b_t = jnp.swapaxes(b.reshape(B, H, W, di), 1, 2).reshape(B, L,
                                                                     di)
        else:
            a_t, b_t = a, b
        rev = kind in ("row_r", "col_r")

        def comb(l, r):
            al, bl = l
            ar2, br2 = r
            return al * ar2, ar2 * bl + br2

        ab = (jnp.flip(a_t, 1), jnp.flip(b_t, 1)) if rev else (a_t, b_t)
        _, h = jax.lax.associative_scan(comb, ab, axis=1)
        if rev:
            h = jnp.flip(h, 1)
        if kind in ("col_f", "col_r"):
            h = jnp.swapaxes(h.reshape(B, W, H, di), 1, 2).reshape(B, L, di)
        y_acc = y_acc + Ckc * h
    y = ln(y_acc, pk["lno"])
    out = jnp.einsum("ble,ed->bld", y, pk["w_out"],
                     preferred_element_type=f32)
    res = xf + m1 * out
    if fuse_mlp:
        h2 = ln(res, pk["ln2"])
        f1 = jnp.einsum("bld,dh->blh", h2, pk["w_fc1"],
                        preferred_element_type=f32) + pk["b_fc1"]
        f1 = 0.5 * f1 * (1.0 + jax.lax.erf(f1 * (2.0 ** -0.5)))
        f2 = jnp.einsum("blh,hd->bld", f1, pk["w_fc2"],
                        preferred_element_type=f32) + pk["b_fc2"]
        res = res + m2 * f2
    return res
