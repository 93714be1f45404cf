"""Tests for the non-default SS2D forward paths: m0 (Mamba-2/SSD), xv
(omni-projection SS2Dv3), and the superseded Cross_SS2Dv2/v3 fusion ops.

Reference surfaces: `vmamba.py:1717-1906` (SS2Dm0), `:1519-1713` (SS2Dv3),
`:715-1005` / `:1134-1436` (Cross_SS2Dv2/v3), factories `:2570-2602` (m2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.fusion import CrossSS2Dv2, CrossSS2Dv3
from xfmamba_tpu.models.ss2d import SS2D, parse_xv_type

pytestmark = pytest.mark.slow
from xfmamba_tpu.models.vssm import (
    VSSM, vmamba_base_m2, vmamba_small_m2, vmamba_tiny_m2)


def _x(key, b=2, h=8, w=8, c=32):
    return jax.random.normal(key, (b, h, w, c), jnp.float32)


@pytest.mark.parametrize("ftype", ["m0", "m0_noz"])
def test_ss2d_m0_forward_and_grad(ftype):
    x = _x(jax.random.key(0))
    m = SS2D(d_model=32, d_state=8, ssm_ratio=1.0, forward_type=ftype,
             initialize="v2", act=jax.nn.gelu, conv_bias=False,
             chunk_size=16, scan_backend="xla")
    variables = m.init(jax.random.key(1), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()

    def loss(params):
        return (m.apply({"params": params}, x) ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_ss2d_m0_param_shapes():
    """Head-structured tensors mirror the reference layouts
    (`vmamba.py:1804-1813`): A_logs (K,R), Ds (K,R,D/R), bias (K,R)."""
    x = _x(jax.random.key(0), c=32)
    m = SS2D(d_model=32, d_state=8, ssm_ratio=1.0, forward_type="m0_noz",
             initialize="v2")
    p = m.init(jax.random.key(1), x)["params"]
    R = int(np.ceil(32 / 16))
    assert p["A_logs"].shape == (4, R)
    assert p["Ds"].shape == (4, R, 32 // R)
    assert p["dt_projs_bias"].shape == (4, R)
    assert p["x_proj_weight"].shape == (4, R + 16, 32)


def test_ss2d_m0_initial_state_carries():
    x = _x(jax.random.key(0))
    m = SS2D(d_model=32, d_state=8, ssm_ratio=1.0, forward_type="m0_noz",
             initialize="v2", with_initial_state=True, chunk_size=16)
    variables = m.init(jax.random.key(1), x)
    assert "ssm_state" in variables
    s0 = variables["ssm_state"]["initial_state"]
    assert float(jnp.abs(s0).max()) == 0.0
    y, updates = m.apply(variables, x, mutable=["ssm_state"])
    s1 = updates["ssm_state"]["initial_state"]
    assert s1.shape == s0.shape
    assert float(jnp.abs(s1).max()) > 0.0  # state advanced


@pytest.mark.parametrize("ftype", ["xv1a", "xv2a", "xv3a",
                                   "xv1a_act", "xv1a_mul"])
def test_ss2d_xv_forward(ftype):
    x = _x(jax.random.key(2))
    m = SS2D(d_model=32, d_state=4, ssm_ratio=1.0, forward_type=ftype,
             scan_backend="xla")
    variables = m.init(jax.random.key(3), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    if ftype == "xv2a":
        assert "dt_projs_weight" not in variables["params"]
    # omni in_proj: d_inner + dts_dim + 8*N
    dts_dim = {"xv1a": 2, "xv2a": 32, "xv3a": 8}.get(ftype[:4], 2)
    assert variables["params"]["in_proj"]["kernel"].shape == (
        32, 32 + dts_dim + 8 * 4)


def test_parse_xv_type_flags():
    # postfixes strip right-to-left in the reference's check order
    # (_ca before _ocov), so _ca must be outermost
    m = parse_xv_type("xv1a_ocov_ca")
    assert m.base == "xv1a" and m.oconv and not m.iconv and m.cact == "silu"
    m2 = parse_xv_type("xv3a_act_onnone")  # out-norm tag parsed first
    assert m2.base == "xv3a" and m2.out_norm == "none" and m2.oact
    m3 = parse_xv_type("xv2a_cpos")
    assert m3.cpos and not m3.iconv is None


@pytest.mark.parametrize("cls", [CrossSS2Dv2, CrossSS2Dv3])
def test_cross_ss2d_v2_v3(cls):
    k1, k2, k3 = jax.random.split(jax.random.key(4), 3)
    x = _x(k1, c=32)
    x2 = _x(k2, c=32)
    m = cls(d_model=32, d_state=4, ssm_ratio=1.0, scan_backend="xla")
    variables = m.init(k3, x, x2)
    y = m.apply(variables, x, x2)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()

    def loss(params):
        return (m.apply({"params": params}, x, x2) ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_m2_factories_construct():
    for fac, depths, dims in [(vmamba_tiny_m2, (2, 2, 4, 2), 96),
                              (vmamba_small_m2, (2, 2, 12, 2), 96),
                              (vmamba_base_m2, (2, 2, 12, 2), 128)]:
        m = fac(num_classes=10)
        assert tuple(m.depths) == depths and m.dims == dims
        assert m.forward_type == "m0_noz" and m.ssm_d_state == 64
        assert m.ssm_init == "v2" and m.ssm_act == "gelu"


def test_vssm_m0_smoke():
    """Tiny m0 backbone end-to-end (geometry scaled down for CPU)."""
    m = VSSM(depths=(1, 1), dims=32, num_classes=3, ssm_d_state=8,
             ssm_ratio=1.0, ssm_act="gelu", ssm_conv_bias=False,
             ssm_init="v2", forward_type="m0_noz", mlp_ratio=1.0,
             downsample_version="v3", patchembed_version="v2")
    x = jax.random.normal(jax.random.key(5), (1, 32, 32, 3))
    variables = m.init(jax.random.key(6), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 3)
    assert np.isfinite(np.asarray(y)).all()
