"""Golden tests: ops/layer_norm.py vs the reference's pure-torch oracles
(`/root/reference/models/mamba2/layer_norm.py:19-125` layer_norm_ref /
rms_norm_ref) plus semantics checks for the jax-only pieces (dropout rng,
LayerNormLinear fusion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xfmamba_tpu.ops.layer_norm import (
    layer_norm_fn, layer_norm_linear_fn, rms_norm_fn)


def _ref_module(name):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference_module, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    pytest.importorskip("torch")
    return load_reference_module(name)


@pytest.mark.parametrize("is_rms", [False, True])
@pytest.mark.parametrize("variant", ["plain", "residual", "x1_dual",
                                     "rowscale_prenorm"])
def test_layer_norm_fn_matches_pytorch_reference(is_rms, variant):
    import torch
    ref = _ref_module("layer_norm")
    ref_fn = ref.rms_norm_ref if is_rms else ref.layer_norm_ref
    rng = np.random.default_rng(0)
    B, L, D = 2, 6, 48
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    w = rng.standard_normal(D).astype(np.float32)
    b = None if is_rms else rng.standard_normal(D).astype(np.float32)
    kw_t = dict(eps=1e-6)
    kw_j = dict(eps=1e-6, is_rms_norm=is_rms)
    if variant == "residual":
        res = rng.standard_normal((B, L, D)).astype(np.float32)
        kw_t["residual"] = torch.tensor(res)
        kw_j["residual"] = jnp.asarray(res)
    elif variant == "x1_dual":
        x1 = rng.standard_normal((B, L, D)).astype(np.float32)
        w1 = rng.standard_normal(D).astype(np.float32)
        kw_t.update(x1=torch.tensor(x1), weight1=torch.tensor(w1))
        kw_j.update(x1=jnp.asarray(x1), weight1=jnp.asarray(w1))
    elif variant == "rowscale_prenorm":
        rs = rng.standard_normal((B, L)).astype(np.float32)
        kw_t.update(rowscale=torch.tensor(rs), prenorm=True)
        kw_j.update(rowscale=jnp.asarray(rs), prenorm=True)

    want = ref_fn(torch.tensor(x), torch.tensor(w),
                  torch.tensor(b) if b is not None else None, **kw_t)
    got = layer_norm_fn(jnp.asarray(x), jnp.asarray(w),
                        jnp.asarray(b) if b is not None else None, **kw_j)
    if not isinstance(want, tuple):
        want, got = (want,), (got,)
    for wt, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), wt.numpy(),
                                   rtol=2e-5, atol=2e-5)


def test_layer_norm_linear_matches_pytorch_reference():
    """Fused norm+linear vs composing the reference oracle with a matmul
    (`LayerNormLinearFn`, `layer_norm.py:956`)."""
    import torch
    ref = _ref_module("layer_norm")
    rng = np.random.default_rng(1)
    B, L, D, E = 2, 5, 32, 24
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    res = rng.standard_normal((B, L, D)).astype(np.float32)
    nw = rng.standard_normal(D).astype(np.float32)
    nb = rng.standard_normal(D).astype(np.float32)
    lw = rng.standard_normal((D, E)).astype(np.float32)
    lb = rng.standard_normal(E).astype(np.float32)

    y_ref, res_ref = ref.layer_norm_ref(
        torch.tensor(x), torch.tensor(nw), torch.tensor(nb),
        residual=torch.tensor(res), eps=1e-6, prenorm=True)
    want = y_ref.numpy() @ lw + lb

    got, res_out = layer_norm_linear_fn(
        jnp.asarray(x), jnp.asarray(nw), jnp.asarray(nb), jnp.asarray(lw),
        jnp.asarray(lb), residual=jnp.asarray(res), eps=1e-6, prenorm=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_out), res_ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_dropout_semantics():
    """Masked positions are zero, kept positions scaled by 1/(1-p), and the
    returned mask reproduces the computation (reference's
    return_dropout_mask contract)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 8, 32)).astype(np.float32)
    w = np.ones(32, np.float32)
    p = 0.25
    out, resid, mask = layer_norm_fn(
        jnp.asarray(x), jnp.asarray(w), None, eps=1e-6, dropout_p=p,
        prenorm=True, dropout_rng=jax.random.key(0),
        return_dropout_mask=True)
    mask = np.asarray(mask)
    # prenorm residual stream IS dropout(x): verify the mask contract
    np.testing.assert_allclose(np.asarray(resid),
                               np.where(mask, x / (1 - p), 0.0),
                               rtol=1e-6, atol=1e-6)
    frac = mask.mean()
    assert 0.65 < frac < 0.85  # keep rate ~0.75


def test_rms_norm_fn_residual_in_fp32():
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((2, 4, 16)).astype(np.float16))
    w = jnp.ones(16, jnp.float32)
    out, resid = rms_norm_fn(x, w, prenorm=True, residual_in_fp32=True)
    assert out.dtype == jnp.float16
    assert resid.dtype == jnp.float32
