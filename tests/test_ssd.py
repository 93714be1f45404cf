"""Tests for the Mamba-2 / SSD chunked scan (xfmamba_tpu.ops.ssd).

Oracle pattern per SURVEY.md §4: the chunked algorithm vs a direct
`lax.scan` of the recurrence h[t] = exp(dt*A)h[t-1] + dt*B*x, y = C·h.
(The reference checks Triton vs its own torch loop, `ssd_minimal.py:150`.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.ops.ssd import (
    layernorm_gated, rmsnorm_gated, segsum, selective_state_update,
    ssd_chunk_scan, swiglu)


def ssd_ref_scan(x, dt, A, B, C, D=None, z=None, dt_bias=None,
                 initial_states=None, dt_softplus=False):
    """Step-by-step recurrence oracle (fp32)."""
    b, s, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    if h != g:
        B = jnp.repeat(B, h // g, axis=2)
        C = jnp.repeat(C, h // g, axis=2)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    h0 = (jnp.zeros((b, h, p, n), jnp.float32) if initial_states is None
          else initial_states.astype(jnp.float32))

    def step(hst, inp):
        xt, dtt, Bt, Ct = inp          # (b,h,p), (b,h), (b,h,n), (b,h,n)
        dA = jnp.exp(dtt * A)[..., None, None]          # (b,h,1,1)
        hst = hst * dA + (dtt[..., None] * xt)[..., None] * Bt[:, :, None, :]
        y = jnp.sum(hst * Ct[:, :, None, :], axis=-1)   # (b,h,p)
        return hst, y

    _, ys = jax.lax.scan(
        step, h0,
        (jnp.moveaxis(x, 1, 0), jnp.moveaxis(dt, 1, 0),
         jnp.moveaxis(B, 1, 0), jnp.moveaxis(C, 1, 0)))
    y = jnp.moveaxis(ys, 0, 1)
    if D is not None:
        Df = D[:, None] if D.ndim == 1 else D
        y = y + Df * x
    if z is not None:
        y = y * (z * jax.nn.sigmoid(z))
    return y


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("seqlen,chunk", [(64, 16), (96, 64), (128, 32)])
@pytest.mark.parametrize("ngroups_eq_heads", [True, False])
def test_ssd_matches_recurrence(seqlen, chunk, ngroups_eq_heads):
    keys = jax.random.split(jax.random.key(0), 6)
    b, h, p, n = 2, 4, 8, 16
    g = h if ngroups_eq_heads else 2
    x = _rand(keys[0], b, seqlen, h, p)
    dt = jax.nn.softplus(_rand(keys[1], b, seqlen, h) - 2.0)
    A = -jnp.exp(jax.random.uniform(keys[2], (h,)))
    B = _rand(keys[3], b, seqlen, g, n)
    C = _rand(keys[4], b, seqlen, g, n)
    D = _rand(keys[5], h)

    y = ssd_chunk_scan(x, dt, A, B, C, chunk_size=chunk, D=D)
    y_ref = ssd_ref_scan(x, dt, A, B, C, D=D)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_ssd_bias_softplus_z_and_matrix_D():
    keys = jax.random.split(jax.random.key(1), 7)
    b, s, h, p, n = 1, 64, 2, 4, 8
    x = _rand(keys[0], b, s, h, p)
    dt = _rand(keys[1], b, s, h) - 3.0
    A = -jnp.exp(jax.random.uniform(keys[2], (h,)))
    B = _rand(keys[3], b, s, h, n)
    C = _rand(keys[4], b, s, h, n)
    D = _rand(keys[5], h, p)
    z = _rand(keys[6], b, s, h, p)
    bias = jnp.full((h,), 0.3)

    y = ssd_chunk_scan(x, dt, A, B, C, chunk_size=16, D=D, z=z,
                       dt_bias=bias, dt_softplus=True)
    y_ref = ssd_ref_scan(x, dt, A, B, C, D=D, z=z, dt_bias=bias,
                         dt_softplus=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_ssd_initial_and_final_states():
    keys = jax.random.split(jax.random.key(2), 6)
    b, s, h, p, n = 2, 64, 2, 4, 8
    x = _rand(keys[0], b, s, h, p)
    dt = jax.nn.softplus(_rand(keys[1], b, s, h) - 2.0)
    A = -jnp.exp(jax.random.uniform(keys[2], (h,)))
    B = _rand(keys[3], b, s, h, n)
    C = _rand(keys[4], b, s, h, n)
    h0 = _rand(keys[5], b, h, p, n)

    y1, f1 = ssd_chunk_scan(x[:, :32], dt[:, :32], A, B[:, :32], C[:, :32],
                            chunk_size=16, initial_states=h0,
                            return_final_states=True)
    y2, f2 = ssd_chunk_scan(x[:, 32:], dt[:, 32:], A, B[:, 32:], C[:, 32:],
                            chunk_size=16, initial_states=f1,
                            return_final_states=True)
    y, f = ssd_chunk_scan(x, dt, A, B, C, chunk_size=16, initial_states=h0,
                          return_final_states=True)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               np.asarray(y), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), rtol=2e-4,
                               atol=2e-4)


def test_ssd_gradients_flow():
    keys = jax.random.split(jax.random.key(3), 5)
    b, s, h, p, n = 1, 32, 2, 4, 4
    x = _rand(keys[0], b, s, h, p)
    dt = jax.nn.softplus(_rand(keys[1], b, s, h) - 2.0)
    A = -jnp.exp(jax.random.uniform(keys[2], (h,)))
    B = _rand(keys[3], b, s, h, n)
    C = _rand(keys[4], b, s, h, n)

    def loss(args):
        x, dt, A, B, C = args
        return ssd_chunk_scan(x, dt, A, B, C, chunk_size=8).sum()

    grads = jax.grad(loss)((x, dt, A, B, C))
    for g_arr in grads:
        assert np.isfinite(np.asarray(g_arr)).all()
        assert float(jnp.abs(g_arr).max()) > 0


def test_selective_state_update_matches_one_scan_step():
    keys = jax.random.split(jax.random.key(4), 6)
    b, h, p, n = 2, 3, 4, 8
    state = _rand(keys[0], b, h, p, n)
    x = _rand(keys[1], b, h, p)
    dt = jax.nn.softplus(_rand(keys[2], b, h, p) - 2.0)
    A = -jnp.exp(jax.random.uniform(keys[3], (h, p, n)))
    B = _rand(keys[4], b, h, n)
    C = _rand(keys[5], b, h, n)

    new_state, y = selective_state_update(state, x, dt, A, B, C)
    dA = jnp.exp(dt[..., None] * A)
    want_state = state * dA + (dt * x)[..., None] * B[:, :, None, :]
    want_y = jnp.sum(want_state * C[:, :, None, :], axis=-1)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(want_state),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y), rtol=1e-5,
                               atol=1e-5)


def test_segsum_definition():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    s = np.asarray(segsum(x))
    # out[i, j] = sum_{j < r <= i} x[r]
    for i in range(4):
        for j in range(4):
            if i >= j:
                assert np.isclose(s[i, j], sum(float(x[r])
                                               for r in range(j + 1, i + 1)))
            else:
                assert s[i, j] == -np.inf


def test_gated_norms():
    key = jax.random.key(5)
    x = jax.random.normal(key, (2, 7, 16))
    z = jax.random.normal(jax.random.key(6), (2, 7, 16))
    w = jnp.ones((16,)) * 1.5

    # norm_before_gate=True: norm(x) * silu(z)
    out = rmsnorm_gated(x, w, z=z, eps=1e-5, norm_before_gate=True)
    rms = x / jnp.sqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-5)
    want = rms * w * (z * jax.nn.sigmoid(z))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-5)

    # norm_before_gate=False: norm(x * silu(z))
    out2 = layernorm_gated(x, w, z=z, eps=1e-5, norm_before_gate=False)
    xg = x * (z * jax.nn.sigmoid(z))
    mu = xg.mean(-1, keepdims=True)
    var = ((xg - mu) ** 2).mean(-1, keepdims=True)
    want2 = (xg - mu) / jnp.sqrt(var + 1e-5) * w
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want2),
                               rtol=1e-5, atol=1e-5)

    # group_size
    out3 = rmsnorm_gated(x, w, eps=1e-5, group_size=8)
    xr = x.reshape(2, 7, 2, 8)
    want3 = (xr / jnp.sqrt(jnp.mean(xr * xr, -1, keepdims=True) + 1e-5)
             ).reshape(2, 7, 16) * w
    np.testing.assert_allclose(np.asarray(out3), np.asarray(want3),
                               rtol=1e-5, atol=1e-5)


def test_swiglu():
    e = jnp.asarray([1.0, -2.0])
    g = jnp.asarray([3.0, 4.0])
    want = e * jax.nn.sigmoid(e) * g
    np.testing.assert_allclose(np.asarray(swiglu(e, g)), np.asarray(want))


def test_ssd_matches_pytorch_reference():
    """Cross-framework golden check: our chunked SSD vs the reference's
    pure-torch `mamba_chunk_scan_combined_torch` (`ssd_minimal.py:85-127`)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference_module, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    ref = load_reference_module("ssd_minimal")

    rng = np.random.default_rng(0)
    b, s, h, p, g, n = 2, 128, 4, 8, 2, 16
    x = rng.standard_normal((b, s, h, p)).astype(np.float32)
    dt = np.abs(rng.standard_normal((b, s, h))).astype(np.float32) * 0.5
    A = -np.exp(rng.uniform(size=(h,))).astype(np.float32)
    B = rng.standard_normal((b, s, g, n)).astype(np.float32)
    C = rng.standard_normal((b, s, g, n)).astype(np.float32)
    D = rng.standard_normal((h,)).astype(np.float32)
    bias = np.full((h,), 0.2, np.float32)

    want = ref.mamba_chunk_scan_combined_torch(
        torch.tensor(x), torch.tensor(dt), torch.tensor(A),
        torch.tensor(B), torch.tensor(C), chunk_size=32,
        D=torch.tensor(D), dt_bias=torch.tensor(bias),
        dt_softplus=True).numpy()

    got = ssd_chunk_scan(jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
                         jnp.asarray(B), jnp.asarray(C), chunk_size=32,
                         D=jnp.asarray(D), dt_bias=jnp.asarray(bias),
                         dt_softplus=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def _ref_module(name):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference_module, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    pytest.importorskip("torch")
    return load_reference_module(name)


def test_state_update_matches_pytorch_reference():
    """Cross-framework: decode-step update vs the reference's
    `selective_state_update_ref` (`selective_state_update.py:202`)."""
    import torch
    ref = _ref_module("selective_state_update")
    rng = np.random.default_rng(1)
    b, h, p, n = 2, 3, 4, 8
    state = rng.standard_normal((b, h, p, n)).astype(np.float32)
    x = rng.standard_normal((b, h, p)).astype(np.float32)
    dt = rng.standard_normal((b, h, p)).astype(np.float32)
    A = -np.exp(rng.uniform(size=(h, p, n))).astype(np.float32)
    B = rng.standard_normal((b, h, n)).astype(np.float32)
    C = rng.standard_normal((b, h, n)).astype(np.float32)
    D = rng.standard_normal((h, p)).astype(np.float32)
    z = rng.standard_normal((b, h, p)).astype(np.float32)
    bias = np.full((h, p), 0.1, np.float32)

    t_state = torch.tensor(state)  # mutated in place by the reference
    want_y = ref.selective_state_update_ref(
        t_state, torch.tensor(x), torch.tensor(dt), torch.tensor(A),
        torch.tensor(B), torch.tensor(C), D=torch.tensor(D),
        z=torch.tensor(z), dt_bias=torch.tensor(bias),
        dt_softplus=True).numpy()

    new_state, y = selective_state_update(
        jnp.asarray(state), jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C), D=jnp.asarray(D), z=jnp.asarray(z),
        dt_bias=jnp.asarray(bias), dt_softplus=True)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_state), t_state.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_gated_norms_match_pytorch_reference():
    """Cross-framework: gated RMS/LayerNorm vs `rms_norm_ref`
    (`layernorm_gated.py:18`)."""
    import torch
    ref = _ref_module("layernorm_gated")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 5, 32)).astype(np.float32)
    z = rng.standard_normal((3, 5, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)

    for nbg in (True, False):
        for gs in (None, 8):
            want = ref.rms_norm_ref(
                torch.tensor(x), torch.tensor(w), None,
                z=torch.tensor(z), eps=1e-5, group_size=gs,
                norm_before_gate=nbg).numpy()
            got = rmsnorm_gated(jnp.asarray(x), jnp.asarray(w),
                                z=jnp.asarray(z), eps=1e-5, group_size=gs,
                                norm_before_gate=nbg)
            np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                       atol=2e-5,
                                       err_msg=f"nbg={nbg} gs={gs}")
