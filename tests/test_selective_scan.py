"""Selective-scan correctness: associative scan vs sequential oracle vs the
PyTorch reference (`/root/reference/models/csms6s.py:25-68` semantics),
including gradients.  Mirrors the parameter grid of the reference's
``test_selective_scan.py``."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xfmamba_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_seq,
    selective_scan_torch_layout,
)

from reference_oracle import reference_available, load_reference_module

pytestmark = pytest.mark.slow


def make_inputs(rng, Bsz, K, C, N, L, dtype=np.float32, with_D=True,
                with_bias=True):
    KC = K * C
    u = rng.standard_normal((Bsz, L, KC)).astype(dtype)
    delta = (0.5 * rng.random((Bsz, L, KC))).astype(dtype)
    A = (-0.5 * rng.random((KC, N))).astype(np.float32)
    Bm = rng.standard_normal((Bsz, L, K, N)).astype(dtype)
    Cm = rng.standard_normal((Bsz, L, K, N)).astype(dtype)
    D = rng.standard_normal((KC,)).astype(np.float32) if with_D else None
    bias = (0.5 * rng.random((KC,))).astype(np.float32) if with_bias else None
    return u, delta, A, Bm, Cm, D, bias


@pytest.mark.parametrize("K,C,N,L", [
    (4, 16, 1, 64),
    (4, 8, 16, 49),
    (2, 24, 16, 56),
    (1, 32, 4, 128),
    (4, 4, 1, 57),   # odd length
])
@pytest.mark.parametrize("softplus", [True, False])
def test_assoc_matches_seq(K, C, N, L, softplus):
    rng = np.random.default_rng(0)
    args = make_inputs(rng, 2, K, C, N, L)
    y_seq = selective_scan_seq(*args, delta_softplus=softplus)
    y_par = selective_scan(*args, delta_softplus=softplus)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq),
                               rtol=2e-5, atol=2e-5)


def test_no_D_no_bias():
    rng = np.random.default_rng(1)
    args = make_inputs(rng, 2, 4, 8, 2, 32, with_D=False, with_bias=False)
    y_seq = selective_scan_seq(*args)
    y_par = selective_scan(*args)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq),
                               rtol=2e-5, atol=2e-5)


def test_reverse_equals_flip_scan_flip():
    rng = np.random.default_rng(2)
    u, delta, A, Bm, Cm, D, bias = make_inputs(rng, 2, 2, 8, 4, 40)
    y_rev = selective_scan(u, delta, A, Bm, Cm, D, bias, reverse=True)
    y_flip = selective_scan(u[:, ::-1], delta[:, ::-1], A, Bm[:, ::-1],
                            Cm[:, ::-1], D, bias)[:, ::-1]
    np.testing.assert_allclose(np.asarray(y_rev), np.asarray(y_flip),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs_fp32_state():
    rng = np.random.default_rng(3)
    u, delta, A, Bm, Cm, D, bias = make_inputs(rng, 2, 4, 8, 1, 64)
    y32 = selective_scan(u, delta, A, Bm, Cm, D, bias)
    y16 = selective_scan(jnp.asarray(u, jnp.bfloat16),
                         jnp.asarray(delta, jnp.bfloat16), A,
                         jnp.asarray(Bm, jnp.bfloat16),
                         jnp.asarray(Cm, jnp.bfloat16), D, bias)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("K,C,N,L", [(4, 16, 1, 64), (2, 16, 16, 49),
                                     (4, 8, 8, 57)])
def test_parity_vs_torch_reference(K, C, N, L):
    torch = pytest.importorskip("torch")
    csms6s = load_reference_module("csms6s")
    rng = np.random.default_rng(4)
    u, delta, A, Bm, Cm, D, bias = make_inputs(rng, 2, K, C, N, L)

    # reference layout: u/delta (B, KC, L), B/C (B, K, N, L)
    t = lambda x: torch.tensor(np.asarray(x))
    y_ref = csms6s.selective_scan_torch(
        t(u.transpose(0, 2, 1)), t(delta.transpose(0, 2, 1)), t(A),
        t(Bm.transpose(0, 2, 3, 1)), t(Cm.transpose(0, 2, 3, 1)),
        t(D), t(bias), True, True,
    ).numpy()

    y = selective_scan_torch_layout(
        jnp.asarray(u.transpose(0, 2, 1)), jnp.asarray(delta.transpose(0, 2, 1)),
        jnp.asarray(A), jnp.asarray(Bm.transpose(0, 2, 3, 1)),
        jnp.asarray(Cm.transpose(0, 2, 3, 1)), jnp.asarray(D),
        jnp.asarray(bias), True,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_gradient_parity_vs_torch_reference():
    torch = pytest.importorskip("torch")
    csms6s = load_reference_module("csms6s")
    rng = np.random.default_rng(5)
    K, C, N, L = 2, 8, 4, 32
    u, delta, A, Bm, Cm, D, bias = make_inputs(rng, 2, K, C, N, L)

    tt = lambda x: torch.tensor(np.asarray(x), requires_grad=True)
    tu, td, tA = tt(u.transpose(0, 2, 1)), tt(delta.transpose(0, 2, 1)), tt(A)
    tB, tC = tt(Bm.transpose(0, 2, 3, 1)), tt(Cm.transpose(0, 2, 3, 1))
    tD, tb = tt(D), tt(bias)
    y_ref = csms6s.selective_scan_torch(tu, td, tA, tB, tC, tD, tb, True, True)
    y_ref.sum().backward()

    def loss(u_, d_, A_, B_, C_, D_, b_):
        return selective_scan(u_, d_, A_, B_, C_, D_, b_).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(Bm),
        jnp.asarray(Cm), jnp.asarray(D), jnp.asarray(bias))

    pairs = [
        (grads[0], tu.grad.numpy().transpose(0, 2, 1)),
        (grads[1], td.grad.numpy().transpose(0, 2, 1)),
        (grads[2], tA.grad.numpy()),
        (grads[3], tB.grad.numpy().transpose(0, 3, 1, 2)),
        (grads[4], tC.grad.numpy().transpose(0, 3, 1, 2)),
        (grads[5], tD.grad.numpy()),
        (grads[6], tb.grad.numpy()),
    ]
    for ours, ref in pairs:
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)
