"""Accuracy tests for the polynomial transcendentals used inside the
Pallas kernels (`ops/fast_math.py`).

The fused kernels' decay `exp(dt*A)` and `softplus` route through these;
the fused-vs-composable parity suites exercise them end-to-end, and these
tests pin the pointwise contracts: ~1-ulp relative error for exp on the
full normal range, ~1-output-ulp absolute error for softplus, and exact
agreement between interpret-mode Pallas evaluation and the plain-jnp
evaluation (same ops, same order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from xfmamba_tpu.ops import fast_math as fm


def _rel_err(got, want):
    got = np.asarray(got, np.float64)
    return np.abs(got - want) / np.maximum(np.abs(want), 1e-300)


@pytest.mark.parametrize("lo,hi", [(-87, 0), (-45, 0), (-20, 25), (-87, 87)])
def test_fast_exp_accuracy(lo, hi):
    x = np.random.default_rng(0).uniform(lo, hi, (200000,)).astype(np.float32)
    want = np.exp(np.asarray(x, np.float64))
    got = fm.fast_exp(jnp.asarray(x))
    assert _rel_err(got, want).max() < 3e-7  # ~2 ulp


def test_fast_exp2_accuracy():
    x = np.random.default_rng(1).uniform(-120, 120, (200000,)) \
        .astype(np.float32)
    want = np.exp2(np.asarray(x, np.float64))
    got = fm.fast_exp2(jnp.asarray(x))
    assert _rel_err(got, want).max() < 3e-7


def test_fast_exp_edges():
    # deep underflow clamps to ~1e-38 (absolute zero for scan decays),
    # exp(0) == 1 exactly
    got = np.asarray(fm.fast_exp(jnp.asarray([-1e4, -500.0, 0.0], jnp.float32)))
    assert got[0] == got[1] and got[0] < 1.3e-38
    assert got[2] == 1.0


def test_fast_log_accuracy():
    w = np.exp(np.random.default_rng(2).uniform(-69, 69, (200000,))) \
        .astype(np.float32)
    want = np.log(np.asarray(w, np.float64))
    got = np.asarray(fm.fast_log(jnp.asarray(w)), np.float64)
    # ~1 ulp of the OUTPUT (|log| up to ~69 -> ulp ~ 7.6e-6)
    assert np.abs(got - want).max() < 1e-5
    tight = np.abs(want) < 1.0
    assert np.abs(got - want)[tight].max() < 3e-7


def test_fast_softplus_matches_torch_semantics():
    z = np.random.default_rng(3).uniform(-40, 40, (200000,)) \
        .astype(np.float32)
    want = np.where(z > 20.0, np.asarray(z, np.float64),
                    np.log1p(np.exp(np.minimum(np.asarray(z, np.float64),
                                               20.0))))
    got = np.asarray(fm.fast_softplus(jnp.asarray(z)), np.float64)
    assert np.abs(got - want).max() < 4e-6  # ~1 ulp at the max output 20.7


def test_pallas_interpret_matches_plain():
    """The same polynomial evaluated inside a Pallas kernel (interpret
    mode) must agree with the plain-jnp evaluation (tolerance covers
    jit-fusion FMA-contraction differences only)."""
    x = jnp.asarray(np.random.default_rng(4).uniform(-60, 20, (8, 256))
                    .astype(np.float32))

    def kernel(x_ref, e_ref, s_ref):
        e_ref[...] = fm.fast_exp(x_ref[...])
        s_ref[...] = fm.fast_softplus(x_ref[...])

    e, s = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(x.shape, jnp.float32)] * 2,
        interpret=True)(x)
    np.testing.assert_allclose(np.asarray(e), np.asarray(fm.fast_exp(x)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(fm.fast_softplus(x)),
                               rtol=1e-6, atol=1e-6)


def test_flag_fallback():
    old = fm.FAST_EXP
    try:
        fm.FAST_EXP = False
        x = jnp.asarray([-3.0, 0.5], jnp.float32)
        np.testing.assert_array_equal(np.asarray(fm.exp(x)),
                                      np.asarray(jnp.exp(x)))
        fm.FAST_EXP = True
        np.testing.assert_array_equal(np.asarray(fm.exp(x)),
                                      np.asarray(fm.fast_exp(x)))
    finally:
        fm.FAST_EXP = old
