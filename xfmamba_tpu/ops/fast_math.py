"""Cheap polynomial transcendentals for the Pallas TPU kernels.

Mosaic lowers ``jnp.exp`` / ``jnp.log1p`` to long guaranteed-precision op
sequences; the measured cost is large (round-2 ablations: softplus alone
3.2 ms of a 21 ms stage-2 pass, and the CSSF nk kernel sits on a ~6 ms
exp floor — ~924M exps/step at bs64).  The scan decays only need ~1e-7
relative accuracy (the e2e tolerance is bf16-dominated), so this module
provides a hand-rolled exp2:

    exp2(x) = poly(f) * 2^i,   i = round(x), f = x - i in [-0.5, 0.5]

with 2^i assembled directly into the float exponent bits (integer shift +
bitcast — no transcendental at all) and a degree-6 least-squares
polynomial for 2^f (max rel err 6.2e-9, below f32 ulp noise after any
realistic scan accumulation).  Total ~13 vector ops.

This was an attempt at the TPU analogue of the reference CUDA kernel's
``exp2f`` trick (`selective_scan_fwd_kernel.cuh:147-148` folds log2(e)
into delta*A and calls exp2f).

**MEASURED DEAD END (round 3, scripts/ab_fastexp.py, one process):**
the polynomial form is ~2x SLOWER than Mosaic's builtin exp at every
geometry — stage2 x15 20.1 -> 40.3 ms, stage0 7.1 -> 15.7 ms, CSSF nk
scan 6.8 -> 20.7 ms, model bs64 55.3 -> 113.9 ms.  Mosaic's builtin
transcendental lowering is NOT the per-op cost the round-2 ablations
made it look like (those measured softplus *call-site count*, not the
exp itself); the bitcast/int-shift exponent assembly and the 6-term FMA
chain cost more VPU issue slots than the builtin sequence.  `FAST_EXP`
therefore defaults to False and every kernel use site goes through the
dispatchers below to the builtins; the module stays as the verified
ablation record (tests/test_fast_math.py pins the numerics).
"""

import jax
import jax.numpy as jnp

FAST_EXP = False

LOG2E = 1.4426950408889634
# Cody-Waite split of ln2: hi has 11 trailing zero bits, so i*LN2_HI is
# exact for |i| < 2^11 and the reduction f = x - i*hi - i*lo carries no
# |x|-proportional rounding (a single-multiply base change costs
# |x|*2^-24 relative — measured 1.7e-6 at x=25; this form stays ~1 ulp).
_LN2_HI = 0.693359375
_LN2_LO = -2.1219444005469057e-4

# degree-6 least-squares fit of e^f on [-ln2/2, ln2/2]; max rel err 6.2e-9
_P = (9.999999999718e-01, 1.000000028136e+00, 5.000000084380e-01,
      1.666645591429e-01, 4.166628040716e-02, 8.371908716805e-03,
      1.394459586836e-03)


def _scale_pow2(p, i):
    """p * 2^i with 2^i assembled in the float exponent bits."""
    return p * jax.lax.bitcast_convert_type(
        (i.astype(jnp.int32) + 127) << 23, jnp.float32)


def fast_exp(x):
    """e**x for f32 vectors, ~15 VPU ops, ~1-2 ulp on the normal range.
    Inputs clamped so 2^i stays a normal float (x <= -87 returns ~1e-38,
    indistinguishable from 0 for scan decays; the kernels never feed
    +x >= 87)."""
    x = jnp.clip(x, -87.3, 87.3)
    i = jnp.floor(x * LOG2E + 0.5)
    f = (x - i * _LN2_HI) - i * _LN2_LO
    p = _P[6]
    for c in (_P[5], _P[4], _P[3], _P[2], _P[1], _P[0]):
        p = p * f + c
    return _scale_pow2(p, i)


def fast_exp2(x):
    """2**x via the same reduction (f is converted back to e-base)."""
    x = jnp.clip(x, -126.0, 126.0)
    i = jnp.floor(x + 0.5)
    f = (x - i) * 0.6931471805599453
    p = _P[6]
    for c in (_P[5], _P[4], _P[3], _P[2], _P[1], _P[0]):
        p = p * f + c
    return _scale_pow2(p, i)


def exp(x):
    """Dispatch: fast polynomial exp when FAST_EXP, else builtin."""
    return fast_exp(x) if FAST_EXP else jnp.exp(x)


def exp2(x):
    return fast_exp2(x) if FAST_EXP else jnp.exp2(x)


# degree-9 least-squares fit of log1p(r) on [1/sqrt2 - 1, sqrt2 - 1];
# max ABS err 1.5e-8 (dt is used through exp(dt*A) with |A| <= ~16, so
# absolute accuracy is what matters for softplus outputs)
_LOGP = (2.644225505270e-10, 9.999999061055e-01, -5.000000283220e-01,
         3.333473061429e-01, -2.500125228614e-01, 1.994478353388e-01,
         -1.657576841502e-01, 1.505633769808e-01, -1.429644496696e-01,
         8.383410675899e-02)

_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def fast_log(w):
    """ln(w) for normal positive f32 vectors, ~20 VPU ops.

    Mantissa/exponent split via bitcast: w = m * 2^k with m in [1, 2),
    renormalized to [1/sqrt2, sqrt2) so the log1p polynomial sees a
    symmetric range."""
    bits = jax.lax.bitcast_convert_type(w, jnp.int32)
    k = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32)
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)
    k = (k + big.astype(jnp.int32)).astype(jnp.float32)
    r = m - 1.0
    p = _LOGP[9]
    for c in (_LOGP[8], _LOGP[7], _LOGP[6], _LOGP[5], _LOGP[4],
              _LOGP[3], _LOGP[2], _LOGP[1], _LOGP[0]):
        p = p * r + c
    # split-constant k*ln2 (k integer, |k| < 2^8: k*hi exact) keeps the
    # total absolute error ~1e-7 instead of k-proportional
    return (k * _LN2_HI + p) + k * _LN2_LO


def fast_softplus(z):
    """softplus with the reference's threshold semantics
    (`F.softplus` / `selective_scan_fwd_kernel.cuh:132-137`:
    z if z > 20 else log1p(exp(z))), built from fast_exp + fast_log."""
    w = 1.0 + fast_exp(jnp.minimum(z, 20.0))
    return jnp.where(z > 20.0, z, fast_log(w))


def softplus(z):
    if FAST_EXP:
        return fast_softplus(z)
    return jnp.where(z > 20.0, z, jnp.log1p(jnp.exp(jnp.minimum(z, 20.0))))
