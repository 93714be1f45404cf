"""Two-segment row-scan ablation for the v2 block megakernel.

Splits each direction's flat serial row scan into TWO independent
half-sequence chains (4 chains total advancing in one fori body — enough
independent FMA streams to hide the multiply-add latency a single serial
chain stalls on): the tail half of the forward chain and the head half of
the reverse chain scan with zero initial state while tracking the running
a-cumprod (stored in-place into the then-dead `af`/`ar` tiles), and a
fix-up pass adds `cumprod * boundary_carry` once the exact half-boundary
states are known.

Measured WORSE than the single-segment loop on every stage geometry
(scripts/ab_rowseg.py / ab_rowseg2.py: stage0 +0.9 ms, stage2 x15
+0.6 ms) — the serial loops are VPU-issue-bound, not latency-bound, so
the extra cumprod tracking + fix-up traversal is pure added work.  Kept
as a numerically-verified ablation (interpret-mode parity in
tests/test_vss_block_v2.py covers it); enabled via
`vss_block_pallas_v2.ROW_SEG = True`.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def serial_row_pair_segmented(af, bf, ar, br, out_f, out_r, T, M, S, G):
    """Segmented variant of `vss_block_pallas_v2._serial_row_pair`.

    Same ref contract (af/bf/ar/br are (L*G, C) VMEM refs, h sequences
    written to out_f/out_r); requires T % (2*M) == 0 and T >= 8 (the
    caller falls back to the single-segment loop otherwise).  Clobbers
    `bf`/`br` (cumprod storage); `out_f`/`out_r` may alias `af`/`ar`.
    """
    C = af.shape[1]
    f32 = jnp.float32
    zero = jnp.zeros((G, C), f32)
    one = jnp.ones((G, C), f32)
    TM = T // M
    half_rows = (T // 2) * 8
    MS = M * S

    def cat(xs):
        return jnp.concatenate(xs, axis=0) if MS > 1 else xs[0]

    def body(i, carry):
        # 4 chains: fwd head (hA, exact), fwd tail (hB + cumprod pB),
        # rev tail (rB, exact), rev head (rA + cumprod pA)
        hA, hB, pB, rB, rA, pA = carry
        bA = pl.multiple_of(i * 8 * M, 8)
        bB = pl.multiple_of(half_rows + i * 8 * M, 8)
        bRB = pl.multiple_of((TM - 1 - i) * 8 * M, 8)
        bRA = pl.multiple_of((TM // 2 - 1 - i) * 8 * M, 8)
        aA = af[pl.ds(bA, 8 * M), :]
        vA = bf[pl.ds(bA, 8 * M), :]
        aB = af[pl.ds(bB, 8 * M), :]
        vB = bf[pl.ds(bB, 8 * M), :]
        aRB = ar[pl.ds(bRB, 8 * M), :]
        vRB = br[pl.ds(bRB, 8 * M), :]
        aRA = ar[pl.ds(bRA, 8 * M), :]
        vRA = br[pl.ds(bRA, 8 * M), :]
        oA, oB, oRB, oRA, pBs, pAs = [], [], [], [], [], []
        for t in range(MS):
            sf = slice(t * G, (t + 1) * G)
            j = MS - 1 - t
            sr = slice(j * G, (j + 1) * G)
            hA = aA[sf] * hA + vA[sf]
            a_b = aB[sf]
            hB = a_b * hB + vB[sf]
            pB = a_b * pB
            rB = aRB[sr] * rB + vRB[sr]
            a_ra = aRA[sr]
            rA = a_ra * rA + vRA[sr]
            pA = a_ra * pA
            oA.append(hA)
            oB.append(hB)
            pBs.append(pB)
            oRB.insert(0, rB)
            oRA.insert(0, rA)
            pAs.insert(0, pA)
        out_f[pl.ds(bA, 8 * M), :] = cat(oA)
        out_f[pl.ds(bB, 8 * M), :] = cat(oB)
        bf[pl.ds(bB, 8 * M), :] = cat(pBs)
        out_r[pl.ds(bRB, 8 * M), :] = cat(oRB)
        out_r[pl.ds(bRA, 8 * M), :] = cat(oRA)
        br[pl.ds(bRA, 8 * M), :] = cat(pAs)
        return hA, hB, pB, rB, rA, pA

    hA, hB, pB, rB, rA, pA = jax.lax.fori_loop(
        0, TM // 2, body, (zero, zero, one, zero, zero, one))

    # fix-up: exact state = raw half-chain state + cumprod * boundary carry
    reps = (8 * M) // G
    cf = jnp.concatenate([hA] * reps, axis=0) if reps > 1 else hA
    cr = jnp.concatenate([rB] * reps, axis=0) if reps > 1 else rB

    def fix(i, _):
        bB = pl.multiple_of(half_rows + i * 8 * M, 8)
        bA = pl.multiple_of(i * 8 * M, 8)
        out_f[pl.ds(bB, 8 * M), :] = (out_f[pl.ds(bB, 8 * M), :]
                                      + bf[pl.ds(bB, 8 * M), :] * cf)
        out_r[pl.ds(bA, 8 * M), :] = (out_r[pl.ds(bA, 8 * M), :]
                                      + br[pl.ds(bA, 8 * M), :] * cr)
        return 0

    jax.lax.fori_loop(0, TM // 2, fix, 0)
