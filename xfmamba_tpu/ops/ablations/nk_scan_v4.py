"""nk scan v4: inline-a/b multi-state scan for the fusion ops.

Same contract as `vss_block_pallas_v2.nk_scan_call_v2` (the N-state scan
behind Cross_SS2Dv5 / ShallowFuse, reference `fusion_vmamba.py:360-610`),
but the per-(k, n) decay/input terms are computed *inside* the scan loops
from dt/dt·u scratch (stored once per k) instead of materializing whole-map
a/b arrays per state and re-reading them:

* v2 per (pair, n): whole-map exp/mul into (Lg, 2D) scratch (2 traversals),
  scan loop re-loads both packed halves per tile (~50% of the loaded lanes
  unused per chain), h written to scratch, y accumulated afterwards from
  re-loaded h (2 more traversals).
* v4 per (pair, n): the loop loads only the needed dt/dt·u lane-slices,
  computes `a = exp(dt*A_n)` / `b = dt·u·B_n` in-register, advances h, and
  accumulates `y += C_n * h` straight into an f32 y scratch — the h
  sequence never touches VMEM.

Restricted to G = 8 (one position per (8, D) tile — the shipped fusion
geometry 7x7 @ B%8==0 always qualifies); the caller falls back to v2
otherwise.

Measured ~10% SLOWER than v2 at the CrossSS2Dv5 geometry
(`scripts/ab_nk4.py`: v2 6.57-6.67 ms vs v4 7.32-7.70 ms, B=192 L=49
D=1536 N=16) — Mosaic executes few big whole-map vector ops (v2's per-state
a/b materialization) faster than many per-tile loop ops with dynamic
slices + in-loop y read-modify-write, even though v4 moves ~25% fewer
bytes.  Off by default; kept as a numerically-verified ablation
(tests/test_nk_scan.py::test_nk_scan_v4_matches_composable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import _softplus
from xfmamba_tpu.ops.vss_block_pallas_v2 import (
    _chain_cols, nk_scan_v2_kind_pairs)

# off by default: measured slower than v2 (see module docstring)
FUSED_V4 = False

f32 = jnp.float32


def _nk_scan_kernel_v4(H, W, G, K, N, kinds, out_dtype,
                       u_ref, dts_ref, Bs_ref, Cs_ref,
                       A_ref, Dsum_ref, bias_ref, y_ref,
                       dt_s, du_s, y_s):
    L = H * W
    Lg = L * G
    T = Lg // 8
    WG = W * G
    D = u_ref.shape[-1]

    u = u_ref[0].astype(f32)
    y_s[...] = u * Dsum_ref[...].astype(f32)
    for k in range(K):
        dt = dts_ref[0][:, k * D:(k + 1) * D].astype(f32)
        dt = _softplus(dt + bias_ref[k:k + 1, :].astype(f32))
        dt_s[:, k * D:(k + 1) * D] = dt
        du_s[:, k * D:(k + 1) * D] = dt * u
    u = dt = None

    def dir_tile(k, n, base, ext, h):
        """Advance chain (k, n) by one (ext, D) tile at row `base`;
        returns (new h, y contribution for that tile)."""
        lo = k * D
        dtt = dt_s[pl.ds(base, ext), lo:lo + D]
        dut = du_s[pl.ds(base, ext), lo:lo + D]
        An = A_ref[k * N + n:k * N + n + 1, :].astype(f32)
        a = jnp.exp(dtt * An)
        col = k * N + n
        Bn = Bs_ref[0, pl.ds(base, ext), col:col + 1].astype(f32)
        h = a * h + dut * Bn
        Cn = Cs_ref[0, pl.ds(base, ext), col:col + 1].astype(f32)
        return h, Cn * h

    pairs = nk_scan_v2_kind_pairs(kinds)
    for (kf, kr, fam) in pairs:
        for n in range(N):
            if fam == "col":
                # two-pass per-column scans (cf. _serial_col_pair): pass 1
                # collects per-column (A, B) exit pairs (+ cumprod), the
                # HS chain supplies cross-column carries, pass 2 recomputes
                # a/b and writes exact states straight into y
                zero = jnp.zeros((WG, D), f32)
                one = jnp.ones((WG, D), f32)

                def p1(h, carry):
                    hf, pf, hr, pr = carry
                    off_f = pl.multiple_of(h * WG, 8)
                    off_r = pl.multiple_of((H - 1 - h) * WG, 8)
                    lo = kf * D
                    a_f = jnp.exp(dt_s[pl.ds(off_f, WG), lo:lo + D]
                                  * A_ref[kf * N + n:kf * N + n + 1, :]
                                  .astype(f32))
                    b_f = du_s[pl.ds(off_f, WG), lo:lo + D] \
                        * Bs_ref[0, pl.ds(off_f, WG),
                                 kf * N + n:kf * N + n + 1].astype(f32)
                    hf = a_f * hf + b_f
                    pf = a_f * pf
                    if kr is not None:
                        lor = kr * D
                        a_r = jnp.exp(dt_s[pl.ds(off_r, WG), lor:lor + D]
                                      * A_ref[kr * N + n:kr * N + n + 1, :]
                                      .astype(f32))
                        b_r = du_s[pl.ds(off_r, WG), lor:lor + D] \
                            * Bs_ref[0, pl.ds(off_r, WG),
                                     kr * N + n:kr * N + n + 1] \
                            .astype(f32)
                        hr = a_r * hr + b_r
                        pr = a_r * pr
                    return hf, pf, hr, pr

                B_cf, A_cf, B_cr, A_cr = jax.lax.fori_loop(
                    0, H, p1, (zero, one, zero, one))
                widx = jax.lax.broadcasted_iota(jnp.int32, (WG, 1), 0) // G
                c_f = _chain_cols(A_cf, B_cf, W, G, widx, False)
                c_r = (_chain_cols(A_cr, B_cr, W, G, widx, True)
                       if kr is not None else zero)

                def p2(h, carry):
                    hf, hr = carry
                    off_f = pl.multiple_of(h * WG, 8)
                    off_r = pl.multiple_of((H - 1 - h) * WG, 8)
                    hf, yc = dir_tile(kf, n, off_f, WG, hf)
                    y_s[pl.ds(off_f, WG), :] = \
                        y_s[pl.ds(off_f, WG), :] + yc
                    if kr is not None:
                        hr, yc = dir_tile(kr, n, off_r, WG, hr)
                        y_s[pl.ds(off_r, WG), :] = \
                            y_s[pl.ds(off_r, WG), :] + yc
                    return hf, hr

                jax.lax.fori_loop(0, H, p2, (c_f, c_r))
            else:
                zero = jnp.zeros((8, D), f32)

                def body(i, carry):
                    hf, hr = carry
                    base_f = pl.multiple_of(i * 8, 8)
                    hf, yc = dir_tile(kf, n, base_f, 8, hf)
                    y_s[pl.ds(base_f, 8), :] = \
                        y_s[pl.ds(base_f, 8), :] + yc
                    if kr is not None:
                        base_r = pl.multiple_of((T - 1 - i) * 8, 8)
                        hr, yc = dir_tile(kr, n, base_r, 8, hr)
                        y_s[pl.ds(base_r, 8), :] = \
                            y_s[pl.ds(base_r, 8), :] + yc
                    return hf, hr

                jax.lax.fori_loop(0, T, body, (zero, zero))

    y_ref[0] = y_s[...].astype(out_dtype)


def nk_scan_v4_supported(L, W, G, kinds):
    """v4 runs one position per (8, D) tile: requires G == 8 and the
    row-major tiling to hold."""
    try:
        nk_scan_v2_kind_pairs(kinds)
    except ValueError:
        return False
    return G == 8 and (L * G) % 8 == 0 and (W * G) % 8 == 0


@functools.partial(jax.jit, static_argnames=("H", "W", "kinds", "group",
                                              "interpret", "vmem_mb"))
def nk_scan_call_v4(u, dts, Bs, Cs, A, Dvec, bias, H, W, kinds, group=8,
                    interpret=False, vmem_mb=100):
    """Drop-in for `nk_scan_call_v2` (same contract); caller must check
    `nk_scan_v4_supported`."""
    B, L, D = u.shape
    K = len(kinds)
    N = A.shape[0] // K
    G = group
    assert nk_scan_v4_supported(L, W, G, kinds) and B % G == 0
    Lg = G * L
    Dsum = Dvec.astype(f32).sum(axis=0, keepdims=True)

    def inter(z):
        Bz, Lz, Cz = z.shape
        z = z.reshape(Bz // G, G, Lz, Cz)
        return jnp.swapaxes(z, 1, 2).reshape(Bz // G, Lz * G, Cz)

    kernel = functools.partial(_nk_scan_kernel_v4, H, W, G, K, N, kinds,
                               u.dtype)
    blk = lambda c: pl.BlockSpec((1, Lg, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(D), blk(K * D), blk(K * N), blk(K * N),
                  full, full, full],
        out_specs=blk(D),
        out_shape=jax.ShapeDtypeStruct((B // G, Lg, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((Lg, K * D), f32),
                        pltpu.VMEM((Lg, K * D), f32),
                        pltpu.VMEM((Lg, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(inter(u), inter(dts), inter(Bs), inter(Cs), A, Dsum,
      bias.astype(f32))
    y = y.reshape(B // G, L, G, D)
    return jnp.swapaxes(y, 1, 2).reshape(B, L, D)
