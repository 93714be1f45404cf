"""Wide-state whole-map scan kernel (nk v3) for the N>1 fusion ops.

Same contract as ``vss_block_pallas.nk_scan_call`` / ``nk_scan_call_v2``
(multi-state selective scan over whole feature maps — used by Cross_SS2Dv5
and ShallowFuse_SS2Dv4, reference ``fusion_vmamba.py:446-578, 831-833``),
but all N states of a direction advance together in ONE serial chain whose
operands are lane-widened to (rows, N*D):

* state n of channel d lives at lane ``n*D + d``; the chain FMA
  ``h = a*h + b`` is N*D lanes wide, so the per-step latency is amortized
  over N states x G images instead of one state (the v2 kernel interleaves
  only 2 chains and measures ~2.3x its VPU floor at the fusion geometry).
* a and b are computed inline per tile from the dt/u/Bs input blocks
  (softplus + exp recomputed in-register) — the per-state whole-map f32
  a/b scratch round-trips of v2 disappear entirely.
* per-state scalars (Bs, Cs columns) are spread onto the wide lane layout
  with a one-hot (N, N*D) MXU matmul — the MXU is otherwise idle here.

Layout/alignment requirements (host wrapper falls back to v2 otherwise):
``D % 128 == 0``, G in {1,2,4,8}, ``8 | L*G`` and ``8 | W*G``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas_v2 import (
    _chain_cols, _interleave, _softplus, nk_scan_v2_kind_pairs)

# one-hot MXU matmul vs lane-broadcast loop for the Bs/Cs state expansion
_USE_MXU_EXPAND = False
_LOG2E = 1.4426950408889634


def _nk_scan_kernel_v3(H, W, G, K, N, kinds, out_dtype,
                       u_ref, dts_ref, Bs_ref, Cs_ref,
                       A_ref, Dsum_ref, bias_ref, S_ref, y_ref,
                       out_f_ref, out_r_ref):
    """u (1, Lg, D); dts (1, Lg, K*D); Bs/Cs (1, Lg, K*N);
    A (K, N*D) f32 rows n-major; Dsum (1, D); bias (K, D) f32;
    S one-hot (N, N*D); y (1, Lg, D)."""
    f32 = jnp.float32
    L = H * W
    Lg = L * G
    WG = W * G
    D = u_ref.shape[2]
    S_sub = 8 // G

    def ab_wide(k, base, size):
        """Lane-widened (a, b) for `size` rows of direction k.
        A rows are pre-scaled by log2(e) host-side: a = exp2(dt * A~)."""
        dt = dts_ref[0, pl.ds(base, size), k * D:(k + 1) * D].astype(f32)
        dt = _softplus(dt + bias_ref[k:k + 1, :])
        u_t = u_ref[0, pl.ds(base, size), :].astype(f32)
        dtu = dt * u_t
        dt_w = jnp.concatenate([dt] * N, axis=1)
        a = jnp.exp2(dt_w * A_ref[k:k + 1, :])
        Bs_t = Bs_ref[0, pl.ds(base, size),
                      k * N:(k + 1) * N].astype(f32)
        if _USE_MXU_EXPAND:
            dtu_w = jnp.concatenate([dtu] * N, axis=1)
            b = dtu_w * jax.lax.dot(Bs_t, S_ref[...],
                                    preferred_element_type=f32)
        else:
            b = jnp.concatenate(
                [dtu * Bs_t[:, n:n + 1] for n in range(N)], axis=1)
        return a, b

    def y_wide(k, base, size, h_seq):
        """Contract the wide states with their C columns -> (size, D)."""
        Cs_t = Cs_ref[0, pl.ds(base, size),
                      k * N:(k + 1) * N].astype(f32)
        if _USE_MXU_EXPAND:
            hc = h_seq * jax.lax.dot(Cs_t, S_ref[...],
                                     preferred_element_type=f32)
            yt = hc[:, :D]
            for n in range(1, N):
                yt = yt + hc[:, n * D:(n + 1) * D]
        else:
            yt = h_seq[:, :D] * Cs_t[:, 0:1]
            for n in range(1, N):
                yt = yt + h_seq[:, n * D:(n + 1) * D] * Cs_t[:, n:n + 1]
        return yt

    def row_pair(kf, kr):
        T = Lg // 8
        h0 = jnp.zeros((G, N * D), f32)

        def body(i, carry):
            hf, hr = carry
            base_f = pl.multiple_of(i * 8, 8)
            a_f, b_f = ab_wide(kf, base_f, 8)
            outs_f = []
            for s in range(S_sub):
                hf = a_f[s * G:(s + 1) * G] * hf + b_f[s * G:(s + 1) * G]
                outs_f.append(hf)
            seq_f = jnp.concatenate(outs_f, axis=0) if S_sub > 1 else hf
            out_f_ref[pl.ds(base_f, 8), :] = y_wide(kf, base_f, 8, seq_f)
            if kr is not None:
                base_r = pl.multiple_of((T - 1 - i) * 8, 8)
                a_r, b_r = ab_wide(kr, base_r, 8)
                outs_r = []
                for s in range(S_sub):
                    sr = slice((S_sub - 1 - s) * G, (S_sub - s) * G)
                    hr = a_r[sr] * hr + b_r[sr]
                    outs_r.insert(0, hr)
                seq_r = (jnp.concatenate(outs_r, axis=0)
                         if S_sub > 1 else hr)
                out_r_ref[pl.ds(base_r, 8), :] = y_wide(kr, base_r, 8,
                                                        seq_r)
            return hf, hr

        jax.lax.fori_loop(0, T, body, (h0, h0))

    def col_pair(kf, kr):
        zero = jnp.zeros((WG, N * D), f32)
        one = jnp.ones((WG, N * D), f32)

        def pass1(h, carry):
            hf, pf, hr, pr = carry
            off_f = pl.multiple_of(h * WG, 8)
            a_f, b_f = ab_wide(kf, off_f, WG)
            hf = a_f * hf + b_f
            pf = a_f * pf
            off_r = pl.multiple_of((H - 1 - h) * WG, 8)
            a_r, b_r = ab_wide(kr, off_r, WG)
            hr = a_r * hr + b_r
            pr = a_r * pr
            return hf, pf, hr, pr

        B_cf, A_cf, B_cr, A_cr = jax.lax.fori_loop(
            0, H, pass1, (zero, one, zero, one))
        widx = jax.lax.broadcasted_iota(jnp.int32, (WG, 1), 0) // G
        c_f = _chain_cols(A_cf, B_cf, W, G, widx, False)
        c_r = _chain_cols(A_cr, B_cr, W, G, widx, True)

        def pass2(h, carry):
            hf, hr = carry
            off_f = pl.multiple_of(h * WG, 8)
            a_f, b_f = ab_wide(kf, off_f, WG)   # recomputed (cheaper than
            hf = a_f * hf + b_f                 # an (Lg, N*D) f32 spill)
            out_f_ref[pl.ds(off_f, WG), :] = y_wide(kf, off_f, WG, hf)
            off_r = pl.multiple_of((H - 1 - h) * WG, 8)
            a_r, b_r = ab_wide(kr, off_r, WG)
            hr = a_r * hr + b_r
            out_r_ref[pl.ds(off_r, WG), :] = y_wide(kr, off_r, WG, hr)
            return hf, hr

        jax.lax.fori_loop(0, H, pass2, (c_f, c_r))

    y = u_ref[0].astype(f32) * Dsum_ref[...].astype(f32)
    for (kf, kr, fam) in nk_scan_v2_kind_pairs(kinds):
        if fam == "col":
            col_pair(kf, kr)
        else:
            row_pair(kf, kr)
        y = y + out_f_ref[...]
        if kr is not None:
            y = y + out_r_ref[...]
    y_ref[0] = y.astype(out_dtype)


_V3_VMEM_BUDGET = 100 * 1024 * 1024


def _vmem_estimate_v3(L, W, D, K, N, G, has_col):
    """Live f32 working set + double-buffered input blocks."""
    Lg, WG, ND = L * G, W * G, N * D
    blocks = Lg * (D + K * D) * 2 * 2 + Lg * K * N * 2 * 2 * 2
    scratch = 2 * Lg * D * 4
    row_ws = 4 * 8 * ND * 4 + 2 * G * ND * 4
    col_ws = (8 * WG * ND * 4) if has_col else 0
    y_val = 2 * Lg * D * 4
    return blocks + scratch + max(row_ws, col_ws) + y_val + N * ND * 4


def nk_scan_v3_supported(L, W, D, K, N, G, kinds,
                         budget=_V3_VMEM_BUDGET):
    if D % 128 != 0 or G not in (1, 2, 4, 8):
        return False
    if (L * G) % 8 or (W * G) % 8:
        return False
    try:
        nk_scan_v2_kind_pairs(kinds)
    except ValueError:
        return False
    has_col = any(k.startswith("col") for k in kinds)
    return _vmem_estimate_v3(L, W, D, K, N, G, has_col) < budget


@functools.partial(jax.jit, static_argnames=("H", "W", "kinds", "group",
                                              "interpret", "vmem_mb"))
def nk_scan_call_v3(u, dts, Bs, Cs, A, Dvec, bias, H, W, kinds, group=8,
                    interpret=False, vmem_mb=110):
    """Drop-in for `nk_scan_call` (u (B, L, D); dts (B, L, K*D);
    Bs/Cs (B, L, K*N); A (K*N, D) rows in (k, n) order; Dvec (K, D);
    bias (K, D); returns (B, L, D) in u.dtype)."""
    B, L, D = u.shape
    K = len(kinds)
    N = A.shape[0] // K
    G = group
    Lg = G * L
    Dsum = Dvec.astype(jnp.float32).sum(axis=0, keepdims=True)
    # (K*N, D) k,n-major rows -> (K, N*D) n-major lanes, pre-scaled so the
    # kernel can use exp2 (saves the ln2 multiply in the hot loop)
    A_w = A.astype(jnp.float32).reshape(K, N * D) * _LOG2E
    S = jnp.repeat(jnp.eye(N, dtype=jnp.float32), D, axis=1)  # (N, N*D)

    kernel = functools.partial(_nk_scan_kernel_v3, H, W, G, K, N, kinds,
                               u.dtype)
    blk = lambda c: pl.BlockSpec((1, Lg, c), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    y = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[blk(D), blk(K * D), blk(K * N), blk(K * N),
                  full, full, full, full],
        out_specs=blk(D),
        out_shape=jax.ShapeDtypeStruct((B // G, Lg, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((Lg, D), f32),
                        pltpu.VMEM((Lg, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(_interleave(u, G), _interleave(dts, G), _interleave(Bs, G),
      _interleave(Cs, G), A_w, Dsum, bias.astype(f32), S)
    y = y.reshape(B // G, L, G, D)
    return jnp.swapaxes(y, 1, 2).reshape(B, L, D)
