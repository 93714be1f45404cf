"""Probe: serial (latency-bound) scan over g-interleaved sublane tiles vs
the Hillis-Steele whole-map scan in `_scan_direction`.

Hypothesis: with G=8 images interleaved on sublanes ((L*8, C) layout,
g fastest), the recurrence h[t] = a[t]*h[t-1] + b[t] runs as L dependent
(8, C)-tile FMAs.  Critical path = L * fma-latency + loop overhead, vs the
HS scheme's log2(W)+log2(H) stages of whole-map ops.  If the per-step cost
is ~10 cycles this is 5-20x less VPU time on every stage geometry.

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/probe_serial_scan.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import _scan_direction  # noqa: E402


def serial_kernel(L, U, a_ref, b_ref, y_ref):
    """Serial over L steps, unrolled by U; each step is an (8, C) tile."""
    C = a_ref.shape[1]
    h0 = jnp.zeros((8, C), jnp.float32)

    def body(i, h):
        base = pl.multiple_of(i * (8 * U), 8)
        for u in range(U):
            off = pl.multiple_of(base + u * 8, 8)
            h = a_ref[pl.ds(off, 8), :] * h + b_ref[pl.ds(off, 8), :]
            y_ref[pl.ds(off, 8), :] = h
        return h

    jax.lax.fori_loop(0, L // U, body, h0)


def serial4_kernel(L, U, a_ref, b_ref, y_ref):
    """Four independent chains interleaved (simulating 4 directions in one
    loop; forward on dirs 0/1, reverse on dirs 2/3) to hide fma latency."""
    C = a_ref.shape[1] // 4
    h = [jnp.zeros((8, C), jnp.float32) for _ in range(4)]

    def body(i, hs):
        h0, h1, h2, h3 = hs
        base_f = pl.multiple_of(i * (8 * U), 8)
        for u in range(U):
            off = pl.multiple_of(base_f + u * 8, 8)
            roff = pl.multiple_of((L - 1) * 8 - off, 8)
            a = a_ref[pl.ds(off, 8), :]
            b = b_ref[pl.ds(off, 8), :]
            ar = a_ref[pl.ds(roff, 8), :]
            br = b_ref[pl.ds(roff, 8), :]
            h0 = a[:, :C] * h0 + b[:, :C]
            h1 = a[:, C:2 * C] * h1 + b[:, C:2 * C]
            h2 = ar[:, 2 * C:3 * C] * h2 + br[:, 2 * C:3 * C]
            h3 = ar[:, 3 * C:] * h3 + br[:, 3 * C:]
            y_ref[pl.ds(off, 8), :] = jnp.concatenate(
                [h0, h1, h2, h3], axis=1)
        return (h0, h1, h2, h3)

    jax.lax.fori_loop(0, L // U, body, tuple(h))


@functools.partial(jax.jit, static_argnames=("L", "U", "four"))
def serial_call(a, b, L, U, four=False):
    kern = functools.partial(serial4_kernel if four else serial_kernel, L, U)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b)


def hs_kernel(H, W, G, kind, a_ref, b_ref, y_ref):
    y_ref[...] = _scan_direction(a_ref[...], b_ref[...], H, W, G, kind,
                                 use_roll=True)


@functools.partial(jax.jit, static_argnames=("H", "W", "G", "kind"))
def hs_call(a, b, H, W, G, kind):
    kern = functools.partial(hs_kernel, H, W, G, kind)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b)


def main():
    key = jax.random.PRNGKey(0)
    G = 8
    # HS baseline at its production group size (pick_group); serial at G=8
    for name, H, W, C, Ghs in [("stage0", 56, 56, 192, 1),
                               ("stage1", 28, 28, 384, 1),
                               ("stage2", 14, 14, 768, 2),
                               ("stage3", 7, 7, 1536, 4)]:
        L = H * W
        k1, k2 = jax.random.split(key)
        a = jax.random.uniform(k1, (L * G, C), jnp.float32, 0.5, 0.99)
        b = jax.random.normal(k2, (L * G, C), jnp.float32)
        ah = a[:L * Ghs]
        bh = b[:L * Ghs]
        t_hs = chain_time(
            lambda a, b: hs_call(a, b, H, W, Ghs, "row_f"),
            (ah, bh), k_long=30) * (G / Ghs)  # normalize to per-8-images
        line = f"{name} (L={L}, C={C}): HS(G={Ghs}) {t_hs*1e6:8.1f} us/8img"
        for U in (1, 4, 8):
            if L % U:
                continue
            t_s = chain_time(
                lambda a, b, U=U: serial_call(a, b, L, U), (a, b), k_long=30)
            line += f" | serial U={U} {t_s*1e6:8.1f}"
        # 4-direction interleaved variant: C lanes split into 4 chains
        if C % 4 == 0:
            for U in (4, 8):
                if L % U:
                    continue
                t_4 = chain_time(
                    lambda a, b, U=U: serial_call(a, b, L, U, four=True),
                    (a, b), k_long=30)
                line += f" | 4chain U={U} {t_4*1e6:8.1f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
