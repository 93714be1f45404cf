"""Ablation timings for the VSSBlock megakernel pieces at a given geometry.

Each piece is compiled as its own Pallas kernel over the same (G*L, di)
map so the per-component cost is visible.  Usage:
    python scripts/ablate_megakernel.py [H W d G]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xfmamba_tpu.ops.vss_block_pallas import (
    _layer_norm, _gelu_exact, _scan_direction)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timed_call(fn, *args, iters=20):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chained(x, k):
        def body(i, c):
            return fn(c, *args)
        return jax.lax.fori_loop(0, k, body, x).sum()

    def run(k, x):
        float(chained(x, k))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, k))
            best = min(best, time.perf_counter() - t0)
        return best
    return run


def main():
    H, W, d, G = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 \
        else (56, 56, 96, 1)
    B = 32
    L = H * W
    di = 2 * d
    Lg = G * L
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, di),
                          jnp.float32) * 0.1

    def make(body_fn, name):
        def kernel(x_ref, y_ref):
            y_ref[0] = body_fn(x_ref[0])

        @jax.jit
        def call(xx):
            xx = xx.reshape(B // G, Lg, di)
            y = pl.pallas_call(
                kernel,
                grid=(B // G,),
                in_specs=[pl.BlockSpec((1, Lg, di), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, Lg, di), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B // G, Lg, di), xx.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xx)
            return y.reshape(B, L, di)

        @functools.partial(jax.jit, static_argnums=(1,))
        def chained(xx, k):
            def body(i, c):
                return call(c)
            return jax.lax.fori_loop(0, k, body, xx).sum()

        float(chained(x, 1))
        t1 = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, 1))
            t1 = min(t1, time.perf_counter() - t0)
        float(chained(x, 20))
        t20 = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, 20))
            t20 = min(t20, time.perf_counter() - t0)
        print(f"{name}: {(t20 - t1) / 19 * 1000:.3f} ms", flush=True)

    make(lambda v: v * 1.0009 + 0.001, "copy (baseline)")

    def ln_body(v):
        ones = jnp.ones((1, di), jnp.float32)
        return _layer_norm(v, ones, 0.0 * ones)

    make(ln_body, "layernorm")

    for kind in ("row_f", "row_r", "col_f", "col_r"):
        make(lambda v, kind=kind: _scan_direction(
            jnp.minimum(jnp.abs(v) + 0.2, 0.99), v, H, W, G, kind)
            + v * 1e-6, f"scan {kind}")

    # level-1 only (row): masked HS without the level-2 chain
    from xfmamba_tpu.ops.vss_block_pallas import _pair_hs_seg

    def level1_row(v):
        wmod = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) % W
        a, b = _pair_hs_seg(jnp.minimum(jnp.abs(v) + 0.2, 0.99), v, W, wmod,
                            False)
        return a + b

    make(level1_row, "scan row level1-only")

    def prologue(v):
        dt = jax.nn.softplus(v)
        return jnp.exp(dt * -0.5) * dt * v

    make(prologue, "softplus+exp prologue")

    def mm(v):
        r = jax.lax.broadcasted_iota(jnp.int32, (di, di), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (di, di), 1)
        wmat = (((r * 37 + c * 11) % 13 - 6).astype(jnp.bfloat16) * 0.01)
        return jax.lax.dot(v.astype(jnp.bfloat16), wmat,
                           preferred_element_type=jnp.float32)

    make(mm, f"matmul ({Lg}x{di})@({di}x{di}) bf16")

    def onehots(v):
        GH = G * H
        rows_h = jax.lax.broadcasted_iota(jnp.int32, (GH, Lg), 0)
        cols_h = jax.lax.broadcasted_iota(jnp.int32, (GH, Lg), 1)
        sel = (cols_h == rows_h * W + W - 1).astype(jnp.float32)
        s = jax.lax.dot(sel, v, preferred_element_type=jnp.float32)
        rows_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, GH), 0)
        cols_l = jax.lax.broadcasted_iota(jnp.int32, (Lg, GH), 1)
        bc = (cols_l == rows_l // W).astype(jnp.float32)
        return jax.lax.dot(bc, s, preferred_element_type=jnp.float32)

    make(onehots, "one-hot extract+bcast (f32 MXU)")

    def conv9(v):
        wmod = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) % W
        lmod = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) % L
        acc = jnp.zeros_like(v)
        for i in range(3):
            for j in range(3):
                off = (i - 1) * W + (j - 1)
                if off > 0:
                    sh = jnp.concatenate(
                        [v[off:], jnp.zeros((off, di), v.dtype)], axis=0)
                elif off < 0:
                    sh = jnp.concatenate(
                        [jnp.zeros((-off, di), v.dtype), v[:off]], axis=0)
                else:
                    sh = v
                if j == 0:
                    sh = jnp.where(wmod >= 1, sh, 0.0)
                elif j == 2:
                    sh = jnp.where(wmod <= W - 2, sh, 0.0)
                if i == 0:
                    sh = jnp.where(lmod >= W, sh, 0.0)
                elif i == 2:
                    sh = jnp.where(lmod <= L - W - 1, sh, 0.0)
                acc = acc + sh * (0.1 + 0.01 * (3 * i + j))
        return acc

    make(conv9, "dwconv 9-tap")


if __name__ == "__main__":
    main()

def extra():
    H, W, d, G = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 \
        else (56, 56, 96, 1)
    B = 32
    L = H * W
    di = 2 * d
    Lg = G * L
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, di),
                          jnp.float32) * 0.1

    def make(body_fn, name):
        def kernel(x_ref, y_ref):
            y_ref[0] = body_fn(x_ref[0])

        @jax.jit
        def call(xx):
            xx = xx.reshape(B // G, Lg, di)
            y = pl.pallas_call(
                kernel,
                grid=(B // G,),
                in_specs=[pl.BlockSpec((1, Lg, di), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, Lg, di), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B // G, Lg, di), xx.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xx)
            return y.reshape(B, L, di)

        @functools.partial(jax.jit, static_argnums=(1,))
        def chained(xx, k):
            def body(i, c):
                return call(c)
            return jax.lax.fori_loop(0, k, body, xx).sum()

        try:
            float(chained(x, 1))
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:120]}", flush=True)
            return
        t1 = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, 1))
            t1 = min(t1, time.perf_counter() - t0)
        float(chained(x, 20))
        t20 = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, 20))
            t20 = min(t20, time.perf_counter() - t0)
        print(f"{name}: {(t20 - t1) / 19 * 1000:.3f} ms", flush=True)

    # single shift stage: concatenate vs roll
    def one_shift_cat(v):
        sh = jnp.concatenate([jnp.zeros((1, di), v.dtype), v[:-1]], axis=0)
        return v + sh * 0.5

    make(one_shift_cat, "one shift by 1 (concat)")

    def one_shift_cat_w(v):
        sh = jnp.concatenate([jnp.zeros((W, di), v.dtype), v[:-W]], axis=0)
        return v + sh * 0.5

    make(one_shift_cat_w, "one shift by W (concat)")

    def one_shift_roll(v):
        sh = pltpu.roll(v, 1, 0)
        m = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) >= 1
        return v + jnp.where(m, sh, 0.0) * 0.5

    make(one_shift_roll, "one shift by 1 (pltpu.roll+mask)")

    def one_shift_roll_w(v):
        sh = pltpu.roll(v, W, 0)
        m = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) >= W
        return v + jnp.where(m, sh, 0.0) * 0.5

    make(one_shift_roll_w, "one shift by W (pltpu.roll+mask)")

    def exp_only(v):
        return jnp.exp(v)

    make(exp_only, "exp only")

    def softplus_only(v):
        return jax.nn.softplus(v)

    make(softplus_only, "softplus only")

    def mm_k128(v):
        r = jax.lax.broadcasted_iota(jnp.int32, (di, 128), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (di, 128), 1)
        wm = (((r * 37 + c * 11) % 13 - 6).astype(jnp.bfloat16) * 0.01)
        o = jax.lax.dot(v.astype(jnp.bfloat16), wm,
                        preferred_element_type=jnp.float32)
        return jnp.pad(o, ((0, 0), (0, di - 128)))

    make(mm_k128, f"matmul ({Lg}x{di})@({di}x128) bf16")

    def mm_bf16out(v):
        r = jax.lax.broadcasted_iota(jnp.int32, (di, di), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (di, di), 1)
        wm = (((r * 37 + c * 11) % 13 - 6).astype(jnp.bfloat16) * 0.01)
        o = jnp.dot(v.astype(jnp.bfloat16), wm,
                    preferred_element_type=jnp.bfloat16)
        return o.astype(jnp.float32)

    make(mm_bf16out, f"matmul bf16 out")

    def where_cost(v):
        m = jax.lax.broadcasted_iota(jnp.int32, (Lg, 1), 0) % W >= 1
        acc = v
        for _ in range(6):
            acc = jnp.where(m, acc, 0.0) + v
        return acc

    make(where_cost, "6x where+add")

extra()
