"""Isolate: fused_cross_scan kernel alone vs full core prep, chunk sweep."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from xfmamba_tpu.ops.selective_scan_pallas import (
    _core_pallas_fwd_impl, fused_cross_scan)


def timeit(fn, *args, iters=10, **kw):
    jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


B, N = 32, 1
for hw, d_model in [(56, 96), (14, 384)]:
    D = 2 * d_model
    L = hw * hw
    key = jax.random.key(0)
    u2 = jax.random.normal(key, (B, 2, L, D), jnp.bfloat16)
    dts = jax.random.normal(key, (B, 4, L, D), jnp.bfloat16)
    Bs = jax.random.normal(key, (B, 4, L, N), jnp.bfloat16)
    Cs = jax.random.normal(key, (B, 4, L, N), jnp.bfloat16)
    A = -jnp.ones((4, D, N), jnp.float32)
    Dk = jnp.ones((4, D), jnp.float32)
    bias = jnp.zeros((4, D), jnp.float32)

    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    dts_hw = jax.random.normal(key, (B, hw, hw, 4, D), jnp.bfloat16)
    Bs_hw = jax.random.normal(key, (B, hw, hw, 4, N), jnp.bfloat16)
    Cs_hw = jax.random.normal(key, (B, hw, hw, 4, N), jnp.bfloat16)

    print(f"== {hw}x{hw} D={D} L={L}")
    for chunk in (None, 256, 512, 1024):
        if chunk is not None and chunk > L + 8:
            continue
        try:
            t = timeit(fused_cross_scan, u2, dts, Bs, Cs, A, Dk, bias,
                       chunk=chunk)
            print(f"  kernel chunk={chunk}: {t*1e3:.3f} ms")
        except Exception as e:
            print(f"  kernel chunk={chunk}: FAIL {type(e).__name__} {e}")
    full = jax.jit(lambda *a: _core_pallas_fwd_impl(*a))
    t = timeit(full, x, dts_hw, Bs_hw, Cs_hw, A, Dk, bias)
    print(f"  full core (prep + kernel + merge): {t*1e3:.3f} ms")
