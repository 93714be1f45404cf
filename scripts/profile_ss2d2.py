"""Per-stage comparison: pallas vs xla core, f32 vs bf16 projection weights."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from xfmamba_tpu.models.ss2d import ss2d_core


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


B, N = 32, 1
print(f"{'stage':>6} {'HxW':>8} {'D':>6} {'pallas32':>9} {'pallas16':>9} "
      f"{'xla32':>9} {'xla16':>9}")
for stage, (hw, d_model) in enumerate([(56, 96), (28, 192), (14, 384),
                                       (7, 768)]):
    D = 2 * d_model
    Rr = max(1, (d_model + 15) // 16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    xw32 = jax.random.normal(key, (4, Rr + 2 * N, D), jnp.float32) * 0.02
    dw32 = jax.random.normal(key, (4, D, Rr), jnp.float32) * 0.02
    xw16, dw16 = xw32.astype(jnp.bfloat16), dw32.astype(jnp.bfloat16)
    A_logs = jnp.zeros((4 * D, N))
    Ds = jnp.ones((4 * D,))
    bias = jnp.zeros((4, D))

    res = []
    for backend in ("pallas", "xla"):
        for xw, dw in ((xw32, dw32), (xw16, dw16)):
            fn = jax.jit(lambda x, xw=xw, dw=dw, backend=backend:
                         ss2d_core(x, xw, dw, bias, A_logs, Ds, N,
                                   backend=backend))
            res.append(timeit(fn, x))
    print(f"{stage:>6} {hw:>4}x{hw:<3} {D:>6} " +
          " ".join(f"{t*1e3:>9.3f}" for t in res))
