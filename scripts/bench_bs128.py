"""One-process inference sweep over large batch sizes (bs 64/96/128).

The stage-stacked kernels pick larger interleave groups at larger B;
checks whether bs>64 amortizes fixed per-kernel cost further.
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from xfmamba_tpu.models.tops import two_view_xfmamba

model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)


@functools.partial(jax.jit, static_argnums=(3,))
def chained(v, a, b, k):
    def body(i, carry):
        a_c, acc = carry
        y = model.apply(v, a_c, b)
        a_c = a_c + (jnp.tanh(y.sum()) * 1e-12).astype(a_c.dtype)
        return (a_c, acc + y.sum())
    _, acc = jax.lax.fori_loop(0, k, body, (a, jnp.zeros((), jnp.float32)))
    return acc


for bs in (64, 96, 128):
    x1 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    x2 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x2)
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def timed(k, reps=3):
        float(chained(v, x1, x2, k))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(v, x1, x2, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tk = timed(5)
    per = (tk - t1) / 4
    print(f"bs={bs}: {per*1e3:.2f} ms/step, {bs/per:.1f} img/s", flush=True)
