"""Microbenchmark: where does SS2D time go at XFMamba-S backbone shapes?

Times, per stage geometry (B=32): (a) the fused Pallas scan alone,
(b) the projection einsums alone, (c) the full ss2d_core, (d) one full
VSSBlock.  Run on the real TPU.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from xfmamba_tpu.models.ss2d import SS2D, _project_kdirs, ss2d_core
from xfmamba_tpu.ops.selective_scan_pallas import ss2d_core_pallas


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


B = 32
R_BASE = 6  # dt_rank = ceil(96/16)
N = 1

print(f"{'stage':>6} {'HxW':>8} {'D':>6} {'proj_ms':>9} {'scan_ms':>9} "
      f"{'core_ms':>9} {'block_ms':>9}")
for stage, (hw, d_model) in enumerate([(56, 96), (28, 192), (14, 384),
                                       (7, 768)]):
    D = 2 * d_model
    Rr = max(1, (d_model + 15) // 16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    xw = jax.random.normal(key, (4, Rr + 2 * N, D), jnp.float32) * 0.02
    dw = jax.random.normal(key, (4, D, Rr), jnp.float32) * 0.02
    A_logs = jnp.zeros((4 * D, N))
    Ds = jnp.ones((4 * D,))
    bias = jnp.zeros((4, D))

    proj = jax.jit(lambda x: _project_kdirs(x, xw, dw, Rr, N))
    t_proj = timeit(proj, x)

    dts, Bs, Cs = jax.block_until_ready(proj(x))
    A = -jnp.exp(A_logs.astype(jnp.float32)).reshape(4, D, N)
    Dmat = Ds.reshape(4, D)
    b2 = bias

    scan = jax.jit(lambda x, dts, Bs, Cs: ss2d_core_pallas(
        x, dts, Bs, Cs, A, Dmat, b2))
    t_scan = timeit(scan, x, dts, Bs, Cs)

    core = jax.jit(lambda x: ss2d_core(x, xw, dw, bias, A_logs, Ds, N,
                                       backend="pallas"))
    t_core = timeit(core, x)

    blk = SS2D(d_model=d_model, d_state=N, ssm_ratio=2.0,
               forward_type="v05_noz", conv_bias=False,
               dtype=jnp.bfloat16, scan_backend="pallas")
    xin = jax.random.normal(key, (B, hw, hw, d_model), jnp.bfloat16)
    v = blk.init(jax.random.key(1), xin)
    blk_fn = jax.jit(lambda x: blk.apply(v, x))
    t_blk = timeit(blk_fn, xin)

    print(f"{stage:>6} {hw:>4}x{hw:<3} {D:>6} {t_proj*1e3:>9.3f} "
          f"{t_scan*1e3:>9.3f} {t_core*1e3:>9.3f} {t_blk*1e3:>9.3f}")
