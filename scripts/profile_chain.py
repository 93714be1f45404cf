import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.models.ss2d import SS2D, ss2d_core
from xfmamba_tpu.ops.selective_scan_pallas import _core_pallas_fwd_impl

B, N = 32, 1
print(f"{'stage':>6} {'D':>6} {'proj+core(pallas)':>18} {'corexla':>9} "
      f"{'kernel+prep':>12} {'block':>9}")
for stage, (hw, d_model) in enumerate([(56, 96), (28, 192), (14, 384), (7, 768)]):
    D = 2 * d_model
    R = max(1, (d_model + 15) // 16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    xw = jax.random.normal(key, (4, R + 2 * N, D), jnp.bfloat16) * 0.02
    dw = jax.random.normal(key, (4, D, R), jnp.bfloat16) * 0.02
    A_logs = jnp.zeros((4 * D, N)); Ds = jnp.ones((4 * D,)); bias = jnp.zeros((4, D))

    t_core_p = chain_time(lambda x: ss2d_core(x, xw, dw, bias, A_logs, Ds, N, backend="pallas"), [x])
    t_core_x = chain_time(lambda x: ss2d_core(x, xw, dw, bias, A_logs, Ds, N, backend="xla"), [x])

    dts_hw = jax.random.normal(key, (B, hw, hw, 4, D), jnp.bfloat16)
    Bs_hw = jax.random.normal(key, (B, hw, hw, 4, N), jnp.bfloat16)
    Cs_hw = jax.random.normal(key, (B, hw, hw, 4, N), jnp.bfloat16)
    A = -jnp.ones((4, D, N), jnp.float32); Dk = jnp.ones((4, D), jnp.float32)
    t_kern = chain_time(lambda x, d, b, c: _core_pallas_fwd_impl(x, d, b, c, A, Dk, bias), [x, dts_hw, Bs_hw, Cs_hw])

    blk = SS2D(d_model=d_model, d_state=N, ssm_ratio=2.0, forward_type="v05_noz",
               conv_bias=False, dtype=jnp.bfloat16, scan_backend="pallas")
    xin = jax.random.normal(key, (B, hw, hw, d_model), jnp.bfloat16)
    v = blk.init(jax.random.key(1), xin)
    t_blk = chain_time(lambda x: blk.apply(v, x), [x[..., :d_model]])
    print(f"{stage:>6} {D:>6} {t_core_p*1e3:>18.3f} {t_core_x*1e3:>9.3f} "
          f"{t_kern*1e3:>12.3f} {t_blk*1e3:>9.3f}")
