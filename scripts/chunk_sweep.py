import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.ops.selective_scan_pallas import _core_fused_proj_impl

B = 32
for hw, d_model in [(56, 96), (28, 192)]:
    D = 2 * d_model
    R = max(1, (d_model + 15) // 16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    xw = jax.random.normal(key, (4, R + 2, D), jnp.float32) * 0.02
    dw = jax.random.normal(key, (4, D, R), jnp.float32) * 0.02
    bias = jnp.zeros((4, D)); A_logs = jnp.zeros((4 * D, 1)); Ds = jnp.ones((4 * D,))
    L = hw * hw
    for chunk in (64, 96, 128, 184, 248):
        if chunk > L:
            continue
        try:
            t = chain_time(lambda x, ch=chunk: _core_fused_proj_impl(
                x, xw, dw, bias, A_logs, Ds, chunk=ch), [x])
            print(f"hw={hw} D2={2*D} chunk={chunk}: {t*1e3:7.3f} ms")
        except Exception as e:
            print(f"hw={hw} chunk={chunk}: FAIL {str(e)[:80]}")
