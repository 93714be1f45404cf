import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.models.ss2d import ss2d_core
from xfmamba_tpu.models.vssm import VSSBlock

B, N = 32, 1
print(f"{'stage':>6} {'D':>6} {'core':>7} {'vssblock':>9} {'est_total':>10}")
tot = 0.0
for stage, (hw, d_model, nblk) in enumerate([(56, 96, 2), (28, 192, 2),
                                             (14, 384, 15), (7, 768, 2)]):
    D = 2 * d_model
    R = max(1, (d_model + 15) // 16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    xw = jax.random.normal(key, (4, R + 2 * N, D), jnp.bfloat16) * 0.02
    dw = jax.random.normal(key, (4, D, R), jnp.float32) * 0.02
    A_logs = jnp.zeros((4 * D, N)); Ds = jnp.ones((4 * D,)); bias = jnp.zeros((4, D))
    t_core = chain_time(lambda x: ss2d_core(x, xw, dw, bias, A_logs, Ds, N,
                                            backend="pallas"), [x])
    blk = VSSBlock(hidden_dim=d_model, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_conv_bias=False, forward_type="v05_noz",
                   mlp_ratio=4.0, dtype=jnp.bfloat16)
    xin = jax.random.normal(key, (B, hw, hw, d_model), jnp.bfloat16)
    v = blk.init(jax.random.key(1), xin)
    t_blk = chain_time(lambda a: blk.apply(v, a), [xin])
    tot += t_blk * nblk * 2
    print(f"{stage:>6} {D:>6} {t_core*1e3:>7.3f} {t_blk*1e3:>9.3f} "
          f"{t_blk*nblk*2*1e3:>10.2f}")
print(f"sum over stages (2 views): {tot*1e3:.1f} ms")
