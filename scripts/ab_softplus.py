"""A/B: torch-form _softplus vs jax.nn.softplus in the stage2 stage kernel."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.ops import vss_block_pallas_v2 as V

key = jax.random.key(0)
B, H, W, d, di, R, G, Dp = 128, 14, 14, 384, 768, 24, 4, 15
hd = 4 * d
L = H * W
f32, bf16 = jnp.float32, jnp.bfloat16
ks = iter(jax.random.split(key, 25))
rnd = lambda s, dt, sc=0.02: (jax.random.normal(next(ks), s, f32) * sc).astype(dt)
ln = lambda n: jnp.stack([jnp.stack([jnp.ones((n,), f32),
                                     jnp.zeros((n,), f32)])] * Dp)
args = [rnd((B, L, d), bf16, 1.0), ln(d),
        rnd((Dp, d, di), bf16), rnd((Dp, 9, di), f32),
        jnp.zeros((Dp, 1, di), f32),
        rnd((Dp, di, 4 * R + 8), bf16), rnd((Dp, 4 * R, di), bf16),
        jnp.zeros((Dp, 4, di), f32), -jnp.ones((Dp, 4, di), f32),
        jnp.ones((Dp, 1, di), f32), ln(di),
        rnd((Dp, di, d), bf16), ln(d),
        rnd((Dp, d, hd), bf16), jnp.zeros((Dp, 1, hd), f32),
        rnd((Dp, hd, d), bf16), jnp.zeros((Dp, 1, d), f32)]

orig = V.__dict__["_softplus"]
for name, fn in [("torch-form", orig), ("jax.nn", jax.nn.softplus),
                 ("torch-form", orig), ("jax.nn", jax.nn.softplus)]:
    V.__dict__["_softplus"] = fn
    V._vss_stage_call_v2.clear_cache()
    t = chain_time(lambda *a: V._vss_stage_call_v2(
        *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
        args, k_long=8)
    print(f"stage2 x15 softplus={name:10s}: {t*1e3:7.3f} ms", flush=True)
V.__dict__["_softplus"] = orig
