"""A/B: interleave group G per stage geometry (v2 block kernel, one process)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.ops import vss_block_pallas_v2 as V

key = jax.random.key(0)


def make_args(B, H, W, d, di, R):
    hd = 4 * d
    f32, bf16 = jnp.float32, jnp.bfloat16
    L = H * W
    ks = iter(jax.random.split(key, 20))

    def rnd(shape, dt, scale=0.02):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dt)

    x = rnd((B, L, d), bf16, 1.0)
    return [x,
            jnp.stack([jnp.ones((d,), f32), jnp.zeros((d,), f32)]),
            rnd((d, di), bf16), rnd((9, di), f32), jnp.zeros((1, di), f32),
            rnd((di, 4 * R + 8), bf16), rnd((4 * R, di), bf16),
            jnp.zeros((4, di), f32), -jnp.ones((4, di), f32),
            jnp.ones((1, di), f32),
            jnp.stack([jnp.ones((di,), f32), jnp.zeros((di,), f32)]),
            rnd((di, d), bf16),
            jnp.stack([jnp.ones((d,), f32), jnp.zeros((d,), f32)]),
            rnd((d, hd), bf16), jnp.zeros((1, hd), f32),
            rnd((hd, d), bf16), jnp.zeros((1, d), f32)]

GEOMS = [
    ("stage0", 128, 56, 56, 96, 192, 6, (1, 2)),
    ("stage1", 128, 28, 28, 192, 384, 12, (2, 4)),
    ("stage2", 128, 14, 14, 384, 768, 24, (4, 8)),
]

if __name__ != "__main__":
    GEOMS = GEOMS  # importable: make_args + GEOMS only

for name, B, H, W, d, di, R, gs in (GEOMS if __name__ == "__main__" else ()):
    args = make_args(B, H, W, d, di, R)
    for G in gs:
        for vm in (100, 127):
            try:
                V._vss_block_call_v2.clear_cache()
                t = chain_time(
                    lambda *a: V._vss_block_call_v2(
                        *a, H=H, W=W, conv_bias=False, fuse_mlp=True,
                        group=G, vmem_mb=vm),
                    args, k_long=8)
                print(f"{name} G={G} vmem={vm}: {t*1e3:7.3f} ms", flush=True)
                break
            except Exception as e:
                print(f"{name} G={G} vmem={vm}: FAIL {str(e)[:90]}",
                      flush=True)
