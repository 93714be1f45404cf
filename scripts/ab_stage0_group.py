"""Re-measure the v2 stage-kernel group size at stage-0/1 geometry.

`pick_group_v2`'s preference table (big maps -> small G) was measured
before ROW_MACRO and the stage-stacked kernel landed; the serial-scan
substep cost is G-amortized, so G=2 may have flipped to a win at stage 0.
One process, chained timing.
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16


def stage_args(key, B, H, W, d, di, R, depth):
    ks = iter(jax.random.split(key, 25))

    def rnd(shape, dt, scale=0.02):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dt)

    hd = 4 * d
    L = H * W
    x = rnd((B, L, d), bf16, 1.0)
    Dp = depth
    ln = jnp.stack([jnp.stack([jnp.ones((d,), f32),
                               jnp.zeros((d,), f32)])] * Dp)
    lni = jnp.stack([jnp.stack([jnp.ones((di,), f32),
                                jnp.zeros((di,), f32)])] * Dp)
    return [x, ln, rnd((Dp, d, di), bf16), rnd((Dp, 9, di), f32),
            jnp.zeros((Dp, 1, di), f32),
            rnd((Dp, di, 4 * R + 8), bf16), rnd((Dp, 4 * R, di), bf16),
            jnp.zeros((Dp, 4, di), f32), -jnp.ones((Dp, 4, di), f32),
            jnp.ones((Dp, 1, di), f32), lni, rnd((Dp, di, d), bf16), ln,
            rnd((Dp, d, hd), bf16), jnp.zeros((Dp, 1, hd), f32),
            rnd((Dp, hd, d), bf16), jnp.zeros((Dp, 1, d), f32)]


GEOMS = [  # (name, B, H, W, d, di, R, depth, groups to try)
    ("stage0", 128, 56, 56, 96, 192, 6, 2, (1, 2)),
    ("stage1", 128, 28, 28, 192, 384, 12, 2, (2, 4, 1)),
]


def run_geoms(geoms):
    for (name, B, H, W, d, di, R, depth, groups) in geoms:
        args = stage_args(jax.random.key(0), B, H, W, d, di, R, depth)
        for G in groups:
            est = V._vmem_estimate_v2(H * W, d, di, 4 * d, G, True)
            V._vss_stage_call_v2.clear_cache()
            try:
                t = chain_time(
                    lambda *a: V._vss_stage_call_v2(
                        *a, H=H, W=W, conv_bias=False, fuse_mlp=True,
                        group=G),
                    args, k_long=8)
                print(f"{name} G={G}: {t*1e3:7.3f} ms  "
                      f"(est vmem {est/2**20:.0f} MB)", flush=True)
            except Exception as e:
                print(f"{name} G={G}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    run_geoms(GEOMS)
