"""Marginal cost of the MXU dots inside the stage-2 megakernel.

Monkeypatches `jax.lax.dot` / `dot_general` to issue every dot TWICE
(operand perturbed so Mosaic cannot CSE) and averages — the doubled run's
overhead over baseline IS the dots' issue cost, including any overlap the
scheduler does or doesn't find.  Compare against the 7.9 ms/stage-2
"remainder" attribution in NOTES (r2 session 4): if t(2x) - t(1x) is much
smaller than the remainder, the remainder is NOT dots (conversions,
deinterleave, loop bookkeeping...) and the "overlap the dots" plan is
chasing the wrong seam.
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

key = jax.random.key(0)
B, H, W, d, di, R, G, DEPTH = 128, 14, 14, 384, 768, 24, 4, 15
hd = 4 * d
L = H * W
f32, bf16 = jnp.float32, jnp.bfloat16
ks = iter(jax.random.split(key, 25))


def rnd(shape, dt, scale=0.02):
    return (jax.random.normal(next(ks), shape, jnp.float32)
            * scale).astype(dt)


x = rnd((B, L, d), bf16, 1.0)
Dp = DEPTH
args = [x,
        jnp.stack([jnp.stack([jnp.ones((d,), f32),
                              jnp.zeros((d,), f32)])] * Dp),
        rnd((Dp, d, di), bf16), rnd((Dp, 9, di), f32),
        jnp.zeros((Dp, 1, di), f32),
        rnd((Dp, di, 4 * R + 8), bf16), rnd((Dp, 4 * R, di), bf16),
        jnp.zeros((Dp, 4, di), f32), -jnp.ones((Dp, 4, di), f32),
        jnp.ones((Dp, 1, di), f32),
        jnp.stack([jnp.stack([jnp.ones((di,), f32),
                              jnp.zeros((di,), f32)])] * Dp),
        rnd((Dp, di, d), bf16),
        jnp.stack([jnp.stack([jnp.ones((d,), f32),
                              jnp.zeros((d,), f32)])] * Dp),
        rnd((Dp, d, hd), bf16), jnp.zeros((Dp, 1, hd), f32),
        rnd((Dp, hd, d), bf16), jnp.zeros((Dp, 1, d), f32)]


def t_stage(label):
    V._vss_stage_call_v2.clear_cache()
    t = chain_time(
        lambda *a: V._vss_stage_call_v2(
            *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
        args, k_long=8)
    print(f"{label:28s}: {t*1e3:7.3f} ms ({t/DEPTH*1e3:6.3f}/block)",
          flush=True)
    return t


ORIG_DOT = jax.lax.dot
ORIG_DG = jax.lax.dot_general

base = t_stage("baseline")


def dot2(a, b, **kw):
    one = (1.0 + 2.0 ** -20)
    return (ORIG_DOT(a, b, **kw) + ORIG_DOT(a * one, b, **kw)) * 0.5


def dg2(a, b, dimension_numbers, **kw):
    one = (1.0 + 2.0 ** -20)
    return (ORIG_DG(a, b, dimension_numbers, **kw)
            + ORIG_DG(a * one, b, dimension_numbers, **kw)) * 0.5


jax.lax.dot = dot2
jax.lax.dot_general = dg2
try:
    dbl = t_stage("dots x2")
finally:
    jax.lax.dot = ORIG_DOT
    jax.lax.dot_general = ORIG_DG

print(f"== stage2 x15 marginal dot cost: {(dbl - base)*1e3:.3f} ms "
      f"(baseline {base*1e3:.3f})", flush=True)
