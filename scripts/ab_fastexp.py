"""A/B: polynomial fast_exp/softplus vs Mosaic builtins (one process).

Times the stage-2 stage kernel (15 blocks, the dominant backbone cost),
the stage-0 block kernel, the CSSF nk scan geometry, and the full model.
Flip order: builtin first, fast second (clear_cache after each flip —
module-level jit entry points cache jaxprs across flag flips).
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import fast_math as FM  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

key = jax.random.key(0)
f32, bf16 = jnp.float32, jnp.bfloat16


def rnd(k, shape, dt, scale=0.02):
    return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)


def stage_args(B, H, W, d, di, R, DEPTH):
    ks = iter(jax.random.split(key, 25))
    hd = 4 * d
    L = H * W
    x = rnd(next(ks), (B, L, d), bf16, 1.0)
    Dp = DEPTH
    return [x,
            jnp.stack([jnp.stack([jnp.ones((d,), f32),
                                  jnp.zeros((d,), f32)])] * Dp),
            rnd(next(ks), (Dp, d, di), bf16), rnd(next(ks), (Dp, 9, di), f32),
            jnp.zeros((Dp, 1, di), f32),
            rnd(next(ks), (Dp, di, 4 * R + 8), bf16),
            rnd(next(ks), (Dp, 4 * R, di), bf16),
            jnp.zeros((Dp, 4, di), f32), -jnp.ones((Dp, 4, di), f32),
            jnp.ones((Dp, 1, di), f32),
            jnp.stack([jnp.stack([jnp.ones((di,), f32),
                                  jnp.zeros((di,), f32)])] * Dp),
            rnd(next(ks), (Dp, di, d), bf16),
            jnp.stack([jnp.stack([jnp.ones((d,), f32),
                                  jnp.zeros((d,), f32)])] * Dp),
            rnd(next(ks), (Dp, d, hd), bf16), jnp.zeros((Dp, 1, hd), f32),
            rnd(next(ks), (Dp, hd, d), bf16), jnp.zeros((Dp, 1, d), f32)]


def t_stage(args, H, W, G):
    V._vss_stage_call_v2.clear_cache()
    return chain_time(
        lambda *a: V._vss_stage_call_v2(
            *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
        args, k_long=8)


def nk_args(B, L, W, D, K, N):
    ks = iter(jax.random.split(jax.random.key(1), 8))
    u = rnd(next(ks), (B, L, D), bf16, 1.0)
    dts = rnd(next(ks), (B, L, K * D), f32, 1.0)
    Bs = rnd(next(ks), (B, L, K * N), f32, 1.0)
    Cs = rnd(next(ks), (B, L, K * N), f32, 1.0)
    A = -jnp.abs(rnd(next(ks), (K * N, D), f32, 1.0)) - 0.1
    Dv = jnp.ones((K, D), f32)
    bias = jnp.zeros((K, D), f32)
    return u, dts, Bs, Cs, A, Dv, bias


def t_nk(args, H, W):
    jax.clear_caches()
    kinds = ("row_f", "col_f", "row_r", "col_r")
    return chain_time(
        lambda *a: V.nk_scan_call_v2(*a, H, W, kinds, group=8),
        list(args), k_long=8)


def t_model(bs=64):
    from xfmamba_tpu.models.tops import two_view_xfmamba
    jax.clear_caches()
    model = two_view_xfmamba("small", outputs=2, dtype=bf16)
    x1 = jnp.ones((bs, 224, 224, 1), bf16)
    v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
    return chain_time(lambda a, b: model.apply(v, a, b), [x1, x1], k_long=6)


s2 = stage_args(128, 14, 14, 384, 768, 24, 15)
s0 = stage_args(64, 56, 56, 96, 192, 6, 2)
nk = nk_args(192, 49, 7, 1536, 4, 16)

for flag in (False, True):
    FM.FAST_EXP = flag
    name = "fast" if flag else "builtin"
    t2 = t_stage(s2, 14, 14, 4)
    t0 = t_stage(s0, 56, 56, 1)
    tn = t_nk(nk, 7, 7)
    tm = t_model()
    print(f"{name:8s}: stage2x15 {t2*1e3:7.3f}  stage0x2 {t0*1e3:7.3f}  "
          f"nk(cssf) {tn*1e3:7.3f}  model bs64 {tm*1e3:7.3f} ms "
          f"({64/tm:.1f} img/s)", flush=True)
