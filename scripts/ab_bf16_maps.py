"""One-process A/B: BF16_MAPS (packed-bf16 conv/SiLU/MLP maps in the v2
inference megakernels) on vs off, at stage level and end-to-end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_bf16_maps.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.vssm import VSSBlock  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as v2  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params  # noqa: E402


def stage_ab(name, d, H, W, depth, B, G):
    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_act="silu", ssm_conv=3, ssm_conv_bias=False,
                   ssm_init="v0", forward_type="v05_noz", mlp_ratio=4.0,
                   mlp_act="gelu", dtype=jnp.bfloat16)
    x0 = jnp.ones((B, H, W, d), jnp.bfloat16)
    variables = blk.init(jax.random.PRNGKey(0), x0)
    ps = [variables["params"]] * depth
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H * W, d),
                          jnp.float32).astype(jnp.bfloat16)
    args = v2.pack_vss_stage_params(ps, jnp.bfloat16, True, fold_ln=True)

    def run():
        return v2._vss_stage_call_v2(x, *args, H=H, W=W, conv_bias=False,
                                     fuse_mlp=True, group=G, fold_ln=True)

    out = {}
    for flag in (True, False):
        v2.BF16_MAPS = flag
        v2._vss_stage_call_v2.clear_cache()
        y = run()  # correctness anchor: outputs must stay close
        t = chain_time(lambda x_: v2._vss_stage_call_v2(
            x_, *args, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G,
            fold_ln=True), (x,), k_long=20)
        out[flag] = (t, y.astype(jnp.float32))
    v2.BF16_MAPS = True
    v2._vss_stage_call_v2.clear_cache()
    err = float(jnp.abs(out[True][1] - out[False][1]).max()
                / jnp.abs(out[False][1]).max())
    print(f"{name}: bf16 {out[True][0]*1e3:7.3f} ms | f32 "
          f"{out[False][0]*1e3:7.3f} ms | speedup "
          f"{out[False][0]/out[True][0]:5.2f}x | rel-err {err:.2e}",
          flush=True)


def model_ab(bs=64):
    from xfmamba_tpu.models.tops import two_view_xfmamba
    model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)
    x1 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    x2 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x2)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    import functools

    for flag in (True, False):
        v2.BF16_MAPS = flag
        v2._vss_stage_call_v2.clear_cache()
        v2._vss_block_call_v2.clear_cache()

        @functools.partial(jax.jit)
        def apply(v, a, b):
            return model.apply(v, a, b)

        t = chain_time(lambda a: apply(variables, a, x2), (x1,), k_long=10)
        print(f"model bs{bs}: BF16_MAPS={flag}: {t*1e3:.2f} ms "
              f"({bs/t:.1f} img/s)", flush=True)
    v2.BF16_MAPS = True


if __name__ == "__main__":
    B = 128  # 2B pass at bs64
    stage_ab("stage0 x2", 96, 56, 56, 2, B, 1)
    stage_ab("stage1 x2", 192, 28, 28, 2, B, 4)
    stage_ab("stage2 x15", 384, 14, 14, 15, B, 4)
    stage_ab("stage3 x2", 768, 7, 7, 2, B, 8)
    model_ab(64)
