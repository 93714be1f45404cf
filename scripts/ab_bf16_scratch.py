"""One-process A/B: BF16_SCRATCH (bf16 scan-chain scratch — halved
dynamic-slice VMEM traffic in the serial scans) vs f32 scratch, at the
four production stage geometries and whole-model bs64.

VERDICT r3 #1's "one genuinely untried experiment": the scan FMA chain is
the long unbracketed segment BF16_MAPS never covered; here only the
STORED maps are bf16 (loads/stores), the chain still accumulates f32.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_bf16_scratch.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16
B = 128  # backbone batch at bs64 two-view

STAGES = [  # (H, W, d, depth, G)
    (56, 56, 96, 2, 1),
    (28, 28, 192, 2, 4),
    (14, 14, 384, 15, 4),
    (7, 7, 768, 2, 8),
]


def stage_args(H, W, d, depth, key):
    """Real VSSBlock params packed with fold_ln=True (the production
    inference layout)."""
    from xfmamba_tpu.models.vssm import VSSBlock
    from xfmamba_tpu.ops.vss_block_pallas_v2 import pack_vss_stage_params

    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1,
                   ssm_ratio=2.0, ssm_act="silu", ssm_conv=3,
                   ssm_conv_bias=False, ssm_init="v0",
                   forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
                   dtype=bf16)
    k1, k2 = jax.random.split(key)
    x1 = jnp.zeros((1, H, W, d), bf16)
    ps = [blk.init(jax.random.fold_in(k1, j), x1)["params"]
          for j in range(depth)]
    packed = pack_vss_stage_params(ps, bf16, True, fold_ln=True)
    x = jax.random.normal(k2, (B, H * W, d), f32).astype(bf16)
    return [x] + list(packed)


def main():
    for i, (H, W, d, depth, G) in enumerate(STAGES):
        args = stage_args(H, W, d, depth, jax.random.key(i))
        ts = {}
        ys = {}
        for flag in (False, True):
            fn = (lambda flag: lambda *a: V._vss_stage_call_v2(
                *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G,
                fold_ln=True, bf16_scratch=flag))(flag)
            ys[flag] = np.asarray(fn(*args).astype(f32))
            ts[flag] = chain_time(fn, args, k_long=8)
        err = (np.abs(ys[True] - ys[False]).max()
               / (np.abs(ys[False]).max() + 1e-9))
        print(f"stage{i} ({H}x{W} d{d} x{depth} G{G}): f32 "
              f"{ts[False]*1e3:7.2f} ms | bf16 {ts[True]*1e3:7.2f} ms "
              f"({ts[False]/ts[True]:.2f}x) | rel-err {err:.2e}",
              flush=True)

    # whole model
    from xfmamba_tpu.models.tops import two_view_xfmamba
    model = two_view_xfmamba("small", outputs=2, dtype=bf16)
    bs = 64
    x1 = jnp.ones((bs, 224, 224, 1), bf16)
    x2 = jnp.ones((bs, 224, 224, 1), bf16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x2)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    for flag in (False, True):
        V.BF16_SCRATCH = flag
        t = chain_time(lambda a, b: model.apply(variables, a, b),
                       [x1, x2], k_long=6)
        print(f"model bs{bs}: BF16_SCRATCH={flag}: {t*1e3:.2f} ms "
              f"({bs/t:.1f} img/s)", flush=True)
    V.BF16_SCRATCH = False


if __name__ == "__main__":
    main()
