"""Round-5 train-step decomposition AFTER the stage-stacked train path +
rank-form nk adjoint + patch-embed tanh-GELU (bs16 two-view -> backbone
B=32, one process).  Produces the NOTES table backing the <70 ms claim.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_r5.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402

bf16 = jnp.bfloat16
f32 = jnp.float32
B = 32          # backbone batch at train bs16 two-view

STAGES = [  # (H, W, d, depth)
    (56, 56, 96, 2),
    (28, 28, 192, 2),
    (14, 14, 384, 15),
    (7, 7, 768, 2),
]


def _consume(t):
    return jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + leaf.astype(f32).sum(), t, 0.0)


def main():
    from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params
    from xfmamba_tpu.ops.vss_stage_train import (
        pick_stage_train_groups, vss_stage_train)
    from xfmamba_tpu.models.vssm import VSSBlock

    total_stages = 0.0
    for (H, W, d, depth) in STAGES:
        di, hd = 2 * d, 4 * d
        L = H * W
        blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1,
                       ssm_ratio=2.0, ssm_act="silu", ssm_conv=3,
                       ssm_conv_bias=False, ssm_init="v0",
                       forward_type="v05_noz", mlp_ratio=4.0,
                       mlp_act="gelu", dtype=bf16)
        x0 = jnp.zeros((1, H, W, d), bf16)
        packed = []
        for j in range(depth):
            p = blk.init(jax.random.PRNGKey(j), x0)["params"]
            packed.append(pack_vss_block_params(p, bf16, True))
        stacked = tuple(jnp.stack(ws) for ws in zip(*packed))
        gf, gb = pick_stage_train_groups(B, H, W, d, di, hd)
        x = jax.random.normal(jax.random.key(d), (B, L, d), bf16)
        m = jnp.ones((depth, B, L, 1), f32)

        def fwd(xx):
            return vss_stage_train(H, W, False, gf, gb, xx, m, m, *stacked)

        def vg(xx):
            def loss(xi, *pk):
                return (fwd_with(xi, pk).astype(f32) ** 2).sum()

            def fwd_with(xi, pk):
                return vss_stage_train(H, W, False, gf, gb, xi, m, m, *pk)

            return _consume(jax.grad(loss, argnums=tuple(
                range(1 + len(stacked))))(xx, *stacked))

        t_f = chain_time(lambda xx: fwd(xx), [x], k_long=8)
        t_vg = chain_time(lambda xx: vg(xx), [x], k_long=8)
        total_stages += t_vg
        print(f"stage {H}x{W} d{d} x{depth} (Gf={gf},Gb={gb}): "
              f"fwd {t_f*1e3:6.2f} ms | fwd+bwd {t_vg*1e3:6.2f} ms",
              flush=True)
    print(f"stage vg sum: {total_stages*1e3:.2f} ms", flush=True)

    # patch embed vg (2B views batched)
    from xfmamba_tpu.models.vssm import PatchEmbedV2
    pe = PatchEmbedV2(embed_dim=96, dtype=bf16)
    xpe = jax.random.normal(jax.random.key(9), (B, 224, 224, 3), bf16)
    vpe = pe.init(jax.random.key(0), xpe)

    def pe_loss(p, a):
        return (pe.apply({"params": p}, a).astype(f32) ** 2).sum()

    t = chain_time(lambda a: _consume(
        jax.grad(pe_loss, argnums=(0, 1))(vpe["params"], a)), [xpe],
        k_long=8)
    print(f"patch embed vg: {t*1e3:6.2f} ms", flush=True)

    # fusion stack vg (CSSF + ShallowFuse at bs16)
    from xfmamba_tpu.models.fusion import CSSFVSSLayer, ShallowFusionBlock
    z = jax.random.normal(jax.random.key(11), (16, 7, 7, 768), bf16)
    for name, mod in [
            ("ShallowFusionBlock", ShallowFusionBlock(
                hidden_dim=768, d_state=16, dtype=bf16)),
            ("CSSFVSSLayer", CSSFVSSLayer(
                hidden_dim=768, depth=1, drop_path=[0.0], d_state=16,
                dtype=bf16))]:
        vm = mod.init(jax.random.key(0), z, z)

        def m_loss(p, a, b):
            out = mod.apply({"params": p}, a, b,
                            deterministic=False,
                            rngs={"dropout": jax.random.key(2)})
            return sum((o.astype(f32) ** 2).sum() for o in out) \
                if isinstance(out, tuple) else (out[0].astype(f32) ** 2).sum()

        t = chain_time(lambda a: _consume(
            jax.grad(m_loss, argnums=(0, 1))(vm["params"], a, z)), [z],
            k_long=8)
        print(f"{name} vg: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
