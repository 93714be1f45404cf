"""Round-4 follow-up train decomposition (bs16, one process):

1. The ~28 ms of backbone grad NOT in the block sum (66.6 total vs 36.1
   blocks): patch-embed and downsample grads iso — stride-2 conv input
   grads are the suspects.
2. stage0 block grad: fused adjoint vs composable (the fused path was
   ACTIVE and still cost 9.12 ms/block vs stage2's 0.34 at equal
   per-step element count).
3. stage1 block grad after the G step-down fix (was silently composable).
4. Whole-model value_and_grad after the fix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_parts2.py
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
B = 16
RNGS = {"dropout": jax.random.key(1)}
key = jax.random.key(0)


def _consume(g):
    return jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(), g, 0.0)


def grad_time(mod, x, label, wrt_x=True):
    v = mod.init(jax.random.key(1), x)

    def loss(p, a):
        y = mod.apply({"params": p}, a)
        return (y.astype(jnp.float32) ** 2).sum()

    if wrt_x:
        g = jax.grad(loss, argnums=(0, 1))
    else:
        g = jax.grad(loss)
    t = chain_time(lambda a: _consume(g(v["params"], a)), [x], k_long=16)
    print(f"{label}: {t*1e3:6.2f} ms", flush=True)
    return t


def main():
    from xfmamba_tpu.models.vssm import DownsampleV3, PatchEmbedV2, VSSBlock

    # 1. embed/downsample grads (2B batch = 32)
    pe = PatchEmbedV2(embed_dim=96, patch_size=4, patch_norm=True,
                      dtype=bf16)
    grad_time(pe, jnp.ones((2 * B, 224, 224, 3), bf16),
              "patch embed grad (2B)", wrt_x=False)
    for (H, d) in ((56, 96), (28, 192), (14, 384)):
        dn = DownsampleV3(out_dim=2 * d, dtype=bf16)
        grad_time(dn, jnp.ones((2 * B, H, H, d), bf16),
                  f"downsample {H}x{H} grad (2B)")

    # 2./3. per-stage block grads, fused vs composable
    from xfmamba_tpu.ops import vss_block_pallas_v2 as V

    for (hw, dm, label) in ((56, 96, "stage0"), (28, 192, "stage1"),
                            (14, 384, "stage2"), (7, 768, "stage3")):
        blk = VSSBlock(hidden_dim=dm, ssm_d_state=1, ssm_ratio=2.0,
                       ssm_conv_bias=False, forward_type="v05_noz",
                       mlp_ratio=4.0, dtype=bf16)
        xin = jax.random.normal(key, (2 * B, hw, hw, dm), bf16)
        v = blk.init(jax.random.key(1), xin)

        def loss_b(p, a, blk=blk):
            y = blk.apply({"params": p}, a, deterministic=False, rngs=RNGS)
            return (y.astype(jnp.float32) ** 2).sum()

        gb = jax.grad(loss_b)
        for fused in (True, False):
            V.FUSED_TRAIN = fused
            t = chain_time(
                lambda a, gb=gb, v=v: _consume(gb(v["params"], a)), [xin],
                k_long=16)
            print(f"{label} block grad (2B) fused={fused}: {t*1e3:6.2f} ms",
                  flush=True)
        V.FUSED_TRAIN = True

    # 4. whole-model vg after the G fix
    from xfmamba_tpu.models.tops import two_view_xfmamba
    from xfmamba_tpu.train.loop import cross_entropy_loss
    model = two_view_xfmamba("small", outputs=2, dtype=bf16,
                             use_checkpoint=False)
    x1 = jnp.ones((B, 224, 224, 1), bf16)
    x2 = jnp.ones((B, 224, 224, 1), bf16)
    labels = jnp.zeros((B,), jnp.int32)
    vv = model.init(jax.random.key(0), x1, x2)
    bstats = vv.get("batch_stats", {})

    def loss_fn(p, a, b):
        variables = {"params": p}
        if bstats:
            variables["batch_stats"] = bstats
        out = model.apply(variables, a, b, deterministic=False,
                          rngs=RNGS,
                          mutable=["batch_stats"] if bstats else False)
        logits = out[0] if bstats else out
        return cross_entropy_loss(logits, labels)

    vg = jax.value_and_grad(loss_fn)

    def vg_all(a, b):
        loss, g = vg(vv["params"], a, b)
        return loss + _consume(g)

    t = chain_time(vg_all, [x1, x2])
    print(f"model vg bs{B} (after G fix): {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
