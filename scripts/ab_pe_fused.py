"""One-process A/B: fused patch-embed LN+GELU (ops/ablations/pe_fused.py,
a measured-slower quarantined ablation) vs the composable XLA lowering,
embed-only and whole-model bs64.

The live PatchEmbedV2 no longer dispatches to the fused kernel, so the
fused arm here is built directly from the ablation module (conv1 ->
ln_act_fused(gelu) -> conv2 -> ln_act_fused) on the composable arm's
params — this keeps the recorded 2.23 vs 5.82 ms measurement reproducible.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_pe_fused.py
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
from xfmamba_tpu.models.layers import Conv2dSame, LN_EPS  # noqa: E402
from xfmamba_tpu.models.vssm import PatchEmbedV2  # noqa: E402
from xfmamba_tpu.ops.ablations import pe_fused  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16
B = 128


def main():
    pe = PatchEmbedV2(embed_dim=96, patch_size=4, patch_norm=True,
                      dtype=bf16)
    x = jax.random.normal(jax.random.key(0), (B, 224, 224, 3),
                          f32).astype(bf16)
    v = pe.init(jax.random.key(1), x)
    p = v["params"]
    conv1 = Conv2dSame(48, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=bf16)
    conv2 = Conv2dSame(96, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=bf16)

    def fused_embed(a):
        h = conv1.apply({"params": p["conv1"]}, a)
        h = pe_fused.ln_act_fused(h, p["norm1"]["scale"], p["norm1"]["bias"],
                                  act_gelu=True, eps=LN_EPS)
        h = conv2.apply({"params": p["conv2"]}, h)
        return pe_fused.ln_act_fused(h, p["norm2"]["scale"],
                                     p["norm2"]["bias"], act_gelu=False,
                                     eps=LN_EPS)

    composable = jax.jit(lambda a: pe.apply(v, a))
    fused = jax.jit(fused_embed)
    ys = {}
    for name, fn in (("composable", composable), ("fused", fused)):
        ys[name] = np.asarray(fn(x).astype(f32))
        t = chain_time(fn, [x], k_long=16)
        print(f"patch embed {name}: {t*1e3:6.2f} ms", flush=True)
    err = (np.abs(ys["fused"] - ys["composable"]).max()
           / (np.abs(ys["composable"]).max() + 1e-9))
    print(f"fused-vs-composable rel-err: {err:.2e}", flush=True)

    # whole model (composable embed — the shipped configuration)
    from xfmamba_tpu.models.tops import two_view_xfmamba
    model = two_view_xfmamba("small", outputs=2, dtype=bf16)
    bs = 64
    x1 = jnp.ones((bs, 224, 224, 1), bf16)
    x2 = jnp.ones((bs, 224, 224, 1), bf16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x2)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    t = chain_time(lambda a, b: model.apply(variables, a, b), [x1, x2],
                   k_long=8)
    print(f"model bs{bs}: {t*1e3:.2f} ms ({bs/t:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
