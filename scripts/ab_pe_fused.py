"""One-process A/B: fused patch-embed LN+GELU (ops/pe_fused.py) vs the
composable XLA lowering, embed-only and whole-model bs64.

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
from xfmamba_tpu.models.vssm import PatchEmbedV2  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16
B = 128


def main():
    pe = PatchEmbedV2(embed_dim=96, patch_size=4, patch_norm=True,
                      dtype=bf16)
    x = jax.random.normal(jax.random.key(0), (B, 224, 224, 3),
                          f32).astype(bf16)
    v = pe.init(jax.random.key(1), x)

    # deterministic=True -> fused; False (without dropout there is no
    # stochastic op in the embed) -> composable
    ys = {}
    for fused in (False, True):
        fn = (lambda fused: lambda a: pe.apply(
            v, a, deterministic=fused))(fused)
        ys[fused] = np.asarray(fn(x).astype(f32))
        t = chain_time(fn, [x], k_long=16)
        print(f"patch embed fused={fused}: {t*1e3:6.2f} ms", flush=True)
    err = (np.abs(ys[True] - ys[False]).max()
           / (np.abs(ys[False]).max() + 1e-9))
    print(f"fused-vs-composable rel-err: {err:.2e}", flush=True)

    # whole model
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
    print(f"model bs{bs} (pe fused in model): {t*1e3:.2f} ms "
          f"({bs/t:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
