"""Decompose the remaining XLA glue of the bs64 inference path, to rank
the round-4 glue attacks (VERDICT r3 #1: "attack whatever the table says
is left: patch embed 1.3 ms, fusion epilogue ~0.8-1.2, head/expand ~1.2").

One process, chained timings, B=128 (bs64 two-view backbone batch).
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from flax import linen as nn  # noqa: E402

from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.layers import LN_EPS, Conv2dSame, gelu  # noqa: E402
from xfmamba_tpu.models.vssm import PatchEmbedV2  # noqa: E402

B = 128
bf16 = jnp.bfloat16


def t_of(mod, x, label):
    v = mod.init(jax.random.key(0), x)
    t = chain_time(lambda a: mod.apply(v, a), [x])
    print(f"{label}: {t*1e3:6.2f} ms", flush=True)
    return t


def main():
    # ---- patch embed total + parts
    x3 = jnp.ones((B, 224, 224, 3), bf16)
    pe = PatchEmbedV2(embed_dim=96, patch_size=4, patch_norm=True,
                      dtype=bf16)
    t_of(pe, x3, "patch_embed total (3ch in)")

    conv1 = Conv2dSame(48, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=bf16)
    t_of(conv1, x3, "  conv1 3->48 s2 (224^2)")

    x1c = jnp.ones((B, 224, 224, 1), bf16)
    conv1g = Conv2dSame(48, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=bf16)
    t_of(conv1g, x1c, "  conv1 1->48 s2 (gray-folded)")

    h = jnp.ones((B, 112, 112, 48), bf16)
    ln1 = nn.LayerNorm(epsilon=LN_EPS, dtype=bf16)
    v = ln1.init(jax.random.key(0), h)
    t = chain_time(lambda a: gelu(ln1.apply(v, a)), [h])
    print(f"  LN+GELU (112^2 x48): {t*1e3:6.2f} ms", flush=True)

    conv2 = Conv2dSame(96, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=bf16)
    t_of(conv2, h, "  conv2 48->96 s2 (112^2)")

    # ---- the gray expand broadcast (tops._expand_gray at model entry)
    xin = jnp.ones((64, 224, 224, 1), bf16)

    @jax.jit
    def expand2(a, b):
        ea = jnp.broadcast_to(a, a.shape[:-1] + (3,))
        eb = jnp.broadcast_to(b, b.shape[:-1] + (3,))
        return jnp.concatenate([ea, eb], axis=0) * 1.0001

    t = chain_time(lambda a: expand2(a, a), [xin])
    print(f"expand+concat 2 views (materialized): {t*1e3:6.2f} ms",
          flush=True)

    # ---- CSSF epilogue glue: everything around the nk kernel
    # (LN on (192,49,1536), split, y-sum, z-gate, out_proj 1536->768)
    y3 = jnp.ones((192, 7, 7, 1536), bf16)
    z = jnp.ones((64, 7, 7, 1536), bf16)
    ln = nn.LayerNorm(epsilon=LN_EPS, dtype=bf16)
    vln = ln.init(jax.random.key(0), y3)
    wout = jnp.ones((1536, 768), bf16)

    @jax.jit
    def epi(y3, z):
        y = ln.apply(vln, y3)
        yf, ya, yb = jnp.split(y, 3, axis=0)
        ysum = (ya + yb + yf) * z
        return ysum.reshape(-1, 1536) @ wout

    t = chain_time(epi, [y3, z])
    print(f"CSSF epilogue (LN+split+sum+gate+out_proj): {t*1e3:6.2f} ms",
          flush=True)

    # ---- CSSF prologue glue: in_proj + dwconv + act on (192,7,7,1536)
    xc = jnp.ones((192, 7, 7, 768), bf16)
    win = jnp.ones((768, 1536), bf16)
    conv = Conv2dSame(1536, (3, 3), feature_group_count=1536, use_bias=True,
                      dtype=bf16)
    xp0 = jnp.ones((192, 7, 7, 1536), bf16)
    vconv = conv.init(jax.random.key(0), xp0)

    @jax.jit
    def pro(xc):
        xp = (xc.reshape(-1, 768) @ win).reshape(192, 7, 7, 1536)
        xp = conv.apply(vconv, xp)
        return nn.silu(xp)

    t = chain_time(pro, [xc])
    print(f"CSSF prologue (in_proj+dwconv+silu): {t*1e3:6.2f} ms",
          flush=True)

    # ---- head: final_conv 1x1 + avgpool + classifier
    zf = jnp.ones((64, 7, 7, 768), bf16)
    wf = jnp.ones((768, 768), bf16)
    wh = jnp.ones((768, 2), bf16)

    @jax.jit
    def head(zf):
        y = (zf.reshape(-1, 768) @ wf).reshape(64, 7, 7, 768)
        y = y.mean(axis=(1, 2))
        return y @ wh

    t = chain_time(head, [zf])
    print(f"head (final_conv+avgpool+classifier): {t*1e3:6.2f} ms",
          flush=True)

    # ---- downsamples (re-measure alongside, same process)
    from xfmamba_tpu.models.vssm import DownsampleV3
    for (H, d) in ((56, 96), (28, 192), (14, 384)):
        dn = DownsampleV3(out_dim=2 * d, dtype=bf16)
        xd = jnp.ones((B, H, H, d), bf16)
        t_of(dn, xd, f"downsample {H}x{H} {d}->{2*d}")


if __name__ == "__main__":
    main()
