"""Decompose the backbone's non-stage-kernel time (the ~5 ms 'glue'):
patch embed, downsamples, the interleave/deinterleave layout transposes,
and the stage-3 outnorm.  One process, chained timings, B=128 (bs64
two-view)."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.layers import LN_EPS  # noqa: E402
from xfmamba_tpu.models.vssm import PatchEmbedV2  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402
from flax import linen as nn  # noqa: E402

B = 128
bf16 = jnp.bfloat16

# patch embed v2 (two conv3x3s2 + LN + GELU)
pe = PatchEmbedV2(embed_dim=96, patch_size=4, patch_norm=True, dtype=bf16)
x = jnp.ones((B, 224, 224, 3), bf16)
vp = pe.init(jax.random.key(0), x)
t = chain_time(lambda a: pe.apply(vp, a), [x])
print(f"patch embed: {t*1e3:6.2f} ms", flush=True)


# downsample v3 (conv3x3s2 + LN) at the three stage boundaries
from xfmamba_tpu.models.vssm import DownsampleV3  # noqa: E402

for (H, d) in ((56, 96), (28, 192), (14, 384)):
    dn = DownsampleV3(out_dim=2 * d, dtype=bf16)
    x = jnp.ones((B, H, H, d), bf16)
    vd = dn.init(jax.random.key(0), x)
    t = chain_time(lambda a: dn.apply(vd, a), [x])
    print(f"downsample {H}x{H} {d}->{2*d}: {t*1e3:6.2f} ms", flush=True)

# interleave/deinterleave transposes at each stage geometry
for (name, H, d, G) in (("s0", 56, 96, 1), ("s1", 28, 192, 4),
                        ("s2", 14, 384, 4), ("s3", 7, 768, 8)):
    L = H * H
    x = jnp.ones((B, L, d), bf16)

    @jax.jit
    def rt(a, G=G, L=L):
        return V._deinterleave(V._interleave(a, G), G, L)

    t = chain_time(rt, [x])
    print(f"interleave+deinterleave {name}: {t*1e3:6.2f} ms", flush=True)

# stage-3 outnorm (LN2d on the consumed feature map)
ln = nn.LayerNorm(epsilon=LN_EPS, dtype=bf16)
x = jnp.ones((B, 7, 7, 768), bf16)
vl = ln.init(jax.random.key(0), x)
t = chain_time(lambda a: ln.apply(vl, a), [x])
print(f"outnorm3: {t*1e3:6.2f} ms", flush=True)
