"""Stage0: row vs col scan cost split + patch-embed timing (bs64 2B pass)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.ops import vss_block_pallas_v2 as V
from scripts.ab_groups import make_args

B, H, W, d, di, R, G = 128, 56, 56, 96, 192, 6, 1
args = make_args(B, H, W, d, di, R)


def t_block(label):
    V._vss_block_call_v2.clear_cache()
    t = chain_time(lambda *a: V._vss_block_call_v2(
        *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
        args, k_long=12)
    print(f"{label:24s}: {t*1e3:7.3f} ms", flush=True)
    return t


def noscan_row(af, bf, ar, br, L, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


def noscan_col(af, bf, ar, br, H, W, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


orig_r, orig_c = V._serial_row_pair, V._serial_col_pair
base = t_block("stage0 baseline")
V._serial_row_pair = noscan_row
t1 = t_block("stage0 -rowscan")
V._serial_col_pair = noscan_col
t2 = t_block("stage0 -row-colscan")
V._serial_row_pair, V._serial_col_pair = orig_r, orig_c
print(f"== row {1e3*(base-t1):.3f}  col {1e3*(t1-t2):.3f}")

# patch embed (v2: conv3x3 s2 -> LN -> GELU -> conv3x3 s2 -> LN) at 2B
from xfmamba_tpu.models.vssm import VSSM
from xfmamba_tpu.models.tops import _make_backbone
bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)


def embed_only(a):
    # forward through patch embed only via capture: run full apply but
    # return the first stage input is not exposed; instead time the first
    # conv stack by constructing it directly
    from xfmamba_tpu.models.layers import Conv2dSame
    return None


# simpler: time full backbone minus (stage prefix 0) is already known;
# time just the two embed convs standalone
from flax import linen as nn
from xfmamba_tpu.models.layers import Conv2dSame


class Embed(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Conv2dSame(48, (3, 3), strides=(2, 2), dtype=jnp.bfloat16)(x)
        x = nn.LayerNorm(dtype=jnp.bfloat16)(x)
        x = nn.gelu(x)
        x = Conv2dSame(96, (3, 3), strides=(2, 2), dtype=jnp.bfloat16)(x)
        x = nn.LayerNorm(dtype=jnp.bfloat16)(x)
        return x


em = Embed()
ve = em.init(jax.random.key(0), x3)
t = chain_time(lambda a: em.apply(ve, a), [x3], k_long=8)
print(f"patch-embed-ish 2B: {t*1e3:.3f} ms")
