"""A/B: two-segment row scans (ROW_SEG) per stage geometry (one process)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.ops import vss_block_pallas_v2 as V
from scripts.ab_groups import make_args, GEOMS

for name, B, H, W, d, di, R, gs in GEOMS:
    args = make_args(B, H, W, d, di, R)
    G = gs[0]
    for seg in (False, True, False, True):
        V.ROW_SEG = seg
        V._vss_block_call_v2.clear_cache()
        t = chain_time(
            lambda *a: V._vss_block_call_v2(
                *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
            args, k_long=10)
        print(f"{name} G={G} ROW_SEG={seg}: {t*1e3:7.3f} ms", flush=True)
V.ROW_SEG = True
