"""A/B: nk scan v4 (inline a/b) vs v2 at the CrossSS2Dv5 geometry, bs64."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.ops.vss_block_pallas_v2 import nk_scan_call_v2
from xfmamba_tpu.ops.ablations.nk_scan_v4 import nk_scan_call_v4

B, H, W = 192, 7, 7          # 3 streams x bs64
D, K, N = 1536, 4, 16
L = H * W
dt = jnp.bfloat16
ks = jax.random.split(jax.random.key(0), 4)
u = jax.random.normal(ks[0], (B, L, D), dt)
dts = 0.2 * jax.random.normal(ks[1], (B, L, K * D), dt)
Bs = jax.random.normal(ks[2], (B, L, K * N), dt)
Cs = jax.random.normal(ks[3], (B, L, K * N), dt)
A = -jnp.exp(0.3 * jax.random.normal(jax.random.key(5), (K * N, D)))
Dvec = jnp.ones((K, D), jnp.float32)
bias = jnp.zeros((K, D), jnp.float32)
kinds = ("row_f", "col_f", "row_r", "col_r")

import xfmamba_tpu.ops.ablations.nk_scan_v4 as V4
for name, fn in (("v2", nk_scan_call_v2), ("v4", nk_scan_call_v4)) * 3:
    if name == "v2":
        V4.FUSED_V4 = False      # keep the v2 dispatch honest
    t = chain_time(lambda *a: fn(*a, H=H, W=W, kinds=kinds, group=8),
                   [u, dts, Bs, Cs, A, Dvec, bias], k_long=12)
    V4.FUSED_V4 = True
    print(f"nk {name}: {t*1e3:7.3f} ms", flush=True)
