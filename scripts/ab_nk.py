"""A/B: nk scan v2 vs v3 variants at the CrossSS2Dv5 fusion geometry."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops.ablations.nk_scan_wide import nk_scan_call_v3  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas_v2 import nk_scan_call_v2  # noqa


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    B, H, W = 96, 7, 7
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

    for name, fn, g in (("v2 g8", nk_scan_call_v2, 8),
                        ("v3 g8", nk_scan_call_v3, 8),
                        ("v3 g4", nk_scan_call_v3, 4),
                        ("v2 g8b", nk_scan_call_v2, 8),
                        ("v3 g8b", nk_scan_call_v3, 8)):
        try:
            t = chain_time(
                lambda uu: fn(uu, dts, Bs, Cs, A, Dvec, bias, H, W, kinds,
                              group=g), (u,), k_long=16)
            print(f"nk {name}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"nk {name}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
