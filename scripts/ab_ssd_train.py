"""A/B: SSD training grad — Pallas fwd+adjoint pair vs XLA einsum autodiff.

The XLA path materializes the (b, h, nc, l, l) decay mask and the chunk
states in HBM on both passes; the Pallas pair keeps everything in VMEM
and recomputes intra-chunk quantities from the checkpointed chunk-start
states (reference counterpart: `ssd_combined.py:351` + the 8 bwd kernels
of `ssd_chunk_scan.py:1333-1703`).

Geometries: vmamba_*_m2 stage maps (d_state 64, heads d/16, groups 4).
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import ssd_pallas as sp  # noqa: E402
from xfmamba_tpu.ops.ssd import ssd_chunk_scan  # noqa: E402


def mk(b, s, h, p, g, n, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (b, s, h, p), jnp.float32)
    dt = jax.random.normal(ks[1], (b, s, h), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (h,), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (b, s, g, n), jnp.float32)
    C = jax.random.normal(ks[4], (b, s, g, n), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[5], (h,), jnp.float32)
    D = jnp.ones((h,), jnp.float32)
    return [x, dt, A, B, C, D, bias]


def grad_fn(use_pallas):
    def loss(x, dt, A, B, C, D, bias):
        if use_pallas:
            y, _ = sp.ssd_chunk_scan_pallas_train(x, dt, A, B, C, 64,
                                                  D, bias, None)
        else:
            y = ssd_chunk_scan(x, dt, A, B, C, chunk_size=64, D=D,
                               dt_bias=bias, dt_softplus=True)
        return jnp.sum(y * y)
    return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))


# (b, s, h, p, g, n): m2-small stage geometries (two views batched)
GEOMS = (
    ("stage2 14x14 bs32", (64, 196, 48, 16, 4, 64)),
    ("stage3 7x7  bs32",  (64, 49, 96, 16, 4, 64)),
)

for name, geom in GEOMS:
    args = mk(*geom)
    for mode, use_p in (("xla   ", False), ("pallas", True)):
        jax.clear_caches()
        g = grad_fn(use_p)
        # chain over x only (first arg)
        t = chain_time(lambda *a: g(*a)[0], args, k_long=6)
        print(f"{name} {mode}: {t*1e3:8.3f} ms/grad", flush=True)
