"""Does XLA:TPU hide an elementwise epilogue under a matmul's MXU time?

Times (a) x@w1 @ w2, (b) gelu(x@w1) @ w2, (c) gelu alone, at the stage-2
MLP geometry.  If t(b) - t(a) << t(c), XLA's fused epilogue pipelines the
VPU work against MXU streaming and the MLP half should live in XLA, not
in the Mosaic megakernel (where the same GELU costs its full serial time,
per probe_mxu_vpu_overlap's roofline-SUM finding).
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402

B, L, d, hd = 128, 196, 384, 1536
bf16 = jnp.bfloat16
key = jax.random.key(0)
x = (jax.random.normal(key, (B * L, d), jnp.float32) * 0.1).astype(bf16)
w1 = (jax.random.normal(jax.random.key(1), (d, hd), jnp.float32)
      * 0.02).astype(bf16)
w2 = (jax.random.normal(jax.random.key(2), (hd, d), jnp.float32)
      * 0.02).astype(bf16)
REP = 15  # ~ stage-2 depth


def mm_plain(x):
    for _ in range(REP):
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        x = jnp.dot(h.astype(bf16), w2,
                    preferred_element_type=jnp.float32).astype(bf16)
    return x


def mm_gelu(x):
    for _ in range(REP):
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=True)
        x = jnp.dot(h.astype(bf16), w2,
                    preferred_element_type=jnp.float32).astype(bf16)
    return x


def gelu_only(x):
    h = jnp.broadcast_to(x, (B * L, d)).astype(jnp.float32)
    for _ in range(REP):
        g = jax.nn.gelu(jnp.concatenate([h, h, h, h], 1), approximate=True)
        h = h + g[:, :d] * 1e-6
    return h


for name, fn in (("mm_plain", mm_plain), ("mm_gelu", mm_gelu),
                 ("gelu_only", gelu_only)):
    t = chain_time(fn, [x if name != "gelu_only" else x], k_long=8)
    print(f"{name:10s}: {t*1e3:7.3f} ms", flush=True)
