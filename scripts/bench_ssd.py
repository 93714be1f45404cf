"""A/B: Pallas SSD kernel vs the XLA einsum path (one process, real TPU).

Times (1) the raw ssd_chunk_scan op at m2 stage geometries and (2) the
full vmamba_small_m2 classifier forward with FUSED_SSD on/off.
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import ssd_pallas as _sp  # noqa: E402
from xfmamba_tpu.ops.ssd import ssd_chunk_scan  # noqa: E402

B = 16

# --- raw op at the m2 stage-0/1 geometries (d_model 96/192, ratio 1,
# Dh=16, N=64, K=4)
for (L, h) in ((3136, 24), (784, 48), (196, 96)):
    p, g, n = 16, 4, 64
    ks = jax.random.split(jax.random.key(0), 6)
    x = jax.random.normal(ks[0], (B, L, h, p), jnp.float32)
    dt = jax.random.normal(ks[1], (B, L, h), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (h,), jnp.float32) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, g, n), jnp.float32)
    C = jax.random.normal(ks[4], (B, L, g, n), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[5], (h,), jnp.float32)
    D = jnp.ones((h,), jnp.float32)

    for backend in ("pallas", None, "pallas", None):
        t = chain_time(
            lambda xx, dd: ssd_chunk_scan(
                xx, dd, A, Bm, C, chunk_size=64, D=D, dt_bias=bias,
                dt_softplus=True, backend=backend),
            [x, dt], k_long=6)
        print(f"ssd L={L} h={h} backend={backend or 'xla':6s}: "
              f"{t*1e3:8.3f} ms", flush=True)

# --- full m2 model
from xfmamba_tpu.models.vssm import vmamba_small_m2  # noqa: E402

model = vmamba_small_m2(num_classes=1000)
model = model.clone(dtype=jnp.bfloat16)
x3 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
v = jax.eval_shape(model.init, jax.random.key(0), x3)
v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
for flag in (True, False, True):
    _sp.FUSED_SSD = flag
    t = chain_time(lambda a: model.apply(v, a), [x3], k_long=6)
    print(f"vmamba_small_m2 bs{B} FUSED_SSD={flag}: {t*1e3:8.2f} ms "
          f"({B/t:.0f} img/s)", flush=True)
