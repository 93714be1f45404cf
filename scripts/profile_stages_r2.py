"""Per-stage prefix timing of the backbone 2B pass (bs64 flagship)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.models.tops import _make_backbone

B2 = 128  # both views of bs64
bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((B2, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)

prev = 0.0
for i in range(4):
    t = chain_time(lambda a, i=i: bb.apply(vb, a)[i], [x3], k_long=6)
    print(f"through stage {i}: {t*1e3:7.2f} ms  (delta {1e3*(t-prev):6.2f})",
          flush=True)
    prev = t
