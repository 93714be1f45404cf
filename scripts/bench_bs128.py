"""One-process inference sweep over large batch sizes (bs 64/96/128).

The stage-stacked kernels pick larger interleave groups at larger B;
checks whether bs>64 amortizes fixed per-kernel cost further.
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.tops import two_view_xfmamba  # noqa: E402

model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)

for bs in (64, 96, 128):
    x1 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    x2 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x2)
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    per = chain_time(lambda a, b: model.apply(v, a, b), [x1, x2], k_long=5)
    print(f"bs={bs}: {per*1e3:.2f} ms/step, {bs/per:.1f} img/s", flush=True)
