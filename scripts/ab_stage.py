"""A/B: stage-stacked megakernel vs per-block kernels (one process)."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.tops import _make_backbone  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2  # noqa: E402

B = 64
bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)

for flag in (True, False, True, False):
    _v2.FUSED_STAGE = flag
    t = chain_time(lambda a: bb.apply(vb, a)[3], [x3], k_long=8)
    print(f"backbone bs{B} FUSED_STAGE={flag}: {t*1e3:8.3f} ms", flush=True)
