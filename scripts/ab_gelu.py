"""A/B: tanh-GELU vs erf-GELU in the fused kernels (one process).

Times the full XFMamba-S backbone (stage path) and the end-to-end two-view
model at bs64, interleaved so tunnel noise cancels.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.tops import _make_backbone, two_view_xfmamba  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas as _vbp  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as _v2  # noqa: E402


def set_gelu(flag):
    """Flip the GELU flag AND drop the nested-jit jaxpr caches of the
    kernel entry points (the flag is read at trace time; a stale cached
    jaxpr would silently reuse the other variant)."""
    _vbp.GELU_TANH = flag
    for f in (_vbp._vss_block_call, _vbp.nk_scan_call,
              _v2._vss_block_call_v2, _v2._vss_stage_call_v2,
              _v2.nk_scan_call_v2):
        f.clear_cache()

B = 64
bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)

model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)
x1 = jnp.ones((B, 224, 224, 1), jnp.bfloat16)
vm = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
vm = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vm)

# numeric sanity on device first: tanh vs erf full-model logits
# (params only: the init-created 'perturbations' collection is batch-shaped)
xr = jax.random.normal(jax.random.key(1), (8, 224, 224, 1), jnp.bfloat16)
vp = {"params": vm["params"], "batch_stats": vm["batch_stats"]}
outs = {}
for flag in (False, True):
    set_gelu(flag)
    outs[flag] = np.asarray(jax.jit(lambda a: model.apply(vp, a, a))(xr),
                            np.float32)
d = np.abs(outs[True] - outs[False]).max()
print(f"logit max abs diff tanh-vs-erf: {d:.3e}", flush=True)

for flag in (True, False, True, False):
    set_gelu(flag)
    t = chain_time(lambda a: bb.apply(vb, a)[3], [x3], k_long=8)
    print(f"backbone bs{B} GELU_TANH={flag}: {t*1e3:8.3f} ms", flush=True)

for flag in (True, False, True):
    set_gelu(flag)
    t = chain_time(lambda a, b: model.apply(vm, a, b), [x1, x1], k_long=6)
    print(f"model    bs{B} GELU_TANH={flag}: {t*1e3:8.3f} ms "
          f"({B / t:.0f} img/s)", flush=True)
