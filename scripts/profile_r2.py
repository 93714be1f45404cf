"""Fresh bs64 decomposition of the flagship path (round 2, session 4)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.models.tops import TwoViewXFMamba, _make_backbone
from xfmamba_tpu.models.fusion import (ShallowFusionBlock, CSSFVSSLayer)
from flax import linen as nn

B = 64
x1 = jnp.ones((B, 224, 224, 1), jnp.bfloat16)

model = TwoViewXFMamba(outputs=2, model_type="small", hidden_dim=768,
                       dtype=jnp.bfloat16)
v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
t = chain_time(lambda a, b: model.apply(v, a, b), [x1, x1])
print(f"full model bs{B}: {t*1e3:.2f} ms")

# backbone as the model runs it: ONE 2B batched pass
bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((2 * B, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)
t = chain_time(lambda a: bb.apply(vb, a)[3], [x3])
print(f"backbone 2B pass: {t*1e3:.2f} ms")

# fusion stack: shallow + deep + head equivalent at 7x7x768
z = jnp.ones((B, 7, 7, 768), jnp.bfloat16)
sf = ShallowFusionBlock(hidden_dim=768, d_state=16, dtype=jnp.bfloat16)
vs = sf.init(jax.random.key(0), z, z)
t = chain_time(lambda a, b: sf.apply(vs, a, b)[0], [z, z])
print(f"ShallowFusionBlock: {t*1e3:.2f} ms")

cl = CSSFVSSLayer(hidden_dim=768, depth=1, drop_path=[0.0],
                  d_state=16, dtype=jnp.bfloat16)
vc = cl.init(jax.random.key(0), z, z)
t = chain_time(lambda a, b: cl.apply(vc, a, b), [z, z])
print(f"CSSFVSSLayer: {t*1e3:.2f} ms")
