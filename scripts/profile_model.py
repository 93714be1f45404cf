import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.models.tops import TwoViewXFMamba, _make_backbone
from xfmamba_tpu.models.fusion import CrossSS2Dv5, ShallowFuseSS2Dv4
from xfmamba_tpu.models.layers import Conv2dSame
from flax import linen as nn

B = 32
key = jax.random.key(0)

# full model
model = TwoViewXFMamba(outputs=2, model_type="small", hidden_dim=768,
                       dtype=jnp.bfloat16)
x1 = jnp.ones((B, 224, 224, 1), jnp.bfloat16)
v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
t = chain_time(lambda a, b: model.apply(v, a, b), [x1, x1])
print(f"full model: {t*1e3:.2f} ms")

# backbone only (one view)
bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)
t = chain_time(lambda a: bb.apply(vb, a)[3], [x3])
print(f"backbone 1 view: {t*1e3:.2f} ms")

# fusion ops at stage-3 size
z = jnp.ones((B, 7, 7, 768), jnp.bfloat16)
cf = CrossSS2Dv5(d_model=768, d_state=16, dtype=jnp.bfloat16)
vc = cf.init(jax.random.key(0), z, z)
t = chain_time(lambda a, b: cf.apply(vc, a, b), [z, z])
print(f"CrossSS2Dv5 (N=16): {t*1e3:.2f} ms")

sf = ShallowFuseSS2Dv4(d_model=768, d_state=16, dtype=jnp.bfloat16)
vs = sf.init(jax.random.key(0), z, z)
t = chain_time(lambda a, b: sf.apply(vs, a, b)[0], [z, z])
print(f"ShallowFuseSS2Dv4: {t*1e3:.2f} ms")

# dwconv at stage2 geometry
dw = Conv2dSame(1536, (3, 3), feature_group_count=1536, use_bias=False,
                dtype=jnp.bfloat16)
xx = jnp.ones((B, 14, 14, 1536), jnp.bfloat16)
vd = dw.init(jax.random.key(0), xx)
t = chain_time(lambda a: dw.apply(vd, a), [xx])
print(f"dwconv 14x14x1536: {t*1e3:.3f} ms")
xx0 = jnp.ones((B, 56, 56, 384), jnp.bfloat16)
dw0 = Conv2dSame(384, (3, 3), feature_group_count=384, use_bias=False,
                 dtype=jnp.bfloat16)
vd0 = dw0.init(jax.random.key(0), xx0)
t = chain_time(lambda a: dw0.apply(vd0, a), [xx0])
print(f"dwconv 56x56x384: {t*1e3:.3f} ms")
