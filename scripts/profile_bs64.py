"""bs64 end-to-end decomposition on the fused inference path (v2 kernels)."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.fusion import CrossSS2Dv5, ShallowFuseSS2Dv4  # noqa
from xfmamba_tpu.models.tops import TwoViewXFMamba, _make_backbone  # noqa
from xfmamba_tpu.models.vssm import VSSBlock  # noqa

B = 64
key = jax.random.key(0)


def timed(name, fn, args, k=8):
    t = chain_time(fn, args, k_long=k)
    print(f"{name:32s} {t*1e3:8.3f} ms", flush=True)
    return t


model = TwoViewXFMamba(outputs=2, model_type="small", hidden_dim=768,
                       dtype=jnp.bfloat16)
x1 = jnp.ones((B, 224, 224, 1), jnp.bfloat16)
v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
timed("full model", lambda a, b: model.apply(v, a, b), [x1, x1])

bb = _make_backbone("small", jnp.bfloat16)
x3 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
vb = jax.eval_shape(bb.init, jax.random.key(0), x3)
vb = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vb)
timed("backbone 1 view", lambda a: bb.apply(vb, a)[3], [x3])

# per-stage single blocks (x depth to estimate stage costs)
stage_geom = [(56, 96, 2), (28, 192, 2), (14, 384, 15), (7, 768, 2)]
for i, (hw, d, depth) in enumerate(stage_geom):
    blk = VSSBlock(hidden_dim=d, ssm_d_state=1, forward_type="v05_noz",
                   ssm_conv_bias=False, dtype=jnp.bfloat16)
    xx = jnp.ones((B, hw, hw, d), jnp.bfloat16)
    vv = jax.eval_shape(blk.init, jax.random.key(0), xx)
    vv = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), vv)
    t = timed(f"stage{i} block ({hw}x{hw}x{d})",
              lambda a, b=blk, w=vv: b.apply(w, a), [xx])
    print(f"{'':32s} x{depth} = {t*depth*1e3:8.3f} ms", flush=True)

z = jnp.ones((B, 7, 7, 768), jnp.bfloat16)
cf = CrossSS2Dv5(d_model=768, d_state=16, dtype=jnp.bfloat16)
vc = cf.init(jax.random.key(0), z, z)
timed("CrossSS2Dv5 (N=16)", lambda a, b: cf.apply(vc, a, b), [z, z])

sf = ShallowFuseSS2Dv4(d_model=768, d_state=16, dtype=jnp.bfloat16)
vs = sf.init(jax.random.key(0), z, z)
timed("ShallowFuseSS2Dv4", lambda a, b: sf.apply(vs, a, b)[0], [z, z])
