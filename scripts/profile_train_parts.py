"""Per-component TRAINING-grad decomposition on the real TPU (bs 16).

All applies use deterministic=False so the measured path is the one the
train step actually takes (fused v2 fwd + block adjoint kernel for the
backbone blocks, composable scans for the fusion ops).
"""
import sys
import jax, jax.numpy as jnp


def _consume(g):
    """Sum EVERY grad leaf (an earlier version consumed only leaf[0] and
    XLA DCE'd the unused weight-grad accumulations — underestimates)."""
    return jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(), g, 0.0)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.models.fusion import CrossSS2Dv5, ShallowFuseSS2Dv4
from xfmamba_tpu.models.vssm import VSSBlock

B = 16
key = jax.random.key(0)
z = jnp.ones((B, 7, 7, 768), jnp.bfloat16)
RNGS = {"dropout": jax.random.key(1)}

cf = CrossSS2Dv5(d_model=768, d_state=16, dtype=jnp.bfloat16)
vc = cf.init(jax.random.key(0), z, z)

def loss_cf(p, a, b):
    y = cf.apply({"params": p}, a, b, deterministic=False, rngs=RNGS)
    return (y.astype(jnp.float32) ** 2).sum()
g_cf = jax.grad(loss_cf)
t = chain_time(lambda a, b: _consume(g_cf(vc["params"], a, b)), [z, z])
print(f"CrossSS2Dv5 grad: {t*1e3:.2f} ms", flush=True)

sf = ShallowFuseSS2Dv4(d_model=768, d_state=16, dtype=jnp.bfloat16)
vs = sf.init(jax.random.key(0), z, z)

def loss_sf(p, a, b):
    y1, y2 = sf.apply({"params": p}, a, b, deterministic=False, rngs=RNGS)
    return (y1.astype(jnp.float32) ** 2).sum() + \
        (y2.astype(jnp.float32) ** 2).sum()
g_sf = jax.grad(loss_sf)
t = chain_time(lambda a, b: _consume(g_sf(vs["params"], a, b)), [z, z])
print(f"ShallowFuse grad: {t*1e3:.2f} ms", flush=True)

# one training-grad per stage geometry; scale by 2 views x depth
for hw, dm, depth in [(56, 96, 2), (28, 192, 2), (14, 384, 15), (7, 768, 2)]:
    blk = VSSBlock(hidden_dim=dm, ssm_d_state=1, ssm_ratio=2.0,
                   ssm_conv_bias=False, forward_type="v05_noz",
                   mlp_ratio=4.0, dtype=jnp.bfloat16)
    # 2 views ride one stacked 2B batch in the real model
    xin = jax.random.normal(key, (2 * B, hw, hw, dm), jnp.bfloat16)
    v = blk.init(jax.random.key(1), xin)

    def loss_b(p, a, blk=blk):
        y = blk.apply({"params": p}, a, deterministic=False, rngs=RNGS)
        return (y.astype(jnp.float32) ** 2).sum()
    gb = jax.grad(loss_b)
    t = chain_time(lambda a, gb=gb, v=v: _consume(gb(v["params"], a)),
                   [xin])
    print(f"VSSBlock {hw}x{hw} d={dm} grad (2B batch): {t*1e3:.2f} ms"
          f"  x{depth} = {t*1e3*depth:.1f} ms", flush=True)

# whole-backbone training grad (2B batch): includes patch embed,
# downsamples and outnorm3 — cross-check against the per-stage sum
from xfmamba_tpu.models.vssm import VSSM
bb = VSSM(depths=(2, 2, 15, 2), dims=96, drop_path_rate=0.3,
          ssm_d_state=1, ssm_dt_rank="auto", ssm_act="silu", ssm_conv=3,
          ssm_conv_bias=False, ssm_drop_rate=0.0, ssm_init="v0",
          forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
          mlp_drop_rate=0.0, gmlp=False, patch_norm=True,
          downsample_version="v3", patchembed_version="v2", posembed=False,
          out_indices=(3,), dtype=jnp.bfloat16)
xbb = jax.random.normal(key, (2 * B, 224, 224, 3), jnp.bfloat16)
vbb = bb.init(jax.random.key(2), xbb)

def loss_bb(p, a):
    y = bb.apply({"params": p}, a, deterministic=False, rngs=RNGS)[0]
    return (y.astype(jnp.float32) ** 2).sum()
gbb = jax.grad(loss_bb)
t = chain_time(lambda a: _consume(gbb(vbb["params"], a)), [xbb])
print(f"backbone (2B) grad total: {t*1e3:.2f} ms", flush=True)
