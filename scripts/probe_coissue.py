"""Does Mosaic/LLO co-issue MXU with VPU across independent streams?

variant "serial": one stream, chain of dot -> elementwise (dependent).
variant "dual":   two independent streams, statements interleaved; same
                  total work.  If the VLIW scheduler co-issues, dual ~=
                  max(MXU, VPU) while serial ~= MXU + VPU.
"""
import sys
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from scripts.chain_timer import chain_time

M, K, N = 1024, 512, 512
ITERS = 30
VPU_OPS = 24


def heavy_vpu(v):
    for _ in range(VPU_OPS // 3):
        v = v * 1.0001 + 0.1
        v = jnp.maximum(v, -3.0)
        v = v * 0.9999
    return v


def k_serial(x_ref, w_ref, o_ref):
    v = x_ref[...].astype(jnp.float32)
    w = w_ref[...]
    def body(i, v):
        d = jax.lax.dot(v.astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
        return heavy_vpu(d)
    v = jax.lax.fori_loop(0, ITERS, body, v)
    o_ref[...] = v.astype(jnp.bfloat16)


def k_dual(x_ref, x2_ref, w_ref, o_ref, o2_ref):
    va = x_ref[...].astype(jnp.float32)
    vb = x2_ref[...].astype(jnp.float32)
    w = w_ref[...]
    def body(i, c):
        va, vb = c
        da = jax.lax.dot(va.astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
        vb = heavy_vpu(vb)
        db = jax.lax.dot(vb.astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
        va = heavy_vpu(da)
        return va, db
    va, vb = jax.lax.fori_loop(0, ITERS, body, (va, vb))
    o_ref[...] = va.astype(jnp.bfloat16)
    o2_ref[...] = vb.astype(jnp.bfloat16)


x = jnp.ones((M, K), jnp.bfloat16)
w = jnp.ones((K, N), jnp.bfloat16) * 0.01
full = pl.BlockSpec(memory_space=pltpu.VMEM)
out = jax.ShapeDtypeStruct((M, N), jnp.bfloat16)

serial = jax.jit(lambda x, w: pl.pallas_call(
    k_serial, in_specs=[full, full], out_specs=full, out_shape=out)(x, w))
dual = jax.jit(lambda x, x2, w: pl.pallas_call(
    k_dual, in_specs=[full] * 3, out_specs=(full, full),
    out_shape=(out, out))(x, x2, w))

# serial does ITERS iterations on ONE stream; run it twice for equal work
t_s = chain_time(lambda x, w: serial(serial(x, w), w), [x, w], k_long=12)
t_d = chain_time(lambda x, x2, w: dual(x, x2, w)[0], [x, x, w], k_long=12)
print(f"serial 2x: {t_s*1e6:8.1f} us   dual: {t_d*1e6:8.1f} us   "
      f"ratio {t_s/t_d:.2f}")
