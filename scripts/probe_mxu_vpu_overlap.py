"""Can Mosaic overlap an MXU dot with an INDEPENDENT VPU scan loop?

Three kernels at stage-2-like geometry, same grid; input/output blocks are
grid-constant (resident in VMEM) and outputs are (8, C) summaries, so the
measurement is pure compute, no DMA:

  scan : serial fori scan over a (784, 768) f32 map (row-scan shaped)
  dot  : one (784, 768) @ (768, 768) bf16 matmul, independent of the scan
  both : the dot issued BEFORE the scan loop, result consumed after it

If t(both) ~= max(t_scan, t_dot): the scheduler hides MXU time behind the
VPU loop -> a skewed batch-pipelined stage kernel (group b scans while
group b-1's MLP dots run) is worth building.
If t(both) ~= t_scan + t_dot: no overlap; the stage-2 megakernel is at a
roofline-SUM and only per-unit op reduction helps.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402

Lg, C = 784, 768
GRID = 480          # matches stage2 (B//G=32) x depth 15
f32, bf16 = jnp.float32, jnp.bfloat16


def _scan_body(x_ref):
    T = Lg // 8

    def body(i, h):
        base = pl.multiple_of(i * 8, 8)
        a = x_ref[pl.ds(base, 8), :]
        for t in range(8):
            h = a[t:t + 1] * h + 1.0
        return h

    return jax.lax.fori_loop(0, T, body, jnp.zeros((1, C), f32))


def _dot(x_ref, w_ref):
    xb = x_ref[...].astype(bf16)
    return jax.lax.dot(xb, w_ref[...], preferred_element_type=f32)


def k_scan(x_ref, w_ref, y_ref):
    h = _scan_body(x_ref)
    y_ref[...] = jnp.broadcast_to(h, (8, C))


def k_dot(x_ref, w_ref, y_ref):
    acc = _dot(x_ref, w_ref)
    y_ref[...] = acc[:8, :]


def k_both(x_ref, w_ref, y_ref):
    acc = _dot(x_ref, w_ref)
    h = _scan_body(x_ref)
    y_ref[...] = acc[:8, :] + h


@functools.partial(jax.jit, static_argnames=("which",))
def run(x, w, which):
    kern = {"scan": k_scan, "dot": k_dot, "both": k_both}[which]
    return pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((Lg, C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, C), f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w)


key = jax.random.key(0)
x = jax.random.uniform(key, (Lg, C), f32, 0.9, 0.999)
w = (jax.random.normal(jax.random.key(1), (C, C), f32) * 0.02).astype(bf16)

ts = {}
for which in ("scan", "dot", "both"):
    t = chain_time(lambda a: run(a, w, which), [x], k_long=8)
    ts[which] = t
    print(f"{which:5s}: {t*1e3:7.3f} ms", flush=True)

print(f"sum(scan,dot) = {(ts['scan'] + ts['dot'])*1e3:.3f} ms ; "
      f"max = {max(ts['scan'], ts['dot'])*1e3:.3f} ms ; "
      f"both = {ts['both']*1e3:.3f} ms", flush=True)
