"""Probe: does Mosaic issue PACKED bf16 VPU ops on v5e (2x f32 throughput)?

bf16's native tile is (16, 128) — two sublanes per f32 vreg row — so
elementwise chains on bf16 arrays could run at ~2x the f32 rate IF Mosaic
emits packed arithmetic instead of upcasting to f32.  If true, every
non-exponent-path whole-map op in the megakernels (conv taps, SiLU, GELU,
epilogue gating — the reference's shipped `v05` config is fp16-I/O, so
bf16 there matches reference semantics) can halve, which is the single
biggest remaining e2e lever (~40 of 55 ms is VPU work).

Caveats found: bf16 COMPARISONS are unsupported on v5e ("Target does not
support this comparison") — masks must come from int iota or f32 compares.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bf16_vpu.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402


def make_kernel(op, reps):
    def kernel(x_ref, a_ref, y_ref):
        x = x_ref[...]
        a = a_ref[...]

        def body(i, x):
            return op(x, a)

        y_ref[...] = jax.lax.fori_loop(0, reps, body, x, unroll=True)

    return kernel


def _ops():
    def mul(x, a):
        return x * a

    def fma(x, a):
        return x * a + jnp.asarray(0.001, x.dtype)

    def sigmoid_nc(x, a):  # sigmoid without comparisons
        one = jnp.asarray(1.0, x.dtype)
        return a * (one / (one + jnp.exp(-x)))

    def tanh_op(x, a):
        return jnp.tanh(x) * a

    def expo(x, a):
        return jnp.exp(x * jnp.asarray(1e-6, x.dtype)) * a

    def sel(x, a):  # int-mask select, how kernel masks actually work
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(idx >= 8, x * a, a)

    def shift_cat(x, a):  # misaligned sublane shift via concat
        sh = jnp.concatenate(
            [jnp.zeros((1, x.shape[1]), x.dtype), x[:-1]], axis=0)
        return sh * a

    return {"mul": mul, "fma": fma, "sigmoid": sigmoid_nc, "tanh": tanh_op,
            "exp": expo, "select": sel, "shift1": shift_cat}


@functools.partial(jax.jit, static_argnames=("opname", "reps"))
def run(x, a, opname, reps):
    kern = make_kernel(_ops()[opname], reps)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, a)


def main():
    key = jax.random.PRNGKey(0)
    shape = (3136, 768)
    REPS = 32
    import os
    only = os.environ.get("OPS")
    for opname in _ops():
        if only and opname not in only.split(","):
            continue
        line = f"{opname:8s}"
        res = {}
        for dt in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(key, shape, jnp.float32).astype(dt) * 0.1
            a = (jnp.ones(shape, jnp.float32) * 0.9999).astype(dt)
            try:
                t = chain_time(
                    lambda x, a: run(x, a, opname, REPS), (x, a), k_long=6)
                res[dt.__name__] = t / REPS * 1e6
                line += f" | {dt.__name__:8s} {t/REPS*1e6:7.2f} us/op"
            except Exception as e:  # noqa: BLE001
                line += f" | {dt.__name__:8s} FAIL {type(e).__name__}"
                import traceback
                with open("/tmp/probe_bf16_err.txt", "a") as f:
                    f.write(f"==== {opname} {dt.__name__}\n")
                    f.write(traceback.format_exc()[-2000:] + "\n")
        if len(res) == 2:
            line += f" | ratio {res['float32']/max(res['bfloat16'],1e-9):5.2f}x"
        print(line, flush=True)


if __name__ == "__main__":
    main()
