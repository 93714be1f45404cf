"""Marginal op costs: repeat the op N times inside ONE kernel; slope = cost."""
import functools, sys, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from xfmamba_tpu.ops.vss_block_pallas import _layer_norm, _scan_direction, _pair_hs_seg

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, W, d, G = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (56, 56, 96, 1)
B, L, di = 32, H*W, 2*(int(sys.argv[3]) if len(sys.argv) > 4 else 96)
Lg = G*L
x = jax.random.normal(jax.random.PRNGKey(0), (B, L, di), jnp.float32) * 0.1

def bench(body_fn, name, reps=(1, 5)):
    times = {}
    for n in reps:
        def kernel(x_ref, y_ref, n=n):
            v = x_ref[0]
            for i in range(n):
                v = body_fn(v) * 0.5 + x_ref[0] * 0.01
            y_ref[0] = v
        @jax.jit
        def call(xx):
            xx = xx.reshape(B//G, Lg, di)
            return pl.pallas_call(kernel, grid=(B//G,),
                in_specs=[pl.BlockSpec((1, Lg, di), lambda b: (b,0,0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, Lg, di), lambda b: (b,0,0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B//G, Lg, di), xx.dtype),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
            )(xx).reshape(B, L, di)
        @functools.partial(jax.jit, static_argnums=(1,))
        def chained(xx, k):
            def body(i, c): return call(c)
            return jax.lax.fori_loop(0, k, body, xx).sum()
        try:
            float(chained(x, 1))
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:100]}", flush=True); return
        best = 1e9
        for _ in range(3):
            t0=time.perf_counter(); float(chained(x, 20)); best=min(best, time.perf_counter()-t0)
        times[n] = best/20
    n1, n2 = reps
    print(f"{name}: {(times[n2]-times[n1])/(n2-n1)*1000:.3f} ms/op  (total@1: {times[n1]*1000:.3f})", flush=True)

ones = None
def ln(v):
    return _layer_norm(v, jnp.ones((1, di), jnp.float32), jnp.zeros((1, di), jnp.float32))
bench(ln, "layernorm")

def mk_scan(kind):
    def f(v):
        return _scan_direction(jnp.minimum(jnp.abs(v)+0.2, 0.99), v, H, W, G, kind)
    return f
for kind in ("row_f", "col_f"):
    bench(mk_scan(kind), f"scan {kind}")

def lvl1(v):
    wmod = jax.lax.broadcasted_iota(jnp.int32, (Lg,1), 0) % W
    a, b = _pair_hs_seg(jnp.minimum(jnp.abs(v)+0.2, 0.99), v, W, wmod, False)
    return a+b
bench(lvl1, "row level1 only")

def prologue(v):
    dt = jax.nn.softplus(v)
    return jnp.exp(dt*-0.5)*dt*v
bench(prologue, "softplus+exp prologue")

def expo(v): return jnp.exp(v)
bench(expo, "exp", reps=(1, 9))

def mm(v):
    r = jax.lax.broadcasted_iota(jnp.int32, (di, di), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (di, di), 1)
    wm = (((r*37+c*11)%13-6).astype(jnp.bfloat16)*0.01)
    return jax.lax.dot(v.astype(jnp.bfloat16), wm, preferred_element_type=jnp.float32)
bench(mm, f"matmul ({Lg}x{di})@({di}x{di})")

def shift1(v):
    return v + jnp.concatenate([jnp.zeros((1, di), v.dtype), v[:-1]], axis=0)*0.5
bench(shift1, "shift by 1 (concat)", reps=(1, 9))

def shiftW(v):
    return v + jnp.concatenate([jnp.zeros((W, di), v.dtype), v[:-W]], axis=0)*0.5
bench(shiftW, "shift by W (concat)", reps=(1, 9))

def rollW(v):
    m = jax.lax.broadcasted_iota(jnp.int32, (Lg,1), 0) >= W
    return v + jnp.where(m, pltpu.roll(v, W, 0), 0.0)*0.5
bench(rollW, "shift by W (roll+mask)", reps=(1, 9))

def conv9(v):
    wmod = jax.lax.broadcasted_iota(jnp.int32, (Lg,1), 0) % W
    lmod = jax.lax.broadcasted_iota(jnp.int32, (Lg,1), 0) % L
    acc = jnp.zeros_like(v)
    for i in range(3):
        for j in range(3):
            off = (i-1)*W + (j-1)
            if off > 0: sh = jnp.concatenate([v[off:], jnp.zeros((off, di), v.dtype)], axis=0)
            elif off < 0: sh = jnp.concatenate([jnp.zeros((-off, di), v.dtype), v[:off]], axis=0)
            else: sh = v
            if j == 0: sh = jnp.where(wmod >= 1, sh, 0.0)
            elif j == 2: sh = jnp.where(wmod <= W-2, sh, 0.0)
            if i == 0: sh = jnp.where(lmod >= W, sh, 0.0)
            elif i == 2: sh = jnp.where(lmod <= L-W-1, sh, 0.0)
            acc = acc + sh*(0.1+0.01*(3*i+j))
    return acc
bench(conv9, "dwconv 9-tap")
