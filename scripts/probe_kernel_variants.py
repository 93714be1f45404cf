"""Isolate Pallas per-grid-step overhead: copy kernel vs scan variants."""
import functools
import math
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time

B, L, D, N = 32, 784, 384, 1
CHUNK = 256
NC = pl.cdiv(L, CHUNK)


def grid_specs():
    def im(b, p, c):
        return (b, p, c, 0)
    blk = pl.BlockSpec((1, 1, CHUNK, D), im, memory_space=pltpu.VMEM)
    return (B, 2, NC), blk


# --- A: pure copy (overhead floor) -----------------------------------
def copy_kernel(u_ref, y_ref):
    y_ref[...] = u_ref[...].astype(jnp.float32)


def run_copy(u2):
    grid, blk = grid_specs()
    return pl.pallas_call(
        copy_kernel, grid=grid, in_specs=[blk],
        out_specs=pl.BlockSpec((1, 1, CHUNK, D), lambda b, p, c: (b, p, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, L, D), jnp.float32),
    )(u2)


# --- B: fwd-only scan, no carry scratch, concatenate shifts ----------
def scanf_kernel(u_ref, dt_ref, y_ref):
    u = u_ref[0, 0].astype(jnp.float32)
    dt = jax.nn.softplus(dt_ref[0, 0].astype(jnp.float32))
    a = jnp.exp(-dt)
    b = dt * u
    for s in range(int(math.log2(CHUNK))):
        off = 1 << s
        pad_a = jnp.ones((off, D), jnp.float32)
        pad_b = jnp.zeros((off, D), jnp.float32)
        a_sh = jnp.concatenate([pad_a, a[:-off]], axis=0)
        b_sh = jnp.concatenate([pad_b, b[:-off]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
    y_ref[0, 0] = b


def run_scanf(u2, dt2):
    grid, blk = grid_specs()
    return pl.pallas_call(
        scanf_kernel, grid=grid, in_specs=[blk, blk],
        out_specs=pl.BlockSpec((1, 1, CHUNK, D), lambda b, p, c: (b, p, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, L, D), jnp.float32),
    )(u2, dt2)


# --- C: same but roll-based shifts -----------------------------------
def scanroll_kernel(u_ref, dt_ref, y_ref):
    u = u_ref[0, 0].astype(jnp.float32)
    dt = jax.nn.softplus(dt_ref[0, 0].astype(jnp.float32))
    a = jnp.exp(-dt)
    b = dt * u
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, D), 0)
    for s in range(int(math.log2(CHUNK))):
        off = 1 << s
        mask = row >= off
        a_sh = jnp.where(mask, pltpu.roll(a, off, 0), 1.0)
        b_sh = jnp.where(mask, pltpu.roll(b, off, 0), 0.0)
        b = b + a * b_sh
        a = a * a_sh
    y_ref[0, 0] = b


def run_scanroll(u2, dt2):
    grid, blk = grid_specs()
    return pl.pallas_call(
        scanroll_kernel, grid=grid, in_specs=[blk, blk],
        out_specs=pl.BlockSpec((1, 1, CHUNK, D), lambda b, p, c: (b, p, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, L, D), jnp.float32),
    )(u2, dt2)


# --- D: bigger block via G batches per step (flattened, masked) ------
G = 4


def scan_g_kernel(u_ref, dt_ref, y_ref):
    u = u_ref[...].reshape(G * CHUNK, D).astype(jnp.float32)
    dt = jax.nn.softplus(dt_ref[...].reshape(G * CHUNK, D)
                         .astype(jnp.float32))
    a = jnp.exp(-dt)
    b = dt * u
    row = jax.lax.broadcasted_iota(jnp.int32, (G * CHUNK, D), 0)
    pos = row % CHUNK
    for s in range(int(math.log2(CHUNK))):
        off = 1 << s
        mask = pos >= off
        a_sh = jnp.where(mask, pltpu.roll(a, off, 0), 1.0)
        b_sh = jnp.where(mask, pltpu.roll(b, off, 0), 0.0)
        b = b + a * b_sh
        a = a * a_sh
    y_ref[...] = b.reshape(G, 1, CHUNK, D)


def run_scan_g(u2, dt2):
    def im(b, p, c):
        return (b * G, p, c, 0)
    blk = pl.BlockSpec((G, 1, CHUNK, D), im, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        scan_g_kernel, grid=(B // G, 2, NC), in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, 2, L, D), jnp.float32),
    )(u2, dt2)


key = jax.random.key(0)
u2 = jax.random.normal(key, (B, 2, L, D), jnp.bfloat16)
dt2 = jax.random.normal(key, (B, 2, L, D), jnp.bfloat16)

steps = B * 2 * NC
for name, fn, args in [("copy", run_copy, [u2]),
                       ("scan_fwd_concat", run_scanf, [u2, dt2]),
                       ("scan_fwd_roll", run_scanroll, [u2, dt2]),
                       (f"scan_fwd_G{G}", run_scan_g, [u2, dt2])]:
    try:
        t = chain_time(jax.jit(fn), args)
        n = steps if "G" not in name else steps // G
        print(f"{name:>18}: {t*1e3:7.3f} ms  ({t/n*1e6:5.1f} us/step, "
              f"{n} steps)")
    except Exception as e:
        print(f"{name:>18}: FAIL {type(e).__name__}: {str(e)[:200]}")
