"""Marginal-cost ablation of the v2 block kernel at stage geometries.

Monkeypatches transcendentals / scans / LN out of the traced kernel body
(one variant per trace; module-level jit caches cleared between variants)
and chain-times each.  Run on the real TPU; one process = comparable.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from scripts.chain_timer import chain_time
from xfmamba_tpu.ops import vss_block_pallas_v2 as V
from xfmamba_tpu.ops import vss_block_pallas as V1

key = jax.random.key(0)


def make_args(B, H, W, d, di, R):
    hd = 4 * d
    f32, bf16 = jnp.float32, jnp.bfloat16
    L = H * W
    ks = iter(jax.random.split(key, 20))

    def rnd(shape, dt, scale=0.02):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dt)

    x = rnd((B, L, d), bf16, 1.0)
    args = [x,
            jnp.stack([jnp.ones((d,), f32), jnp.zeros((d,), f32)]),  # ln1
            rnd((d, di), bf16), rnd((9, di), f32), jnp.zeros((1, di), f32),
            rnd((di, 4 * R + 8), bf16), rnd((4 * R, di), bf16),
            jnp.zeros((4, di), f32), -jnp.ones((4, di), f32),
            jnp.ones((1, di), f32),
            jnp.stack([jnp.ones((di,), f32), jnp.zeros((di,), f32)]),  # lno
            rnd((di, d), bf16),
            jnp.stack([jnp.ones((d,), f32), jnp.zeros((d,), f32)]),  # ln2
            rnd((d, hd), bf16), jnp.zeros((1, hd), f32),
            rnd((hd, d), bf16), jnp.zeros((1, d), f32)]
    return args


def time_block(args, H, W, G, label):
    V._vss_block_call_v2.clear_cache()
    t = chain_time(
        lambda *a: V._vss_block_call_v2(
            *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
        args, k_long=8)
    print(f"{label:32s}: {t*1e3:7.3f} ms", flush=True)
    return t


def noscan_row(af, bf, ar, br, L, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


def noscan_col(af, bf, ar, br, H, W, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


GEOMS = [("stage0", 128, 56, 56, 96, 192, 6, 1),
         ("stage2", 128, 14, 14, 384, 768, 24, 4)]

import jax.nn as jnn
orig = dict(softplus=jax.nn.softplus, exp=jnp.exp, sigmoid=jax.nn.sigmoid,
            row=V._serial_row_pair, col=V._serial_col_pair,
            gelu=V1.GELU_TANH, ln=V1._layer_norm)

for name, B, H, W, d, di, R, G in GEOMS:
    args = make_args(B, H, W, d, di, R)
    base = time_block(args, H, W, G, f"{name} G={G} baseline")

    jax.nn.softplus = lambda z: z
    t = time_block(args, H, W, G, f"{name} -softplus")
    sp = base - t

    jnp.exp = lambda z: z * 1.0001
    t2 = time_block(args, H, W, G, f"{name} -softplus-exp")
    ex = t - t2
    jnp.exp = orig["exp"]

    jax.nn.sigmoid = lambda z: z * 0.5
    t3 = time_block(args, H, W, G, f"{name} -softplus-sigmoid")
    sg = t - t3
    jax.nn.sigmoid = orig["sigmoid"]
    jax.nn.softplus = orig["softplus"]

    V._serial_row_pair = noscan_row
    V._serial_col_pair = noscan_col
    t4 = time_block(args, H, W, G, f"{name} -scans")
    sc = base - t4
    V._serial_row_pair = orig["row"]
    V._serial_col_pair = orig["col"]

    # free MLP GELU
    import xfmamba_tpu.ops.vss_block_pallas as V1m
    _saved = V1m._gelu_tanh
    V1m._gelu_tanh = lambda z: z
    t5 = time_block(args, H, W, G, f"{name} -gelu")
    ge = base - t5
    V1m._gelu_tanh = _saved

    print(f"== {name}: softplus {sp*1e3:.3f}  exp {ex*1e3:.3f}  "
          f"sigmoid {sg*1e3:.3f}  scans {sc*1e3:.3f}  gelu {ge*1e3:.3f}  "
          f"(of {base*1e3:.3f} ms)", flush=True)
