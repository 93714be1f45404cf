"""Marginal-cost ablation of the 15-block stage2 stage kernel (high signal).

Patches pieces of `_block_body` out via module monkeypatching and chain-times
the whole-stage kernel each time.  One process = comparable numbers.
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
B, H, W, d, di, R, G, DEPTH = 128, 14, 14, 384, 768, 24, 4, 15
hd = 4 * d
L = H * W
f32, bf16 = jnp.float32, jnp.bfloat16
ks = iter(jax.random.split(key, 25))


def rnd(shape, dt, scale=0.02):
    return (jax.random.normal(next(ks), shape, jnp.float32)
            * scale).astype(dt)


x = rnd((B, L, d), bf16, 1.0)
Dp = DEPTH
args = [x,
        jnp.stack([jnp.stack([jnp.ones((d,), f32),
                              jnp.zeros((d,), f32)])] * Dp),
        rnd((Dp, d, di), bf16), rnd((Dp, 9, di), f32),
        jnp.zeros((Dp, 1, di), f32),
        rnd((Dp, di, 4 * R + 8), bf16), rnd((Dp, 4 * R, di), bf16),
        jnp.zeros((Dp, 4, di), f32), -jnp.ones((Dp, 4, di), f32),
        jnp.ones((Dp, 1, di), f32),
        jnp.stack([jnp.stack([jnp.ones((di,), f32),
                              jnp.zeros((di,), f32)])] * Dp),
        rnd((Dp, di, d), bf16),
        jnp.stack([jnp.stack([jnp.ones((d,), f32),
                              jnp.zeros((d,), f32)])] * Dp),
        rnd((Dp, d, hd), bf16), jnp.zeros((Dp, 1, hd), f32),
        rnd((Dp, hd, d), bf16), jnp.zeros((Dp, 1, d), f32)]


def t_stage(label):
    V._vss_stage_call_v2.clear_cache()
    t = chain_time(
        lambda *a: V._vss_stage_call_v2(
            *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G),
        args, k_long=8)
    print(f"{label:28s}: {t*1e3:7.3f} ms ({t/DEPTH*1e3:6.3f}/block)",
          flush=True)
    return t


orig = dict(softplus=jax.nn.softplus, sigmoid=jax.nn.sigmoid,
            row=V._serial_row_pair, col=V._serial_col_pair,
            ln=V1._layer_norm, shift=V1._shift0, gel=V1._gelu_tanh)

base = t_stage("baseline")

jax.nn.softplus = lambda z: z
sp = base - t_stage("-softplus")
jax.nn.softplus = orig["softplus"]

jax.nn.sigmoid = lambda z: z * 0.5
sg = base - t_stage("-sigmoid(silu)")
jax.nn.sigmoid = orig["sigmoid"]


def noscan_row(af, bf, ar, br, L, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


def noscan_col(af, bf, ar, br, H, W, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


V._serial_row_pair = noscan_row
sc_r = base - t_stage("-rowscan")
V._serial_col_pair = noscan_col
sc_rc = base - t_stage("-row+colscan")
V._serial_row_pair = orig["row"]
V._serial_col_pair = orig["col"]

V1._gelu_tanh = lambda z: z
ge = base - t_stage("-gelu")
V1._gelu_tanh = orig["gel"]

# layer_norm -> passthrough (3 LNs per block)
import xfmamba_tpu.ops.vss_block_pallas as V1m
V1m._layer_norm = lambda v, s, b, use_mxu=False: v
V.  _layer_norm = V1m._layer_norm if hasattr(V, "_layer_norm") else None
import importlib
# _layer_norm is imported by name into V's namespace
V_ln = getattr(V, "_layer_norm", None)
V.__dict__["_layer_norm"] = lambda v, s, b, use_mxu=False: v
ln = base - t_stage("-layernorm x3")
V.__dict__["_layer_norm"] = orig["ln"]

# dwconv -> passthrough: patch _shift0 to zero-cost identity
V.__dict__["_shift0"] = lambda v, k, rev, _=False: v
sh = base - t_stage("-shifts(conv+scans)")
V.__dict__["_shift0"] = orig["shift"]

print(f"== stage2 x15: softplus {sp*1e3:.3f}  silu {sg*1e3:.3f}  "
      f"rowscan {sc_r*1e3:.3f}  row+col {sc_rc*1e3:.3f}  gelu {ge*1e3:.3f}  "
      f"ln {ln*1e3:.3f}  shifts {sh*1e3:.3f}  (of {base*1e3:.3f} ms)",
      flush=True)
