"""Finer component ablation of the block ADJOINT kernel residual
(round 5: the r5 probe showed residual 2.94 of 5.00 ms at stage-0 —
scans/softplus/shifts are NOT the story).  Ablates: exp (a:=dt), the
weight-grad _mm_t dots, the _colsum ones-row reductions, the LN
backwards, and the duplicated dir_parts recompute cost (approximated by
exp+softplus both off).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adjoint_ablate2.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.vssm import VSSBlock  # noqa: E402
from xfmamba_tpu.ops import fast_math as _fm  # noqa: E402
from xfmamba_tpu.ops import vss_block_v2_adjoint as VA  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params  # noqa: E402

bf16 = jnp.bfloat16
f32 = jnp.float32
B = 32

CASES = [(56, 96, 1), (14, 384, 4)]

ORIG = dict(exp=_fm.exp,
            mm_t=VA.__dict__["_mm_t"],
            colsum=VA.__dict__["_colsum"],
            ln_bwd=VA.__dict__["_ln_bwd"])


def main():
    for (H, d, G) in CASES:
        L = H * H
        blk = VSSBlock(hidden_dim=d, ssm_d_state=1, ssm_ratio=2.0,
                       ssm_conv_bias=False, forward_type="v05_noz",
                       mlp_ratio=4.0, dtype=bf16)
        x = jax.random.normal(jax.random.key(0), (B, H, H, d), bf16)
        v = blk.init(jax.random.key(1), x)
        packed = pack_vss_block_params(v["params"], bf16, fuse_mlp=False)
        xl = x.reshape(B, L, d)
        g = jax.random.normal(jax.random.key(2), (B, L, d), bf16)
        m = jnp.ones((B, L, 1), jnp.float32)

        def t_adj(label):
            VA.vss_block_bwd_call.clear_cache()
            t = chain_time(
                lambda xx, gg: VA.vss_block_bwd_call(
                    xx, *packed, m, m, gg, H=H, W=H, conv_bias=False,
                    fuse_mlp=False, group=G)[0], [xl, g], k_long=8)
            print(f"{H}x{H} d{d} G{G} {label:12s}: {t*1e3:7.3f} ms",
                  flush=True)
            return t

        base = t_adj("baseline")

        _fm.exp = lambda z: z
        ex = base - t_adj("-exp")
        _fm.exp = ORIG["exp"]

        VA.__dict__["_mm_t"] = lambda a, b: jnp.zeros(
            (a.shape[1], b.shape[1]), f32)
        mm = base - t_adj("-mm_t")
        VA.__dict__["_mm_t"] = ORIG["mm_t"]

        VA.__dict__["_colsum"] = lambda x_: jnp.zeros((1, x_.shape[1]), f32)
        cs = base - t_adj("-colsum")
        VA.__dict__["_colsum"] = ORIG["colsum"]

        VA.__dict__["_ln_bwd"] = lambda g_, xhat, rstd, scale: (
            g_, jnp.zeros((1, g_.shape[1]), f32),
            jnp.zeros((1, g_.shape[1]), f32))
        lb = base - t_adj("-ln_bwd")
        VA.__dict__["_ln_bwd"] = ORIG["ln_bwd"]

        print(f"== {H}x{H}: total {base*1e3:.2f} | exp {ex*1e3:.2f} | "
              f"mm_t {mm*1e3:.2f} | colsum {cs*1e3:.2f} | "
              f"ln_bwd {lb*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
