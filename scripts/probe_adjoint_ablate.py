"""Component ablation of the block ADJOINT kernel at stage-0 vs stage-2
geometry (round-5 prep: stage-0's adjoint runs at ~2x stage-2's
per-element cost; find where).

Same method as probe_roofline_ablate: patch a component to identity in
the adjoint module's namespace, re-time `vss_block_bwd_call` iso in one
process, subtract.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adjoint_ablate.py
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
from xfmamba_tpu.ops import vss_block_v2_adjoint as VA  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params  # noqa: E402

bf16 = jnp.bfloat16
B = 32

CASES = [(56, 96, 1), (14, 384, 4)]


def noscan_row(af, bf, ar, br, L, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


def noscan_col(af, bf, ar, br, H, W, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


ORIG = dict(row=VA.__dict__["_serial_row_pair"],
            col=VA.__dict__["_serial_col_pair"],
            sp=VA.__dict__["_softplus"],
            sh=VA.__dict__["_shift0"])


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
        VA.__dict__["_serial_row_pair"] = noscan_row
        VA.__dict__["_serial_col_pair"] = noscan_col
        sc = base - t_adj("-scans")
        VA.__dict__["_serial_row_pair"] = ORIG["row"]
        VA.__dict__["_serial_col_pair"] = ORIG["col"]
        VA.__dict__["_softplus"] = lambda z: z
        sp = base - t_adj("-softplus")
        VA.__dict__["_softplus"] = ORIG["sp"]
        VA.__dict__["_shift0"] = lambda vv, k, rev, _=False: vv
        sh = base - t_adj("-shifts")
        VA.__dict__["_shift0"] = ORIG["sh"]
        print(f"== {H}x{H}: total {base*1e3:.2f} | scans {sc*1e3:.2f} | "
              f"softplus {sp*1e3:.2f} | shifts {sh*1e3:.2f} | "
              f"residual {(base-sc-sp-sh)*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
