"""Roofline-SUM inputs for VERDICT r3 #1, by the method that actually
works on this tunnel: component ABLATION of each stage megakernel (patch
a piece out, re-time the whole stage, subtract) — the dots-doubling and
micro-chain approaches both drown in dispatch noise / Mosaic re-scheduling
(scripts/roofline.py, kept as the negative record).

One process; interleaved chain_timer; per-geometry production configs.
The analytic MXU side of the table is computed offline
(scripts/roofline_table.py) from the padded MACC inventory at the
measured in-kernel MXU rate.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_roofline_ablate.py
"""
import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas as V1  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16
B = 128  # backbone batch at bs64 two-view

STAGES = [  # (H, W, d, depth, G)  — XFMamba-S production geometry
    (56, 56, 96, 2, 1),
    (28, 28, 192, 2, 4),
    (14, 14, 384, 15, 4),
    (7, 7, 768, 2, 8),
]

# real inited VSSBlock params packed with fold_ln=True (the production
# inference layout) — hand-rolled operands don't match the folded packing
from ab_bf16_scratch import stage_args as stage_operands  # noqa: E402


def noscan_row(af, bf, ar, br, L, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


def noscan_col(af, bf, ar, br, H, W, G, out_f, out_r):
    out_f[...] = bf[...]
    out_r[...] = br[...]


ORIG = dict(softplus=V.__dict__["_softplus"], sigmoid=jax.nn.sigmoid,
            row=V._serial_row_pair, col=V._serial_col_pair,
            ln=V.__dict__["_layer_norm"], shift=V.__dict__["_shift0"],
            gel=V1._gelu_tanh)


def main():
    out = {}
    for (H, W, d, depth, G) in STAGES:
        name = f"{H}x{W}_d{d}_x{depth}_G{G}"
        args = stage_operands(H, W, d, depth, jax.random.key(d))

        def t_stage(label):
            V._vss_stage_call_v2.clear_cache()
            t = chain_time(
                lambda *a: V._vss_stage_call_v2(
                    *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G,
                    fold_ln=True),
                args, k_long=8)
            print(f"{name} {label:16s}: {t*1e3:7.3f} ms", flush=True)
            return t

        comp = {}
        base = t_stage("baseline")

        V.__dict__["_softplus"] = lambda z: z
        comp["softplus"] = base - t_stage("-softplus")
        V.__dict__["_softplus"] = ORIG["softplus"]

        jax.nn.sigmoid = lambda z: z * 0.5
        comp["silu"] = base - t_stage("-silu")
        jax.nn.sigmoid = ORIG["sigmoid"]

        V._serial_row_pair = noscan_row
        V._serial_col_pair = noscan_col
        comp["scans"] = base - t_stage("-scans")
        V._serial_row_pair = ORIG["row"]
        V._serial_col_pair = ORIG["col"]

        V1._gelu_tanh = lambda z: z
        comp["gelu"] = base - t_stage("-gelu")
        V1._gelu_tanh = ORIG["gel"]

        V.__dict__["_layer_norm"] = lambda v, s, b, use_mxu=False: v
        comp["layernorm"] = base - t_stage("-ln")
        V.__dict__["_layer_norm"] = ORIG["ln"]

        V.__dict__["_shift0"] = lambda v, k, rev, _=False: v
        comp["shifts"] = base - t_stage("-shifts")
        V.__dict__["_shift0"] = ORIG["shift"]

        vpu = sum(comp.values())
        out[name] = dict(total_ms=base * 1e3,
                         **{k: v * 1e3 for k, v in comp.items()},
                         vpu_sum_ms=vpu * 1e3,
                         residual_ms=(base - vpu) * 1e3)
        print(f"== {name}: total {base*1e3:.2f} | VPU-ablatable "
              f"{vpu*1e3:.2f} | residual (dots+loop glue) "
              f"{(base-vpu)*1e3:.2f}", flush=True)

    with open("/root/repo/scripts/roofline_ablate_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote scripts/roofline_ablate_out.json", flush=True)


if __name__ == "__main__":
    main()
