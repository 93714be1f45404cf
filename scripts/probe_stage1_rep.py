"""Stage-1 (28x28) roofline re-measure with a method that RESOLVES sub-ms
components (VERDICT r4 #4): instead of ablating a component to identity
(difference lands at the chain-timer noise floor for sub-ms parts), each
component is REPLICATED x8 inside the kernel (CSE-defeated via input
perturbations, results folded in at 1e-20 weight so nothing is DCE'd) and
its cost is the slope (t_x8 - t_x1) / 7.  Method sanity-checked at stage-0
where the ablation numbers are well above noise (softplus 1.75 ms, LN 2.42
ms at bs64 two-view -> the slope should reproduce them).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_stage1_rep.py
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
from ab_bf16_scratch import stage_args  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16
R = 8            # replication factor; slope divisor is R-1
W_TINY = 1e-20   # fold-in weight: non-zero (no DCE), numerically invisible

ORIG = dict(softplus=V.__dict__["_softplus"], sigmoid=jax.nn.sigmoid,
            row=V._serial_row_pair, col=V._serial_col_pair,
            ln=V.__dict__["_layer_norm"], shift=V.__dict__["_shift0"])


def _rep(orig):
    """x8-replicated elementwise op: orig(z) + 1e-20 * sum of 7 perturbed
    re-evaluations (distinct inputs defeat CSE; the fold-in weight keeps
    the extra work live through DCE without changing the result)."""
    def f(z):
        out = orig(z)
        extra = 0.0
        for i in range(1, R):
            extra = extra + orig(z + jnp.asarray(i * 1e-3, z.dtype))
        return out + W_TINY * extra
    return f


def _rep_ln(orig):
    def f(x, scale, bias, eps=1e-5, use_mxu=False):
        out = orig(x, scale, bias, eps, use_mxu)
        extra = 0.0
        for i in range(1, R):
            extra = extra + orig(x + jnp.asarray(i * 1e-3, x.dtype),
                                 scale, bias, eps, use_mxu)
        return out + (W_TINY * extra).astype(out.dtype)
    return f


def _rep_shift(orig):
    def f(x, off, reverse, use_roll=False):
        out = orig(x, off, reverse, use_roll)
        extra = 0.0
        for i in range(1, R):
            extra = extra + orig(x + jnp.asarray(i * 1e-3, x.dtype),
                                 off, reverse, use_roll)
        return out + (W_TINY * extra).astype(out.dtype)
    return f


def _rep_row(orig):
    def f(af, bf, ar, br, L, G, out_f, out_r):
        for _ in range(R - 1):
            # perturb the b operands so no pass can be folded; the final
            # call overwrites out_f/out_r with (near-)correct states
            bf[...] = bf[...] * (1.0 + 1e-7)
            br[...] = br[...] * (1.0 + 1e-7)
            orig(af, bf, ar, br, L, G, out_f, out_r)
        orig(af, bf, ar, br, L, G, out_f, out_r)
    return f


def _rep_col(orig):
    def f(af, bf, ar, br, H, W, G, out_f, out_r):
        for _ in range(R - 1):
            bf[...] = bf[...] * (1.0 + 1e-7)
            br[...] = br[...] * (1.0 + 1e-7)
            orig(af, bf, ar, br, H, W, G, out_f, out_r)
        orig(af, bf, ar, br, H, W, G, out_f, out_r)
    return f


def main():
    out = {}
    # (H, W, d, depth, G, components-to-measure)
    cases = [
        (56, 56, 96, 2, 1, ["softplus", "layernorm"]),          # sanity
        (28, 28, 192, 2, 4, ["softplus", "silu", "layernorm",
                             "shifts", "scans"]),               # the target
    ]
    for (H, Wd, d, depth, G, comps) in cases:
        name = f"{H}x{Wd}_d{d}_x{depth}_G{G}"
        args = stage_args(H, Wd, d, depth, jax.random.key(d))

        def t_stage(label):
            V._vss_stage_call_v2.clear_cache()
            t = chain_time(
                lambda *a: V._vss_stage_call_v2(
                    *a, H=H, W=Wd, conv_bias=False, fuse_mlp=True, group=G,
                    fold_ln=True),
                args, k_long=8)
            print(f"{name} {label:14s}: {t*1e3:7.3f} ms", flush=True)
            return t

        base = t_stage("x1 baseline")
        row = {"total_ms": base * 1e3}

        def slope(t8):
            return (t8 - base) / (R - 1)

        if "softplus" in comps:
            V.__dict__["_softplus"] = _rep(ORIG["softplus"])
            row["softplus"] = slope(t_stage("softplus x8")) * 1e3
            V.__dict__["_softplus"] = ORIG["softplus"]
        if "silu" in comps:
            jax.nn.sigmoid = _rep(ORIG["sigmoid"])
            row["silu"] = slope(t_stage("silu x8")) * 1e3
            jax.nn.sigmoid = ORIG["sigmoid"]
        if "layernorm" in comps:
            V.__dict__["_layer_norm"] = _rep_ln(ORIG["ln"])
            row["layernorm"] = slope(t_stage("ln x8")) * 1e3
            V.__dict__["_layer_norm"] = ORIG["ln"]
        if "shifts" in comps:
            V.__dict__["_shift0"] = _rep_shift(ORIG["shift"])
            row["shifts"] = slope(t_stage("shift x8")) * 1e3
            V.__dict__["_shift0"] = ORIG["shift"]
        if "scans" in comps:
            V._serial_row_pair = _rep_row(ORIG["row"])
            V._serial_col_pair = _rep_col(ORIG["col"])
            row["scans"] = slope(t_stage("scans x8")) * 1e3
            V._serial_row_pair = ORIG["row"]
            V._serial_col_pair = ORIG["col"]

        vpu = sum(v for k, v in row.items() if k != "total_ms")
        row["vpu_sum_ms"] = vpu
        row["residual_ms"] = row["total_ms"] - vpu
        out[name] = row
        print(f"== {name}: total {row['total_ms']:.2f} | measured VPU "
              f"{vpu:.2f} | residual {row['residual_ms']:.2f}", flush=True)

    with open("/root/repo/scripts/stage1_rep_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote scripts/stage1_rep_out.json", flush=True)


if __name__ == "__main__":
    main()
