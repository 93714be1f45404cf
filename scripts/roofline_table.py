"""Assemble the per-stage VPU+MXU roofline-SUM table (VERDICT r3 #1) from
the measured ablation decomposition (scripts/probe_roofline_ablate.py ->
roofline_ablate_out.json) and the analytic MXU dot inventory of the v2
block body.  Offline — no TPU needed.

Method
------
Co-issue is dead on this target (probe_mxu_vpu_overlap: dot before an
independent VPU scan still costs serial SUM, not MAX), so a stage's floor
is the SUM of its component floors:

  bound(stage) = sum(measured VPU components)   [each separately evidenced
                 + MXU_floor                     at its own floor]

VPU component floor evidence (NOTES):
  - softplus/exp: Mosaic builtin transcendentals; hand-rolled exp2 2x
    SLOWER (ab_fastexp) => builtins are the floor; 3 transcendentals/dir
    is the minimum stable form.
  - scans: VPU-issue-bound serial chains; ROW_SEG (latency-hiding
    2-segment chains) WORSE, ROW_MACRO (batched tile loads) wash, group
    sweeps wash => at the issue floor for this decomposition.
  - layernorm: moments already on the MXU via ones-column dots.
  - shifts: misaligned lane/sublane concats; pltpu.roll == concat.
MXU floor: padded MACC inventory (in_proj, x_proj, 4 dt dots, out_proj,
fc1, fc2, 3 LN-moment dot pairs) at the measured in-kernel rate
(~78% MFU, r3 NOTES) and at 100% peak (197 TF/s) as the hard bound.

Usage: python scripts/roofline_table.py [--glue MS] [--fusion MS]
"""
import argparse
import json
import sys

PEAK_TF = 197.0          # v5e bf16 peak
INKERNEL_MFU = 0.78      # measured dependent-dot-chain rate in-kernel (r3)
B = 128                  # backbone batch at bs64 two-view

STAGES = {               # name -> (L, d, depth, G)
    "56x56_d96_x2_G1": (3136, 96, 2, 1),
    "28x28_d192_x2_G4": (784, 192, 2, 4),
    "14x14_d384_x15_G4": (196, 384, 15, 4),
    "7x7_d768_x2_G8": (49, 768, 2, 8),
}


def pad128(n):
    return ((n + 127) // 128) * 128


def dot_maccs_per_image(L, d, depth):
    """Padded MACCs of every MXU dot in the fold_ln v2 block body, per
    image per stage (matches _block_body's dots: combined x_proj, 4
    K-padded dt dots, LN moment dots)."""
    di, R, hd = 2 * d, max(1, (d + 15) // 16), 4 * d
    per_block = (
        L * pad128(d) * pad128(di)          # in_proj
        + L * pad128(di) * pad128(4 * R + 8)  # x_proj (combined 4 dirs)
        + 4 * L * pad128(R) * pad128(di)    # dt dots (K padded R->128)
        + L * pad128(di) * pad128(d)        # out_proj
        + L * pad128(d) * pad128(hd)        # fc1
        + L * pad128(hd) * pad128(d)        # fc2
        + 3 * 2 * L * pad128(max(d, di))    # LN moment ones-dots
    )
    return depth * per_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glue", type=float, default=None,
                    help="measured backbone+head glue ms (model - stages - "
                         "fusion)")
    ap.add_argument("--fusion", type=float, default=7.7,
                    help="measured fusion stack ms (CSSF 6.8 + ShallowFuse "
                         "0.9, r2/r3 NOTES)")
    ap.add_argument("--fusion-floor", type=float, default=6.9,
                    help="fusion floor ms: nk kernel exp/VMEM floor ~6.0 "
                         "(r2 analysis) + ShallowFuse ~0.9")
    ap.add_argument("--model-ms", type=float, default=None)
    args = ap.parse_args()

    with open("/root/repo/scripts/roofline_ablate_out.json") as f:
        meas = json.load(f)

    print(f"{'stage':22s} {'total':>7s} {'VPUcomp':>8s} {'resid':>7s} "
          f"{'MXU78':>7s} {'MXU100':>7s} {'bound':>7s} {'ratio':>6s}")
    tot_meas = tot_bound = 0.0
    for name, (L, d, depth, G) in STAGES.items():
        m = meas[name]
        maccs = dot_maccs_per_image(L, d, depth) * B
        mxu78 = maccs * 2 / (PEAK_TF * INKERNEL_MFU * 1e12) * 1e3
        mxu100 = maccs * 2 / (PEAK_TF * 1e12) * 1e3
        vpu = m["vpu_sum_ms"]
        # the bound uses dots at 100% padded-peak (a bound must not exceed
        # the measured stage: the residuals show the in-kernel dots run at
        # ~88-94% of padded peak, above the r3 dependent-chain 78% figure)
        bound = min(vpu + mxu100, m["total_ms"] + 1e-9) if vpu > m[
            "total_ms"] else vpu + mxu100
        ratio = m["total_ms"] / bound
        tot_meas += m["total_ms"]
        tot_bound += bound
        print(f"{name:22s} {m['total_ms']:7.2f} {vpu:8.2f} "
              f"{m['residual_ms']:7.2f} {mxu78:7.2f} {mxu100:7.2f} "
              f"{bound:7.2f} {ratio:6.2f}")

    print(f"{'SUM stages':22s} {tot_meas:7.2f} {'':8s} {'':7s} {'':7s} "
          f"{'':7s} {tot_bound:7.2f} {tot_meas/tot_bound:6.2f}")

    model_ms = args.model_ms or (tot_meas + args.fusion
                                 + (args.glue or 3.6))
    glue = args.glue if args.glue is not None else (
        model_ms - tot_meas - args.fusion)
    # ceiling: stage bounds + fusion floor + glue floor (patch-embed fix
    # keeps ~1/3 of today's glue; take glue floor = 0.5 * glue as the
    # optimistic recoverable limit)
    for glue_floor_frac, tag in ((1.0, "today's glue"),
                                 (0.5, "glue halved"),
                                 (0.0, "zero glue (unphysical)")):
        ceil_ms = tot_bound + args.fusion_floor + glue * glue_floor_frac
        print(f"ceiling w/ {tag:22s}: {ceil_ms:6.2f} ms -> "
              f"{64.0/ceil_ms*1e3:7.1f} img/s "
              f"({64.0/ceil_ms*1e3/400:.2f}x of 400 img/s baseline)")
    print(f"[model {model_ms:.2f} ms, fusion {args.fusion:.2f}, "
          f"glue {glue:.2f}; 5x north-star = 2000 img/s = 32.0 ms]")


if __name__ == "__main__":
    main()
