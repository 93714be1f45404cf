"""Measured dead-end ablation kernels, kept off by default.

Each module here is real, numerically-verified code whose measured result
was NEUTRAL or NEGATIVE versus the live kernels in
`xfmamba_tpu.ops.vss_block_pallas_v2` — retained as an engineering record
(the A/B scripts and parity tests still exercise them) so future rounds
don't re-explore the same seams.  None of this is on the shipped hot path.

Index (details + numbers in NOTES.md):

- `nk_scan_wide` — "v3" wide-state fusion scan: all N=16 states of a
  direction advance in ONE (rows, N*D)-lane serial chain.  EQUAL to the
  live v2 per-state chains at the CrossSS2Dv5 geometry (the op is at a
  combined exp-ALU + VMEM-traffic floor).  Gate: `FUSED_V3` in
  vss_block_pallas_v2 (False).
- `nk_scan_v4` — inline-a/b fusion scan with in-loop y accumulation
  (~25% less VMEM traffic).  ~10% SLOWER than v2: few big whole-map
  vector ops beat many per-tile loop ops.  Gate: `FUSED_V4` here (False).
- `row_seg` — two-segment row chains (4 independent chains + cumprod
  fix-up) for the v2 block megakernel's serial row scans; would hide FMA
  latency but the loops are VPU-issue-bound, so it measured WORSE on
  every stage geometry (stage0 +0.9 ms, stage2 x15 +0.6 ms).  Gate:
  `ROW_SEG` in vss_block_pallas_v2 (False).
"""
