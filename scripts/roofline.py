"""Per-stage VPU+MXU roofline-SUM table for the XFMamba-S inference path
(VERDICT r3 #1): settle whether the 5x north-star (~2,000 img/s bs64) is
reachable, with numbers.

Method (all in ONE process — cross-process tunnel noise is +/-15%):
  1. Microbench the VPU issue floors on this chip at kernel-realistic
     geometry: dependent whole-map FMA chains (t_simple per element-op)
     and dependent exp chains (t_trans per element-transcendental).
  2. Measure the MXU dot rate in-kernel (dependent dot chain).
  3. For each backbone stage at bs64 two-view (backbone B=128) measure
     the stage-stacked megakernel total, then re-measure with every
     `jax.lax.dot`/`dot_general` issued twice (CSE-defeated) — the delta,
     minus the probe's own whole-map overhead, is the marginal MXU time
     (co-issue is dead: scheduler overlap would show up here).
  4. VPU time = total - MXU.  Floors: MXU_floor = analytic dot FLOPs at
     the measured in-kernel MXU rate (incl. tile padding); VPU_floor =
     enumerated whole-map op counts x measured issue rates.
  5. Ceiling img/s = bs64 / (sum of stage floors + measured fusion+glue).

Op-count enumeration (from ops/vss_block_pallas_v2._block_body, fold_ln
inference path; E = Lg*di elements, Ed = Lg*d = E/2):
  - LN x2 (fold: moments on MXU): sub+mul            ~ 2.0 E + 1.0 Ed
  - in_proj bias add                                  ~ 1 E
  - dwconv 3x3 (2 shifts + 2 masks + 15 row FMAs
    + 2 col shifts + 2 adds)                          ~ 21 E
  - SiLU mul (+1 trans)                               ~ 1 E
  - y_acc init u*Dsum                                 ~ 1 E
  - 4 directions x (softplus add/select ~2, a mul 1,
    b 2 muls, scratch writes 2, scan FMA 2 + scan
    load/store ~2, y_acc += C*h 2)                    ~ 44 E
  - out bias + residual + MLP bias/residual           ~ 1 E + 4 Ed
  - GELU muls on hidden (2E)                          ~ 4 E
  simple total ~ 79 E + 5 Ed  => N_SIMPLE = 81.5 (in E units)
  transcendentals: SiLU 1 + 4x(softplus 2 + exp 1) + GELU 1 on 2E = 2
                   => N_TRANS = 15 (in E units)
These coefficients reproduce NOTES' empirical stage-2 decomposition
(scans 5.9 + softplus 3.2 + LN 2.2 + GELU/SiLU/shifts 2.6 ms of 21.9).
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16
BS = 64                      # two-view samples; backbone batch = 128
B = 2 * BS
N_SIMPLE = 81.5              # whole-map element-ops per block, in E units
N_TRANS = 15.0               # element-transcendentals per block, in E units

# XFMamba-S stage geometry: (H, W, d, depth, G) ; di = 2d, R = d/16
STAGES = [
    (56, 56, 96, 2, 1),
    (28, 28, 192, 2, 4),
    (14, 14, 384, 15, 4),
    (7, 7, 768, 2, 8),
]


# ---------------------------------------------------------------- microbench
def _chain_kernel(n_ops, trans, x_ref, y_ref):
    x = x_ref[...]
    for i in range(n_ops):
        if trans:
            x = jnp.exp(x * -0.9997)
        else:
            x = x * 1.0001 + 0.3
    y_ref[...] = x


def vpu_rate(rows, cols, trans, n_ops=48):
    """Seconds per element-op for a dependent whole-map chain."""
    shape = (rows, cols)
    x = jnp.full(shape, 0.5, f32)

    def run(n):
        fn = pl.pallas_call(
            functools.partial(_chain_kernel, n, trans),
            out_shape=jax.ShapeDtypeStruct(shape, f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return chain_time(lambda a: fn(a), [x], k_long=8)

    t_long, t_short = run(n_ops), run(n_ops // 4)
    per_op = (t_long - t_short) / (n_ops - n_ops // 4)
    return per_op / (rows * cols)


def mxu_rate():
    """Seconds per MACC via a dependent in-kernel bf16 dot chain
    (1024x1024x1024, f32 accум) — the same ~78% MFU measurement as r3."""
    n = 1024
    a = jnp.full((n, n), 0.01, bf16)
    w = jnp.full((n, n), 0.01, bf16)

    def kern(k_dots, a_ref, w_ref, y_ref):
        x = a_ref[...]
        for _ in range(k_dots):
            x = jax.lax.dot(x, w_ref[...],
                            preferred_element_type=f32).astype(bf16)
        y_ref[...] = x.astype(f32)

    def run(k):
        fn = pl.pallas_call(
            functools.partial(kern, k),
            out_shape=jax.ShapeDtypeStruct((n, n), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return chain_time(lambda x_: fn(x_, w), [a], k_long=8)

    t8, t2 = run(8), run(2)
    per_dot = (t8 - t2) / 6
    return per_dot / (n ** 3)


# ------------------------------------------------------------- stage timing
def stage_args(H, W, d, depth, key):
    """Real VSSBlock params packed with fold_ln=True (the production
    inference layout of the bf16 model path)."""
    from xfmamba_tpu.models.vssm import VSSBlock
    from xfmamba_tpu.ops.vss_block_pallas_v2 import pack_vss_stage_params

    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1,
                   ssm_ratio=2.0, ssm_act="silu", ssm_conv=3,
                   ssm_conv_bias=False, ssm_init="v0",
                   forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
                   dtype=bf16)
    k1, k2 = jax.random.split(key)
    x1 = jnp.zeros((1, H, W, d), bf16)
    ps = [blk.init(jax.random.fold_in(k1, j), x1)["params"]
          for j in range(depth)]
    packed = pack_vss_stage_params(ps, bf16, True, fold_ln=True)
    x = jax.random.normal(k2, (B, H * W, d), f32).astype(bf16)
    return [x] + list(packed)


def t_stage(args, H, W, G):
    # clear so the dots-doubled monkeypatch (trace-time) takes effect
    V._vss_stage_call_v2.clear_cache()
    return chain_time(
        lambda *a: V._vss_stage_call_v2(
            *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G,
            fold_ln=True),
        args, k_long=8)


ORIG_DOT, ORIG_DG = jax.lax.dot, jax.lax.dot_general


def _dots_doubled():
    one = 1.0 + 2.0 ** -20

    def dot2(a, b, **kw):
        return (ORIG_DOT(a, b, **kw) + ORIG_DOT(a * one, b, **kw)) * 0.5

    def dg2(a, b, dimension_numbers, **kw):
        return (ORIG_DG(a, b, dimension_numbers, **kw)
                + ORIG_DG(a * one, b, dimension_numbers, **kw)) * 0.5

    jax.lax.dot, jax.lax.dot_general = dot2, dg2


def _dots_restore():
    jax.lax.dot, jax.lax.dot_general = ORIG_DOT, ORIG_DG


def pad128(n):
    return ((n + 127) // 128) * 128


def dot_maccs(L, d, depth, padded):
    """Per-stage MACC count of every MXU dot in the fold_ln block body
    (in_proj, x_proj, 4 dt dots, out_proj, fc1, fc2, LN-moment dots)."""
    di, R, hd = 2 * d, max(1, d // 16), 4 * d
    p = pad128 if padded else (lambda v: v)
    # LN moments: 3 LNs x 2 dots against a ones column (contraction over
    # rows): L*di-ish work each — small; count as 3*2*L*max(d,di) macc.
    per_block = (L * p(d) * p(di)              # in_proj
                 + L * p(di) * p(4 * R + 8)    # x_proj
                 + 4 * L * p(R) * p(di)        # dt projections
                 + L * p(di) * p(d)            # out_proj
                 + L * p(d) * p(hd)            # fc1
                 + L * p(hd) * p(d)            # fc2
                 + 3 * 2 * L * p(di))          # LN moment dots
    return depth * per_block


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    t_simple = vpu_rate(3136, 192, trans=False)
    t_trans = vpu_rate(3136, 192, trans=True)
    t_macc = mxu_rate()
    mxu_tf = 2.0 / t_macc / 1e12
    print(f"VPU simple: {t_simple*1e12:.3f} ps/elem-op | "
          f"VPU trans: {t_trans*1e12:.3f} ps/elem | "
          f"MXU: {mxu_tf:.1f} TF/s ({mxu_tf/197*100:.0f}% of peak)",
          flush=True)

    rows = []
    total_meas = total_floor = 0.0
    for i, (H, W, d, depth, G) in enumerate(STAGES):
        L = H * W
        di = 2 * d
        E = L * G * di / G  # per image: L*di elements; B images
        E_total = B * L * di * depth
        args = stage_args(H, W, d, depth, jax.random.key(i))
        base = t_stage(args, H, W, G)
        _dots_doubled()
        try:
            dbl = t_stage(args, H, W, G)
        finally:
            _dots_restore()
        # probe overhead: per dot, one whole-map mul on the a operand,
        # one add + one mul(0.5) on the output map
        n_dots_elems = 0
        R = max(1, d // 16)
        hd = 4 * d
        for (m, k, n) in [(L, d, di), (L, di, 4 * R + 8)] \
                + [(L, R, di)] * 4 + [(L, di, d), (L, d, hd), (L, hd, d)]:
            n_dots_elems += (m * k) + 2 * (m * n)
        n_dots_elems *= B * depth
        overhead = n_dots_elems * t_simple
        mxu_meas = max(dbl - base - overhead, 0.0)
        vpu_meas = base - mxu_meas
        mxu_floor = dot_maccs(L, d, depth, padded=True) * B * t_macc
        vpu_floor = E_total * (N_SIMPLE * t_simple + N_TRANS * t_trans)
        floor = mxu_floor + vpu_floor
        rows.append(dict(stage=i, H=H, W=W, d=d, depth=depth, G=G,
                         total_ms=base * 1e3, mxu_ms=mxu_meas * 1e3,
                         vpu_ms=vpu_meas * 1e3,
                         mxu_floor_ms=mxu_floor * 1e3,
                         vpu_floor_ms=vpu_floor * 1e3,
                         floor_ms=floor * 1e3,
                         ratio=base / floor))
        total_meas += base
        total_floor += floor
        print(f"stage{i} ({H}x{W} d{d} x{depth} G{G}): total "
              f"{base*1e3:7.2f} ms = MXU {mxu_meas*1e3:6.2f} + VPU "
              f"{vpu_meas*1e3:6.2f} | floor {floor*1e3:6.2f} "
              f"(MXU {mxu_floor*1e3:5.2f} + VPU {vpu_floor*1e3:6.2f}) | "
              f"ratio {base/floor:5.2f}", flush=True)

    # fusion + glue: whole model minus the four backbone stages
    from xfmamba_tpu.models.tops import two_view_xfmamba
    model = two_view_xfmamba("small", outputs=2, dtype=bf16)
    x1 = jnp.ones((BS, 224, 224, 1), bf16)
    x2 = jnp.ones((BS, 224, 224, 1), bf16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x2)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    t_model = chain_time(
        lambda a, b: model.apply(variables, a, b), [x1, x2], k_long=6)
    glue = t_model - total_meas
    ceiling = BS / (total_floor + glue)
    now = BS / t_model
    print(f"\nmodel bs{BS}: {t_model*1e3:.2f} ms ({now:.1f} img/s); "
          f"stages {total_meas*1e3:.2f} ms; fusion+glue {glue*1e3:.2f} ms",
          flush=True)
    print(f"CEILING (stage floors + today's glue): {ceiling:.0f} img/s "
          f"({ceiling/400:.2f}x of the 400 img/s A100 baseline; "
          f"5x target = 2000)", flush=True)
    out = dict(device=str(dev), bs=BS,
               vpu_ps_per_elem_op=t_simple * 1e12,
               vpu_ps_per_elem_trans=t_trans * 1e12,
               mxu_tf=mxu_tf, stages=rows, model_ms=t_model * 1e3,
               glue_ms=glue * 1e3, img_per_s_now=now,
               ceiling_img_per_s=ceiling)
    with open("/root/repo/scripts/roofline_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote scripts/roofline_out.json", flush=True)


if __name__ == "__main__":
    main()
