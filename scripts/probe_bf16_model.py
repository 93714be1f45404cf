"""Settle the bf16-scratch model-vs-iso discrepancy (round 4): iso stage0
measured 1.49x with bf16 scratch, but the whole model shows no gain.

One process.  Measures, in order:
  1. model bs64, auto policy (stage0/3 bf16)  vs  forced all-f32
  2. backbone-only 2B pass, both ways
  3. stage0 kernel iso with the REAL inited model's stage0 params and the
     model's own pick_group_v2 choice, both ways
All with real random-inited weights (ab_bf16_scratch used zeros for the
model phase — ruled out here too).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bf16_model.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.tops import two_view_xfmamba  # noqa: E402
from xfmamba_tpu.models.vssm import VSSM  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

bf16 = jnp.bfloat16
BS = 64
B = 2 * BS


def main():
    model = two_view_xfmamba("small", outputs=2, dtype=bf16)
    x1 = jnp.ones((BS, 224, 224, 1), bf16)
    x2 = jnp.ones((BS, 224, 224, 1), bf16)
    variables = model.init(jax.random.key(0), x1, x2)

    # what group does the model's stage path pick at stage0?
    g2 = V.pick_group_v2(B, 56, 56, 96, 192, 384, True,
                         budget_bytes=V._VMEM_BUDGET_V2
                         - 2 * (2 * 96 * 192 + 2 * 96 * 384
                                + 3 * 192 * 192 // 4) * 2)
    print(f"model stage0 pick_group_v2 -> G={g2}", flush=True)

    for flag in (None, False):
        V.BF16_SCRATCH = flag
        t = chain_time(lambda a, b: model.apply(variables, a, b),
                       [x1, x2], k_long=8)
        print(f"model bs{BS} BF16_SCRATCH={flag}: {t*1e3:.2f} ms "
              f"({BS/t:.1f} img/s)", flush=True)

    # backbone-only
    bb = VSSM(depths=(2, 2, 15, 2), dims=96, drop_path_rate=0.3,
              ssm_d_state=1, ssm_dt_rank="auto", ssm_act="silu", ssm_conv=3,
              ssm_conv_bias=False, ssm_drop_rate=0.0, ssm_init="v0",
              forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
              mlp_drop_rate=0.0, gmlp=False, patch_norm=True,
              downsample_version="v3", patchembed_version="v2",
              posembed=False, out_indices=(3,), dtype=bf16)
    xb = jnp.ones((B, 224, 224, 3), bf16)
    vb = bb.init(jax.random.key(0), xb)

    for flag in (None, False):
        V.BF16_SCRATCH = flag
        t = chain_time(lambda a: bb.apply(vb, a)[0], [xb], k_long=8)
        print(f"backbone 2B={B} BF16_SCRATCH={flag}: {t*1e3:.2f} ms",
              flush=True)

    # stage0 kernel iso with the REAL model's stage0 params
    p = vb["params"]
    ps = [p["stage0_block0"], p["stage0_block1"]]
    packed = V.pack_vss_stage_params(ps, bf16, True, fold_ln=True)
    xs = jax.random.normal(jax.random.key(1), (B, 56 * 56, 96),
                           jnp.float32).astype(bf16)
    for G in ([g2] if g2 not in (None, 1) else [1]):
        for flag in (True, False):
            fn = (lambda flag, G: lambda *a: V._vss_stage_call_v2(
                *a, H=56, W=56, conv_bias=False, fuse_mlp=True, group=G,
                fold_ln=True, bf16_scratch=flag))(flag, G)
            t = chain_time(fn, [xs] + list(packed), k_long=8)
            print(f"stage0 iso G={G} bf16_scratch={flag}: {t*1e3:.2f} ms",
                  flush=True)
    V.BF16_SCRATCH = None


if __name__ == "__main__":
    main()
