"""Round-5 prep: why does the stage-0 adjoint run at HALF stage-2's
per-element efficiency?  (r4 parts2: 288 vs 149 us/grid-step at equal
per-step element count; stage-0's footprint 117 MB sits against the
127 MB budget.)

Times `vss_block_bwd_call` iso at the stage-0 and stage-2 geometries
(bs16 train batch) across vmem_mb settings.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_stage0_adjoint.py
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
from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params  # noqa: E402
from xfmamba_tpu.ops.vss_block_v2_adjoint import vss_block_bwd_call  # noqa: E402

bf16 = jnp.bfloat16
B = 32  # bs16 two-view backbone batch

CASES = [  # (H, d, G, vmem_mb list)
    (56, 96, 1, (127, 118, 100)),
    (14, 384, 4, (127, 100)),
]


def main():
    for (H, d, G, vmems) in CASES:
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
        for vm in vmems:
            fn = (lambda vm: lambda xx, gg: vss_block_bwd_call(
                xx, *packed, m, m, gg, H=H, W=H, conv_bias=False,
                fuse_mlp=False, group=G, vmem_mb=vm)[0])(vm)
            try:
                t = chain_time(fn, [xl, g], k_long=8)
                print(f"adjoint {H}x{H} d{d} G{G} vmem={vm}: "
                      f"{t*1e3:7.2f} ms ({t/ (B//G) * 1e6:6.1f} us/step)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"adjoint {H}x{H} d{d} G{G} vmem={vm}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
