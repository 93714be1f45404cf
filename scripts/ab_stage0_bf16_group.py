"""One-process A/B: stage0/stage3 interleave group G under BF16_SCRATCH.

The bf16 scratch halves the per-map VMEM footprint, which may flip the
group-size tradeoff measured at f32 (stage0 G=1 won at f32 because bigger
G added VMEM pressure without cutting the G-invariant dynamic-slice count;
with half the traffic per map the balance can move).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_stage0_bf16_group.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from ab_bf16_scratch import stage_args  # noqa: E402
from xfmamba_tpu.ops import vss_block_pallas_v2 as V  # noqa: E402

CASES = [  # (H, W, d, depth, groups to try)
    (56, 56, 96, 2, (1, 2)),
    (7, 7, 768, 2, (8,)),  # 8 is the only alignment-valid choice; rerun
]


def main():
    for i, (H, W, d, depth, gs) in enumerate(CASES):
        args = stage_args(H, W, d, depth, jax.random.key(i))
        for G in gs:
            if (H * W * G) % 8 or (W * G) % 8:
                continue
            fn = (lambda G: lambda *a: V._vss_stage_call_v2(
                *a, H=H, W=W, conv_bias=False, fuse_mlp=True, group=G,
                fold_ln=True, bf16_scratch=True))(G)
            t = chain_time(fn, args, k_long=8)
            print(f"stage ({H}x{W} d{d} x{depth}) G={G} bf16_scratch: "
                  f"{t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
