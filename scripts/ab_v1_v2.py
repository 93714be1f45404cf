"""A/B: v1 megakernel (HS scans) vs v2 (interleaved serial scans), per
stage geometry of XFMamba-S, bf16, bs 32 — interleaved in ONE process
(NOTES.md: cross-process timing on the tunnel is too noisy)."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.vssm import VSSBlock  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import (  # noqa: E402
    _vss_block_call, pack_vss_block_params, pick_group)
from xfmamba_tpu.ops.vss_block_pallas_v2 import _vss_block_call_v2  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    B = 32
    dt = jnp.bfloat16
    for name, H, W, d in [("stage0", 56, 56, 96), ("stage1", 28, 28, 192),
                          ("stage2", 14, 14, 384), ("stage3", 7, 7, 768)]:
        blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1,
                       ssm_ratio=2.0, ssm_act="silu", ssm_conv=3,
                       ssm_conv_bias=False, ssm_init="v0",
                       forward_type="v05_noz", mlp_ratio=4.0,
                       mlp_act="gelu", dtype=dt)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, d), dt)
        variables = blk.init(jax.random.PRNGKey(1), x)
        p = variables["params"]
        args = pack_vss_block_params(p, dt, True)
        xl = x.reshape(B, H * W, d)
        di, hd = 2 * d, 4 * d
        g1 = pick_group(B, H, W, d, di, hd, True)
        t1 = chain_time(
            lambda xx: _vss_block_call(xx, *args, H=H, W=W, conv_bias=False,
                                       fuse_mlp=True, group=g1),
            (xl,), k_long=40)
        line = f"{name} ({H}x{W}x{d}): v1(G={g1}) {t1*1e3:7.3f} ms"
        for G in (1, 2, 4, 8):
            if (H * W * G) % 8 or (W * G) % 8 or B % G:
                continue
            try:
                t2 = chain_time(
                    lambda xx, G=G: _vss_block_call_v2(
                        xx, *args, H=H, W=W, conv_bias=False,
                        fuse_mlp=True, group=G),
                    (xl,), k_long=40)
                line += f" | v2 G={G} {t2*1e3:7.3f}"
            except Exception as e:
                line += f" | v2 G={G} FAIL({type(e).__name__})"
        # pre-interleaved (stage-hoisted layout): isolates transpose cost
        from xfmamba_tpu.ops.vss_block_pallas_v2 import _interleave
        for G in ({"stage0": (1, 2), "stage1": (2, 4), "stage2": (4, 8),
                   "stage3": (8,)}[name]):
            if B % G:
                continue
            xi = _interleave(xl, G)
            try:
                t3 = chain_time(
                    lambda xx, G=G: _vss_block_call_v2(
                        xx, *args, H=H, W=W, conv_bias=False,
                        fuse_mlp=True, group=G, interleaved=True),
                    (xi,), k_long=40)
                line += f" | v2i G={G} {t3*1e3:7.3f}"
            except Exception as e:
                line += f" | v2i G={G} FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
