"""A/B: train-path block fwd+bwd with fuse_mlp=True (whole block incl.
MLP in the kernel pair) vs the shipped fuse_mlp=False (ssm half fused,
MLP half composable XLA).

The train path ships fuse_mlp=False on the assumption that the MLP is
pure MXU work XLA runs at roofline; but the composable MLP half still
multi-passes LN2/GELU maps through HBM each way.  Stage-0 is excluded
(adjoint VMEM cannot fit the MLP maps at Lg=3136).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fuse_mlp_train.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from flax import linen as nn  # noqa: E402
from xfmamba_tpu.models.vssm import VSSBlock  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params  # noqa: E402
from xfmamba_tpu.ops import vss_block_v2_adjoint as VA  # noqa: E402
from xfmamba_tpu.ops.vss_block_v2_adjoint import vss_block_train_v2  # noqa: E402
from xfmamba_tpu.models.layers import LN_EPS, gelu  # noqa: E402

bf16 = jnp.bfloat16
f32 = jnp.float32
B = 32

# (H, d, G_nomlp, G_mlp, vmem_mlp)
CASES = [(28, 192, 2, 2, 127), (14, 384, 4, 4, 127), (7, 768, 8, 8, 127)]


def main():
    for (H, d, G0, G1, vm) in CASES:
        L = H * H
        blk = VSSBlock(hidden_dim=d, ssm_d_state=1, ssm_ratio=2.0,
                       ssm_conv_bias=False, forward_type="v05_noz",
                       mlp_ratio=4.0, dtype=bf16)
        x = jax.random.normal(jax.random.key(0), (B, H, H, d), bf16)
        v = blk.init(jax.random.key(1), x)
        p = v["params"]
        xl = x.reshape(B, L, d)
        m = jnp.ones((B, L, 1), f32)
        wy = jax.random.normal(jax.random.key(2), (B, L, d), f32)

        packed0 = pack_vss_block_params(p, bf16, fuse_mlp=False)
        packed1 = pack_vss_block_params(p, bf16, fuse_mlp=True)
        ln2s = p["norm2"]["scale"].astype(f32)
        ln2b = p["norm2"]["bias"].astype(f32)
        fc1k = p["mlp"]["fc1"]["kernel"].astype(bf16)
        fc1b = p["mlp"]["fc1"]["bias"].astype(f32)
        fc2k = p["mlp"]["fc2"]["kernel"].astype(bf16)
        fc2b = p["mlp"]["fc2"]["bias"].astype(f32)

        def arm_nomlp(xx):
            y1 = vss_block_train_v2(H, H, False, False, G0, xx, m, m,
                                    *packed0)
            h = y1.astype(f32)
            mu = h.mean(-1, keepdims=True)
            var = ((h - mu) ** 2).mean(-1, keepdims=True)
            hn = (h - mu) * jax.lax.rsqrt(var + LN_EPS) * ln2s + ln2b
            z = jnp.dot(hn.astype(bf16), fc1k) + fc1b
            z = gelu(z)
            out = jnp.dot(z.astype(bf16), fc2k) + fc2b
            return y1 + out.astype(y1.dtype)

        def arm_mlp(xx):
            return vss_block_train_v2(H, H, False, True, G1, xx, m, m,
                                      *packed1)

        orig_est = VA.bwd_vmem_estimate
        for name, arm in (("nomlp", arm_nomlp), ("mlp", arm_mlp)):
            # the auto estimate does not model the MLP maps: pin the
            # declared limit to 127 for the mlp arm
            VA.__dict__["bwd_vmem_estimate"] = (
                orig_est if name == "nomlp"
                else (lambda L_, d_, di_, G_: 120 * 1024 * 1024))
            VA.vss_block_bwd_call.clear_cache()

            def loss(xx):
                return jnp.sum(arm(xx).astype(f32) * wy)
            try:
                t = chain_time(jax.grad(loss), [xl], k_long=8)
                print(f"{H}x{H} d{d} train-block [{name:5s}]: "
                      f"{t*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"{H}x{H} d{d} [{name}]: FAILED {str(e)[:200]}",
                      flush=True)
        VA.__dict__["bwd_vmem_estimate"] = orig_est


if __name__ == "__main__":
    main()
