"""Probe: does the block-level adjoint kernel compile+run at stage-0
geometry (L=3136, d=96, di=192, G=1) with a raised VMEM limit?"""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from xfmamba_tpu.ops.vss_block_v2_adjoint import vss_block_bwd_call

GEOMS = [  # (B, H, W, d, di, G, hd)
    (16, 56, 56, 96, 192, 1, 8),
    (16, 28, 28, 192, 384, 2, 8),
    (16, 14, 14, 384, 768, 4, 8),
    (16, 7, 7, 768, 1536, 8, 8),
]
vmem_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 127

for B, H, W, d, di, G, hd in GEOMS:
    L = H * W
    R = max(d // 16, 1)
    ks = jax.random.split(jax.random.PRNGKey(0), 24)
    x = jax.random.normal(ks[0], (B, L, d), jnp.bfloat16)
    g = jax.random.normal(ks[1], (B, L, d), jnp.bfloat16) * 0.1
    m1 = jnp.ones((B, L, 1), jnp.float32)
    m2 = jnp.ones((B, L, 1), jnp.float32)
    packed = (
        jnp.ones((2, d), jnp.float32),                       # ln1
        jax.random.normal(ks[2], (d, di), jnp.bfloat16) * .1,  # w_in
        jax.random.normal(ks[3], (9, di), jnp.float32) * .1,   # w_conv
        jnp.zeros((1, di), jnp.float32),                     # b_conv
        jax.random.normal(ks[4], (di, 4 * R + 8), jnp.bfloat16) * .1,
        jax.random.normal(ks[5], (4 * R, di), jnp.bfloat16) * .1,
        jnp.zeros((4, di), jnp.float32),                     # b_dt
        -jnp.ones((4, di), jnp.float32),                     # A
        jnp.ones((1, di), jnp.float32),                      # Dsum
        jnp.ones((2, di), jnp.float32),                      # lno
        jax.random.normal(ks[6], (di, d), jnp.bfloat16) * .1,  # w_out
        jnp.ones((2, d), jnp.float32),                       # ln2
        jax.random.normal(ks[7], (d, hd), jnp.bfloat16) * .1,
        jnp.zeros((1, hd), jnp.float32),
        jax.random.normal(ks[8], (hd, d), jnp.bfloat16) * .1,
        jnp.zeros((1, d), jnp.float32),
    )
    try:
        t0 = time.perf_counter()
        outs = vss_block_bwd_call(x, *packed, m1, m2, g, H=H, W=W,
                                  conv_bias=False, fuse_mlp=False,
                                  vmem_mb=vmem_mb, group=G)
        s = float(outs[0].sum())
        print(f"L={L:5d} d={d:4d} G={G}: OK  (compile+run "
              f"{time.perf_counter()-t0:.1f}s, dx.sum={s:.3e})", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"L={L:5d} d={d:4d} G={G}: FAIL {type(e).__name__}: {msg}",
              flush=True)
