"""One-process A/B: segment-packed LN(+GELU) kernel (`ops/seg_ln.py`) vs
the XLA lowering at the patch-embed / downsample geometries (bs64
two-view: backbone batch 128).  Also times the fused VJP backward vs XLA
autodiff of the composable form.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_seg_ln.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.ops.ablations import seg_ln as SL  # noqa: E402

f32, bf16 = jnp.float32, jnp.bfloat16

CASES = [  # (shape, C, act)
    ((128, 112, 112, 48), 48, True),    # patch-embed norm1 + GELU
    ((128, 56, 56, 96), 96, False),     # patch-embed norm2
    ((128, 28, 28, 192), 192, False),   # downsample 0 norm
]


def xla_ln_act(x, scale, bias, act):
    xf = x.astype(f32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    y = y * scale + bias
    if act:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(x.dtype)


def main():
    for shape, C, act in CASES:
        k = jax.random.key(C)
        x = jax.random.normal(k, shape, bf16)
        scale = jnp.ones((C,), f32)
        bias = jnp.zeros((C,), f32)

        t_xla = chain_time(lambda xx: xla_ln_act(xx, scale, bias, act),
                           [x], k_long=8)
        t_seg = chain_time(
            lambda xx: SL.seg_ln_act(xx, scale, bias, C, 1e-5, act),
            [x], k_long=8)
        print(f"fwd  {shape} C={C} act={act}: xla {t_xla*1e3:6.3f} ms | "
              f"seg {t_seg*1e3:6.3f} ms | {t_xla/t_seg:4.2f}x", flush=True)

        # backward: d/dx sum(ln(x)) — time the full vjp
        def loss_xla(xx):
            return xla_ln_act(xx, scale, bias, act).astype(f32).sum()

        def loss_seg(xx):
            return SL.seg_ln_act(xx, scale, bias, C, 1e-5,
                                 act).astype(f32).sum()

        t_xla_b = chain_time(lambda xx: jax.grad(loss_xla)(xx), [x],
                             k_long=8)
        t_seg_b = chain_time(lambda xx: jax.grad(loss_seg)(xx), [x],
                             k_long=8)
        print(f"grad {shape} C={C} act={act}: xla {t_xla_b*1e3:6.3f} ms | "
              f"seg {t_seg_b*1e3:6.3f} ms | {t_xla_b/t_seg_b:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
