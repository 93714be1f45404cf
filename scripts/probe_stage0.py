import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.ops.selective_scan_pallas import (
    _core_pallas_fwd_impl, fused_cross_scan)

B, N = 32, 1
hw, D = 56, 192
L = hw * hw
key = jax.random.key(0)
u2 = jax.random.normal(key, (B, 2, L, D), jnp.bfloat16)
dts4 = jax.random.normal(key, (B, 4, L, D), jnp.bfloat16)
Bs4 = jax.random.normal(key, (B, 4, L, N), jnp.bfloat16)
Cs4 = jax.random.normal(key, (B, 4, L, N), jnp.bfloat16)
A = -jnp.ones((4, D, N), jnp.float32)
Dk = jnp.ones((4, D), jnp.float32)
bias = jnp.zeros((4, D), jnp.float32)

for chunk in (256, 512, 784, 1024):
    try:
        t = chain_time(lambda *a: fused_cross_scan(*a, chunk=chunk),
                       [u2, dts4, Bs4, Cs4, A, Dk, bias])
        import math
        steps = B * 2 * ((L + chunk - 1) // chunk)
        print(f"kernel-only chunk={chunk}: {t*1e3:7.3f} ms "
              f"({t/steps*1e6:4.1f} us/step, {steps} steps)")
    except Exception as e:
        print(f"chunk={chunk}: FAIL {str(e)[:120]}")

# prep alone: the stacking/transposing into kernel layout
x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
dts_hw = jax.random.normal(key, (B, hw, hw, 4, D), jnp.bfloat16)
Bs_hw = jax.random.normal(key, (B, hw, hw, 4, N), jnp.bfloat16)
Cs_hw = jax.random.normal(key, (B, hw, hw, 4, N), jnp.bfloat16)


def prep(x, dts, Bs, Cs):
    B_, H, W, D_ = x.shape
    L_ = H * W
    xt = jnp.swapaxes(x, 1, 2)
    u2 = jnp.stack([x.reshape(B_, L_, D_), xt.reshape(B_, L_, D_)], axis=1)

    def karr(t, k, transposed):
        v = t[..., k, :]
        if transposed:
            v = jnp.swapaxes(v, 1, 2)
        return v.reshape(B_, L_, t.shape[-1])

    dts4 = jnp.stack([karr(dts, 0, False), karr(dts, 1, True),
                      karr(dts, 2, False), karr(dts, 3, True)], axis=1)
    Bs4 = jnp.stack([karr(Bs, 0, False), karr(Bs, 1, True),
                     karr(Bs, 2, False), karr(Bs, 3, True)], axis=1)
    Cs4 = jnp.stack([karr(Cs, 0, False), karr(Cs, 1, True),
                     karr(Cs, 2, False), karr(Cs, 3, True)], axis=1)
    return u2, dts4, Bs4, Cs4


t = chain_time(prep, [x, dts_hw, Bs_hw, Cs_hw])
print(f"prep alone: {t*1e3:.3f} ms")
t = chain_time(lambda *a: _core_pallas_fwd_impl(*a, chunk=512),
               [x, dts_hw, Bs_hw, Cs_hw, A, Dk, bias])
print(f"full core chunk=512: {t*1e3:.3f} ms")
