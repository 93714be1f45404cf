import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


B, N = 32, 1
for hw, d_model in [(56, 96), (14, 384)]:
    D = 2 * d_model
    R = max(1, (d_model + 15) // 16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, hw, hw, D), jnp.bfloat16)
    xw = jax.random.normal(key, (4, R + 2 * N, D), jnp.bfloat16) * 0.02
    dw = jax.random.normal(key, (4, D, R), jnp.bfloat16) * 0.02

    e1 = jax.jit(lambda x: jnp.einsum("bhwd,kcd->bhwkc", x, xw))
    t1 = timeit(e1, x)
    xdbl = jax.block_until_ready(e1(x))
    dts_in = xdbl[..., :R]
    e2 = jax.jit(lambda d: jnp.einsum("bhwkr,kdr->bhwkd", d, dw))
    t2 = timeit(e2, dts_in)

    # matmul-form alternative: one (BL, D) @ (D, K*(R+2N))
    w_flat = jnp.transpose(xw, (2, 0, 1)).reshape(D, -1)
    m1 = jax.jit(lambda x: (x.reshape(-1, D) @ w_flat)
                 .reshape(B, hw, hw, 4, R + 2 * N))
    t3 = timeit(m1, x)

    # collapsed dt: M_k = dw_k @ xw_k[:R]  -> x @ M^T directly
    M = jnp.einsum("kdr,krc->kdc", dw, xw[:, :R])   # (4, D, D)
    M_flat = jnp.transpose(M, (2, 0, 1)).reshape(D, 4 * D)
    m2 = jax.jit(lambda x: (x.reshape(-1, D) @ M_flat)
                 .reshape(B, hw, hw, 4, D))
    t4 = timeit(m2, x)
    print(f"{hw}x{hw} D={D} R={R}: einsum1={t1*1e3:.3f} einsum2={t2*1e3:.3f} "
          f"matmul1={t3*1e3:.3f} collapsed_dt={t4*1e3:.3f} ms")
