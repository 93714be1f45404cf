"""Chained-in-jit timing for the remote-TPU path (see bench.py docstring):
K dependent iterations inside one jit program; per-step = (t_K - t_1)/(K-1).
"""
import time
import jax
import jax.numpy as jnp


def chain_time(fn, args, k_long=8, reps=3, perturb_idx=0):
    """fn(*args) -> array(s). Chains fn k times, each iteration's input
    perturbed by the previous output so XLA cannot elide iterations."""
    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def chained(args, k):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = jnp.tanh(leaf.sum().astype(jnp.float32))
            args = list(args)
            a = args[perturb_idx]
            args[perturb_idx] = jax.tree_util.tree_map(
                lambda leaf: leaf + (s * 1e-12).astype(leaf.dtype), a)
            return (tuple(args), acc + s)
        (_, acc) = jax.lax.fori_loop(0, k, body,
                                     (tuple(args), jnp.zeros((), jnp.float32)))
        return acc

    def once(k):
        t0 = time.perf_counter()
        float(chained(tuple(args), k))
        return time.perf_counter() - t0

    # compile + warm both variants first
    once(1)
    once(k_long)
    # INTERLEAVE the t1/tk reps: the remote-TPU tunnel has multi-second
    # stall windows, and measuring all t1 reps back-to-back lets one stall
    # inflate t1 alone, which fakes a FASTER per-step ((tk - t1)/(k-1)).
    # Round-4 lesson: this produced a phantom 1.49x for BF16_SCRATCH at
    # stage0 (ab_bf16_scratch) that a re-measure could not reproduce.
    t1s, tks = [], []
    for _ in range(reps):
        t1s.append(once(1))
        tks.append(once(k_long))
    return (min(tks) - min(t1s)) / (k_long - 1)
