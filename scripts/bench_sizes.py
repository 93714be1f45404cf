"""Per-size throughput + MFU (VERDICT r1 item 8: bench rigor).

Measures tiny/small/base two-view 224² inference at the best batch size
and reports images/s, ms/step, analytic FLOPs/sample (XLA cost_analysis)
and MFU against the v5e bf16 peak.  Paste the table into NOTES.md each
round so perf claims stay auditable.
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.tops import two_view_xfmamba  # noqa: E402

V5E_PEAK_BF16 = 394e12  # 394 TFLOP/s bf16 (v5e published peak)

for size, bs in (("tiny", 64), ("small", 64), ("base", 32)):
    model = two_view_xfmamba(size, outputs=2, dtype=jnp.bfloat16)
    x1 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)

    # analytic FLOPs from XLA's own cost model (composable or fused path —
    # pallas custom-calls carry no flops, so measure on a bs=1 CPU-free
    # trace of the same program; use the XLA count as the lower bound)
    try:
        fwd = jax.jit(lambda a, b: model.apply(v, a, b))
        cost = fwd.lower(x1, x1).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0)) / bs
    except Exception:
        flops = 0.0

    t = chain_time(lambda a, b: model.apply(v, a, b), [x1, x1], k_long=6)
    ips = bs / t
    mfu = (flops * ips) / V5E_PEAK_BF16 if flops else float("nan")
    print(f"{size:6s} bs{bs}: {t*1e3:7.2f} ms/step  {ips:7.1f} img/s  "
          f"{flops/1e9:6.1f} GF/sample  MFU {mfu*100:5.2f}%", flush=True)
