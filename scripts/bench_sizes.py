"""Per-size throughput + MFU (VERDICT r1 item 8 / r2 item 3: bench rigor).

Measures tiny/small/base two-view 224² inference at the best batch size
and reports images/s, ms/step, analytic FLOPs/sample and MFU against the
v5e bf16 peak.  Paste the table into NOTES.md each round so perf claims
stay auditable.

FLOPs come from XLA's cost model of the COMPOSABLE path, counted in a CPU
subprocess (``--flops-only``): on the TPU platform the fused Pallas
megakernels are opaque zero-flop custom calls AND `lowered.cost_analysis()`
returns None under the axon plugin, so the r2 run printed nonsense
(3.4 GF/sample).  On the CPU backend every dispatcher picks the pure-XLA
path, giving the honest per-sample work estimate of the same math.
"""
import json
import os
import subprocess
import sys

SIZES = (("tiny", 64), ("small", 64), ("base", 32))

if "--flops-only" in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from xfmamba_tpu.models.tops import two_view_xfmamba
    out = {}
    for size, _ in SIZES:
        model = two_view_xfmamba(size, outputs=2, dtype=jnp.bfloat16)
        x1 = jnp.ones((1, 224, 224, 1), jnp.bfloat16)
        v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
        v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
        ca = (jax.jit(lambda a, b: model.apply(v, a, b))
              .lower(x1, x1).cost_analysis())
        out[size] = float(ca.get("flops", 0.0))
    print("FLOPS_JSON " + json.dumps(out))
    sys.exit(0)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.tops import two_view_xfmamba  # noqa: E402

# v5e published peaks: 394 TOP/s int8, ~197 TFLOP/s bf16.  MFU must use
# the bf16 number (VERDICT r2 item 3: the previous 394e12 constant was the
# int8 peak and understated every MFU ~2x).
V5E_PEAK_BF16 = 197e12

env = dict(os.environ, JAX_PLATFORMS="cpu")
proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                       "--flops-only"], env=env, capture_output=True,
                      text=True, timeout=1200)
flops_by_size = {}
for line in proc.stdout.splitlines():
    if line.startswith("FLOPS_JSON "):
        flops_by_size = json.loads(line[len("FLOPS_JSON "):])
if not flops_by_size:
    print(f"# flops subprocess failed:\n{proc.stdout}\n{proc.stderr}",
          file=sys.stderr)

for size, bs in SIZES:
    model = two_view_xfmamba(size, outputs=2, dtype=jnp.bfloat16)
    x1 = jnp.ones((bs, 224, 224, 1), jnp.bfloat16)
    v = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
    flops = flops_by_size.get(size, 0.0)

    t = chain_time(lambda a, b: model.apply(v, a, b), [x1, x1], k_long=6)
    ips = bs / t
    mfu = (flops * ips) / V5E_PEAK_BF16 if flops else float("nan")
    print(f"{size:6s} bs{bs}: {t*1e3:7.2f} ms/step  {ips:7.1f} img/s  "
          f"{flops/1e9:6.1f} GF/sample  MFU {mfu*100:5.2f}%", flush=True)
