"""FLOPs / parameter counting.

Reference counterparts:
- ``flops_selective_scan_fn`` analytic formula
  (`/root/reference/models/csms6s.py:139-219`): 9·B·L·D·N for the scan
  einsums (+ B·D·L for the D skip, + B·D·L for the z gate).
- ``VSSM.flops()`` with a custom selective-scan handler over fvcore
  (`vmamba.py:2309-2330`, `2_inference_mura.py:123-131` ``--cal_flops``).

TPU-native replacement for the fvcore jit-trace path: XLA's own cost model
via ``jax.jit(fn).lower(*args).compile().cost_analysis()`` — the compiler
counts every fused op, including the scan, with no per-op handlers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np


def flops_selective_scan_fn(B: int = 1, L: int = 256, D: int = 768,
                            N: int = 16, with_D: bool = True,
                            with_Z: bool = False,
                            with_complex: bool = False) -> int:
    """Analytic selective-scan FLOPs (`csms6s.py:155-159`):
    9·B·L·D·N core recurrence/einsums, + B·D·L for the D skip and the same
    for the z gate."""
    assert not with_complex, "complex SSM not supported (nor in reference)"
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_Z:
        flops += B * D * L
    return flops


def flops_ssd_chunk_scan(B: int, L: int, H: int, P: int, N: int,
                         chunk: int) -> int:
    """Analytic chunked-SSD FLOPs: intra-chunk quadratic term 2·B·L·chunk·H·
    (N+P) + state build/emit 2·B·L·H·N·P each + O(nc²) state passing."""
    nc = max(L // max(chunk, 1), 1)
    intra = 2 * B * L * chunk * H * (N + P)
    states = 4 * B * L * H * N * P
    passing = 2 * B * H * (nc + 1) ** 2 * P * N
    return intra + states + passing


def count_params(tree) -> int:
    """Total parameter count of a pytree."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "shape")))


def xla_cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes accessed,
    transcendentals...).  The TPU-native `fvcore.FlopCountAnalysis`."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(ca) if ca else {}


def model_flops(model, variables, *example_inputs) -> Dict[str, float]:
    """FLOPs/memory of one ``model.apply`` forward (the ``--cal_flops``
    equivalent, `2_inference_mura.py:123-131`).  Returns a dict with
    ``flops`` (per program, i.e. per batch), ``bytes accessed``, and
    ``params``."""
    def fwd(*xs):
        return model.apply(variables, *xs)

    ca = xla_cost_analysis(fwd, *example_inputs)
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "params": count_params(variables.get("params", variables)),
    }
