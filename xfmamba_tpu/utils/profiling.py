"""Profiling and timing harnesses.

Reference counterparts (SURVEY.md §5): manual `torch.cuda.synchronize()`
wall-clock benches (`vmamba.py:2624-2645`, `csms6s.py:233-245`),
`triton.testing.do_bench`, and the per-image timing stats written to
``inference_timing.txt`` incl. FPS (`2_inference_chexpert.py:233-266`).

TPU-native: ``jax.profiler`` traces (viewable in TensorBoard/XProf/Perfetto)
plus `block_until_ready`-synchronized wall-clock timing.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): run()`` — the
    jax.profiler analogue of nvprof/nsys in the CUDA workflow."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def do_bench(fn: Callable, *args, warmup: int = 2, iters: int = 10,
             **kwargs) -> Dict[str, float]:
    """`triton.testing.do_bench` equivalent: median/mean wall-clock seconds
    of ``fn(*args)`` with device synchronization per call."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "median_s": statistics.median(times),
        "mean_s": statistics.fmean(times),
        "min_s": min(times),
        "max_s": max(times),
        "iters": iters,
    }


def timing_stats(times_s: Sequence[float],
                 batch_size: int = 1) -> Dict[str, float]:
    """Per-call timing statistics incl. FPS, mirroring the fields of
    ``inference_timing.txt`` (`2_inference_chexpert.py:233-266`)."""
    n = len(times_s)
    mean = statistics.fmean(times_s) if n else float("nan")
    return {
        "num_batches": n,
        "batch_size": batch_size,
        "mean_ms": mean * 1e3,
        "std_ms": (statistics.pstdev(times_s) * 1e3 if n > 1 else 0.0),
        "min_ms": min(times_s) * 1e3 if n else float("nan"),
        "max_ms": max(times_s) * 1e3 if n else float("nan"),
        "fps": (batch_size / mean) if n and mean > 0 else float("nan"),
    }


def format_timing_report(stats: Dict[str, float],
                         header: str = "Inference timing") -> str:
    """Human-readable block matching the reference's txt artifact."""
    lines = [header, "=" * len(header)]
    lines.append(f"batches measured : {stats['num_batches']}")
    lines.append(f"batch size       : {stats['batch_size']}")
    lines.append(f"mean time        : {stats['mean_ms']:.3f} ms")
    lines.append(f"std time         : {stats['std_ms']:.3f} ms")
    lines.append(f"min time         : {stats['min_ms']:.3f} ms")
    lines.append(f"max time         : {stats['max_ms']:.3f} ms")
    lines.append(f"throughput (FPS) : {stats['fps']:.2f} images/sec")
    return "\n".join(lines)
