"""Multi-host (multi-process) distributed setup.

The reference has no distributed layer at all (SURVEY.md §2.10: zero hits
for NCCL/MPI/DDP anywhere); this module is the TPU build's obligation for
BASELINE config 5 (multi-chip training sweeps beyond one host): a thin,
idempotent wrapper around ``jax.distributed.initialize`` plus the two
helpers every multi-host data-parallel loop needs —

* a *global* mesh spanning every process's devices, and
* per-host batch assembly (`host_local_batch_to_global`) that turns each
  process's local shard into one globally-sharded `jax.Array` without any
  cross-host transfer (the idiomatic
  `jax.make_array_from_process_local_data` pattern).

Collectives ride ICI within a slice and DCN across slices — XLA inserts
them from the sharding annotations; there is nothing NCCL-like to manage.

Single-process environments (tests, the one-chip bench box) work untouched:
``ensure_initialized`` is a no-op unless a coordinator is configured, and
every helper degrades to the local-mesh behavior of `parallel.mesh`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """Initialize `jax.distributed` exactly once.

    Explicit arguments win; otherwise the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or a TPU-pod metadata server that `initialize()` auto-detects) are
    used.  With no configuration at all this is a no-op, keeping
    single-process runs (tests, one-chip benches) untouched.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return  # single process, nothing to do
    # NOTE: nothing before this point may touch the backend —
    # `jax.process_count()`/`jax.devices()` initialize XLA, after which
    # `jax.distributed.initialize` hard-fails (bug found by the real
    # 2-process test: the old guard called process_count() first).
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # a launcher (e.g. a pod runtime) already initialized it — fine
        if "once" not in str(e) and "already" not in str(e):
            raise
    _initialized = True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def make_global_mesh(axis: str = "data") -> Mesh:
    """1-axis mesh over every device of every process (ICI+DCN)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_batch_slice(global_batch_size: int) -> slice:
    """The half-open index range of the global batch this process loads.

    Per-host data sharding: each process reads only its slice of the
    dataset order, so the input pipeline scales with hosts instead of
    replicating reads."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def host_local_batch_to_global(batch: Dict[str, Any], mesh: Mesh,
                               axis: str = "data") -> Dict[str, Any]:
    """Assemble each process's local arrays into globally-sharded
    `jax.Array`s (batch axis split over the whole mesh).

    Each process passes only ITS slice of the global batch (see
    `process_batch_slice`); no host ever materializes the full batch."""
    sharding = NamedSharding(mesh, P(axis))

    def to_global(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return {k: to_global(v) for k, v in batch.items()}
