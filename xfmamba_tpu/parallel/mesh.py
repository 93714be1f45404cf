"""Device-mesh data parallelism.

The reference is strictly single-GPU (SURVEY.md §2.10: no DDP/NCCL anywhere);
this module is the TPU build's first-class parallel layer: a 1-axis
``Mesh("data")`` with batch-sharded inputs and replicated parameters.  The
gradient all-reduce over ICI is inserted by XLA from the sharding
annotations — the idiomatic `jit` + `NamedSharding` formulation rather than
explicit collectives.

Scaling beyond pure DP (e.g. sharding the channel axis of the scan across a
"model" axis) is a mesh-axis change: the selective scan is batched over
(B, D) rows, so extra axes partition cleanly without rewrites.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: str = "data") -> Dict[str, Any]:
    """Place host arrays batch-sharded across the mesh."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """Wrap a (state, batch, rng, lr) -> (state, metrics) step with mesh
    shardings: state replicated, batch sharded on its leading axis.  XLA
    turns the gradient reduction into a psum over ICI."""
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, bsh, repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(eval_step, mesh: Mesh, axis: str = "data"):
    """Wrap a ``(state, batch) -> {"loss": scalar, "logits": (B, ...)}`` eval
    step for the mesh with ``shard_map``: state replicated, batch split on
    its leading axis.

    Like :func:`make_parallel_infer`, shard_map (not GSPMD jit) is mandatory
    here: the fused Pallas inference kernels are not auto-partitioned under
    a GSPMD mesh, so this wrapper is what fences the sharded-eval footgun
    for the training driver's validation passes.  Per-shard losses are
    ``pmean``-combined (equal shard sizes by construction — the driver
    enforces batch-size divisibility), logits stay batch-sharded."""
    def per_shard(state, batch):
        out = eval_step(state, batch)
        # mean of per-shard means == global mean at equal shard sizes
        loss = jax.lax.pmean(out["loss"], axis)
        return {"loss": loss, "logits": out["logits"]}

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs={"loss": P(), "logits": P(axis)},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_infer(infer_fn, mesh: Mesh, axis: str = "data"):
    """Wrap an inference fn ``(params_pytree, batch_pytree) -> outputs``
    (every output leaf batch-leading) for the mesh with ``shard_map``:
    params replicated, batch split on its leading axis.

    Unlike the GSPMD train-step formulation, shard_map hands each device
    its *local* batch shard, so the fused Pallas inference kernels
    (`ops/vss_block_pallas.py`) run per-shard instead of degrading to a
    replicated custom call — this is the supported way to run fused
    inference on a multi-chip mesh.  Losses/metrics are host-side
    reductions over the gathered outputs (matching the single-device
    driver)."""
    sharded = jax.shard_map(
        infer_fn, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)
