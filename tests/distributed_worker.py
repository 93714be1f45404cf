"""Worker for the real 2-process distributed test (tests/test_distributed.py).

Each process owns 4 virtual CPU devices (8 global), initializes
`jax.distributed` against a localhost coordinator, assembles ITS half of a
deterministic global batch through the non-degenerate
`host_local_batch_to_global` branch, and runs two sharded train steps of
the smoke-geometry XFMamba topology.  Prints ``WORKER_LOSS <l0> <l1>`` for
the parent to compare across processes and against the single-process run.

The reference has no distributed layer (SURVEY.md §2.10); this exercises
the TPU build's multi-host obligation end-to-end: coordinator bootstrap,
global mesh over non-addressable devices, `make_array_from_process_local_data`
batch assembly, and the psum the GSPMD train step inserts across processes
(Gloo collectives on the CPU backend).

Run: ``python tests/distributed_worker.py <process_id> <port>``
(XLA_FLAGS must carry ``--xla_force_host_platform_device_count=4``).
"""

import functools
import os
import sys


def _setup_platform(n_local: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_global_batch(global_batch: int, img: int = 32):
    """Deterministic global batch every process can reconstruct."""
    import numpy as np
    rng = np.random.default_rng(0)
    return {
        "image1": rng.normal(size=(global_batch, img, img, 1)).astype(
            np.float32),
        "image2": rng.normal(size=(global_batch, img, img, 1)).astype(
            np.float32),
        "label": (np.arange(global_batch) % 2).astype(np.int32),
    }


def run_two_steps(mesh, batch_global):
    """Init the smoke-geometry model replicated over ``mesh`` and run two
    sharded train steps on an already-globally-sharded batch.  Returns the
    two scalar losses (replicated, so addressable from every process)."""
    import jax
    import jax.numpy as jnp

    from xfmamba_tpu.models.tops import TwoViewXFMamba
    from xfmamba_tpu.parallel.mesh import (
        make_parallel_train_step, replicated)
    from xfmamba_tpu.train.config import TrainConfig
    from xfmamba_tpu.train.loop import (
        TrainState, make_optimizer, make_train_step)

    cfg = TrainConfig(lr=1e-3)
    model = TwoViewXFMamba(outputs=2, model_type="tiny", hidden_dim=128,
                           d_state=4,
                           backbone_overrides=dict(depths=(1, 1, 1, 1),
                                                   dims=16))
    optimizer = make_optimizer(cfg)

    # Initialize INSIDE jit with replicated out_shardings: every process
    # computes the same program over the global mesh, so the params exist
    # as one logical replicated array without any host-side device_put of
    # process-local data.
    @functools.partial(jax.jit,
                       out_shardings=replicated(mesh))
    def init_state(x1, x2):
        variables = model.init(jax.random.key(0), x1, x2)
        params = variables["params"]
        return TrainState(step=0, params=params,
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=optimizer.init(params))

    state = init_state(batch_global["image1"], batch_global["image2"])

    train_step, _ = make_train_step(model, optimizer, multilabel=False,
                                    two_view=True, jit_compile=False)
    pstep = make_parallel_train_step(train_step, mesh)

    lr = jnp.asarray(cfg.lr, jnp.float32)
    state, m0 = pstep(state, batch_global, jax.random.key(1), lr)
    state, m1 = pstep(state, batch_global, jax.random.key(2), lr)
    return float(m0["loss"]), float(m1["loss"])


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    _setup_platform(n_local=4)

    import jax
    from xfmamba_tpu.parallel.distributed import (
        ensure_initialized, host_local_batch_to_global, is_primary,
        make_global_mesh, process_batch_slice)

    ensure_initialized(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8
    assert is_primary() == (process_id == 0)

    mesh = make_global_mesh()
    global_batch = 8
    full = make_global_batch(global_batch)
    sl = process_batch_slice(global_batch)
    local = {k: v[sl] for k, v in full.items()}
    batch = host_local_batch_to_global(local, mesh)
    # global logical shape restored from per-process halves
    assert batch["image1"].shape[0] == global_batch

    l0, l1 = run_two_steps(mesh, batch)
    print(f"WORKER_LOSS {l0:.10f} {l1:.10f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
