"""Multi-host plumbing tests (single-process degenerate forms + the
per-process data-sharding contract) on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.parallel.distributed import (
    ensure_initialized, host_local_batch_to_global, is_primary,
    make_global_mesh, process_batch_slice)


def test_ensure_initialized_single_process_noop():
    ensure_initialized()  # no coordinator configured -> must not raise
    assert jax.process_count() == 1
    assert is_primary()


def test_global_mesh_and_batch_sharding():
    mesh = make_global_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    batch = {"image1": np.ones((8, 4, 4, 1), np.float32),
             "label": np.arange(8, dtype=np.int32)}
    dev = host_local_batch_to_global(batch, mesh)
    assert dev["image1"].shape == (8, 4, 4, 1)
    # batch axis split over the mesh: each device holds 1 sample
    assert len(dev["label"].addressable_shards) == 8
    assert dev["label"].addressable_shards[0].data.shape == (1,)
    np.testing.assert_array_equal(np.asarray(dev["label"]), batch["label"])


def test_process_batch_slice_single_process():
    assert process_batch_slice(16) == slice(0, 16)


def test_loader_process_slice():
    """Each 'host' slice of every global batch: same shuffle order, disjoint
    local shards covering the batch."""
    samples = [(i, i, i % 2) for i in range(32)]
    load = lambda s: (np.full((4, 4, 1), s[0], np.float32),
                      np.full((4, 4, 1), s[1], np.float32), np.int32(s[2]))
    mk = lambda: TwoViewLoader(TwoViewSamples(samples, load), batch_size=8,
                               shuffle=True, drop_last=True, num_workers=1,
                               seed=7)
    full, l0, l1 = mk(), mk(), mk()
    l0.process_slice = slice(0, 4)
    l1.process_slice = slice(4, 8)
    got_full = [b for b in full]
    got0 = [b for b in l0]
    got1 = [b for b in l1]
    assert len(got_full) == len(got0) == len(got1) == 4
    for bf, b0, b1 in zip(got_full, got0, got1):
        assert b0["image1"].shape[0] == 4 and b1["image1"].shape[0] == 4
        np.testing.assert_array_equal(
            np.concatenate([b0["image1"], b1["image1"]]), bf["image1"])
        np.testing.assert_array_equal(
            np.concatenate([b0["label"], b1["label"]]), bf["label"])
