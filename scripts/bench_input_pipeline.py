"""End-to-end input-pipeline bench (VERDICT r3 #5): synthetic image files
on disk -> threaded host decode + u8 staging -> device preprocessing ->
XFMamba-S two-view forward -> logits.

Proves the host pipeline can feed the chip at/above its device-only rate
(BENCH_r* ~1,100+ img/s bs64).  Reference being replaced: torchvision
transforms (`dataset_mura_twoview.py:808-816`) + DataLoader workers.

Stages reported:
  loader-only   : decode+stage u8 throughput, no device work
  e2e inference : loader -> H2D (u8, 4x fewer bytes) -> jit(preprocess +
                  forward), async dispatch so host decode overlaps device
                  compute; one scalar sync at the end

Usage: python scripts/bench_input_pipeline.py [n_batches] [batch_size]
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LOADER_ONLY = "--loader-only" in sys.argv
argv = [a for a in sys.argv if not a.startswith("--")]
N_BATCHES = int(argv[1]) if len(argv) > 1 else 20
BS = int(argv[2]) if len(argv) > 2 else 64


def make_dataset(root, n_pairs):
    """Ragged grayscale PNGs (MURA-like geometry ~300-500 px)."""
    from PIL import Image
    rng = np.random.default_rng(0)
    samples = []
    for i in range(n_pairs):
        paths = []
        for v in range(2):
            h = int(rng.integers(280, 460))
            w = int(rng.integers(240, 420))
            img = rng.integers(0, 255, (h, w), dtype=np.uint8)
            p = os.path.join(root, f"img_{i:05d}_{v}.png")
            Image.fromarray(img).save(p)
            paths.append(p)
        samples.append((paths[0], paths[1], i % 2))
    return samples


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from xfmamba_tpu.data.device_pipeline import (StagingTransform,
                                                  mura_device_preprocess)
    from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
    from xfmamba_tpu.data.mura import _load_pair
    from xfmamba_tpu.models.tops import two_view_xfmamba

    n_pairs = N_BATCHES * BS
    root = tempfile.mkdtemp(prefix="xfm_pipe_")
    t0 = time.time()
    samples = make_dataset(root, n_pairs)
    print(f"dataset: {n_pairs} pairs ({2*n_pairs} pngs) "
          f"in {time.time()-t0:.1f}s", flush=True)

    ds = TwoViewSamples(samples, _load_pair, StagingTransform((224, 224)))
    workers = max(8, os.cpu_count() or 8)
    loader = TwoViewLoader(ds, BS, shuffle=False, drop_last=True,
                           num_workers=workers, prefetch=6)

    # ---- loader-only, u8 staging (the device-preprocess host half)
    t0 = time.time()
    n = 0
    for batch in loader:
        n += batch["n_valid"]
    t_loader = time.time() - t0
    ncpu = os.cpu_count() or 1
    print(f"loader-only (u8 staging): {n / t_loader:.1f} pairs/s "
          f"({t_loader:.2f}s, {workers} workers on {ncpu} cores; "
          f"{n / t_loader / ncpu:.1f} pairs/s/core)", flush=True)

    # ---- A/B: the all-host f32 transform path (decode + resize + u8->f32
    # normalize on host, 4x the H2D bytes)
    from xfmamba_tpu.data.transforms import mura_eval_transform
    ds_host = TwoViewSamples(samples, _load_pair, mura_eval_transform())
    loader_host = TwoViewLoader(ds_host, BS, shuffle=False, drop_last=True,
                                num_workers=workers, prefetch=6)
    t0 = time.time()
    n_h = 0
    for batch in loader_host:
        n_h += batch["n_valid"]
    t_host = time.time() - t0
    print(f"loader-only (host f32 transform): {n_h / t_host:.1f} pairs/s "
          f"(u8 staging is {t_host / t_loader:.2f}x)", flush=True)

    if LOADER_ONLY:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
        return

    # ---- device side: preprocess (eval) + forward, one jit
    pp = mura_device_preprocess((224, 224))
    model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)
    x1 = jnp.ones((BS, 224, 224, 1), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x1, x1)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def step(v, u8a, u8b):
        a = pp.eval_batch(u8a).astype(jnp.bfloat16)
        b = pp.eval_batch(u8b).astype(jnp.bfloat16)
        logits = model.apply(v, a, b)
        return logits.astype(jnp.float32).sum()

    # compile + warm
    u8 = jnp.zeros((BS, 224, 224, 1), jnp.uint8)
    float(step(variables, u8, u8))

    # ---- end to end: decode threads feed async device dispatches
    t0 = time.time()
    acc = []
    n = 0
    for batch in loader:
        a = jnp.asarray(batch["image1"])   # u8 H2D
        b = jnp.asarray(batch["image2"])
        acc.append(step(variables, a, b))  # async dispatch
        n += batch["n_valid"]
    total = float(sum(acc[1:], acc[0]))    # one scalar sync at the end
    t_e2e = time.time() - t0
    print(f"e2e (disk->logits): {n / t_e2e:.1f} pairs/s "
          f"({t_e2e:.2f}s, checksum {total:.3e})", flush=True)

    import shutil
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
