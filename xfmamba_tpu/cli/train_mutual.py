"""Mutual-learning sweep CLI — the runnable counterpart of
``/root/reference/libs/train_mutual_learning.py`` (whose own ``train()``
driver is fully commented out, `:204-298`; its argparse is `:14-43`).

Trains K models jointly (CE + mean pairwise KL against detached peers,
`:89-102`) with one fused jit step (`xfmamba_tpu.train.mutual`), sharded
data-parallel over a device mesh — the BASELINE config-5 multi-model sweep
workload.  Multi-host ready: `parallel.distributed.ensure_initialized`
bootstraps `jax.distributed` when a coordinator is configured, the mesh
spans all processes, and each host loads only its slice of every batch.

Usage (two-model sweep on MURA):
    python -m xfmamba_tpu.cli.train_mutual --dataset mura \
        --model_names twoviewxfmamba_tiny twoviewxfmamba \
        --data_root ... --train_image_csv ... --train_label_csv ... \
        --valid_image_csv ... --valid_label_csv ... --savemodel_path runs/dml
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from xfmamba_tpu.cli import build_model_by_name
from xfmamba_tpu.cli.train import build_loaders
from xfmamba_tpu.train.config import TrainConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="XFMamba mutual-learning sweep")
    # reference flags (`train_mutual_learning.py:14-43`)
    p.add_argument("--dataset", default="mura",
                   choices=["mura", "chexpert", "ddsmxray", "hipxray"])
    p.add_argument("--model_names", nargs="+",
                   default=["twoviewxfmamba_tiny", "twoviewxfmamba"])
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--num_tasks", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=16,
                   help="GLOBAL batch size (split across hosts and devices)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--savemodel_path", default="runs/mutual")
    p.add_argument("--bf16", type=int, default=0)
    # data paths (same surface as cli.train)
    p.add_argument("--data_root", default="")
    p.add_argument("--train_image_csv", default=None)
    p.add_argument("--train_label_csv", default=None)
    p.add_argument("--valid_image_csv", default=None)
    p.add_argument("--valid_label_csv", default=None)
    p.add_argument("--chexpert_csv", default=None)
    p.add_argument("--ddsm_metadata_csv", default=None)
    p.add_argument("--ddsm_case_csvs", nargs="*", default=None)
    p.add_argument("--hip_images_dir", default=None)
    p.add_argument("--hip_csv", default=None)
    p.add_argument("--num_workers", type=int, default=4)
    # multi-host bootstrap (optional; env vars work too)
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from xfmamba_tpu.parallel.distributed import (
        ensure_initialized, host_local_batch_to_global, is_primary,
        make_global_mesh, process_batch_slice)
    from xfmamba_tpu.parallel.mesh import batch_sharding, replicated
    from xfmamba_tpu.train.loop import init_train_state, make_optimizer
    from xfmamba_tpu.train.mutual import (
        MutualMeter, make_mutual_train_step, save_best_roc_checkpoint)
    from xfmamba_tpu.train import metrics as M

    ensure_initialized(args.coordinator_address, args.num_processes,
                       args.process_id)
    mesh = make_global_mesh()
    n_proc = jax.process_count()
    local_bs = args.batch_size // n_proc
    if args.batch_size % n_proc:
        raise ValueError("batch_size must divide process count")

    cfg = TrainConfig(
        dataset=args.dataset, data_root=args.data_root,
        image_size=(args.image_size, args.image_size),
        batch_size=args.batch_size, eval_batch_size=args.batch_size,
        num_workers=args.num_workers, seed=args.seed,
        num_classes=args.num_classes, num_tasks=args.num_tasks,
        lr=args.lr, weight_decay=args.weight_decay, epochs=args.epochs,
        savemodel_path=args.savemodel_path,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["root_dir"] = cfg.data_root

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    models, two_view = [], []
    for name in args.model_names:
        m, tv = build_model_by_name(name, cfg.num_classes, dtype)
        models.append(m)
        two_view.append(tv)
    K = len(models)
    multilabel = cfg.num_tasks > 1

    train_loader, val_loader, _ = build_loaders(args, cfg_dict)
    # per-host data sharding: this process decodes only its slice of each
    # (global-batch-size) batch; all hosts share the shuffle order (seed)
    train_loader.drop_last = True
    train_loader.process_slice = process_batch_slice(args.batch_size)

    optimizers = [make_optimizer(cfg) for _ in range(K)]
    rng = jax.random.key(cfg.seed)
    sample = next(iter(train_loader))
    ex1 = jnp.zeros_like(jnp.asarray(sample["image1"][:1]))
    ex2 = jnp.zeros_like(jnp.asarray(sample["image2"][:1]))
    states = []
    for i in range(K):
        inputs = (ex1, ex2) if two_view[i] else (ex1,)
        states.append(init_train_state(models[i], optimizers[i],
                                       jax.random.fold_in(rng, i), inputs))

    step = make_mutual_train_step(models, optimizers, multilabel=multilabel,
                                  two_view=two_view, jit_compile=False)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    pstep = jax.jit(step, in_shardings=(repl, bsh, repl, repl),
                    donate_argnums=(0,))
    states = jax.device_put(states, repl)

    os.makedirs(cfg.savemodel_path, exist_ok=True)
    best_roc = [-np.inf] * K
    for epoch in range(cfg.epochs):
        meters = [MutualMeter(max(len(train_loader), 1),
                              max(len(train_loader) * local_bs, 1))
                  for _ in range(K)]
        all_logits = [[] for _ in range(K)]
        all_labels = []
        for batch in train_loader:
            dev = host_local_batch_to_global(
                {k: v for k, v in batch.items() if k != "n_valid"}, mesh)
            states, out = pstep(states, dev,
                                jax.random.fold_in(rng, epoch),
                                jnp.asarray(cfg.lr, jnp.float32))
            for i in range(K):
                # metrics use this host's addressable shard of the global
                # logits (labels below are already host-local)
                logits_i = np.concatenate([
                    np.asarray(s.data)
                    for s in out["logits"][i].addressable_shards])
                acc = (logits_i.argmax(1) == np.asarray(
                    batch["label"])).sum()
                meters[i].update(out["ce_loss"][i], out["kl_loss"][i],
                                 out["loss"] / K, acc, epoch)
                all_logits[i].append(logits_i)
            all_labels.append(np.asarray(batch["label"]))
        labels = np.concatenate(all_labels) if all_labels else np.zeros(0)
        for i in range(K):
            if all_logits[i]:
                logits = np.concatenate(all_logits[i])
                try:
                    if multilabel:
                        auc = M.multilabel_mean_auc(
                            labels, 1.0 / (1.0 + np.exp(-logits)))
                    else:
                        e = np.exp(logits - logits.max(1, keepdims=True))
                        auc = M.roc_auc(labels, (e / e.sum(1, keepdims=True))
                                        [:, 1])
                except Exception:
                    auc = float("nan")
                meters[i].update_auc(auc)
            avg = meters[i].get_avg()
            if is_primary():
                print(f"epoch {epoch} model[{i}] {args.model_names[i]}: "
                      f"ce={avg['ce_loss']:.4f} kl={avg['kl_loss']:.4f} "
                      f"auc={avg['auc']:.4f}")
                if avg["auc"] == avg["auc"] and avg["auc"] > best_roc[i]:
                    best_roc[i] = avg["auc"]
                    save_best_roc_checkpoint(
                        cfg.savemodel_path, args.model_names[i],
                        jax.device_get(states[i]), epoch, avg["auc"])
    return states


if __name__ == "__main__":
    main()
