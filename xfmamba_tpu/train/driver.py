"""Epoch driver: the TPU counterpart of `train_one_epoch`/`validator`
(``/root/reference/libs/training.py:138-330``) and the `1_train_model.py`
epoch loop (:158-187).

Differences by design (not behavior): metrics accumulate logits on device
and sync once per epoch (the reference's per-batch ``.cpu()`` stall,
SURVEY.md §3.1, disappears); eval batches are padded to a fixed size with an
``n_valid`` mask so one compiled program serves every batch.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xfmamba_tpu.train.config import TrainConfig
from xfmamba_tpu.train.loop import (
    EarlyStopping, TrainState, lr_schedule, make_optimizer, make_train_step)
from xfmamba_tpu.train import metrics as M


def _to_device(batch, sharding=None):
    arrs = {k: v for k, v in batch.items() if k != "n_valid"}
    if sharding is not None:
        arrs = {k: jax.device_put(v, sharding) for k, v in arrs.items()}
    return arrs


def run_train_epoch(train_step, state: TrainState, loader, rng, lr,
                    multilabel: bool, log_every: int = 50,
                    sharding=None, log_fn: Callable = print):
    """One epoch; returns (state, epoch_metrics)."""
    losses = []
    all_logits, all_labels = [], []
    t0 = time.time()
    lr_arr = jnp.asarray(lr, jnp.float32)
    for i, batch in enumerate(loader):
        dev = _to_device(batch, sharding)
        state, out = train_step(state, dev, rng, lr_arr)
        losses.append(out["loss"])
        all_logits.append(out["logits"])
        all_labels.append(batch["label"])
        if log_every and (i + 1) % log_every == 0:
            log_fn(f"  step {i + 1}/{len(loader)} "
                   f"loss={float(out['loss']):.4f}")
    logits = np.concatenate([np.asarray(l) for l in all_logits])
    labels = np.concatenate(all_labels)
    stats = compute_epoch_metrics(logits, labels, multilabel)
    stats["loss"] = float(np.mean([float(l) for l in losses]))
    stats["time_s"] = time.time() - t0
    return state, stats


def run_eval_epoch(eval_step, state: TrainState, loader,
                   multilabel: bool, sharding=None):
    """Validation/test pass; respects each batch's `n_valid` padding."""
    losses, weights = [], []
    all_logits, all_labels = [], []
    for batch in loader:
        nv = batch.get("n_valid", batch["label"].shape[0])
        dev = _to_device(batch, sharding)
        out = eval_step(state, dev)
        logits = np.asarray(out["logits"])[:nv]
        all_logits.append(logits)
        all_labels.append(np.asarray(batch["label"])[:nv])
        losses.append(float(out["loss"]))
        weights.append(nv)
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    stats = compute_epoch_metrics(logits, labels, multilabel)
    stats["loss"] = float(np.average(losses, weights=weights))
    return stats, logits, labels


def compute_epoch_metrics(logits: np.ndarray, labels: np.ndarray,
                          multilabel: bool) -> Dict:
    """Reference metric surface: binary softmax[:,1] ROC-AUC + accuracy
    (`training.py:197-204`) or sigmoid per-label mean AUC (:205-214)."""
    if multilabel:
        probs = 1.0 / (1.0 + np.exp(-logits))
        mean_auc, per = M.multilabel_mean_auc(labels, probs,
                                              return_per_label=True)
        preds = probs > 0.5
        acc = float((preds == (labels > 0.5)).mean())
        return {"auc": mean_auc, "per_label_auc": per, "accuracy": acc}
    probs = jax.nn.softmax(logits, axis=-1)
    probs = np.asarray(probs)
    scores = probs[:, 1] if probs.shape[1] == 2 else probs.max(axis=1)
    preds = probs.argmax(axis=1)
    acc = float((preds == labels).mean())
    out = {"accuracy": acc}
    if probs.shape[1] == 2:
        out["auc"] = M.roc_auc(labels, scores)
        out.update(M.binary_confusion_stats(labels, preds))
    return out


def write_epoch_artifacts(out_dir: str, epoch: int, stats: Dict,
                          logits=None, labels=None, multilabel=False):
    """Per-epoch metric txt + confusion-matrix PNG, mirroring
    `plot_confusion_matrix` (`training.py:20-134`)."""
    ep_dir = os.path.join(out_dir, f"epoch_{epoch}")
    os.makedirs(ep_dir, exist_ok=True)
    with open(os.path.join(ep_dir, "metrics.txt"), "w") as f:
        for k, v in stats.items():
            f.write(f"{k}: {v}\n")
    if logits is not None and not multilabel and logits.shape[1] == 2:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            preds = logits.argmax(axis=1)
            cm = np.zeros((2, 2), int)
            for t, p in zip(labels, preds):
                cm[int(t), int(p)] += 1
            fig, ax = plt.subplots()
            ax.imshow(cm, cmap="Blues")
            for i in range(2):
                for j in range(2):
                    ax.text(j, i, str(cm[i, j]), ha="center", va="center")
            ax.set_xlabel("predicted")
            ax.set_ylabel("true")
            fig.savefig(os.path.join(ep_dir, "confusion_matrix.png"))
            plt.close(fig)
        except Exception:
            pass


def fit(model, cfg: TrainConfig, train_loader, val_loader,
        init_state: Optional[TrainState] = None, example_batch=None,
        log_fn: Callable = print, out_dir: Optional[str] = None,
        save_checkpoints: bool = True, preprocess=None):
    """Full training run with early stopping and LR scheduling; returns
    (final_state, history).

    ``preprocess``: optional `data.device_pipeline.DevicePreprocess` —
    loaders must then emit staged u8 batches (``device_preprocess`` config
    flag) and augmentation/normalization runs inside the jitted steps."""
    from xfmamba_tpu.checkpoint.io import save_npz

    multilabel = cfg.num_tasks > 1 or cfg.dataset == "chexpert"
    optimizer = make_optimizer(cfg)
    rng = jax.random.key(cfg.seed)

    # Data-parallel mesh (SURVEY.md §2.10 — the reference is single-GPU;
    # this is the TPU build's first-class DP layer).  `cfg.data_parallel`
    # shards every batch over all local devices; a non-divisible batch size
    # is a hard error rather than a silent single-device fallback.
    mesh = None
    n_dev = len(jax.devices())
    if cfg.data_parallel and n_dev > 1:
        from xfmamba_tpu.parallel.mesh import make_mesh
        for name, bs in (("batch_size", cfg.batch_size),
                         ("eval_batch_size", cfg.eval_batch_size)):
            if bs % n_dev:
                raise ValueError(
                    f"data_parallel: {name}={bs} is not divisible by the "
                    f"{n_dev} local devices; adjust the batch size or pass "
                    f"data_parallel=False")
        mesh = make_mesh()
        log_fn(f"data-parallel: batches sharded over {n_dev} devices")

    if init_state is None:
        if example_batch is None:
            example_batch = next(iter(train_loader))
        from xfmamba_tpu.train.loop import init_train_state
        inputs = (jnp.asarray(example_batch["image1"]),
                  jnp.asarray(example_batch["image2"]))
        if preprocess is not None:
            inputs = tuple(preprocess.eval_batch(im) for im in inputs)
        init_state = init_train_state(model, optimizer,
                                      jax.random.key(cfg.seed), inputs)
    state = init_state

    data_sharding = None
    if mesh is not None:
        from xfmamba_tpu.parallel.mesh import (
            batch_sharding, make_parallel_eval_step,
            make_parallel_train_step, replicated)
        raw_train, raw_eval = make_train_step(
            model, optimizer, multilabel, preprocess=preprocess,
            jit_compile=False)
        train_step = make_parallel_train_step(raw_train, mesh)
        # eval MUST go through shard_map: the fused Pallas inference
        # kernels are not auto-partitioned under a GSPMD mesh
        eval_step = make_parallel_eval_step(raw_eval, mesh)
        state = jax.device_put(state, replicated(mesh))
        data_sharding = batch_sharding(mesh)
    else:
        train_step, eval_step = make_train_step(
            model, optimizer, multilabel, preprocess=preprocess)
    sched = lr_schedule(cfg)
    out_dir = out_dir or cfg.savemodel_path
    os.makedirs(out_dir, exist_ok=True)

    def save_fn(st, epoch, improved):
        if save_checkpoints:
            save_npz(os.path.join(out_dir, f"model_epoch_{epoch}.npz"),
                     {"params": st.params, "batch_stats": st.batch_stats})
            if improved:
                save_npz(os.path.join(out_dir, "best.npz"),
                         {"params": st.params,
                          "batch_stats": st.batch_stats})

    stopper = EarlyStopping(patience=cfg.patience, save_fn=save_fn)
    history = []
    plateau_lr = cfg.lr
    plateau_bad = 0
    for epoch in range(cfg.epochs):
        lr = sched(epoch) if cfg.scheduler != "reduce" else plateau_lr
        state, tr_stats = run_train_epoch(
            train_step, state, train_loader, rng, lr, multilabel,
            log_every=cfg.log_every, log_fn=log_fn,
            sharding=data_sharding)
        va_stats, logits, labels = run_eval_epoch(
            eval_step, state, val_loader, multilabel,
            sharding=data_sharding)
        log_fn(f"epoch {epoch}: lr={lr:.2e} "
               f"train_loss={tr_stats['loss']:.4f} "
               f"val_loss={va_stats['loss']:.4f} "
               f"val_auc={va_stats.get('auc', float('nan')):.4f}")
        if getattr(cfg, "wandb", False):
            # per-epoch metric logging (`1_train_model.py:173-181`)
            try:
                import wandb as _wandb
                if _wandb.run is not None:
                    _wandb.log({
                        "epoch": epoch, "lr": lr,
                        "train_loss": tr_stats["loss"],
                        "train_acc": tr_stats.get("accuracy"),
                        "train_auc": tr_stats.get("auc"),
                        "val_loss": va_stats["loss"],
                        "val_acc": va_stats.get("accuracy"),
                        "val_auc": va_stats.get("auc"),
                    })
            except Exception:
                pass
        write_epoch_artifacts(out_dir, epoch, va_stats, logits, labels,
                              multilabel)
        history.append({"epoch": epoch, "train": tr_stats, "val": va_stats})
        if cfg.scheduler == "reduce":
            # ReduceLROnPlateau(patience=10, factor=0.1) equivalent
            if history[-1]["val"]["loss"] >= min(
                    h["val"]["loss"] for h in history):
                plateau_bad += 1
                if plateau_bad > 10:
                    plateau_lr *= 0.1
                    plateau_bad = 0
            else:
                plateau_bad = 0
        if stopper(va_stats["loss"], state, epoch):
            log_fn(f"early stop at epoch {epoch} "
                   f"(best epoch {stopper.best_epoch})")
            break
    return state, history
