"""Deep-mutual-learning trainer.

Reference: ``/root/reference/libs/train_mutual_learning.py`` — N models
trained jointly; each model's loss is CE plus the mean pairwise
KL(softmax_j.detach() ‖ softmax_i) over its peers (:89-102 — torch
``KLDivLoss()(log_softmax(out_i), softmax(out_j.detach()))``), the
``Totoal_Meter`` accumulator (`libs/utils.py:14-46`), and the full-state
best-ROC checkpoint (`train_mutual_learning.py:306-325`).

TPU-first design: the reference runs K separate backward passes per batch
(one per model).  Because every peer term is detached, the gradient of the
*summed* loss w.r.t. model i's params equals model i's own gradient — so one
fused jit program computes all K forwards, one joint backward, and all K
optimizer updates, keeping every matmul on the MXU and syncing with the host
zero times per step.  This is also the BASELINE multi-model-sweep workload:
under `parallel.make_parallel_train_step`-style sharding the K models
replicate and the batch shards over the mesh.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from xfmamba_tpu.checkpoint.io import save_npz
from xfmamba_tpu.train.loop import (
    TrainState, _with_lr, bce_with_logits_loss, cross_entropy_loss,
    init_train_state)


def kl_div_loss(log_q, p, reduction: str = "mean"):
    """torch ``nn.KLDivLoss`` semantics: input is log-probabilities of q,
    target p is probabilities; pointwise p·(log p − log q); default
    reduction 'mean' averages over *all elements* (the torch default the
    reference relies on)."""
    pointwise = p * (jnp.log(jnp.clip(p, 1e-12)) - log_q)
    if reduction == "mean":
        return pointwise.mean()
    if reduction == "batchmean":
        return pointwise.sum() / pointwise.shape[0]
    if reduction == "sum":
        return pointwise.sum()
    return pointwise


class MutualMeter:
    """`Totoal_Meter` equivalent (`libs/utils.py:14-46`)."""

    def __init__(self, n_batch: int, n_dataset: int):
        self.n_batch = n_batch
        self.n_dataset = n_dataset
        self.reset()

    def reset(self):
        self.ce_loss = 0.0
        self.kl_loss = 0.0
        self.loss = 0.0
        self.acc = 0.0
        self.auc = 0.0
        self.epoch = 0

    def update(self, ce_loss, kl_loss, loss, acc, epoch):
        self.ce_loss += float(ce_loss)
        self.kl_loss += float(kl_loss)
        self.loss += float(loss)
        self.acc += float(acc)
        self.epoch = epoch

    def update_auc(self, auc):
        self.auc = float(auc)

    def get_avg(self) -> Dict[str, float]:
        return {
            "ce_loss": self.ce_loss / self.n_batch,
            "kl_loss": self.kl_loss / self.n_batch,
            "loss": self.loss / self.n_batch,
            "acc": self.acc / self.n_dataset,
            "auc": self.auc,
            "epoch": self.epoch,
        }


def make_mutual_train_step(models: Sequence, optimizers: Sequence,
                           multilabel: bool = False,
                           two_view: Optional[Sequence[bool]] = None,
                           jit_compile: bool = True):
    """Fused mutual-learning step over K models.

    ``two_view[i]`` selects model i's input signature (the reference mixes
    two-view fusion models with single-view ones, `:79-84`).  Returns
    ``step(states, batch, rng, lr) -> (states, metrics)`` where states is a
    list of TrainState and metrics carries per-model ce/kl/loss/logits.
    """
    K = len(models)
    assert K >= 2, "mutual learning needs at least two models"
    two_view = list(two_view) if two_view is not None else [True] * K
    ce_fn = bce_with_logits_loss if multilabel else cross_entropy_loss

    def fwd(i, params, batch_stats, batch, rngs):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        inputs = ((batch["image1"], batch["image2"]) if two_view[i]
                  else (batch["image1"],))
        mutable = ["batch_stats"] if batch_stats else False
        out = models[i].apply(variables, *inputs, deterministic=False,
                              rngs=rngs, mutable=mutable)
        if mutable:
            logits, updates = out
            return logits, updates.get("batch_stats", batch_stats)
        return out, batch_stats

    def joint_loss(params_list, stats_list, batch, rngs):
        logits, new_stats = [], []
        for i in range(K):
            li, si = fwd(i, params_list[i], stats_list[i], batch, rngs)
            logits.append(li)
            new_stats.append(si)
        total = 0.0
        ces, kls = [], []
        for i in range(K):
            ce = ce_fn(logits[i], batch["label"])
            kl = 0.0
            for j in range(K):
                if j != i:
                    kl = kl + kl_div_loss(
                        jax.nn.log_softmax(logits[i], axis=1),
                        jax.nn.softmax(
                            jax.lax.stop_gradient(logits[j]), axis=1))
            kl = kl / (K - 1)
            total = total + ce + kl
            ces.append(ce)
            kls.append(kl)
        return total, (logits, new_stats, ces, kls)

    def step(states: List[TrainState], batch, rng, lr):
        rngs = {"dropout": jax.random.fold_in(rng, states[0].step)}
        params_list = [s.params for s in states]
        stats_list = [s.batch_stats for s in states]
        grad_fn = jax.value_and_grad(joint_loss, has_aux=True)
        (total, (logits, new_stats, ces, kls)), grads = grad_fn(
            params_list, stats_list, batch, rngs)
        new_states = []
        for i in range(K):
            updates, opt_state = optimizers[i].update(
                grads[i], _with_lr(states[i].opt_state, lr),
                states[i].params)
            params = optax.apply_updates(states[i].params, updates)
            new_states.append(TrainState(
                step=states[i].step + 1, params=params,
                batch_stats=new_stats[i], opt_state=opt_state))
        metrics = {
            "loss": total,
            "ce_loss": jnp.stack(ces),
            "kl_loss": jnp.stack(kls),
            "logits": logits,
        }
        return new_states, metrics

    return jax.jit(step) if jit_compile else step


def save_best_roc_checkpoint(save_model_path: str, model_name: str,
                             state: TrainState, epoch: int,
                             val_roc: float) -> str:
    """Full-state best-ROC checkpoint — the orbax/npz counterpart of
    `save_best_roc_model_auc` (`train_mutual_learning.py:306-325`):
    {epoch, model, optimizer, val_roc} in one file."""
    from flax import serialization

    model_dir = os.path.join(save_model_path, model_name)
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, f"best_model_{epoch}.npz")
    save_npz(path, {
        "epoch": jnp.asarray(epoch),
        "val_roc": jnp.asarray(val_roc),
        "params": state.params,
        "batch_stats": state.batch_stats or {},
        # optax state as a nested dict (torch's optimizer_state_dict analog)
        "opt_state": serialization.to_state_dict(state.opt_state),
    })
    return path
