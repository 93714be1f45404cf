"""Jitted train/eval steps and the epoch driver.

TPU-first counterpart of the reference loop (``/root/reference/libs/
training.py:138-330``): instead of a per-batch ``.to(device)`` + ``.item()``
host sync, the step is one fused jit program; logits/labels are accumulated
on device and fetched once per epoch for the host-side AUC metrics.

Optimizers/schedules mirror ``libs/utils.py:83-134`` (adam/sgd/adamw,
step/cos/reduce-on-plateau) and ``1_train_model.py:141-147`` (Adam wd 1e-5 +
StepLR(10, 0.1) defaults).  Note torch ``Adam(weight_decay=...)`` is L2
regularization folded into the gradient (not AdamW) — replicated with
``optax.add_decayed_weights`` *before* the Adam transform.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from xfmamba_tpu.train.config import TrainConfig


@dataclasses.dataclass
class TrainState:
    """Minimal functional train state (params + batch stats + opt state)."""
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any

    def tree_flatten(self):
        return ((self.step, self.params, self.batch_stats, self.opt_state),
                None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def lr_schedule(cfg: TrainConfig) -> Callable[[int], float]:
    """Per-epoch schedule evaluated on the host; `reduce` is handled by the
    epoch driver (needs val loss)."""
    if cfg.scheduler == "step":
        return lambda epoch: cfg.lr * (cfg.gamma ** (epoch // cfg.step_size))
    if cfg.scheduler == "cos":
        return lambda epoch: 0.5 * cfg.lr * (
            1 + np.cos(np.pi * epoch / max(cfg.epochs, 1)))
    return lambda epoch: cfg.lr


def make_optimizer(cfg: TrainConfig):
    """adam / sgd / adamw with torch-compatible weight-decay semantics
    (`libs/utils.py:107-134`).  Learning rate is injected per-step via
    optax.inject_hyperparams so the host can drive any schedule."""
    def build(learning_rate):
        if cfg.optimizer == "adam":
            core = optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1])
            pre = ([optax.add_decayed_weights(cfg.weight_decay)]
                   if cfg.weight_decay else [])
            return optax.chain(*pre, core,
                               optax.scale_by_learning_rate(learning_rate))
        if cfg.optimizer == "adamw":
            return optax.adamw(learning_rate, b1=cfg.betas[0],
                               b2=cfg.betas[1],
                               weight_decay=cfg.weight_decay)
        if cfg.optimizer == "sgd":
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay)
                if cfg.weight_decay else optax.identity(),
                optax.sgd(learning_rate, momentum=cfg.momentum))
        raise ValueError(cfg.optimizer)
    return optax.inject_hyperparams(build)(learning_rate=cfg.lr)


def cross_entropy_loss(logits, labels):
    """CE with integer labels (`1_train_model.py:134-135`)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def bce_with_logits_loss(logits, labels):
    """Multi-label BCE (`1_train_model.py:136-137`, CheXpert)."""
    return optax.sigmoid_binary_cross_entropy(logits,
                                              labels.astype(logits.dtype)
                                              ).mean()


def make_train_step(model, optimizer, multilabel: bool,
                    two_view: bool = True, donate: bool = True,
                    jit_compile: bool = True, preprocess=None):
    """Build the fused train step (fwd + bwd + optimizer + metrics) and eval
    step.  Set ``jit_compile=False`` to get the raw functions (e.g. for
    `parallel.make_parallel_train_step` to jit with mesh shardings).

    ``preprocess``: optional `data.device_pipeline.DevicePreprocess` —
    batches then carry staged u8 images and the resize/crop/flip/rotate/
    normalize pipeline runs ON DEVICE, fused into the jitted step (4x less
    host->device traffic; the north-star device-preprocessing stage)."""
    loss_fn_inner = bce_with_logits_loss if multilabel else cross_entropy_loss

    def apply_model(params, batch_stats, batch, rngs, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        inputs = (batch["image1"], batch["image2"]) if two_view \
            else (batch["image1"],)
        if preprocess is not None:
            if train:
                pkey = jax.random.fold_in(rngs["dropout"], 0x5eed)
                keys = jax.random.split(pkey, len(inputs))
                inputs = tuple(preprocess.train_batch(im, k)
                               for im, k in zip(inputs, keys))
            else:
                inputs = tuple(preprocess.eval_batch(im) for im in inputs)
        mutable = ["batch_stats"] if (train and batch_stats) else False
        out = model.apply(variables, *inputs, deterministic=not train,
                          rngs=rngs if train else None, mutable=mutable)
        if mutable:
            logits, updates = out
            return logits, updates.get("batch_stats", batch_stats)
        return out, batch_stats

    def loss_fn(params, batch_stats, batch, rngs):
        logits, new_stats = apply_model(params, batch_stats, batch, rngs,
                                        train=True)
        return loss_fn_inner(logits, batch["label"]), (logits, new_stats)

    def train_step(state: TrainState, batch: Dict, rng, lr):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rngs)
        updates, opt_state = optimizer.update(
            grads, _with_lr(state.opt_state, lr), state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"loss": loss, "logits": logits}

    def eval_step(state: TrainState, batch: Dict):
        logits, _ = apply_model(state.params, state.batch_stats, batch,
                                None, train=False)
        loss = loss_fn_inner(logits, batch["label"])
        return {"loss": loss, "logits": logits}

    if not jit_compile:
        return train_step, eval_step
    donate_argnums = (0,) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_argnums),
            jax.jit(eval_step))


def _with_lr(opt_state, lr):
    """Override the injected learning-rate hyperparameter."""
    try:
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    except Exception:
        pass
    return opt_state


def init_train_state(model, optimizer, rng, example_inputs) -> TrainState:
    variables = model.init(rng, *example_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=opt_state)


def mixup(rng, x, y, alpha: float = 1.0, num_classes: Optional[int] = None):
    """Mixup augmentation (`libs/utils.py:177-191`): convex combination of a
    batch with a shuffled copy of itself.  Integer labels are one-hot encoded
    first (pass num_classes); soft labels are mixed directly.

    Returns (mixed_x, mixed_y, lam).
    """
    k_lam, k_perm = jax.random.split(rng)
    lam = jax.random.beta(k_lam, alpha, alpha) if alpha > 0 else jnp.ones(())
    perm = jax.random.permutation(k_perm, x.shape[0])
    mixed_x = lam * x + (1 - lam) * x[perm]
    if num_classes is not None and y.ndim == 1:
        y = jax.nn.one_hot(y, num_classes)
    mixed_y = lam * y + (1 - lam) * y[perm]
    return mixed_x, mixed_y, lam


class EarlyStopping:
    """Patience on -val_loss with best-checkpoint tracking.

    Mirrors `early_stop.py:4-51` — the reference saves a checkpoint every
    epoch regardless of improvement (a deliberate quirk, SURVEY.md §5); we
    keep `save_every_epoch` as a flag defaulting to the reference behavior.
    """

    def __init__(self, patience: int = 100, delta: float = 0.0,
                 save_fn: Optional[Callable] = None,
                 save_every_epoch: bool = True):
        self.patience = patience
        self.delta = delta
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.save_fn = save_fn
        self.save_every_epoch = save_every_epoch
        self.best_epoch = -1

    def __call__(self, val_loss: float, state, epoch: int):
        score = -val_loss
        improved = (self.best_score is None
                    or score > self.best_score + self.delta)
        if improved:
            self.best_score = score
            self.best_epoch = epoch
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        if self.save_fn is not None and (improved or self.save_every_epoch):
            self.save_fn(state, epoch, improved)
        return self.early_stop
