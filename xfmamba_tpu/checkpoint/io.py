"""Checkpoint save/load (orbax-backed with an npz fallback).

The reference saves torch state dicts every epoch
(`early_stop.py:43-51`: ``model_epoch_{n}.pth``) and full training state in
the mutual-learning path (`train_mutual_learning.py:306-325`); here both are
one orbax pytree checkpoint per step/epoch, plus `save_npz`/`load_npz` for
dependency-free snapshots.  Mid-epoch resume — absent from the reference
(SURVEY.md §5) — comes free by checkpointing the whole TrainState.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz(path: str, tree: Any):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    np.savez(path, **flat)


def load_npz(path: str):
    with np.load(path, allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})


class CheckpointManager:
    """Orbax checkpoint manager over a run directory; keeps `max_to_keep`
    checkpoints plus an always-updated 'best' copy."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )
        self._ocp = ocp

    def save(self, step: int, tree: Any, best: bool = False):
        self._mgr.save(step, args=self._ocp.args.StandardSave(
            jax.device_get(tree)))
        self._mgr.wait_until_finished()
        if best:
            save_npz(os.path.join(self.directory, "best.npz"), tree)

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(
                    jax.device_get(template)))
        return self._mgr.restore(step)

    def latest_step(self):
        return self._mgr.latest_step()
