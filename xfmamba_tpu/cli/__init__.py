"""CLI layer (reference: ``1_train_model.py``, ``2_inference_*.py``).

Shared helpers: model-name dispatch (`1_train_model.py:122-127`), checkpoint
loading (npz native / .pth via the converter), and ROC artifact writers
(`2_inference_mura.py:263-324`).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CheXpert label names (`dataset_chexpert_twoview.py:12-17`)
CHEXPERT_LABELS = [
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly",
    "Lung Opacity", "Lung Lesion", "Edema", "Consolidation", "Pneumonia",
    "Atelectasis", "Pneumothorax", "Pleural Effusion", "Pleural Other",
    "Fracture", "Support Devices",
]

# MURA body parts (`2_inference_mura.py:154`)
MURA_BODY_PARTS = ["ELBOW", "FINGER", "FOREARM", "HAND", "HUMERUS",
                   "SHOULDER", "WRIST"]


def build_model_by_name(model_name: str, num_classes: int,
                        dtype=jnp.float32):
    """CLI model-name dispatch (`1_train_model.py:122-127` + the
    Single/LateJoin/Early variants of `net_fusionmamba.py`).

    Returns (model, two_view).
    """
    from xfmamba_tpu.models.tops import (
        SingleViewMamba, TwoViewEarlyFusionMamba, TwoViewLateJoinMamba,
        two_view_xfmamba)
    from xfmamba_tpu.models.tops import TwoViewXFMamba
    name = model_name.lower()
    if name == "twoviewxfmamba_smoke":
        # tiny-geometry variant for CI smoke tests and dry runs
        return TwoViewXFMamba(
            outputs=num_classes, model_type="tiny", hidden_dim=128,
            d_state=4, dtype=dtype,
            backbone_overrides=dict(depths=(1, 1, 1, 1), dims=16)), True
    if name in ("twoviewxfmamba", "dualfusionmambav13"):
        # README's legacy name `dualfusionmambav13` (`README.md:66`) maps to
        # the current small model — the reference CLI drops it (a known
        # doc/code mismatch, SURVEY.md §2.6); we accept it as an alias.
        return two_view_xfmamba("small", outputs=num_classes,
                                dtype=dtype), True
    if name == "twoviewxfmamba_tiny":
        return two_view_xfmamba("tiny", outputs=num_classes,
                                dtype=dtype), True
    if name == "twoviewxfmamba_base":
        return two_view_xfmamba("base", outputs=num_classes,
                                dtype=dtype), True
    if name == "singleviewmamba":
        return SingleViewMamba(outputs=num_classes, dtype=dtype), False
    if name == "twoviewlatejoinmamba":
        return TwoViewLateJoinMamba(outputs=num_classes, dtype=dtype), True
    if name == "twoviewearlyfusionmamba":
        return TwoViewEarlyFusionMamba(outputs=num_classes,
                                       dtype=dtype), True
    raise ValueError(f"unknown model_name {model_name!r}")


def load_variables(path: str, model=None, example_inputs=None,
                   rng_seed: int = 0):
    """Load model variables from a native .npz checkpoint or convert a
    PyTorch .pth on the fly (`2_inference_mura.py:134-139` equivalent)."""
    from xfmamba_tpu.checkpoint.io import load_npz
    if path.endswith(".npz"):
        tree = load_npz(path)
        out = {"params": tree.get("params", tree)}
        if tree.get("batch_stats"):
            out["batch_stats"] = tree["batch_stats"]
        # numpy -> device arrays (one upload; jit closures stay device-side)
        return jax.tree_util.tree_map(jnp.asarray, out)
    if path.endswith((".pth", ".pt", ".bin")):
        from xfmamba_tpu.checkpoint.convert import (
            convert_xfmamba_state_dict, load_pth_state_dict)
        sd = load_pth_state_dict(path)
        converted = convert_xfmamba_state_dict(sd)
        return converted
    raise ValueError(f"unsupported checkpoint format: {path}")


def write_roc_artifacts(out_dir: str, tag: str, labels: np.ndarray,
                        scores: np.ndarray) -> float:
    """ROC curve PNG + AUC txt (mirrors `2_inference_mura.py:263-324`).
    Returns the AUC."""
    from xfmamba_tpu.train.metrics import roc_auc, roc_curve_points
    os.makedirs(out_dir, exist_ok=True)
    auc = roc_auc(labels, scores)
    fpr, tpr, _ = roc_curve_points(labels, scores)
    with open(os.path.join(out_dir, f"auc_{tag}.txt"), "w") as f:
        f.write(f"{tag} AUC: {auc:.6f}\n")
        f.write(f"n = {len(labels)}\n")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(fpr, tpr, label=f"{tag} (AUC={auc:.4f})")
        ax.plot([0, 1], [0, 1], "k--", lw=0.8)
        ax.set_xlabel("False positive rate")
        ax.set_ylabel("True positive rate")
        ax.legend(loc="lower right")
        fig.savefig(os.path.join(out_dir, f"roc_{tag}.png"), dpi=120)
        plt.close(fig)
    except Exception:
        pass
    return auc


def make_eval_apply(model, variables, two_view: bool):
    """One jitted inference program reused across every batch."""
    @jax.jit
    def apply_fn(x1, x2):
        if two_view:
            return model.apply(variables, x1, x2)
        return model.apply(variables, x1)
    return apply_fn


def collect_scores(apply_fn, loader, binary: bool = True):
    """Run inference over a loader; returns (labels, probs, batch_times_s).

    binary=True  -> probs = softmax[:, 1]  (`2_inference_mura.py:187`)
    binary=False -> probs = sigmoid(logits) (`2_inference_chexpert.py:123`)
    """
    import time
    all_labels, all_probs, times = [], [], []
    for batch in loader:
        nv = batch.get("n_valid", batch["label"].shape[0])
        x1 = jnp.asarray(batch["image1"])
        x2 = jnp.asarray(batch["image2"])
        t0 = time.perf_counter()
        logits = jax.block_until_ready(apply_fn(x1, x2))
        times.append(time.perf_counter() - t0)
        logits = np.asarray(logits)[:nv]
        if binary:
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            probs = (e / e.sum(axis=1, keepdims=True))[:, 1]
        else:
            probs = 1.0 / (1.0 + np.exp(-logits))
        all_probs.append(probs)
        all_labels.append(np.asarray(batch["label"])[:nv])
    return (np.concatenate(all_labels), np.concatenate(all_probs), times)
