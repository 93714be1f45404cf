"""CheXpert two-view (frontal + lateral) dataset pipeline.

Behavior mirrors ``/root/reference/libs/dataset_chexpert_twoview.py``:
- 14-label tuple (`:12-17`); the paper's 13-class protocol is obtained via
  ``drop_no_finding=True`` (BASELINE.md caveat)
- an os.walk image-path map over the root dirs (`:52-71`); CSV paths
  normalized to ``patientXXXX/...`` (`:115-121`)
- grouping by (patient, study) keeping only studies with BOTH a frontal and
  a lateral view, first of each (`:139-152`)
- NaN labels -> 0.0 (`:163-167`)
- 75/12.5/12.5 random split with a torch.Generator(seed) permutation
  (`:311-320`) — reproduced exactly via torch.randperm so split membership
  matches the reference bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.data.transforms import (
    chexpert_eval_transform, chexpert_train_transform, load_grayscale)

LABELS = (
    "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
    "Lung Lesion", "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other", "Fracture",
    "Support Devices", "No Finding",
)


def _normalize_path(path: str) -> str:
    parts = path.replace("\\", "/").split("/")
    for i, p in enumerate(parts):
        if p.startswith("patient"):
            return "/".join(parts[i:])
    return path


def _view_from_path(path: str) -> str:
    name = os.path.basename(path).lower()
    if "frontal" in name:
        return "Frontal"
    if "lateral" in name:
        return "Lateral"
    return "Unknown"


def build_image_path_map(root_dirs: Sequence[str]) -> Dict[str, str]:
    """normalized relative path -> absolute path (reference os.walk map)."""
    out = {}
    for root in root_dirs:
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.lower().endswith((".jpg", ".jpeg", ".png")):
                    full = os.path.join(dirpath, f)
                    out[_normalize_path(os.path.relpath(full, root))] = full
    return out


def build_samples(csv_files: Sequence[str], root_dirs: Sequence[str],
                  drop_no_finding: bool = False) -> List[Tuple]:
    """Returns [(frontal_path, lateral_path, label_vec float32)]."""
    labels = [l for l in LABELS if not (drop_no_finding
                                        and l == "No Finding")]
    path_map = build_image_path_map(root_dirs)
    samples = []
    for csv_file in ([csv_files] if isinstance(csv_files, str)
                     else csv_files):
        data = pd.read_csv(csv_file)
        data["Path"] = data["Path"].apply(_normalize_path)
        data["patient_id"] = data["Path"].str.split("/").str[0]
        data["study_id"] = data["Path"].str.split("/").str[1]
        if "Frontal/Lateral" not in data.columns:
            data["Frontal/Lateral"] = data["Path"].apply(_view_from_path)
        for (_, _), group in data.groupby(["patient_id", "study_id"]):
            fr = group[group["Frontal/Lateral"] == "Frontal"]
            la = group[group["Frontal/Lateral"] == "Lateral"]
            if fr.empty or la.empty:
                continue
            fr_row, la_row = fr.iloc[0], la.iloc[0]
            fp = path_map.get(fr_row["Path"])
            lp = path_map.get(la_row["Path"])
            if fp is None or lp is None:
                continue
            vec = np.array(
                [float(fr_row.get(l)) if pd.notnull(fr_row.get(l)) else 0.0
                 for l in labels], np.float32)
            samples.append((fp, lp, vec))
    return samples


def reference_split_indices(n: int, seed: int):
    """The reference's torch.random_split membership (`:311-320`)."""
    import torch
    train_n = int(0.75 * n)
    val_n = int(0.125 * n)
    perm = torch.randperm(n,
                          generator=torch.Generator().manual_seed(seed)
                          ).tolist()
    return (perm[:train_n], perm[train_n:train_n + val_n],
            perm[train_n + val_n:])


def _load_pair(sample):
    p1, p2, vec = sample
    return load_grayscale(p1), load_grayscale(p2), vec


def create_train_val_test_data_loaders(train_root_dirs, train_csv_file,
                                       config, drop_no_finding=False):
    """Equivalent of ``create_train_val_test_data_loader`` (`:288-357`)."""
    samples = build_samples(train_csv_file, train_root_dirs,
                            drop_no_finding=drop_no_finding)
    tr_i, va_i, te_i = reference_split_indices(len(samples), config["seed"])
    if config.get("device_preprocess"):
        from xfmamba_tpu.data.device_pipeline import StagingTransform
        tt = StagingTransform(tuple(config["image_size"]))
        et = StagingTransform(tuple(config["image_size"]))
    else:
        tt = chexpert_train_transform(tuple(config["image_size"]))
        et = chexpert_eval_transform(tuple(config["image_size"]))
    nw = config.get("num_workers", 4)
    procs = bool(config.get("loader_processes"))

    def mk(idxs, tf):
        return TwoViewSamples([samples[i] for i in idxs], _load_pair, tf)

    train_loader = TwoViewLoader(mk(tr_i, tt), config["batch_size"],
                                 shuffle=True, drop_last=True,
                                 num_workers=nw, seed=config["seed"],
                                 use_processes=procs)
    val_loader = TwoViewLoader(mk(va_i, et), config["batch_size"],
                               shuffle=False, num_workers=nw,
                               seed=config["seed"], use_processes=procs)
    test_loader = TwoViewLoader(mk(te_i, et),
                                config.get("eval_batch_size",
                                           config["batch_size"]),
                                shuffle=False, num_workers=nw,
                                seed=config["seed"], use_processes=procs)
    return train_loader, val_loader, test_loader
