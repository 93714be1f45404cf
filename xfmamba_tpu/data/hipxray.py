"""Hip X-ray two-view (AP + Lateral) dataset.

Behavior mirrors ``/root/reference/libs/dataset_hipxray_twoview.py``:
- pairing by filename convention "NNN AP.jpg" / "NNN Lateral.jpg" with
  zero-padded 3-digit image numbers (`:41-59`)
- rows with ``Fracture_Classification == 'Exclude'`` dropped (`:33-34`)
- labels mapped from sorted unique ``Final_Classification`` values
  (`:66-74`); rows with missing classification skipped.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.data.transforms import (
    load_grayscale, mura_eval_transform, mura_train_transform)


def build_samples(images_dir: str, csv_file: str):
    """Returns (samples [(ap, lateral, label_int)], label_mapping)."""
    table = pd.read_csv(csv_file)
    required = ["Image_no", "Admission_Date", "Fracture_Classification",
                "Final_Classification"]
    missing = [c for c in required if c not in table.columns]
    if missing:
        raise ValueError(f"CSV missing required columns: {missing}")
    table = table[table["Fracture_Classification"].str.lower() != "exclude"]

    unique = sorted(table["Final_Classification"].dropna().unique())
    mapping = {label: i for i, label in enumerate(unique)}

    samples = []
    for _, row in table.iterrows():
        num = str(row["Image_no"]).zfill(3)
        ap = os.path.join(images_dir, f"{num} AP.jpg")
        lat = os.path.join(images_dir, f"{num} Lateral.jpg")
        if not (os.path.exists(ap) and os.path.exists(lat)):
            continue
        if pd.isna(row["Final_Classification"]):
            continue
        samples.append((ap, lat,
                        np.int32(mapping[row["Final_Classification"]])))
    if not samples:
        raise RuntimeError("no valid AP/Lateral pairs found")
    return samples, mapping


def _load_pair(sample):
    p1, p2, label = sample
    return load_grayscale(p1), load_grayscale(p2), label


def create_data_loaders(images_dir, csv_file, config):
    """Train/val split by the config ratios over a seeded shuffle
    (reference `create_data_loader`, `:118-` with its SubsetWithTransform)."""
    samples, mapping = build_samples(images_dir, csv_file)
    rng = np.random.default_rng(config["seed"])
    idx = rng.permutation(len(samples))
    n_train = int(config.get("train_ratio", 0.85) * len(samples))
    tt = mura_train_transform(tuple(config["image_size"]))
    et = mura_eval_transform(tuple(config["image_size"]))
    nw = config.get("num_workers", 4)
    procs = bool(config.get("loader_processes"))

    def mk(ids, tf):
        return TwoViewSamples([samples[i] for i in ids], _load_pair, tf)

    train_loader = TwoViewLoader(mk(idx[:n_train], tt), config["batch_size"],
                                 shuffle=True, drop_last=True,
                                 num_workers=nw, seed=config["seed"],
                                 use_processes=procs)
    val_loader = TwoViewLoader(mk(idx[n_train:], et), config["batch_size"],
                               shuffle=False, num_workers=nw,
                               seed=config["seed"], use_processes=procs)
    return train_loader, val_loader, mapping
