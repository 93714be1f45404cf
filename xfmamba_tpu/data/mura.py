"""MURA two-view dataset pipeline.

Behavior mirrors ``/root/reference/libs/dataset_mura_twoview.py``:
- study -> image grouping from the official CSVs (image paths CSV + study
  label CSV, header row skipped, `:832-847`)
- view-pairing policy per study (`:74-107` / `:936-955`): N=1 duplicates the
  image, N=2 pairs them, N>=3 takes all unique pairs
- label cleaning: non-integer label rows dropped (`:852-863`)
- patient-level stratified 92/8 train/val split seeded by config
  (`:997-1003`), UNKNOWN patients forced into train (`:979-984`)
- the official valid CSV becomes the held-out test set (`:1094-1100`)

The seven body parts: ELBOW FINGER FOREARM HAND HUMERUS SHOULDER WRIST.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.data.transforms import (
    load_grayscale, mura_eval_transform, mura_train_transform)

BODY_PARTS = ("ELBOW", "FINGER", "FOREARM", "HAND", "HUMERUS", "SHOULDER",
              "WRIST")


def study_pairs(images: Sequence[str]) -> List[Tuple[str, str]]:
    """The reference's pairing policy (`dataset_mura_twoview.py:936-955`)."""
    images = sorted(images)
    n = len(images)
    if n == 1:
        return [(images[0], images[0])]
    return [(images[i], images[j]) for i in range(n)
            for j in range(i + 1, n)]


def _study_of(image_path: str) -> str:
    return os.path.dirname(image_path.rstrip("/"))


def _patient_of(path: str) -> str:
    for part in path.strip("/").split(os.sep):
        if part.lower().startswith("patient"):
            return part
    return "UNKNOWN_PATIENT"


def _body_part_of(path: str, parts=BODY_PARTS) -> str:
    low = path.lower()
    for p in parts:
        if p.lower() in low:
            return p
    return "UNKNOWN"


def read_mura_tables(image_paths_csv: str, study_labels_csv: str,
                     root_dir: str) -> pd.DataFrame:
    """Join image paths to study labels; returns one row per (img1, img2)
    pair with label/study/patient/body_part columns."""
    paths = pd.read_csv(image_paths_csv, header=0, names=["image_path"],
                        skipinitialspace=True)
    labels = pd.read_csv(study_labels_csv, header=0,
                         names=["study_path", "label"],
                         skipinitialspace=True)
    # drop non-integer label rows (reference cleaning, :852-863)
    labels = labels[labels["label"].apply(
        lambda x: str(x).strip().lstrip("-").isdigit())]
    labels["label"] = labels["label"].astype(int)
    labels["study_path"] = labels["study_path"].apply(
        lambda x: os.path.normpath(os.path.join(root_dir, x)))

    study_to_label = dict(zip(labels["study_path"], labels["label"]))
    study_to_images: Dict[str, List[str]] = {}
    for p in paths["image_path"]:
        full = os.path.normpath(os.path.join(root_dir, p))
        study = _study_of(full)
        if study in study_to_label:
            study_to_images.setdefault(study, []).append(full)

    rows = []
    for study, images in study_to_images.items():
        label = study_to_label[study]
        patient = _patient_of(study)
        for img1, img2 in study_pairs(images):
            rows.append((img1, img2, label, study, patient,
                         _body_part_of(img1)))
    return pd.DataFrame(rows, columns=["image_path1", "image_path2", "label",
                                       "study_path", "patient_id",
                                       "body_part"])


def patient_level_split(sample_df: pd.DataFrame, seed: int,
                        test_size: float = 0.08):
    """Stratified 92/8 patient split; UNKNOWN patients go to train
    (`:979-1015`); asserts no patient overlap."""
    from sklearn.model_selection import train_test_split

    patient_df = (sample_df.groupby("patient_id")["label"]
                  .agg(lambda x: x.value_counts().idxmax()).reset_index())
    unknown = patient_df["patient_id"] == "UNKNOWN_PATIENT"
    train_ids = set(patient_df[unknown]["patient_id"])
    rest = patient_df[~unknown]
    stratify = rest["label"] if rest["label"].nunique() > 1 else None
    try:
        tr, te = train_test_split(rest, test_size=test_size,
                                  random_state=seed, shuffle=True,
                                  stratify=stratify)
    except ValueError:  # too few patients per class to stratify
        tr, te = train_test_split(rest, test_size=test_size,
                                  random_state=seed, shuffle=True)
    train_ids.update(tr["patient_id"])
    test_ids = set(te["patient_id"])
    assert not (train_ids & test_ids), "patient overlap in split"
    train = sample_df[sample_df["patient_id"].isin(train_ids)].copy()
    val = sample_df[sample_df["patient_id"].isin(test_ids)].copy()
    val = val[val["body_part"] != "UNKNOWN"]
    return train, val


def _load_pair(sample):
    p1, p2, label = sample
    return load_grayscale(p1), load_grayscale(p2), np.int32(label)


def create_data_loaders(train_image_paths_csv, train_study_labels_csv,
                        valid_image_paths_csv, valid_study_labels_csv,
                        config, body_part: Optional[str] = None):
    """Equivalent of ``create_data_loader4`` (`:797-1126`): returns
    (train_loader, val_loader, test_loader); test = the official valid CSV.

    `body_part` optionally filters the test loader to one of the seven parts
    (used by the per-part inference sweep, `2_inference_mura.py:154-260`).
    """
    root = config["root_dir"]
    df = read_mura_tables(train_image_paths_csv, train_study_labels_csv, root)
    train_df, val_df = patient_level_split(df, seed=config["seed"])

    test_df = read_mura_tables(valid_image_paths_csv, valid_study_labels_csv,
                               root)
    if body_part is not None:
        test_df = test_df[test_df["body_part"] == body_part]

    def to_samples(d):
        return list(d[["image_path1", "image_path2", "label"]]
                    .itertuples(index=False, name=None))

    if config.get("device_preprocess"):
        # host stages u8 only; resize/crop/flip/rotate/normalize run
        # on-device (`data.device_pipeline.DevicePreprocess`)
        from xfmamba_tpu.data.device_pipeline import StagingTransform
        tt = StagingTransform(tuple(config["image_size"]))
        et = StagingTransform(tuple(config["image_size"]))
    else:
        tt = mura_train_transform(tuple(config["image_size"]))
        et = mura_eval_transform(tuple(config["image_size"]))
    mk = lambda d, tf: TwoViewSamples(to_samples(d), _load_pair, tf)
    nw = config.get("num_workers", 4)
    procs = bool(config.get("loader_processes"))
    train_loader = TwoViewLoader(mk(train_df, tt), config["batch_size"],
                                 shuffle=True, drop_last=True,
                                 num_workers=nw, seed=config["seed"],
                                 use_processes=procs)
    val_loader = TwoViewLoader(mk(val_df, et), config["batch_size"],
                               shuffle=False, num_workers=nw,
                               seed=config["seed"], use_processes=procs)
    test_loader = TwoViewLoader(mk(test_df, et),
                                config.get("eval_batch_size",
                                           config["batch_size"]),
                                shuffle=False, num_workers=nw,
                                seed=config["seed"], use_processes=procs)
    return train_loader, val_loader, test_loader
