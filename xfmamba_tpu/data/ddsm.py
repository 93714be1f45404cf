"""CBIS-DDSM two-view (CC + MLO) mammogram pipeline.

Behavior mirrors ``/root/reference/libs/dataset_ddsmxray_twoview.py``:
- case CSVs joined to ``metadata.csv`` via Series-UID -> (file location,
  image number) (`:81-91`, `:155-172`); DICOMs found as ``1-<n>.dcm``
- grouped by (patient, side, abnormality); kept only when BOTH CC and MLO
  exist (`:215-250`)
- pathology mapped benign/benign-without-callback -> 0, malignant -> 1
  (`:20-25`, `:268-275`)
- ROI masks OR-combined with nearest resize (`:301-313`)
- optional rescale + NYU largest-connected-component crop (`:327-341`)
- 80/20 split stratified by abnormality type with ``random.seed(42)``
  shuffles (`:704-743`) — reproduced with the same stdlib-random recipe.

DICOM decode needs ``pydicom`` which is not installed in this image; the
pipeline is gated (raises a clear error) and also accepts pre-converted
PNG/NPY files next to the DICOM paths.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from xfmamba_tpu.data import nyu_cropping
from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.data.transforms import TwoViewTransform, resize

try:
    import pydicom
    HAS_PYDICOM = True
except Exception:  # pragma: no cover
    pydicom = None
    HAS_PYDICOM = False

ASSESSMENT_MAP = {"BENIGN_WITHOUT_CALLBACK": "benign", "BENIGN": "benign",
                  "MALIGNANT": "malignant"}
SIDE_MAP = {"LEFT": "left", "RIGHT": "right"}
VIEW_MAP = {"CC": "cc", "MLO": "mlo"}


def _extract_series_uid(path: str) -> str:
    parts = path.strip().split("/")
    if len(parts) < 2:
        raise ValueError(f"path {path!r} not in expected format")
    return parts[-2]


def _normalize_subdir(p: str) -> str:
    p = p.replace("\\", "/")
    if p.startswith("./"):
        p = p[2:]
    return os.path.normpath(p)


def read_metadata(metadata_csv: str) -> Dict[str, Tuple[str, int]]:
    import csv
    out = {}
    with open(metadata_csv) as f:
        for row in csv.DictReader(f):
            out[row["Series UID"]] = (row["File Location"],
                                      int(row["Number of Images"]))
    return out


def load_subjects(main_csv_files, metadata_csv, base_dir,
                  check_exists: bool = True) -> List[Dict]:
    """Group case rows into two-view subjects (see module docstring)."""
    import csv
    uid_map = read_metadata(metadata_csv)
    if isinstance(main_csv_files, str):
        main_csv_files = [main_csv_files]

    groups: Dict[Tuple, Dict] = {}
    for csv_file in main_csv_files:
        with open(csv_file) as f:
            for line in csv.DictReader(f):
                pid = line["patient_id"]
                side = SIDE_MAP.get(line["left or right breast"].upper(),
                                    line["left or right breast"].lower())
                view = VIEW_MAP.get(line["image view"].upper(),
                                    line["image view"].lower())
                abnormality = line["abnormality type"].lower()
                pathology = line["pathology"]
                key = (pid, side, view, abnormality)
                g = groups.setdefault(key, dict(
                    patient_id=pid, side=side, view=view,
                    abnormality_type=abnormality,
                    assessment_label=pathology, image_file=None,
                    mask_files=[]))

                def resolve(rel):
                    uid = _extract_series_uid(rel)
                    if uid not in uid_map:
                        return None
                    loc, num = uid_map[uid]
                    d = _normalize_subdir(os.path.join(base_dir, loc))
                    return os.path.join(d, f"1-{num}.dcm")

                img = resolve(line["image file path"].strip())
                mask = resolve(line["ROI mask file path"].strip())
                if img is None or mask is None:
                    continue
                if check_exists and not _exists_any(img):
                    continue
                if check_exists and not _exists_any(mask):
                    continue
                if g["image_file"] is None:
                    g["image_file"] = img
                g["mask_files"].append(mask)

    merged: Dict[Tuple, Dict] = {}
    for (pid, side, view, abn), g in groups.items():
        key2 = (pid, side, abn)
        m = merged.setdefault(key2, dict(
            patient_id=pid, side=side, abnormality_type=abn,
            assessment_label=g["assessment_label"], views={}))
        m["views"][view] = dict(image_file=g["image_file"],
                                mask_files=g["mask_files"])

    subjects = []
    for (pid, side, abn), m in merged.items():
        v = m["views"]
        if "cc" in v and "mlo" in v and v["cc"]["image_file"] \
                and v["mlo"]["image_file"]:
            subjects.append(m)
    return subjects


def _exists_any(dcm_path: str) -> bool:
    if os.path.exists(dcm_path):
        return True
    base = os.path.splitext(dcm_path)[0]
    return any(os.path.exists(base + ext) for ext in (".png", ".npy"))


def read_pixels(dcm_path: str) -> np.ndarray:
    """DICOM pixel array (float32); falls back to a pre-converted .png/.npy
    next to the DICOM path when pydicom is unavailable."""
    if os.path.exists(dcm_path) and HAS_PYDICOM:
        return pydicom.dcmread(dcm_path).pixel_array.astype(np.float32)
    base = os.path.splitext(dcm_path)[0]
    if os.path.exists(base + ".npy"):
        return np.load(base + ".npy").astype(np.float32)
    if os.path.exists(base + ".png"):
        from PIL import Image
        return np.asarray(Image.open(base + ".png")).astype(np.float32)
    if not HAS_PYDICOM:
        raise RuntimeError(
            f"pydicom is not installed and no converted .png/.npy exists "
            f"for {dcm_path}; pre-convert DICOMs or install pydicom")
    raise FileNotFoundError(dcm_path)


def load_view(view_data: Dict, side: str, crop: bool = False,
              rescale_factor: Optional[float] = None,
              overlay_mask: bool = False):
    """image (+ OR-combined mask) for one view; optional NYU crop
    (`:288-341`) and the Crop-Test dataset's white-highlight overlay
    (`:621`)."""
    image = read_pixels(view_data["image_file"])
    mask = np.zeros(image.shape, bool)
    for mp in view_data["mask_files"]:
        m = read_pixels(mp)
        if m.shape != image.shape:
            m = resize(m, image.shape[:2])
        mask |= m > 0
    if rescale_factor is not None:
        new_hw = (int(image.shape[0] * rescale_factor),
                  int(image.shape[1] * rescale_factor))
        image = resize(image, new_hw)
        mask = resize(mask.astype(np.float32), new_hw) > 0.5
    if crop:
        (top, bottom, left, right), *_ = \
            nyu_cropping.crop_img_from_largest_connected(image, side)
        image = image[top:bottom, left:right]
    if overlay_mask:
        # alpha-blend the ROI toward white
        mx = image.max() or 1.0
        image = np.where(mask[:image.shape[0], :image.shape[1]]
                         if mask.shape == image.shape else False,
                         0.5 * image + 0.5 * mx, image)
    return image, mask


def subject_label(subj: Dict) -> int:
    kind = ASSESSMENT_MAP[subj["assessment_label"]]
    return 0 if kind == "benign" else 1


def reference_split(subjects: List[Dict]):
    """80/20 per-abnormality split with random.seed(42) (`:704-743`)."""
    calc = [i for i, s in enumerate(subjects)
            if s["abnormality_type"] == "calcification"]
    mass = [i for i, s in enumerate(subjects)
            if s["abnormality_type"] == "mass"]
    random.seed(42)
    random.shuffle(calc)
    random.shuffle(mass)
    cs, ms = int(0.8 * len(calc)), int(0.8 * len(mass))
    return calc[:cs] + mass[:ms], calc[cs:] + mass[ms:]


def _scale_to_uint8(img: np.ndarray) -> np.ndarray:
    hi = img.max() or 1.0
    return np.clip(img / hi * 255.0, 0, 255).astype(np.uint8)


class DDSMLoadFn:
    """Picklable DICOM->u8 two-view load fn (a class, not a closure, so
    the process-pool loader can ship it to spawn-mode workers)."""

    def __init__(self, subjects, crop=False, rescale_factor=None,
                 overlay_mask=False):
        self.subjects = subjects
        self.crop = crop
        self.rescale_factor = rescale_factor
        self.overlay_mask = overlay_mask

    def __call__(self, sample):
        subj = self.subjects[sample]
        cc, _ = load_view(subj["views"]["cc"], subj["side"], self.crop,
                          self.rescale_factor, self.overlay_mask)
        mlo, _ = load_view(subj["views"]["mlo"], subj["side"], self.crop,
                           self.rescale_factor, self.overlay_mask)
        return (_scale_to_uint8(cc), _scale_to_uint8(mlo),
                np.int32(subject_label(subj)))


def make_load_fn(subjects, crop=False, rescale_factor=None,
                 overlay_mask=False):
    return DDSMLoadFn(subjects, crop, rescale_factor, overlay_mask)


def create_data_loaders(main_csv_files, metadata_csv, base_dir, config,
                        crop_size=None, rescale_factor=None):
    """Equivalent of ``create_ddsmxray_data_loader`` (`:674-760`)."""
    subjects = load_subjects(main_csv_files, metadata_csv, base_dir)
    tr_i, va_i = reference_split(subjects)
    if config.get("device_preprocess"):
        # DICOM decode + NYU crop stay host-side; the host then stages
        # u8 at the image size and the float pipeline runs on-device
        # (`data.device_pipeline.ddsm_device_preprocess`)
        from xfmamba_tpu.data.device_pipeline import StagingTransform
        tt = StagingTransform(tuple(config["image_size"]))
        et = StagingTransform(tuple(config["image_size"]))
    else:
        # DDSM transforms: no crop, no normalize (`:676-692`)
        tt = TwoViewTransform(tuple(config["image_size"]), crop=None,
                              normalize_mean=None, normalize_std=None,
                              train=True)
        et = TwoViewTransform(tuple(config["image_size"]), train=False,
                              normalize_mean=None, normalize_std=None)
    load = make_load_fn(subjects, crop=crop_size is not None,
                        rescale_factor=rescale_factor)
    nw = config.get("num_workers", 4)
    procs = bool(config.get("loader_processes"))
    train_loader = TwoViewLoader(TwoViewSamples(tr_i, load, tt),
                                 config["batch_size"], shuffle=True,
                                 drop_last=True, num_workers=nw,
                                 seed=config["seed"], use_processes=procs)
    val_loader = TwoViewLoader(TwoViewSamples(va_i, load, et),
                               config["batch_size"], shuffle=False,
                               num_workers=nw, seed=config["seed"],
                               use_processes=procs)
    return train_loader, val_loader
