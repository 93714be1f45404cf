"""CBIS-DDSM pipeline tests on a synthetic dataset (UID join, two-view
grouping, 80/20 abnormality-stratified split, mask handling, loaders, and
the DDSM inference CLI) — no pydicom needed: `read_pixels` falls back to
pre-converted .npy files."""

import os

import numpy as np
import pytest

from xfmamba_tpu.data import ddsm


def _write_npy(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, arr)


@pytest.fixture
def ddsm_tree(tmp_path):
    base = tmp_path / "CBIS-DDSM"
    rng = np.random.default_rng(0)
    meta_rows = ["Series UID,File Location,Number of Images"]
    case_rows = ["patient_id,left or right breast,image view,"
                 "abnormality type,pathology,image file path,"
                 "ROI mask file path"]
    for p in range(6):
        pid = f"P_{p:05d}"
        pathology = ["BENIGN", "MALIGNANT"][p % 2]
        abn = ["mass", "calcification"][p % 2]
        for view in ("CC", "MLO"):
            img_uid = f"uid.img.{p}.{view}"
            roi_uid = f"uid.roi.{p}.{view}"
            img_loc = f"./{pid}/{view}/img"
            roi_loc = f"./{pid}/{view}/roi"
            meta_rows.append(f"{img_uid},{img_loc},1")
            meta_rows.append(f"{roi_uid},{roi_loc},1")
            img = rng.integers(0, 4000, (60, 40)).astype(np.float32)
            mask = np.zeros((60, 40), np.float32)
            mask[10:30, 5:20] = 1.0
            _write_npy(str(base / pid / view / "img" / "1-1.npy"), img)
            _write_npy(str(base / pid / view / "roi" / "1-1.npy"), mask)
            case_rows.append(
                f"{pid},LEFT,{view},{abn},{pathology},"
                f"a/{img_uid}/x.dcm,b/{roi_uid}/y.dcm")
    meta_csv = tmp_path / "metadata.csv"
    case_csv = tmp_path / "mass_case.csv"
    meta_csv.write_text("\n".join(meta_rows))
    case_csv.write_text("\n".join(case_rows))
    return str(base), str(meta_csv), str(case_csv)


def test_load_subjects_and_split(ddsm_tree):
    base, meta, case = ddsm_tree
    subjects = ddsm.load_subjects([case], meta, base)
    assert len(subjects) == 6
    for s in subjects:
        assert set(s["views"]) == {"cc", "mlo"}
        assert s["views"]["cc"]["image_file"].endswith("1-1.dcm")
    labels = [ddsm.subject_label(s) for s in subjects]
    assert set(labels) == {0, 1}
    tr, te = ddsm.reference_split(subjects)
    assert not set(tr) & set(te)
    assert len(tr) + len(te) == 6


def test_load_view_mask_and_overlay(ddsm_tree):
    base, meta, case = ddsm_tree
    subjects = ddsm.load_subjects([case], meta, base)
    s = subjects[0]
    img, mask = ddsm.load_view(s["views"]["cc"], s["side"])
    assert img.shape == (60, 40) and mask.shape == (60, 40)
    assert mask.sum() > 0
    img_ov, _ = ddsm.load_view(s["views"]["cc"], s["side"],
                               overlay_mask=True)
    assert float(img_ov[15, 10]) >= float(img[15, 10])  # whitened ROI


def test_ddsm_loaders(ddsm_tree):
    base, meta, case = ddsm_tree
    config = dict(image_size=(32, 32), batch_size=2, num_workers=2, seed=42)
    tr, va = ddsm.create_data_loaders([case], meta, base, config)
    batch = next(iter(tr))
    assert batch["image1"].shape == (2, 32, 32, 1)
    assert batch["image1"].dtype == np.float32
    assert set(np.unique(batch["label"])) <= {0, 1}


@pytest.mark.slow
def test_ddsm_infer_cli(ddsm_tree, tmp_path):
    from xfmamba_tpu.cli.infer_ddsm import main as infer_main
    base, meta, case = ddsm_tree
    out = str(tmp_path / "out")
    results = infer_main([
        "--model_name", "twoviewxfmamba_smoke", "--image_size", "32",
        "--batch_size", "2", "--num_workers", "2",
        "--base_dir", base, "--metadata_csv", meta, "--case_csvs", case,
        "--out_dir", out,
    ])
    # the tiny test fold may be single-class; artifacts exist when not
    for tag, auc in results.items():
        assert 0.0 <= auc <= 1.0
        assert os.path.exists(os.path.join(out, f"auc_{tag}.txt"))
