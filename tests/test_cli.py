"""End-to-end CLI tests on a synthetic MURA tree (train 1 epoch -> infer
from the saved checkpoint -> FLOPs -> Grad-CAM export)."""

import os

import numpy as np
import pytest
from PIL import Image

from xfmamba_tpu.cli import build_model_by_name
from xfmamba_tpu.cli.infer_mura import main as infer_mura_main
from xfmamba_tpu.cli.train import main as train_main


def _png(path, size=(32, 40), seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, size, dtype=np.uint8)).save(path)


@pytest.fixture
def mura_tree(tmp_path):
    root = tmp_path / "MURA"
    rows_img, rows_lbl = [], []
    for p in range(10):
        part = ["XR_ELBOW", "XR_WRIST"][p % 2]
        study = f"train/{part}/patient{p:05d}/study1_x"
        rel = f"{study}/image1.png"
        _png(str(root / rel), seed=p)
        rows_img.append(rel)
        # decorrelate label from body part so every per-part fold has
        # both classes
        rows_lbl.append((study + "/", (p // 2) % 2))
    img_csv = tmp_path / "imgs.csv"
    lbl_csv = tmp_path / "lbls.csv"
    img_csv.write_text("path\n" + "\n".join(rows_img))
    lbl_csv.write_text("study,label\n" +
                       "\n".join(f"{s},{l}" for s, l in rows_lbl))
    return root, img_csv, lbl_csv


def test_model_name_dispatch():
    for name, two_view in [("twoviewxfmamba", True),
                           ("twoviewxfmamba_tiny", True),
                           ("twoviewxfmamba_base", True),
                           ("dualfusionmambav13", True),
                           ("singleviewmamba", False),
                           ("twoviewlatejoinmamba", True),
                           ("twoviewearlyfusionmamba", True),
                           ("twoviewxfmamba_smoke", True)]:
        m, tv = build_model_by_name(name, 2)
        assert tv is two_view
    with pytest.raises(ValueError):
        build_model_by_name("nope", 2)


@pytest.mark.slow
def test_train_and_infer_cli(mura_tree, tmp_path):
    root, img_csv, lbl_csv = mura_tree
    save_dir = str(tmp_path / "run")
    state, history = train_main([
        "--dataset", "mura", "--model_name", "twoviewxfmamba_smoke",
        "--image_size", "32", "--batch_size", "4", "--epochs", "1",
        "--num_workers", "2", "--data_parallel", "0",
        "--data_root", str(root),
        "--train_image_csv", str(img_csv),
        "--train_label_csv", str(lbl_csv),
        "--valid_image_csv", str(img_csv),
        "--valid_label_csv", str(lbl_csv),
        "--savemodel_path", save_dir,
    ])
    assert len(history) == 1
    best = os.path.join(save_dir, "best.npz")
    assert os.path.exists(best)
    assert os.path.exists(os.path.join(save_dir, "epoch_0", "metrics.txt"))

    out_dir = str(tmp_path / "infer")
    aucs = infer_mura_main([
        "--model_name", "twoviewxfmamba_smoke", "--image_size", "32",
        "--batch_size", "4", "--num_workers", "2",
        "--pretrained_model_path", best,
        "--data_root", str(root),
        "--valid_image_csv", str(img_csv),
        "--valid_label_csv", str(lbl_csv),
        "--body_parts", "ELBOW", "WRIST",
        "--out_dir", out_dir, "--gradcam", "1",
    ])
    assert "combined" in aucs
    assert os.path.exists(os.path.join(out_dir, "auc_combined.txt"))
    assert os.path.exists(os.path.join(out_dir, "gradcam.npz"))
    cams = np.load(os.path.join(out_dir, "gradcam.npz"))
    assert cams["cam_a"].shape[1:] == (32, 32)
    # heatmap-on-image overlay renders (reference `2_inference_mura.py:189`)
    assert os.path.exists(os.path.join(out_dir, "gradcam_overlay_0.png"))


@pytest.mark.slow
def test_cal_flops_cli(mura_tree, tmp_path):
    root, img_csv, lbl_csv = mura_tree
    out = infer_mura_main([
        "--model_name", "twoviewxfmamba_smoke", "--image_size", "32",
        "--cal_flops", "1",
        "--valid_image_csv", str(img_csv),
        "--valid_label_csv", str(lbl_csv),
    ])
    assert out["flops"] > 0 and out["params"] > 0
