"""Data-layer tests on synthetic datasets (the reference's dataset smoke
tests need cluster paths, SURVEY.md §4 — here we generate tiny fake
datasets in tmp dirs and assert pairing/split/batch invariants)."""

import os

import numpy as np
import pytest
from PIL import Image

from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.data.mura import (
    create_data_loaders as mura_loaders, patient_level_split,
    read_mura_tables, study_pairs)
from xfmamba_tpu.data import chexpert, hipxray
from xfmamba_tpu.data.nyu_cropping import (
    crop_img_from_largest_connected, optimal_window_center)


def _png(path, size=(32, 40), seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, size, dtype=np.uint8).astype(
        np.uint8)).save(path)


def test_study_pairs_policy():
    assert study_pairs(["a"]) == [("a", "a")]
    assert study_pairs(["b", "a"]) == [("a", "b")]
    assert len(study_pairs(list("abc"))) == 3
    assert len(study_pairs(list("abcd"))) == 6  # all unique pairs


@pytest.fixture
def mura_tree(tmp_path):
    root = tmp_path / "MURA"
    rows_img, rows_lbl = [], []
    parts = ["XR_ELBOW", "XR_WRIST"]
    for p in range(8):
        part = parts[p % 2]
        study = f"train/{part}/patient{p:05d}/study1_positive"
        n_imgs = 1 + (p % 3)
        for i in range(n_imgs):
            rel = f"{study}/image{i + 1}.png"
            _png(str(root / rel), seed=p * 10 + i)
            rows_img.append(rel)
        rows_lbl.append((study + "/", p % 2))
    img_csv = tmp_path / "imgs.csv"
    lbl_csv = tmp_path / "lbls.csv"
    img_csv.write_text("path\n" + "\n".join(rows_img))
    lbl_csv.write_text("study,label\n" +
                       "\n".join(f"{s},{l}" for s, l in rows_lbl))
    return root, img_csv, lbl_csv


def test_mura_tables_and_split(mura_tree):
    root, img_csv, lbl_csv = mura_tree
    df = read_mura_tables(str(img_csv), str(lbl_csv), str(root))
    assert len(df) > 0
    assert set(df["label"]) <= {0, 1}
    # pairing count: studies with 1 img -> 1 pair, 2 -> 1, 3 -> 3
    tr, va = patient_level_split(df, seed=42, test_size=0.25)
    assert not set(tr["patient_id"]) & set(va["patient_id"])
    assert len(tr) + len(va) == len(df)


def test_mura_loaders_end_to_end(mura_tree):
    root, img_csv, lbl_csv = mura_tree
    config = dict(root_dir=str(root), image_size=(32, 32), batch_size=3,
                  num_workers=2, seed=0)
    train, val, test = mura_loaders(str(img_csv), str(lbl_csv),
                                    str(img_csv), str(lbl_csv), config)
    batch = next(iter(train))
    assert batch["image1"].shape == (3, 32, 32, 1)
    assert batch["image1"].dtype == np.float32
    assert batch["label"].shape == (3,)
    b2 = next(iter(test))
    assert b2["n_valid"] <= b2["image1"].shape[0]


def test_chexpert_pipeline(tmp_path):
    root = tmp_path / "chexpert"
    rows = ["Path,Frontal/Lateral,Cardiomegaly,No Finding"]
    for p in range(6):
        for view in ("frontal", "lateral"):
            rel = f"patient{p:04d}/study1/view1_{view}.jpg"
            _png(str(root / rel), seed=p)
            rows.append(f"{rel},{view.capitalize()},{p % 2},")
    # one incomplete study (frontal only) must be skipped
    _png(str(root / "patient9999/study1/view1_frontal.jpg"))
    rows.append("patient9999/study1/view1_frontal.jpg,Frontal,1,0")
    csv = tmp_path / "train.csv"
    csv.write_text("\n".join(rows))

    samples = chexpert.build_samples([str(csv)], [str(root)])
    assert len(samples) == 6
    assert samples[0][2].shape == (14,)
    s13 = chexpert.build_samples([str(csv)], [str(root)],
                                 drop_no_finding=True)
    assert s13[0][2].shape == (13,)

    config = dict(image_size=(32, 32), batch_size=2, num_workers=2, seed=42)
    tr, va, te = chexpert.create_train_val_test_data_loaders(
        [str(root)], [str(csv)], config)
    batch = next(iter(tr))
    assert batch["label"].shape == (2, 14)


def test_chexpert_split_matches_torch_random_split():
    torch = pytest.importorskip("torch")
    from torch.utils.data import random_split
    n, seed = 40, 42
    tr, va, te = chexpert.reference_split_indices(n, seed)
    t_tr, t_va, t_te = random_split(
        list(range(n)), [30, 5, 5],
        generator=torch.Generator().manual_seed(seed))
    assert tr == list(t_tr.indices)
    assert va == list(t_va.indices)
    assert te == list(t_te.indices)


def test_hipxray_pipeline(tmp_path):
    img_dir = tmp_path / "hips"
    rows = ["Image_no,Admission_Date,Fracture_Classification,"
            "Final_Classification"]
    for i in range(1, 7):
        _png(str(img_dir / f"{i:03d} AP.jpg"), seed=i)
        _png(str(img_dir / f"{i:03d} Lateral.jpg"), seed=100 + i)
        cls = "TypeA" if i % 2 else "TypeB"
        rows.append(f"{i},2020-01-01,Include,{cls}")
    rows.append("7,2020-01-01,Exclude,TypeA")  # excluded row
    csv = tmp_path / "hip.csv"
    csv.write_text("\n".join(rows))

    samples, mapping = hipxray.build_samples(str(img_dir), str(csv))
    assert len(samples) == 6
    assert mapping == {"TypeA": 0, "TypeB": 1}
    config = dict(image_size=(32, 32), batch_size=2, num_workers=1, seed=0,
                  train_ratio=0.5)
    tr, va, mp = hipxray.create_data_loaders(str(img_dir), str(csv), config)
    assert len(tr) + len(va) >= 2


def test_nyu_crop_finds_breast_region():
    img = np.zeros((200, 160), np.float32)
    img[40:160, 0:70] = 100.0  # breast touching the left edge
    img[10, 120:150] = 5.0     # thin line to be eroded away
    (top, bottom, left, right), rightmost, bottommost, dist = \
        crop_img_from_largest_connected(img, "left", iterations=5,
                                        buffer_size=10)
    assert top <= 40 and bottom >= 160
    assert left == 0 and right >= 70
    assert dist == 0


def test_optimal_window_center():
    mask = np.zeros((100, 100), bool)
    mask[60:90, 10:40] = True
    cy, cx = optimal_window_center(mask, (30, 30))
    assert 60 <= cy <= 90 and 10 <= cx <= 40


def test_loader_padding_and_shuffle_determinism(tmp_path):
    imgs = []
    for i in range(5):
        p = str(tmp_path / f"im{i}.png")
        _png(p, seed=i)
        imgs.append((p, p, np.int32(i % 2)))

    from xfmamba_tpu.data.transforms import load_grayscale, TwoViewTransform

    def load(s):
        return load_grayscale(s[0]), load_grayscale(s[1]), s[2]

    ds = TwoViewSamples(imgs, load, TwoViewTransform((16, 16), train=False))
    loader = TwoViewLoader(ds, batch_size=2, shuffle=True, seed=7,
                           num_workers=2)
    b1 = [b["label"].tolist() for b in loader]
    # padded final batch
    sizes = [b["n_valid"] for b in TwoViewLoader(ds, 2, num_workers=1)]
    assert sizes == [2, 2, 1]


def test_process_pool_loader_matches_threads(tmp_path):
    """`use_processes=True` (GIL-free worker processes — the mode that
    scales u8 staging across host cores) must produce bit-identical
    batches to the thread pool: same per-sample rng keying, same order."""
    from xfmamba_tpu.data.device_pipeline import StagingTransform
    from xfmamba_tpu.data.mura import _load_pair

    imgs = []
    for i in range(6):
        p = str(tmp_path / f"im{i}.png")
        _png(p, size=(40, 30), seed=i)
        imgs.append((p, p, np.int32(i % 2)))

    ds = TwoViewSamples(imgs, _load_pair, StagingTransform((16, 16)))
    kw = dict(batch_size=2, shuffle=True, seed=7, num_workers=2)
    thread_batches = list(TwoViewLoader(ds, **kw))
    proc_batches = list(TwoViewLoader(ds, use_processes=True, **kw))
    assert len(thread_batches) == len(proc_batches) == 3
    for bt, bp in zip(thread_batches, proc_batches):
        assert bt["n_valid"] == bp["n_valid"]
        np.testing.assert_array_equal(bt["image1"], bp["image1"])
        np.testing.assert_array_equal(bt["image2"], bp["image2"])
        np.testing.assert_array_equal(bt["label"], bp["label"])


def test_ddsm_load_fn_is_picklable():
    """Spawn-mode process pools pickle the dataset (load fn included) to
    each worker; the DDSM load fn is a class, not a closure, for this."""
    import pickle
    from xfmamba_tpu.data.ddsm import make_load_fn
    fn = make_load_fn([{"views": {}, "side": "left"}], crop=True)
    fn2 = pickle.loads(pickle.dumps(fn))
    assert fn2.crop and fn2.subjects == fn.subjects
