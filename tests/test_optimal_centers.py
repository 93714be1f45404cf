"""Optimal-window search (`data/optimal_centers.py`) golden-tested against
the live reference module (`/root/reference/libs/calc_optimal_centers.py`,
pure numpy/pandas — imported directly as the oracle), plus the one-pass
distance-transform morphology vs scipy's iterated erosion/dilation."""

import importlib.util
import os

import numpy as np
import pytest
import scipy.ndimage as ndi

from xfmamba_tpu.data import optimal_centers as oc
from xfmamba_tpu.data.nyu_cropping import (
    fast_binary_dilation, fast_binary_erosion, find_crop_center)

REF_PATH = "/root/reference/libs/calc_optimal_centers.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_PATH):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_calc_oc", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _blob_image(seed, shape=(48, 36)):
    rng = np.random.default_rng(seed)
    img = np.zeros(shape, np.float32)
    for _ in range(3):
        cy, cx = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        h, w = rng.integers(5, 18), rng.integers(5, 15)
        img[max(0, cy - h // 2):cy + h, max(0, cx - w // 2):cx + w] = 1.0
    return img


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("step", [1, 3])
def test_window_info_matches_reference(ref, seed, step):
    img = _blob_image(seed)
    com = np.array([20, 17])
    for wd in [(8, 8), (15, 11), (48, 36), (64, 48)]:
        mine = oc.get_image_optimal_window_info(
            img, com, np.array(wd), step=step)
        theirs = ref.get_image_optimal_window_info(
            img, com, np.array(wd), step=step)
        for k in ("window_dim_y", "window_dim_x",
                  "best_center_y", "best_center_x"):
            assert int(mine[k]) == int(theirs[k]), (wd, k, mine, theirs)
        assert abs(mine["fraction"] - theirs["fraction"]) < 1e-12


def test_constraints_match_reference(ref):
    img = _blob_image(5, (60, 44))
    com = np.array([30, 22])
    wd = np.array([20, 16])
    pairs = [
        (oc.get_rightmost_pixel_constraint(40),
         ref.get_rightmost_pixel_constraint(40)),
        (oc.get_bottomrightmost_pixel_constraint(40, 50),
         ref.get_bottomrightmost_pixel_constraint(40, 50)),
    ]
    for mine_c, ref_c in pairs:
        mine = oc.get_image_optimal_window_info(
            img, com, wd, tl_br_constraint=mine_c)
        theirs = ref.get_image_optimal_window_info(
            img, com, wd, tl_br_constraint=ref_c)
        assert int(mine["best_center_y"]) == int(theirs["best_center_y"])
        assert int(mine["best_center_x"]) == int(theirs["best_center_x"])
        assert abs(mine["fraction"] - theirs["fraction"]) < 1e-12


def test_dataframe_api_matches_reference(ref):
    img = _blob_image(7)
    com = np.array([24, 18])
    sizes = [np.array([10, 10]), np.array([20, 14])]
    mine = oc.get_images_optimal_window_info(img, com, sizes)
    theirs = ref.get_images_optimal_window_info(img, com, sizes)
    assert list(mine.columns) == list(theirs.columns)
    for col in mine.columns:
        np.testing.assert_allclose(mine[col].to_numpy(dtype=float),
                                   theirs[col].to_numpy(dtype=float))


@pytest.mark.parametrize("iterations", [1, 3, 10])
def test_fast_morphology_matches_scipy(iterations):
    rng = np.random.default_rng(42 + iterations)
    mask = ndi.binary_dilation(rng.random((64, 80)) > 0.97, iterations=4)
    er_fast = fast_binary_erosion(mask, iterations)
    er_ref = ndi.binary_erosion(mask, iterations=iterations)
    np.testing.assert_array_equal(er_fast, er_ref)
    di_fast = fast_binary_dilation(mask, iterations)
    di_ref = ndi.binary_dilation(mask, iterations=iterations)
    np.testing.assert_array_equal(di_fast, di_ref)


def test_fast_morphology_edge_cases():
    empty = np.zeros((16, 16), bool)
    full = np.ones((16, 16), bool)
    np.testing.assert_array_equal(fast_binary_erosion(empty, 2), empty)
    np.testing.assert_array_equal(fast_binary_dilation(full, 2), full)
    # border semantics: erosion eats inward from the frame edge
    np.testing.assert_array_equal(fast_binary_erosion(full, 2),
                                  ndi.binary_erosion(full, iterations=2))
    m = np.zeros((8, 8), bool)
    np.testing.assert_array_equal(fast_binary_erosion(m, 0), m)
    np.testing.assert_array_equal(fast_binary_dilation(m, 0), m)


@pytest.mark.parametrize("side,view", [("left", "cc"), ("left", "mlo"),
                                       ("right", "cc")])
def test_find_crop_center_full_contract(side, view):
    """The upgraded find_crop_center returns the reference's full
    ((cy, cx), bbox, wininfo) contract (`nyu_cropping.py:219-270`)."""
    img = np.zeros((300, 200), np.float32)
    ys, xs = np.mgrid[0:300, 0:200]
    if side == "left":
        img[(ys - 150) ** 2 / 4 + xs ** 2 < 120 ** 2] = 1000.0
    else:
        img[(ys - 150) ** 2 / 4 + (199 - xs) ** 2 < 120 ** 2] = 1000.0
    (cy, cx), bbox, wininfo = find_crop_center(
        img, crop_size=(128, 96), side=side, view=view, iterations=10)
    assert 0 <= cy < 300
    assert {"best_center_y", "fraction"} <= set(wininfo)
    assert wininfo["fraction"] > 0.2
    # the crop center must sit on the breast side of the frame
    if side == "left":
        assert cx < 160
    else:
        assert cx > 40
