"""Native host-kernel tests: compiled C++ vs numpy/cv2 references."""

import numpy as np
import pytest

from xfmamba_tpu import native


def test_normalize_u8_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (3, 37, 53), dtype=np.uint8)
    got = native.normalize_u8(x, mean=0.456, std=0.224, threads=2)
    want = ((x.astype(np.float32) / 255.0) - 0.456) / 0.224
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert got.dtype == np.float32


def test_normalize_single_image():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    got = native.normalize_u8(x)
    np.testing.assert_allclose(got, x.astype(np.float32) / 255.0,
                               rtol=1e-6, atol=1e-6)


def test_resize_bilinear_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((40, 30)).astype(np.float32)
    got = native.resize_bilinear(x, 17, 23)
    want = cv2.resize(x, (23, 17), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_transform_uses_native_path():
    from xfmamba_tpu.data.transforms import TwoViewTransform
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 48), dtype=np.uint8)
    tf = TwoViewTransform(image_size=(32, 32), train=False,
                          normalize_mean=0.456, normalize_std=0.224)
    out = tf(img)
    assert out.shape == (32, 32, 1) and out.dtype == np.float32
    # matches the plain-numpy composition
    from xfmamba_tpu.data.transforms import resize
    want = ((resize(img, (32, 32)).astype(np.float32) / 255.0 - 0.456)
            / 0.224)[:, :, None]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
