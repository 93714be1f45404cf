"""Host-side image transforms (cv2/numpy — C++-backed decode and warps).

Reproduces the reference's torchvision pipelines:
- MURA train: Grayscale → Resize(224²) → RandomCrop(224) → HFlip →
  RandomRotation(30, nearest) → ToTensor → Normalize([0.456],[0.224])
  (`libs/dataset_mura_twoview.py:808-816`)
- CheXpert/DDSM/hip variants differ only in crop/normalize choices
  (`dataset_chexpert_twoview.py:289-303` has no Normalize).

Outputs are channel-last (H, W, 1) float32 — the framework's native layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False
from PIL import Image


def load_grayscale(path: str) -> np.ndarray:
    """Decode an image file to (H, W) uint8 grayscale (PIL 'L' semantics,
    `dataset_mura_twoview.py:115-116`)."""
    if _HAS_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img
    return np.asarray(Image.open(path).convert("L"))


def resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Resize to exact (h, w), bilinear (torchvision Resize((h, w)))."""
    h, w = size
    if img.shape[:2] == (h, w):
        return img
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


def random_crop(img: np.ndarray, size: int, rng: np.random.Generator,
                pad_if_needed: bool = True) -> np.ndarray:
    h, w = img.shape[:2]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        img = np.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2))
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top:top + size, left:left + size]


def random_hflip(img: np.ndarray, rng: np.random.Generator,
                 p: float = 0.5) -> np.ndarray:
    if rng.random() < p:
        return img[:, ::-1]
    return img


def random_rotation(img: np.ndarray, degrees: float,
                    rng: np.random.Generator) -> np.ndarray:
    """Uniform rotation in ±degrees about the center, nearest-neighbor fill-0
    (torchvision RandomRotation defaults)."""
    angle = float(rng.uniform(-degrees, degrees))
    h, w = img.shape[:2]
    if _HAS_CV2:
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_NEAREST,
                              borderValue=0)
    return np.asarray(Image.fromarray(img).rotate(angle,
                                                  resample=Image.NEAREST))


def to_float(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1] with a trailing channel axis."""
    out = img.astype(np.float32) / 255.0
    if out.ndim == 2:
        out = out[:, :, None]
    return out


@dataclasses.dataclass
class TwoViewTransform:
    """Composed per-view transform; `train=False` applies resize-only."""
    image_size: Tuple[int, int] = (224, 224)
    crop: Optional[int] = 224
    hflip: bool = True
    rotation: float = 30.0
    normalize_mean: Optional[float] = 0.456
    normalize_std: Optional[float] = 0.224
    train: bool = True

    def __call__(self, img: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        img = resize(img, self.image_size)
        if self.train:
            rng = rng or np.random.default_rng()
            if self.crop:
                img = random_crop(img, self.crop, rng)
            if self.hflip:
                img = random_hflip(img, rng)
            if self.rotation:
                img = random_rotation(img, self.rotation, rng)
        if (img.dtype == np.uint8 and self.normalize_mean is not None
                and img.ndim == 2):
            # fused native u8 -> normalized f32 (GIL-free C++ kernel;
            # numpy fallback inside) — the loader's hottest per-pixel op
            from xfmamba_tpu.native import normalize_u8
            return np.ascontiguousarray(
                normalize_u8(img, self.normalize_mean,
                             self.normalize_std, threads=1)[:, :, None])
        img = to_float(img)
        if self.normalize_mean is not None:
            img = (img - self.normalize_mean) / self.normalize_std
        return np.ascontiguousarray(img)


def mura_train_transform(image_size=(224, 224)):
    # the reference hardcodes RandomCrop(224) (`:811`) — a no-op at the
    # default 224² resize; clamp to the configured size otherwise
    return TwoViewTransform(image_size=image_size, train=True,
                            crop=min(224, *image_size))


def mura_eval_transform(image_size=(224, 224)):
    return TwoViewTransform(image_size=image_size, train=False)


def chexpert_train_transform(image_size=(224, 224)):
    # no Normalize (commented out in the reference, :295)
    return TwoViewTransform(image_size=image_size, train=True,
                            crop=min(224, *image_size),
                            normalize_mean=None, normalize_std=None)


def chexpert_eval_transform(image_size=(224, 224)):
    return TwoViewTransform(image_size=image_size, train=False,
                            normalize_mean=None, normalize_std=None)
