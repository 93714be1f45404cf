"""jit-compiled on-device preprocessing (the north-star's "device
preprocessing stage"; SURVEY §7 step 5).

Replaces the reference's torchvision transform stack
(`libs/dataset_mura_twoview.py:808-816`: Resize → RandomCrop → HFlip →
RandomRotation(30, nearest) → ToTensor → Normalize) with a batched,
jitted pipeline that runs on the accelerator:

    host (threads): decode -> [NYU crop] -> u8 resize to the staging size
    device (jit)  : u8 -> f32/255 -> resize -> random crop -> hflip ->
                    rotate(nearest, fill 0) -> normalize

Shipping u8 instead of f32 cuts host->device bytes 4x, and all float
math moves off the host.  Decode and the NYU connected-component crop are
inherently host-side (SURVEY §7 hard part 5); the jit boundary is the
fixed-size u8 staging image.

The stage composes INTO the jitted train/eval step (`train.loop
.make_train_step(..., preprocess=...)`) so preprocessing fuses with the
forward pass — one dispatch, no intermediate HBM round-trip at the jit
boundary.  Enable end to end with ``config["device_preprocess"]=True`` on
the data loaders (host transforms then emit staged u8).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _resize_bilinear(x, out_hw):
    """(B, H, W, 1) f32 -> (B, h, w, 1); non-antialiased bilinear to match
    the host path's cv2.INTER_LINEAR."""
    b, _, _, c = x.shape
    if x.shape[1:3] == tuple(out_hw):
        return x
    return jax.image.resize(x, (b,) + tuple(out_hw) + (c,), "bilinear",
                            antialias=False)


def _random_crop(x, crop, key):
    """Per-sample random (crop x crop) window (torchvision RandomCrop)."""
    b, h, w, c = x.shape
    if h == crop and w == crop:
        return x
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (b,), 0, h - crop + 1)
    lefts = jax.random.randint(kl, (b,), 0, w - crop + 1)

    def one(img, t, l):
        return jax.lax.dynamic_slice(img, (t, l, 0), (crop, crop, c))

    return jax.vmap(one)(x, tops, lefts)


def _random_hflip(x, key, p=0.5):
    flags = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(flags[:, None, None, None], x[:, :, ::-1, :], x)


def _random_rotate_nearest(x, key, degrees):
    """Per-sample uniform rotation in ±degrees about the image center,
    nearest-neighbor sampling, zero fill — torchvision RandomRotation
    defaults (and the host path's cv2.warpAffine(INTER_NEAREST))."""
    b, h, w, c = x.shape
    angles = jax.random.uniform(key, (b,), minval=-degrees, maxval=degrees)
    rad = jnp.deg2rad(angles)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx

    def one(img, a):
        cos, sin = jnp.cos(a), jnp.sin(a)
        # inverse map: destination pixel pulls from the source rotated by -a
        sx = cos * xx - sin * yy + cx
        sy = sin * xx + cos * yy + cy
        sxi = jnp.round(sx).astype(jnp.int32)
        syi = jnp.round(sy).astype(jnp.int32)
        valid = ((sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h))
        sxi = jnp.clip(sxi, 0, w - 1)
        syi = jnp.clip(syi, 0, h - 1)
        out = img[syi, sxi]                       # (h, w, c) gather
        return jnp.where(valid[..., None], out, 0.0)

    return jax.vmap(one)(x, rad)


@dataclasses.dataclass(frozen=True)
class DevicePreprocess:
    """Batched jit preprocessing stage.  Hashable/frozen so the jitted
    train/eval step can close over it as a static."""
    image_size: Tuple[int, int] = (224, 224)
    crop: Optional[int] = 224
    hflip: bool = True
    rotation: float = 30.0
    normalize_mean: Optional[float] = 0.456
    normalize_std: Optional[float] = 0.224

    def _normalize(self, x):
        if self.normalize_mean is None:
            return x
        return (x - self.normalize_mean) / self.normalize_std

    def train_batch(self, u8, key):
        """(B, Hs, Ws, 1) u8 -> augmented normalized (B, h, w, 1) f32."""
        x = u8.astype(jnp.float32) / 255.0
        x = _resize_bilinear(x, self.image_size)
        kc, kf, kr = jax.random.split(key, 3)
        if self.crop:
            x = _random_crop(x, min(self.crop, *self.image_size), kc)
        if self.hflip:
            x = _random_hflip(x, kf)
        if self.rotation:
            x = _random_rotate_nearest(x, kr, self.rotation)
        return self._normalize(x)

    def eval_batch(self, u8):
        """Deterministic resize + normalize (the eval transform)."""
        x = u8.astype(jnp.float32) / 255.0
        x = _resize_bilinear(x, self.image_size)
        return self._normalize(x)

    def __call__(self, u8, key=None, train=True):
        if train:
            assert key is not None
            return self.train_batch(u8, key)
        return self.eval_batch(u8)


@dataclasses.dataclass
class StagingTransform:
    """Host half of the device pipeline: u8 resize to the staging size
    only (decode and the ragged->fixed step stay host-side; everything
    float moves on-device).  Output (H, W, 1) uint8."""
    image_size: Tuple[int, int] = (224, 224)

    def __call__(self, img: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        from xfmamba_tpu.data.transforms import resize
        img = resize(img, self.image_size)
        if img.ndim == 2:
            img = img[:, :, None]
        return np.ascontiguousarray(img.astype(np.uint8))


def mura_device_preprocess(image_size=(224, 224), train=True):
    """MURA config (`dataset_mura_twoview.py:808-816`)."""
    if train:
        return DevicePreprocess(image_size=tuple(image_size),
                                crop=min(224, *image_size))
    return DevicePreprocess(image_size=tuple(image_size), crop=None,
                            hflip=False, rotation=0.0)


def ddsm_device_preprocess(image_size=(224, 224), train=True):
    """CBIS-DDSM: no crop, no Normalize; hflip + rotation(30) when
    training (`dataset_ddsmxray_twoview.py:676-692` semantics).  The
    DICOM decode + NYU connected-component crop stay host-side (the
    `DDSMLoadFn` output is already a cropped u8 map); this stage covers
    the float half."""
    if train:
        return DevicePreprocess(image_size=tuple(image_size), crop=None,
                                hflip=True, rotation=30.0,
                                normalize_mean=None, normalize_std=None)
    return DevicePreprocess(image_size=tuple(image_size), crop=None,
                            hflip=False, rotation=0.0,
                            normalize_mean=None, normalize_std=None)


def chexpert_device_preprocess(image_size=(224, 224), train=True):
    """CheXpert: no Normalize (`dataset_chexpert_twoview.py:295`)."""
    if train:
        return DevicePreprocess(image_size=tuple(image_size),
                                crop=min(224, *image_size),
                                normalize_mean=None, normalize_std=None)
    return DevicePreprocess(image_size=tuple(image_size), crop=None,
                            hflip=False, rotation=0.0,
                            normalize_mean=None, normalize_std=None)
