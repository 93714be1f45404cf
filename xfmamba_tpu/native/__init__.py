"""ctypes bindings for the native host-side data-path kernels.

Compiled on first import with g++ (cached in the package dir); every entry
point has a numpy fallback, so the framework works without a toolchain.
The reference's equivalent layer is torch DataLoader's libtorch worker pool
(`libs/config.py:20-21`); here the C++ kernels run GIL-free inside the
threaded prefetch loader (`xfmamba_tpu.data.loader`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "xfm_host.cc")
_SO = os.path.join(_HERE, "xfm_host.so")
_lock = threading.Lock()
_lib = None
HAS_NATIVE = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, HAS_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.normalize_u8_f32_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_float, ctypes.c_float,
                ctypes.c_int]
            lib.resize_bilinear_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            _lib = lib
            HAS_NATIVE = True
        except Exception:
            _lib = False
            HAS_NATIVE = False
    return _lib


def normalize_u8(batch_u8: np.ndarray, mean: float = 0.0,
                 std: float = 1.0, threads: int = 4) -> np.ndarray:
    """(..., H, W) uint8 -> float32 ((x/255)-mean)/std; native when built."""
    lib = _load()
    src = np.ascontiguousarray(batch_u8, dtype=np.uint8)
    if lib:
        out = np.empty(src.shape, np.float32)
        bs = src.shape[0] if src.ndim > 2 else 1
        n = src.size // bs
        lib.normalize_u8_f32_batch(
            src.ctypes.data, out.ctypes.data, bs, n,
            ctypes.c_float(mean), ctypes.c_float(std), threads)
        return out
    return ((src.astype(np.float32) / 255.0) - mean) / std


def resize_bilinear(img_f32: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(H, W) float32 bilinear resize (cv2.INTER_LINEAR semantics)."""
    lib = _load()
    src = np.ascontiguousarray(img_f32, dtype=np.float32)
    if lib:
        out = np.empty((oh, ow), np.float32)
        lib.resize_bilinear_f32(src.ctypes.data, src.shape[0], src.shape[1],
                                out.ctypes.data, oh, ow)
        return out
    # numpy fallback (same align_corners=false sampling)
    h, w = src.shape
    fy = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    fx = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    fy = np.clip(fy, 0, None)
    fx = np.clip(fx, 0, None)
    y0 = fy.astype(int)
    x0 = fx.astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None]
    wx = (fx - x0)[None, :]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)
