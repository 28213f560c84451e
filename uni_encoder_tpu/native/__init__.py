"""ctypes bindings for the native C++ data-path kernels (uniio.cpp).

Compiled on first use with g++ (cached next to the source); every entry
point has a numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "uniio.cpp")
_LIB_PATH = os.path.join(_HERE, "libuniio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning(f"native uniio build failed ({e}); using numpy fallbacks")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            path = _build()
        if path:
            lib = ctypes.CDLL(path)
            i64, u8p, f32p, i32p, i64p = (
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            )
            lib.resize_bilinear_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64, ctypes.c_int]
            lib.normalize_pad_f32.argtypes = [u8p, i64, i64, f32p, f32p, f32p, i64, i64]
            lib.decode_panoptic_ids.argtypes = [u8p, i64, i32p]
            lib.accumulate_confusion.argtypes = [u8p, u8p, i64, i64, i64, i64p]
            _lib = lib
        return _lib


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int, align_corners: bool = False) -> np.ndarray:
    """uint8 HWC bilinear resize with torch coordinate semantics."""
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is None:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
    out = np.empty((oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(_u8p(img), h, w, c, _u8p(out), oh, ow, int(align_corners))
    return out


def normalize_pad(img: np.ndarray, mean, std, ph: int, pw: int) -> np.ndarray:
    """uint8 HWC -> normalized f32 (ph, pw, 3), zero-padded bottom/right."""
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is None:
        out = np.zeros((ph, pw, 3), np.float32)
        out[:h, :w] = (img.astype(np.float32) - mean) / std
        return out
    out = np.empty((ph, pw, 3), np.float32)
    lib.normalize_pad_f32(
        _u8p(img), h, w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ph, pw,
    )
    return out


def decode_panoptic_ids(rgb: np.ndarray) -> np.ndarray:
    lib = get_lib()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    if lib is None:
        r = rgb.astype(np.uint32)
        return (r[..., 0] + 256 * r[..., 1] + 65536 * r[..., 2]).astype(np.int32)
    out = np.empty((h, w), np.int32)
    lib.decode_panoptic_ids(_u8p(rgb), h * w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def accumulate_confusion(gt: np.ndarray, pred: np.ndarray, num_classes: int, ignore_label: int, mat: np.ndarray) -> None:
    lib = get_lib()
    gt = np.ascontiguousarray(gt, np.uint8)
    pred = np.ascontiguousarray(pred, np.uint8)
    if lib is None:
        valid = gt != ignore_label
        g = gt[valid].astype(np.int64)
        p = np.minimum(pred[valid].astype(np.int64), num_classes - 1)
        mat += np.bincount(g * num_classes + p, minlength=num_classes ** 2).reshape(
            num_classes, num_classes
        )
        return
    lib.accumulate_confusion(
        _u8p(gt), _u8p(pred), gt.size, num_classes, ignore_label,
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
