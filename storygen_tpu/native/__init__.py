"""Native host preprocessing: ctypes bindings with numpy fallback.

Builds libpreprocess.so from preprocess.cpp on first use (g++, cached next
to the source); every entry point degrades to a numpy implementation when
the toolchain or the build is unavailable, so the framework never hard-
depends on the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_SO = os.path.join(_HERE, "libpreprocess.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC,
             "-o", _SO], check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.normalize_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_float]
        lib.assemble_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float]
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def normalize_u8(img: np.ndarray, scale: float,
                 offset: float) -> np.ndarray:
    """uint8 array -> float32, dst = src*scale + offset (any shape)."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if lib is None:
        return img.astype(np.float32) * scale + offset
    out = np.empty(img.shape, np.float32)
    lib.normalize_u8_to_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(img.size), ctypes.c_float(scale),
        ctypes.c_float(offset))
    return out


def assemble_batch(images: Sequence[np.ndarray], scale: float,
                   offset: float) -> np.ndarray:
    """List of identically-shaped uint8 HWC images -> (B, H, W, C) float32
    with normalize fused (one pass, multithreaded)."""
    lib = load()
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    if lib is None:
        return np.stack(imgs).astype(np.float32) * scale + offset
    b = len(imgs)
    out = np.empty((b,) + imgs[0].shape, np.float32)
    PtrT = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (PtrT * b)(*[im.ctypes.data_as(PtrT) for im in imgs])
    lib.assemble_batch_f32(
        ptrs, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(b), ctypes.c_int64(imgs[0].size),
        ctypes.c_float(scale), ctypes.c_float(offset))
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC bilinear resize (half-pixel centers)."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    sh, sw, c = img.shape
    if lib is None:
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize((dw, dh),
                                                      Image.BILINEAR))
    out = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(sh), ctypes.c_int(sw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(dh), ctypes.c_int(dw), ctypes.c_int(c))
    return out
