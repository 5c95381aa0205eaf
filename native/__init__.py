"""Native (C++) host-side components, loaded via ctypes.

Builds lazily with g++ on first use; falls back gracefully if no toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpreprocess.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "preprocess.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_DIR, "preprocess.cc")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.preprocess_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.transform_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_preprocess(
    img: np.ndarray,  # (H, W, 3) uint8 BGR
    canvas: tuple,
    new_h: int,
    new_w: int,
    mean: np.ndarray,
    std: np.ndarray,
    to_rgb: bool = True,
    flip: bool = False,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((*canvas, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.preprocess_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        canvas[0], canvas[1], new_h, new_w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if to_rgb else 0, 1 if flip else 0,
    )
    return out
