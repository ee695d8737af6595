"""ctypes binding for the native (C++) host image pipeline.

Loads ``native/libssmv_dataloader.so`` (built by ``make -C native``); the
threaded batch crop+resize replaces per-sample PIL work in the loader hot
path. Degrades silently to the PIL path when the library isn't built.
"""
from __future__ import annotations

import ctypes
import os
import typing as typ

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> typ.Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cands = [
        os.environ.get("SSMV_NATIVE_LIB", ""),
        os.path.join(here, "native", "libssmv_dataloader.so"),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def load_native():
    """Returns the ctypes lib or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ssmv_crop_resize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.ssmv_batch_crop_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ssmv_pad_reflect_crop_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ]
        assert lib.ssmv_version() == 1
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def crop_resize(img: np.ndarray, y0: int, x0: int, ch: int, cw: int,
                size: int) -> np.ndarray:
    """Crop (y0, x0, ch, cw) from an (H, W, 3) uint8 image and bicubic-resize
    to (size, size, 3)."""
    lib = load_native()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W = img.shape[:2]
    out = np.empty((size, size, 3), np.uint8)
    lib.ssmv_crop_resize_u8(
        img.ctypes.data, H, W, int(y0), int(x0), int(ch), int(cw),
        out.ctypes.data, size)
    return out


def batch_crop_resize(imgs: typ.Sequence[np.ndarray], crops: np.ndarray,
                      size: int, num_threads: int = 0) -> np.ndarray:
    """Threaded batch version. imgs: list of (H, W, 3) u8; crops: (n, 4) int32
    [y0, x0, ch, cw]. Returns (n, size, size, 3) u8."""
    lib = load_native()
    assert lib is not None
    n = len(imgs)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 4, 16)
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    dims = np.asarray([[im.shape[0], im.shape[1]] for im in imgs],
                      np.int32)
    crops = np.ascontiguousarray(crops, dtype=np.int32)
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in imgs])
    out = np.empty((n, size, size, 3), np.uint8)
    lib.ssmv_batch_crop_resize_u8(ptrs, dims.ctypes.data, crops.ctypes.data,
                                  out.ctypes.data, n, size, num_threads)
    return out


def pad_reflect_crop(img: np.ndarray, pad: int, y0: int, x0: int,
                     size: int) -> np.ndarray:
    lib = load_native()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W = img.shape[:2]
    out = np.empty((size, size, 3), np.uint8)
    lib.ssmv_pad_reflect_crop_u8(img.ctypes.data, H, W, pad, int(y0), int(x0),
                                 out.ctypes.data, size)
    return out
