"""ctypes bindings for the native host-side data runtime (native/stereodata.cc).

The C library is the TPU-host equivalent of the reference's native data-path
dependencies (SURVEY.md §2.6): OpenCV image IO, numba z-buffer warps, and the
C++ core of torch's DataLoader.  All entry points are GIL-free, so the
threaded PrefetchLoader (data/loader.py) gets real decode parallelism.

`lib()` returns the loaded library or None; callers fall back to the pure
Python/numpy implementations (frame_utils / warps) when unavailable.  The
shared object is built lazily with g++ on first use (toolchain is a baked-in
dependency; the compile takes <2 s and is cached next to the source).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_NATIVE = Path(__file__).resolve().parents[2] / "native"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


class _SDImage(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("h", ctypes.c_int64),
        ("w", ctypes.c_int64),
        ("c", ctypes.c_int64),
        ("dtype", ctypes.c_int32),
    ]


_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.float32}


def _build() -> Path | None:
    so = _REPO_NATIVE / "libstereodata.so"
    src = _REPO_NATIVE / "stereodata.cc"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    if not src.exists():
        return None
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-fvisibility=hidden", "-o", str(so), str(src),
             "-lpng", "-ljpeg", "-lz"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so
    except Exception:
        return None


def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None if it can't be built/loaded."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("STEREOANYWHERE_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            L = ctypes.CDLL(str(so))
        except OSError:
            return None
        L.sd_last_error.restype = ctypes.c_char_p
        L.sd_free.argtypes = [ctypes.c_void_p]
        for name in ("sd_read_pfm", "sd_read_png", "sd_read_jpeg"):
            fn = getattr(L, name)
            fn.argtypes = [ctypes.c_char_p, ctypes.POINTER(_SDImage)]
            fn.restype = ctypes.c_int
        L.sd_write_pfm.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        L.sd_write_pfm.restype = ctypes.c_int
        f32p = ctypes.POINTER(ctypes.c_float)
        L.sd_warp_depth.argtypes = [f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int64]
        L.sd_warp_disparity.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_int64]
        L.sd_interpolate_background.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64]
        L.sd_otsu_threshold.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)
        ]
        L.sd_otsu_threshold.restype = ctypes.c_int
        _LIB = L
        return _LIB


def available() -> bool:
    return lib() is not None


def _take_image(L: ctypes.CDLL, im: _SDImage) -> np.ndarray:
    """Copy a decoded SDImage into a numpy array and free the C buffer."""
    dt = _DTYPES[im.dtype]
    n = im.h * im.w * im.c
    buf = (ctypes.c_char * (n * np.dtype(dt).itemsize)).from_address(im.data)
    arr = np.frombuffer(buf, dtype=dt).reshape(im.h, im.w, im.c).copy()
    L.sd_free(im.data)
    if im.c == 1:
        arr = arr[..., 0]
    return arr


def _decode(fn_name: str, path: str) -> np.ndarray:
    L = lib()
    assert L is not None
    im = _SDImage()
    rc = getattr(L, fn_name)(str(path).encode(), ctypes.byref(im))
    if rc != 0:
        raise ValueError(L.sd_last_error().decode(errors="replace"))
    return _take_image(L, im)


def read_pfm(path: str) -> np.ndarray:
    return _decode("sd_read_pfm", path)


def read_png(path: str) -> np.ndarray:
    return _decode("sd_read_png", path)


def read_jpeg(path: str) -> np.ndarray:
    return _decode("sd_read_jpeg", path)


def write_pfm(path: str, image: np.ndarray) -> None:
    L = lib()
    assert L is not None
    img = np.ascontiguousarray(image, np.float32)
    c = 1 if img.ndim == 2 else img.shape[2]
    rc = L.sd_write_pfm(
        str(path).encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0], img.shape[1], c,
    )
    if rc != 0:
        raise ValueError(L.sd_last_error().decode(errors="replace"))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_depth(depth: np.ndarray, disparity: np.ndarray) -> np.ndarray:
    L = lib()
    assert L is not None
    d = np.ascontiguousarray(depth, np.float32)
    s = np.ascontiguousarray(disparity, np.float32)
    out = np.empty_like(d)
    L.sd_warp_depth(_f32p(d), _f32p(s), _f32p(out), d.shape[0], d.shape[1])
    return out


def warp_disparity(disparity: np.ndarray) -> np.ndarray:
    L = lib()
    assert L is not None
    s = np.ascontiguousarray(disparity, np.float32)
    out = np.empty_like(s)
    L.sd_warp_disparity(_f32p(s), _f32p(out), s.shape[0], s.shape[1])
    return out


def interpolate_background(disparity: np.ndarray) -> np.ndarray:
    L = lib()
    assert L is not None
    d = np.ascontiguousarray(disparity, np.float32).copy()
    L.sd_interpolate_background(_f32p(d), d.shape[0], d.shape[1])
    return d


def otsu_mask(img_u8: np.ndarray) -> tuple[int, np.ndarray]:
    """Otsu threshold of a uint8 array; returns (threshold, mask>thr as u8*255)."""
    L = lib()
    assert L is not None
    a = np.ascontiguousarray(img_u8, np.uint8)
    mask = np.empty_like(a)
    thr = L.sd_otsu_threshold(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        a.size,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return thr, mask.reshape(a.shape)
