"""ctypes bindings for the native batch-assembly library (native/batcher.cpp).

Builds the shared library on first use (g++ is in the image), caches the
.so next to the source, and degrades to numpy when a toolchain isn't
available — every call site works either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "batcher.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libbatcher.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_SO):
            return None
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gather_rows_f32.argtypes = [f32p, i64p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int]
        lib.gather_images_f32.argtypes = [
            f32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, f32p, u8p, ctypes.c_int,
        ]
        lib.gather_normalize_f32.argtypes = [
            f32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, f32p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_rows(src: np.ndarray, idx: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """dst[i] = src[idx[i]] for a [N, ...] float32 array."""
    lib = load_library()
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return src[idx]
    out = np.empty((len(idx),) + src.shape[1:], np.float32)
    row = int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gather_rows_f32(_f32p(src), _i64p(idx), len(idx), row, _f32p(out), n_threads)
    return out


def gather_images(
    src: np.ndarray, idx: np.ndarray, flip: np.ndarray | None = None,
    n_threads: int = 4,
) -> np.ndarray:
    """Gather [N, H, W, C] images with optional per-sample hflip."""
    lib = load_library()
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        out = src[idx]
        if flip is not None:
            out[flip.astype(bool)] = out[flip.astype(bool)][:, :, ::-1]
        return out
    n, h, w, c = len(idx), *src.shape[1:]
    out = np.empty((n, h, w, c), np.float32)
    fp = (
        np.ascontiguousarray(flip, np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if flip is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    lib.gather_images_f32(_f32p(src), _i64p(idx), n, h, w, c, _f32p(out), fp, n_threads)
    return out


def gather_normalize(
    src: np.ndarray, idx: np.ndarray, mean: np.ndarray, std: np.ndarray,
    n_threads: int = 4,
) -> np.ndarray:
    """Fused gather + ([-1,1] -> CLIP normalization) for eval feeding."""
    lib = load_library()
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is None:
        x01 = (src[idx] + 1.0) * 0.5
        return ((x01 - mean) / std).astype(np.float32)
    n = len(idx)
    h, w, c = src.shape[1:]
    out = np.empty((n, h, w, c), np.float32)
    lib.gather_normalize_f32(
        _f32p(src), _i64p(idx), n, h * w, c, _f32p(mean), _f32p(std), _f32p(out), n_threads
    )
    return out
