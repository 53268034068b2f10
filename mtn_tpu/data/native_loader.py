"""ctypes binding to the native C++ .npy batch loader.

Builds lazily (one ``make`` invocation, cached) and degrades gracefully:
if the toolchain or library is unavailable, ``available()`` is False and
:mod:`mtn_tpu.data.features` falls back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libnpy_loader.so")
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_NATIVE_DIR, "npy_loader.cc")
        stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
        if (not os.path.exists(_LIB_PATH) or stale) and not _build():
            if not os.path.exists(_LIB_PATH):
                return None  # else: fall through to the existing lib
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "mtn_npy_shape3"):
            # stale pre-3-D library on disk: rebuild once and reload
            # (the Makefile renames atomically, so concurrent readers
            # never see a partial file)
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None
            if not hasattr(lib, "mtn_npy_shape3"):
                return None
        lib.mtn_load_npy_batch.restype = ctypes.c_int
        lib.mtn_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.mtn_npy_shape.restype = ctypes.c_int
        lib.mtn_npy_shape.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.mtn_npy_shape3.restype = ctypes.c_int
        lib.mtn_npy_shape3.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def npy_shape(path: str) -> Tuple[int, ...]:
    """Header-only shape: (T, D) for 2-D files, (T, R, D) for 3-D."""
    lib = _load()
    dims = (ctypes.c_int64 * 3)()
    nd = ctypes.c_int32()
    rc = lib.mtn_npy_shape3(path.encode(), dims, ctypes.byref(nd))
    if rc != 0:
        raise IOError(f"mtn_npy_shape3({path}) failed with code {rc}")
    return tuple(int(dims[i]) for i in range(nd.value))


def load_batch(paths: Sequence[str], max_frames: int, skip: int = 1,
               n_threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (B, max_frames, D) float32 zero-padded array + (B,) lengths.

    3-D (T, R, D) files follow the features.py flatten law: frame skip on
    the time axis, then regions flatten into the frame axis.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    dim = npy_shape(paths[0])[-1]
    B = len(paths)
    out = np.zeros((B, max_frames, dim), dtype=np.float32)
    lens = np.zeros((B,), dtype=np.int32)
    c_paths = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    rc = lib.mtn_load_npy_batch(
        c_paths, B, skip, max_frames, dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if rc != 0:
        raise IOError(f"mtn_load_npy_batch failed with code {rc}")
    return out, lens
