"""Lazy video-feature registry and loaders.

The reference stores ``vid -> (filepath, n_frames)`` per feature stream by
reading only the ``.npy`` header (data_handler.py:16-24,137-147) and then
``np.load``s features from disk inside the training hot loop
(data_handler.py:233). Here the registry is the same, but batch feature
loading goes through a pluggable loader so the hot path can use the native
C++ reader (``native/npy_loader.cc``) with host-side threads, falling back
to numpy when the shared library is not built.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def get_npy_shape(filename: str) -> Tuple[int, ...]:
    """Read only the array header (parity: data_handler.py:16-24)."""
    if filename.endswith(".pkl"):
        with open(filename, "rb") as f:
            return pickle.load(f).shape
    with open(filename, "rb") as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
            shape, _, _ = np.lib.format.read_array_header_1_0(f)
        else:
            shape, _, _ = np.lib.format.read_array_header_2_0(f)
    return shape


class FeatureRegistry:
    """Per-stream map ``vid -> (path, n_frames)`` built from header reads."""

    def __init__(self, fea_types: Sequence[str], fea_path_template: str,
                 vid_set: Sequence[str]):
        self.fea_types = list(fea_types)
        self.streams: List[Dict[str, Tuple[str, int]]] = []
        # streams containing any 3-D per-frame array (T, R, D): regions
        # are flattened into the frame axis at load time (see
        # load_features), so n_frames here is the post-flatten T*R
        self._has_3d: List[bool] = []
        if vid_set and self.fea_types and \
                "<ImageID>" not in fea_path_template:
            raise ValueError(
                f"feature path {fea_path_template!r} has no <ImageID> "
                "placeholder — expected a per-video template like "
                "'data/<FeaType>/<ImageID>.npy' (run.sh stage 3 passes "
                "one; a bare directory cannot name per-video files)")
        for ftype in self.fea_types:
            basepath = fea_path_template.replace("<FeaType>", ftype)
            stream: Dict[str, Tuple[str, int]] = {}
            any_3d = False
            for vid in vid_set:
                filepath = basepath.replace("<ImageID>", vid)
                shape = get_npy_shape(filepath)
                if len(shape) == 2:
                    n = shape[0]
                elif len(shape) == 3:
                    # The reference nominally pads 3-D per-frame arrays
                    # (data_handler.py:237-238) but its path is broken
                    # end-to-end (the mask law data_utils.py:29 only
                    # handles 2-D). Here the region axis is flattened
                    # into the frame axis — every (frame, region) vector
                    # becomes one attention key, information-preserving
                    # and compatible with the 2-D mask law.
                    n = shape[0] * shape[1]
                    any_3d = True
                else:
                    raise NotImplementedError(
                        f"{filepath}: {len(shape)}-D feature array "
                        f"{shape}; only 2-D (n_frames, dim) and 3-D "
                        "(n_frames, regions, dim) per-video features "
                        "are supported")
                stream[vid] = (filepath, n)
            self.streams.append(stream)
            self._has_3d.append(any_3d)

    def has_3d(self, stream_idx: int) -> bool:
        return self._has_3d[stream_idx]

    def __len__(self) -> int:
        return len(self.streams)

    def n_frames(self, stream_idx: int, vid: str) -> int:
        return self.streams[stream_idx][vid][1]

    def path(self, stream_idx: int, vid: str) -> str:
        return self.streams[stream_idx][vid][0]

    def feature_dims(self) -> List[int]:
        """Last-axis dim per stream (parity: data_handler.py:277-285)."""
        dims = []
        for stream in self.streams:
            path, _ = next(iter(stream.values()))
            dims.append(int(_load_npy(path).shape[-1]))
        return dims


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------

_native = None
_native_checked = False


def _get_native():
    """Lazily import the ctypes binding to the C++ loader, if built."""
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from mtn_tpu.data import native_loader
            if native_loader.available():
                _native = native_loader
        except Exception:
            _native = None
    return _native


def _load_npy(path: str) -> np.ndarray:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    return np.load(path)


def load_features(registry: FeatureRegistry, vids: Sequence[str],
                  max_frames: Sequence[int], skip: Sequence[int],
                  use_native: bool = True,
                  cache=None) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Load and pad one batch of per-video features.

    Returns ``(fts, fts_len)`` where ``fts[i]`` is a zero-padded
    ``(B, max_frames[i], D_i)`` float32 array for stream ``i`` and
    ``fts_len[i]`` the (B,) int32 count of real frames after skipping.

    The reference pads 2-D features with *ones* as a mask sentinel
    (data_handler.py:236, data_utils.py:29-30); here padding is zeros and
    masking is explicit via ``fts_len`` — an intentional, documented fix
    (a genuine all-ones frame is no longer masked out).

    Repeated videos in one batch (training batches routinely pack several
    turns of the same dialog; the reference re-reads the file per example,
    data_handler.py:233) are read from disk once and scattered to their
    rows — output-identical, host-I/O-proportional to *unique* videos.

    ``cache``: an optional :class:`~mtn_tpu.data.feature_cache.
    FeatureCache`. First touch of a (paths, frames, skip) block stores
    it in transfer form; later epochs serve the block from the cache's
    mmap (VERDICT r4 #6 — with int8 transfer the block may come back as
    a ``QuantFeature``, which ``device_batch`` ships without
    re-quantizing).
    """
    native = _get_native() if use_native else None
    B = len(vids)
    fts: List[np.ndarray] = []
    lens: List[np.ndarray] = []
    for i in range(len(registry)):
        paths = [registry.path(i, vid) for vid in vids]
        s = skip[i] if i < len(skip) else 1
        ckey = None
        if cache is not None:
            ckey = cache.key(paths, int(max_frames[i]), int(s))
            hit = cache.get(ckey)
            if hit is not None:
                fts.append(hit[0])
                lens.append(hit[1])
                continue
        arr = ln = None
        if native is not None and all(p.endswith(".npy") for p in paths):
            # the C++ loader implements the same 3-D flatten law (see
            # native/npy_loader.cc LoadOne), so 2-D and 3-D streams both
            # take the native path; dtypes/layouts it cannot parse
            # (f16/int/fortran-order) fall back to numpy below
            try:
                uniq = list(dict.fromkeys(paths))
                if len(uniq) < len(paths):
                    uarr, uln = native.load_batch(uniq, int(max_frames[i]), s)
                    pos = {p: k for k, p in enumerate(uniq)}
                    inv = np.array([pos[p] for p in paths])
                    arr, ln = uarr[inv], uln[inv]
                else:
                    arr, ln = native.load_batch(paths, int(max_frames[i]), s)
            except (IOError, OSError):
                arr = ln = None
        if arr is None:
            # frame skip applies to the time axis; 3-D (T, R, D) arrays
            # then flatten regions into frames (FeatureRegistry note).
            # NB: this per-batch read-dedup dict must NOT be named
            # `cache` — that shadows the FeatureCache parameter and
            # breaks the next stream's cache lookup (caught by the
            # round-5 full-suite run).
            read_cache: dict = {}

            def _read(p):
                a = read_cache.get(p)
                if a is None:
                    a = _load_npy(p)[::s]
                    a = a.reshape(-1, a.shape[-1]) if a.ndim == 3 else a
                    read_cache[p] = a
                return a
            D = _read(paths[0]).shape[-1]
            arr = np.zeros((B, int(max_frames[i]), D), dtype=np.float32)
            ln = np.zeros((B,), dtype=np.int32)
            for j, p in enumerate(paths):
                a = _read(p)
                n = min(a.shape[0], arr.shape[1])
                arr[j, :n] = a[:n]
                ln[j] = n
        if ckey is not None:
            arr = cache.put(ckey, arr, ln)  # returns transfer form
        fts.append(arr)
        lens.append(ln)
    return fts, lens
