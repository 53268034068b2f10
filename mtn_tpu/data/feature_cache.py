"""Write-once disk cache of padded per-batch feature blocks.

Stage-2 training re-reads every video's ``.npy`` features from disk on
every epoch — the reference does a per-example ``np.load`` inside the
hot loop (data_handler.py:233); our loader batches and dedups the reads
but the bytes still come off disk each epoch, and with
``--feature_transfer int8`` the host also re-quantizes every block
every epoch. Batch plans are deterministic per run (make_batch_indices;
the epoch shuffle permutes plan ORDER only), so the padded feature
block of a plan is identical across epochs: this cache (VERDICT r4 #6)
writes each block once, in the TRANSFER dtype, and serves later epochs
from disk with zero-copy ``mmap`` reads:

- ``float32``: the padded ``(B, T, D)`` block as produced.
- ``bfloat16``: the block pre-converted (half the bytes; stored as a
  uint16 view since ``np.save`` cannot serialize ml_dtypes).
- ``int8``: the per-frame absmax quantization (train/batch.py
  ``host_quant_int8``) runs ONCE at first touch; later epochs read the
  int8 block + f32 row scales (~1/4 the f32 bytes) and the device path
  ships them as-is (:class:`QuantFeature` flows through ``device_batch``
  without re-quantizing — bitwise-identical to the uncached transfer).

Keys hash the per-stream source file identities (path, mtime_ns, size)
together with the frame cap, skip and transfer dtype, so editing a
feature file on disk invalidates its batches. Writes are
atomic (tmp + rename), so a crashed run never leaves a torn entry.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

_VERSION = 1


class QuantFeature(NamedTuple):
    """A host-side feature block already in int8 transfer form.

    ``device_batch`` ships ``q``/``scale`` as-is and dequantizes on
    device (train/batch.py ``_dequant_int8``) — exactly the bytes the
    uncached int8 transfer puts on the wire."""

    q: np.ndarray      # (B, T, D) int8
    scale: np.ndarray  # (B, T, 1) float32

    @property
    def shape(self):
        return self.q.shape

    def pad_rows(self, rows: int) -> "QuantFeature":
        """Zero-pad the batch axis (make_batch's pad_rows_to law).
        Padded rows dequantize to exact 0.0, matching the uncached
        path's all-zero rows (q=0 regardless of scale)."""
        n = self.q.shape[0]
        if rows <= n:
            return self
        return QuantFeature(
            q=np.concatenate(
                [self.q, np.zeros((rows - n,) + self.q.shape[1:],
                                  self.q.dtype)]),
            scale=np.concatenate(
                [self.scale, np.zeros((rows - n,) + self.scale.shape[1:],
                                      self.scale.dtype)]))


class FeatureCache:
    """Per-(plan, stream) write-once block cache under ``cache_dir``.

    ``transfer``: the feature wire format this cache stores —
    ``"float32"`` (default), ``"bfloat16"`` or ``"int8"`` — must match
    the run's ``--feature-transfer`` (it is part of the key, so a
    mismatched cache directory simply never hits).
    """

    def __init__(self, cache_dir: str, transfer: str = "float32"):
        if transfer not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"feature cache transfer {transfer!r}")
        self.dir = cache_dir
        self.transfer = transfer
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    # -- keys --------------------------------------------------------------
    def key(self, paths: Sequence[str], max_frames: int, skip: int) -> str:
        h = hashlib.sha1()
        h.update(f"v{_VERSION}|{self.transfer}|{max_frames}|{skip}"
                 .encode())
        for p in paths:
            st = os.stat(p)
            h.update(f"|{p}|{st.st_mtime_ns}|{st.st_size}".encode())
        return h.hexdigest()

    def _path(self, key: str, part: str) -> str:
        return os.path.join(self.dir, f"{key}.{part}.npy")

    # -- read --------------------------------------------------------------
    def get(self, key: str):
        """The cached ``(block, lens)`` for ``key`` or ``None``.

        ``block`` is a float32/bfloat16 ndarray or a
        :class:`QuantFeature`; arrays are ``mmap``-backed (read-only) —
        the bytes stream off disk only as the device upload consumes
        them."""
        try:
            ln = np.load(self._path(key, "len"))
            if self.transfer == "int8":
                q = np.load(self._path(key, "q"), mmap_mode="r")
                s = np.load(self._path(key, "s"), mmap_mode="r")
                block = QuantFeature(q=q, scale=s)
            elif self.transfer == "bfloat16":
                import ml_dtypes
                raw = np.load(self._path(key, "bf16"), mmap_mode="r")
                block = raw.view(ml_dtypes.bfloat16)
            else:
                block = np.load(self._path(key, "f32"), mmap_mode="r")
        except (FileNotFoundError, ValueError, OSError):
            return None
        self.hits += 1
        return block, ln

    # -- write -------------------------------------------------------------
    def put(self, key: str, arr: np.ndarray, ln: np.ndarray):
        """Store the float32 block under ``key`` (atomic, write-once)
        and return it in transfer form — callers use the returned block
        immediately, so the first epoch already skips any later
        conversion."""
        self.misses += 1
        self._save(key, "len", ln)
        if self.transfer == "int8":
            from mtn_tpu.train.batch import host_quant_int8
            q, s = host_quant_int8(arr)
            self._save(key, "q", q)
            self._save(key, "s", s)
            return QuantFeature(q=q, scale=s)
        if self.transfer == "bfloat16":
            import ml_dtypes
            b = arr.astype(ml_dtypes.bfloat16)
            self._save(key, "bf16", b.view(np.uint16))
            return b
        self._save(key, "f32", arr)
        return arr

    def _save(self, key: str, part: str, arr: np.ndarray):
        path = self._path(key, part)
        if os.path.exists(path):
            return
        # np.save appends ".npy" when the name lacks it — keep the
        # suffix so the tmp name is exactly what we rename
        tmp = f"{path}.{os.getpid()}.tmp.npy"
        np.save(tmp, arr)
        os.replace(tmp, path)

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "dir": self.dir, "transfer": self.transfer}
