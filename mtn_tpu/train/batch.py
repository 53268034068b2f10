"""Device-side batch representation + mask construction (jit-safe).

The reference ``Batch`` (data_utils.py:21-54) builds masks eagerly on GPU;
here the host batch carries tokens/features/lengths and all masks are pure
functions evaluated inside jit (so they fuse with the model).

Degenerate configurations the reference crashes on are supported cleanly:
- no separate caption → a single-<blank> caption column (all-masked);
- no video features → zero streams, no QAE sublayers, no AE loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mtn_tpu.data.batching import HostBatch
from mtn_tpu.models.mtn import SourceMasks
from mtn_tpu.ops.masks import length_mask, pad_mask, target_mask


@struct.dataclass
class DeviceBatch:
    query: jnp.ndarray       # (B, Lq) int32
    his: jnp.ndarray         # (B, Lh)
    cap: jnp.ndarray         # (B, Lc)
    answer_in: jnp.ndarray   # (B, La)
    answer_out: jnp.ndarray  # (B, La)
    fts: Tuple[jnp.ndarray, ...]      # per stream (B, T, D) float32
    fts_len: Tuple[jnp.ndarray, ...]  # per stream (B,) int32
    valid: jnp.ndarray       # (B,) bool


@jax.jit
def _dequant_int8(q, scale):
    """(B,T,D) int8 × (B,T,1) f32 row scales -> f32 features on device.

    Dequantizes in float32 so the only error is the int8 rounding itself
    (the model casts to its compute dtype downstream, mtn.py encode)."""
    return q.astype(jnp.float32) * scale


def host_quant_int8(f: np.ndarray):
    """Per-frame absmax int8 quantization on the host: returns
    ``(q int8, scale f32)`` ready to ship (≈¼ the f32 bytes, ½ of
    bf16); relative error ≤ 1/254 per frame (docs/BENCH.md)."""
    scale = np.abs(f).max(axis=-1, keepdims=True).astype(np.float32) / 127.0
    np.maximum(scale, 1e-12, out=scale)
    q = np.rint(f / scale).astype(np.int8)
    return q, scale


def _int8_transfer(f: np.ndarray) -> jnp.ndarray:
    """Quantize on host, ship int8 + f32 scales, dequantize on device —
    opt-in for transfer-bound hosts (docs/BENCH.md)."""
    q, scale = host_quant_int8(f)
    return _dequant_int8(jnp.asarray(q), jnp.asarray(scale))


def device_batch(hb: HostBatch,
                 feature_dtype: str = "float32") -> DeviceBatch:
    from mtn_tpu.data.feature_cache import QuantFeature
    cap = hb.cap
    if cap is None:
        # all-<blank> single-column caption; its pad mask is all-False
        cap = np.ones((hb.query.shape[0], 1), dtype=np.int32)
    if feature_dtype == "int8":
        # a cached QuantFeature is already the int8 wire form — ship it
        # without re-quantizing (feature_cache.py; bitwise-identical)
        fts = tuple(
            _dequant_int8(jnp.asarray(f.q), jnp.asarray(f.scale))
            if isinstance(f, QuantFeature) else _int8_transfer(f)
            for f in hb.fts)
    else:
        fdt = jnp.dtype(feature_dtype) if feature_dtype != "float32" else None
        fts = tuple(jnp.asarray(f if fdt is None else f.astype(fdt))
                    for f in hb.fts)  # ml_dtypes: bf16 is a valid numpy dtype
    return DeviceBatch(
        query=jnp.asarray(hb.query), his=jnp.asarray(hb.his),
        cap=jnp.asarray(cap), answer_in=jnp.asarray(hb.answer_in),
        answer_out=jnp.asarray(hb.answer_out),
        fts=fts,
        fts_len=tuple(jnp.asarray(l) for l in hb.fts_len),
        valid=jnp.asarray(hb.valid),
    )


def to_device_fn(feature_dtype: str = "float32", shardings=None):
    """HostBatch -> DeviceBatch transfer closure shared by the CLIs:
    `device_batch` with the configured feature transfer dtype, then
    `shardings.put_batch` when running under a mesh.

    Multi-process: go host→global directly (`put_host_batch`) so each
    host uploads only the rows its devices own — per-host input
    sharding with ONE wire crossing per batch, instead of uploading the
    full batch to the local device and fetching it back to slice."""
    if shardings is None:
        return lambda hb: device_batch(hb, feature_dtype)
    if jax.process_count() > 1:
        return lambda hb: shardings.put_host_batch(hb, feature_dtype)
    return lambda hb: shardings.put_batch(device_batch(hb, feature_dtype))


def stack_batches(batches) -> DeviceBatch:
    """Stack equal-shape microbatches on a new leading (A,) axis for the
    Trainer's accumulating step (`lax.scan` over microbatches)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def blank_like(db: DeviceBatch, pad: int = 1) -> DeviceBatch:
    """An all-padding microbatch shaped like ``db``: zero real tokens,
    zero frames, every row invalid. Under the padded-rows loss
    invariance it contributes zero loss and zero gradients — used to
    fill the ragged tail of a gradient-accumulation group so one
    compiled program serves every group."""
    return DeviceBatch(
        query=jnp.full_like(db.query, pad),
        his=jnp.full_like(db.his, pad),
        cap=jnp.full_like(db.cap, pad),
        answer_in=jnp.full_like(db.answer_in, pad),
        answer_out=jnp.full_like(db.answer_out, pad),
        fts=tuple(jnp.zeros_like(f) for f in db.fts),
        fts_len=tuple(jnp.zeros_like(l) for l in db.fts_len),
        valid=jnp.zeros_like(db.valid))


def accumulated(batches, accum_steps: int, to_device, pad: int = 1):
    """Group a HostBatch stream into stacked accumulation macro-batches.

    Yields DeviceBatch pytrees with a leading (accum_steps,) axis; the
    final ragged group is completed with `blank_like(pad=pad)` fillers
    (``pad`` must be the trainer's pad id so fillers stay token-free).
    Requires shape-uniform batches (train CLI enforces
    --uniform_shapes_train)."""
    buf = []
    for hb in batches:
        buf.append(hb if isinstance(hb, DeviceBatch) else to_device(hb))
        if len(buf) == accum_steps:
            yield stack_batches(buf)
            buf = []
    if buf:
        while len(buf) < accum_steps:
            buf.append(blank_like(buf[0], pad=pad))
        yield stack_batches(buf)


def batch_masks(b: DeviceBatch, pad: int) -> Tuple[SourceMasks, jnp.ndarray]:
    """Returns (source masks, target mask (B, La, La))."""
    masks = SourceMasks(
        query=pad_mask(b.query, pad),
        his=pad_mask(b.his, pad),
        cap=pad_mask(b.cap, pad),
        vid=tuple(length_mask(l, f.shape[1])
                  for l, f in zip(b.fts_len, b.fts)),
    )
    return masks, target_mask(b.answer_in, pad)
