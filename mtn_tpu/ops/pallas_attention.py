"""Fused multi-head attention Pallas (Mosaic) kernel for TPU.

The TPU-native counterpart of a custom CUDA attention kernel (the
reference has none — its MultiHeadedAttention is plain torch matmuls,
mtn.py:221-231): one kernel instance per (batch, head) computes
``softmax(q·kᵀ/√d + mask)·v`` entirely in VMEM, so the (Lq, Lk) score
matrix never round-trips through HBM. MTN's sequence lengths (≤ a few
hundred text tokens / video frames) fit comfortably in one VMEM block, so
a single-block fused kernel is the right shape — no streaming/online
softmax needed (that would only pay off at Lk ≫ 1k).

Numerics match :func:`mtn_tpu.ops.attention.sdpa_xla`: scores accumulate
in float32 on the MXU, masked positions get -1e9 before a float32
softmax, and the probability·value matmul accumulates in float32.

Autodiff: the forward is the Pallas kernel; the backward falls back to
the XLA formulation via ``jax.vjp`` (same math ⇒ consistent gradients).
The training hot path keeps the reference's fixed attention-prob dropout
of 0.1, which the kernel does not implement — the dispatcher in
mtn_tpu.ops.attention only selects Pallas when dropout is off (decode /
eval / dropout-0 training), so the kernel's main win is the decode path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9
_MAX_SEQ = 2048          # single-block VMEM budget gate
_INTERPRET = False       # flipped by tests for CPU interpreter mode


def supports(q_shape: Tuple[int, ...], k_shape: Tuple[int, ...],
             dtype) -> bool:
    """Shape gate for the single-block kernel."""
    if len(q_shape) != 4 or len(k_shape) != 4:
        return False
    B, H, Lq, D = q_shape
    Lk = k_shape[2]
    if D > 256 or Lq > _MAX_SEQ or Lk > _MAX_SEQ:
        return False
    # single-/few-query shapes (incremental decode steps) are launch-
    # overhead bound: one tiny grid program per (batch, head) is ~8x
    # slower than the fused XLA einsum there (measured on v5e)
    if Lq < 16:
        return False
    # score block + q/k/v/out blocks must fit VMEM (~16MB) with headroom
    vmem = 4 * (Lq * Lk) + 4 * D * (2 * Lq + 2 * Lk)
    return vmem < 8 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale):
    q = q_ref[0, 0]                    # (Lq, D)
    k = k_ref[0, 0]                    # (Lk, D)
    v = v_ref[0, 0]                    # (Lk, D)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    mask = mask_ref[0]                 # (Lq, Lk) int8
    scores = jnp.where(mask != 0, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pallas_fwd(q, k, v, mask_b):
    """q (B,H,Lq,D), k/v (B,H,Lk,D), mask_b (B,Lq,Lk) int8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    grid = (B, H)
    qkv_spec = lambda L: pl.BlockSpec(
        (1, 1, L, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, Lq, Lk), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[qkv_spec(Lq), qkv_spec(Lk), qkv_spec(Lk), mask_spec],
        out_specs=qkv_spec(Lq),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * D * 2,
            bytes_accessed=q.size * q.dtype.itemsize * 4,
            transcendentals=B * H * Lq * Lk),
    )(q, k, v, mask_b)


def _canon_mask(mask, B, Lq, Lk) -> jnp.ndarray:
    """Broadcast any (B,1|H,1|Lq,Lk) bool mask to (B,Lq,Lk) int8.

    MTN masks are head-independent (data_utils.py:21-54), so collapsing
    the head axis is exact.
    """
    if mask is None:
        return jnp.ones((B, Lq, Lk), jnp.int8)
    m = mask
    if m.ndim == 4:
        m = m[:, 0]
    return jnp.broadcast_to(m, (B, Lq, Lk)).astype(jnp.int8)


@jax.custom_vjp
def _flash(q, k, v, mask_b):
    return _pallas_fwd(q, k, v, mask_b)


def _flash_fwd(q, k, v, mask_b):
    return _pallas_fwd(q, k, v, mask_b), (q, k, v, mask_b)


def _flash_bwd(res, g):
    from mtn_tpu.ops.attention import sdpa_xla
    q, k, v, mask_b = res
    mask = (mask_b != 0)[:, None]
    _, vjp = jax.vjp(lambda q_, k_, v_: sdpa_xla(q_, k_, v_, mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(mask_b)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    return _flash(q, k, v, _canon_mask(mask, B, Lq, Lk))
