"""Scaled dot-product attention — XLA path with optional Pallas TPU kernel.

Math parity with the reference ``attention`` (mtn.py:221-231): scores are
``q @ k^T / sqrt(d_k)``, masked positions filled with ``-1e9`` before the
softmax, optional dropout on the probabilities.

The XLA path is a pair of einsum contractions that XLA fuses and tiles
onto the MXU; at MTN's sequence lengths (<= a few hundred) this is already
near the HBM roofline. The Pallas kernel
(:mod:`mtn_tpu.ops.pallas_attention`) fuses the softmax and avoids
materializing the (B, H, Lq, Lk) score tensor in HBM for longer sequences;
it is selected when ``use_pallas=True``, the platform is TPU, and the
shapes satisfy the kernel's tiling constraints.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None,
             dropout_rate: float = 0.0,
             dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """q (B,H,Lq,Dk), k/v (B,H,Lk,Dk), mask bool broadcastable to
    (B,H,Lq,Lk). Returns (B,H,Lq,Dk) in q.dtype; softmax in float32."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(d_k))
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pallas_eligible(q, k) -> bool:
    if jax.default_backend() != "tpu":
        return False
    from mtn_tpu.ops import pallas_attention as pa
    return pa.supports(q.shape, k.shape, q.dtype)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None,
                         dropout_rate: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None,
                         use_pallas: bool = False) -> jnp.ndarray:
    """Head-batched attention on projected tensors (B, H, L, Dk)."""
    if use_pallas and dropout_rate == 0.0 and _pallas_eligible(q, k):
        from mtn_tpu.ops import pallas_attention as pa
        return pa.flash_attention(q, k, v, mask)
    return sdpa_xla(q, k, v, mask, dropout_rate, dropout_rng)
