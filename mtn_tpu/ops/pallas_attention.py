"""Fused (flash-style) multi-head attention Pallas kernel for TPU.

Placeholder module: :func:`supports` gates dispatch from
mtn_tpu.ops.attention; the fused kernel lands in a later milestone and
until then every shape reports unsupported so the XLA path is used.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def supports(q_shape: Tuple[int, ...], k_shape: Tuple[int, ...],
             dtype) -> bool:
    return False


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    raise NotImplementedError("Pallas attention kernel not yet enabled")
