"""Noam learning-rate schedule + Adam optimizer (optax).

Parity: ``rate = factor · d_model^-0.5 · min(step^-0.5, step·warmup^-1.5)``
over Adam(lr=0→rate, betas=(0.9, 0.98), eps=1e-9) (data_utils.py:92-117,
train.py:190-191). The reference increments its step *before* computing
the rate, so optax count ``c`` maps to reference step ``c+1``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_rate(step, d_model: int, warmup: int, factor: float = 1.0):
    step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
    return factor * (d_model ** -0.5) * jnp.minimum(
        step ** -0.5, step * (warmup ** -1.5))


def noam_schedule(d_model: int, warmup: int, factor: float = 1.0):
    def schedule(count):
        return noam_rate(jnp.asarray(count, jnp.float32) + 1.0,
                         d_model, warmup, factor)
    return schedule


def make_optimizer(d_model: int, warmup: int, factor: float = 1.0
                   ) -> optax.GradientTransformation:
    return optax.adam(learning_rate=noam_schedule(d_model, warmup, factor),
                      b1=0.9, b2=0.98, eps=1e-9)
