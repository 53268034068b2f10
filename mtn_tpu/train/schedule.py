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


def make_optimizer(d_model: int, warmup: int, factor: float = 1.0,
                   grad_clip: float = 0.0) -> optax.GradientTransformation:
    """Noam/Adam, optionally preceded by global-norm gradient clipping.

    ``grad_clip <= 0`` (the default, and the reference's behavior — it
    never clips) returns the plain Adam transformation, so the
    ``opt_state`` pytree structure of existing checkpoints is unchanged.
    With clipping on, the optimizer is an ``optax.chain`` and its state
    gains the chain tuple — checkpoints are compatible only within the
    same setting.
    """
    adam = optax.adam(learning_rate=noam_schedule(d_model, warmup, factor),
                      b1=0.9, b2=0.98, eps=1e-9)
    if grad_clip and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), adam)
    return adam
