"""Label-smoothed KL loss + the composite MTN training objective.

Parity with the reference:

- ``label_smoothed_kl`` reproduces LabelSmoothing (label_smoothing.py:9-32)
  + KLDivLoss(sum): the smoothed target distribution puts ``1-smoothing``
  on the gold token, ``smoothing/(V-2)`` elsewhere, zeroes the pad column
  and all pad-target rows, and the loss *includes* the target-entropy term
  ``Σ p·log p`` (torch KLDiv semantics) so loss values are comparable.
- ``mtn_loss`` reproduces SimpleLossCompute + run_epoch's AE branch
  (data_utils.py:123-156, train.py:34-39):
  ``KL(resp)/ntokens + Σ_i λ·KL(ae_i)/ae_ntokens`` where the auto-encoder
  reconstructs the source tokens position-by-position and ``ae_ntokens``
  counts non-<blank> source tokens.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def label_smoothed_kl(logp: jnp.ndarray, targets: jnp.ndarray, pad: int,
                      smoothing: float) -> jnp.ndarray:
    """Sum KL divergence (scalar, float32).

    logp: (..., V) float32 log-probabilities; targets: (...,) int32.
    """
    V = logp.shape[-1]
    logp = logp.reshape(-1, V).astype(jnp.float32)
    targets = targets.reshape(-1)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 2)
    onehot = jax.nn.one_hot(targets, V, dtype=jnp.float32)
    td = low + (confidence - low) * onehot
    col = (jnp.arange(V) != pad).astype(jnp.float32)[None, :]
    row = (targets != pad).astype(jnp.float32)[:, None]
    td = td * col * row
    # KLDiv(sum): sum td*(log td - logp), with 0·log0 := 0
    xlogx = jnp.where(td > 0, td * jnp.log(jnp.maximum(td, 1e-30)), 0.0)
    return jnp.sum(xlogx - td * logp)


def mtn_loss(resp_logp: jnp.ndarray, answer_out: jnp.ndarray,
             ae_logps: Sequence[jnp.ndarray], ae_targets: jnp.ndarray,
             pad: int, smoothing: float, loss_l: float,
             norm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
             ) -> Tuple[jnp.ndarray, dict]:
    """Composite objective. Returns (normalized loss, metrics dict).

    metrics['loss_x_ntok'] is the reference run_epoch accumulator value
    (``loss.item()*ntokens``, data_utils.py:156) so epoch averages match.

    ``norm``: optional externally supplied ``(ntokens, ae_ntokens)``
    normalizers. Gradient accumulation passes the *macro-batch* totals
    here so the sum of microbatch losses/grads equals the one-big-batch
    loss/grad exactly (Trainer accumulating step).
    """
    if norm is None:
        ntokens = jnp.sum(answer_out != pad).astype(jnp.float32)
        ntokens = jnp.maximum(ntokens, 1.0)
        ae_ntokens = jnp.maximum(
            jnp.sum(ae_targets != pad).astype(jnp.float32), 1.0)
    else:
        ntokens, ae_ntokens = norm
    loss = label_smoothed_kl(resp_logp, answer_out, pad, smoothing) / ntokens
    for ae_logp in ae_logps:
        loss = loss + loss_l * label_smoothed_kl(
            ae_logp, ae_targets, pad, smoothing) / ae_ntokens
    metrics = {
        "ntokens": ntokens,
        "loss": loss,
        "loss_x_ntok": loss * ntokens,
    }
    return loss, metrics
