"""Attention masks as pure functions (all jit-safe, static shapes).

Parity notes vs the reference:
- pad masks: ``(seq != pad)`` per key position (data_utils.py:34-41);
- target mask: pad mask AND causal lower-triangle
  (data_utils.py:48-54, ``subsequent_mask`` data_utils.py:10-14);
- feature masks: the reference pads frames with ones and masks frames whose
  channels are all == 1 (data_utils.py:29-30); here masks come from explicit
  frame counts (see mtn_tpu/data/features.py docstring for the rationale).

Mask convention: boolean, True = attend. Shapes are ``(B, 1, Lk)`` for
pure key-padding masks and ``(B, Lq, Lk)`` for the target mask; attention
broadcasts them over heads.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_mask(seq: jnp.ndarray, pad: int) -> jnp.ndarray:
    """(B, L) int tokens -> (B, 1, L) bool."""
    return (seq != pad)[:, None, :]


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, 1, max_len) bool."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None])[:, None, :]


def attend_first_if_empty(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, L) key mask: rows with NO valid key attend key 0 only.

    The decode-time law for fully-masked sources (e.g. the lone-<blank>
    history of a turn-0 row under separate_caption). The reference
    decodes at batch size 1 (generate.py:146, make_batch_indices(...,1)),
    so such a source has length exactly 1 and its -1e9-filled softmax
    (mtn.py:229) collapses onto that single <blank> position. Under our
    static-shape batched decode the row is padded to the batch/bucket
    length, and a fully-masked softmax would instead spread uniformly
    over L pad positions — making the output depend on the padding
    length. Restricting degenerate rows to key 0 reproduces the
    reference's batchsize-1 decode exactly AND makes decode output
    padding-invariant. Training keeps the raw masks: there the reference
    itself batches (h_len = batch max), i.e. the same uniform spread.
    """
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    first = jnp.zeros_like(mask).at[..., :1].set(True)
    return jnp.where(any_valid, mask, first)


def causal_mask(size: int) -> jnp.ndarray:
    """(1, size, size) bool lower-triangular."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))[None]


def target_mask(tgt: jnp.ndarray, pad: int) -> jnp.ndarray:
    """(B, L) tokens -> (B, L, L) bool causal+pad mask."""
    return pad_mask(tgt, pad) & causal_mask(tgt.shape[-1])
