"""Slow, cache-free decoding oracles for testing the fast paths.

These re-run the FULL training-style forward over the whole prefix at
every step (the reference's costly strategy, data_utils.py:188-242),
implemented independently from the documented semantics. The fast cached
decoder must match them exactly.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtn_tpu.models.mtn import MTN
from mtn_tpu.ops.masks import causal_mask
from mtn_tpu.train.batch import DeviceBatch, batch_masks


def full_forward_logp(model: MTN, params, batch: DeviceBatch, pad: int,
                      prefix: np.ndarray) -> np.ndarray:
    """Last-position log-probs after a full forward over ``prefix`` (B, L).

    Applies the decode-time degenerate-source law (fully-masked rows
    attend key 0 — ops/masks.py::attend_first_if_empty) so the oracle
    shares MTN.init_decode_state's mask semantics exactly."""
    from mtn_tpu.models.mtn import SourceMasks
    from mtn_tpu.ops.masks import attend_first_if_empty as _fix
    masks, _ = batch_masks(batch, pad)
    masks = SourceMasks(query=_fix(masks.query), his=_fix(masks.his),
                        cap=_fix(masks.cap),
                        vid=tuple(_fix(m) for m in masks.vid))
    tgt = jnp.asarray(prefix, jnp.int32)
    tgt_mask = jnp.broadcast_to(causal_mask(tgt.shape[1]),
                                (tgt.shape[0],) + (tgt.shape[1],) * 2)
    x, _ = model.apply({"params": params}, batch.query, batch.his, batch.cap,
                       batch.fts, masks, tgt, tgt_mask, deterministic=True)
    logp = model.apply({"params": params}, x[:, -1],
                       method=MTN.generate_logprobs)
    return np.asarray(logp, np.float64)


def slow_beam(model: MTN, params, row: DeviceBatch, pad: int, sos: int,
              eos: int, unk: int, maxlen: int, beam: int, penalty: float,
              nbest: int, min_len: int = 1
              ) -> Tuple[List[Tuple[List[int], float]], float]:
    """Single-row (batch=1) beam with reference semantics."""
    hyplist = [([], 0.0)]
    comp: List[Tuple[List[int], float]] = []
    best = None
    for l in range(maxlen):
        cand_all = []
        for out, lp in hyplist:
            prefix = np.array([[sos] + out], dtype=np.int32)
            logp = full_forward_logp(model, params, row, pad, prefix)[0]
            lp_vec = logp + lp
            if l >= min_len:
                new_lp = float(lp_vec[eos] + penalty * (len(out) + 1))
                comp.append((out, new_lp))
                if best is None or best < new_lp:
                    best = new_lp
            for o in range(len(lp_vec)):
                if o == unk or o == eos:
                    continue
                cand_all.append((out + [o], float(lp_vec[o])))
        cand_all.sort(key=lambda h: -h[1])
        hyplist = cand_all[:beam]
    comp.sort(key=lambda h: -h[1])
    return comp[:nbest], best


def slow_greedy(model: MTN, params, batch: DeviceBatch, pad: int, sos: int,
                maxlen: int) -> np.ndarray:
    """Greedy argmax via full forwards; returns (B, maxlen+1) incl <sos>."""
    B = batch.query.shape[0]
    ys = np.full((B, 1), sos, dtype=np.int32)
    for _ in range(maxlen):
        logp = full_forward_logp(model, params, batch, pad, ys)
        nxt = np.argmax(logp, axis=-1).astype(np.int32)
        ys = np.concatenate([ys, nxt[:, None]], axis=1)
    return ys
