"""Discriminative candidate ranking (the VisDial-style mode).

The reference's visdial branch selects, at test time, the answer option
with the highest generative log-likelihood under the dialogue context
(reference readme.md:81-86). ``BeamDecoder.rank_batch`` computes those
log-likelihoods with the cached one-token decode step tiled over
candidates; these tests pin it against a teacher-forced full-forward
oracle, prove the (N, L) bucketing is padding-invariant, and pin the
retrieval metric block to hand-derived goldens.
"""

import numpy as np
import pytest

import jax

from mtn_tpu.config import DecodeConfig
from mtn_tpu.decode.beam import BeamDecoder
from mtn_tpu.evalmetrics.retrieval import rank_of, retrieval_metrics
from mtn_tpu.models.mtn import MTN
from mtn_tpu.train.batch import batch_masks
from tests.fixtures import tiny_model_cfg
from tests.slow_reference import full_forward_logp
from tests.test_model import PAD, _random_batch

EOS = 3  # SPECIALS["<eos>"]
SOS = 2


def _setup(vocab=30):
    rng = np.random.default_rng(7)
    db = _random_batch(rng, B=2, vocab=vocab)
    cfg = tiny_model_cfg(vocab, (12, 8), dropout=0.0)
    model = MTN(cfg)
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(1)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=8, beam=2, nbest=2))
    return model, params, db, dec


def _oracle_score(model, params, db, row, tokens, include_eos):
    """sum_l log P(t_l | context, t_<l) via teacher-forced FULL forwards
    (one whole-prefix forward per position — the slow oracle)."""
    seq = list(tokens) + ([EOS] if include_eos else [])
    total = 0.0
    prefix = [SOS]
    B = db.query.shape[0]
    for t in seq:
        arr = np.full((B, len(prefix)), PAD, np.int32)
        arr[row, :] = prefix
        logp = full_forward_logp(model, params, db, PAD, arr)
        total += float(logp[row, t])
        prefix.append(t)
    return total


@pytest.mark.parametrize("include_eos", [True, False])
def test_rank_scores_match_full_forward_oracle(include_eos):
    model, params, db, dec = _setup()
    cands = [
        [[5, 9, 4], [7], [11, 12, 13, 14, 6]],
        [[8, 8], [10, 4, 6], [5]],
    ]
    got = dec.rank_batch(params, db, cands, include_eos=include_eos)
    assert len(got) == 2
    for b in range(2):
        assert len(got[b]) == len(cands[b])
        for n, toks in enumerate(cands[b]):
            want = _oracle_score(model, params, db, b, toks, include_eos)
            assert got[b][n] == pytest.approx(want, abs=2e-3), (b, n)


def test_rank_bucketing_is_padding_invariant():
    """Scores must not depend on the (N, L) compile bucket: padded
    candidate slots and padded tail positions contribute exactly 0."""
    _, params, db, dec = _setup()
    cands = [[[5, 9, 4], [7]], [[8, 8], [10, 4, 6]]]
    a = dec.rank_batch(params, db, cands, len_bucket=4, cand_bucket=2)
    b = dec.rank_batch(params, db, cands, len_bucket=16, cand_bucket=8)
    for ra, rb in zip(a, b):
        assert ra == pytest.approx(rb, abs=1e-5)


def test_rank_candidate_count_mismatch_raises():
    _, params, db, dec = _setup()
    with pytest.raises(ValueError):
        dec.rank_batch(params, db, [[[5]]])  # 1 row of cands, batch has 2


def test_rank_of_tie_law():
    # strictly higher outranks; exact ties do not
    assert rank_of([0.5, 0.9, 0.5, 0.1], 0) == 2
    assert rank_of([0.5, 0.9, 0.5, 0.1], 1) == 1
    assert rank_of([0.5, 0.9, 0.5, 0.1], 3) == 4
    with pytest.raises(IndexError):
        rank_of([0.5], 1)


def test_retrieval_metrics_goldens():
    # hand-derived: ranks 1, 3, 12, 5 over four turns
    m = retrieval_metrics([1, 3, 12, 5])
    assert m["r@1"] == pytest.approx(1 / 4)
    assert m["r@5"] == pytest.approx(3 / 4)
    assert m["r@10"] == pytest.approx(3 / 4)
    assert m["mean_rank"] == pytest.approx(21 / 4)
    assert m["mrr"] == pytest.approx((1 + 1 / 3 + 1 / 12 + 1 / 5) / 4)
    with pytest.raises(ValueError):
        retrieval_metrics([])
    with pytest.raises(ValueError):
        retrieval_metrics([0])
