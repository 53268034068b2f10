"""Fast cached beam search vs the slow reference-semantics oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.config import DecodeConfig
from mtn_tpu.decode.beam import BeamDecoder
from mtn_tpu.models.mtn import MTN
from mtn_tpu.train.batch import batch_masks
from tests.fixtures import tiny_model_cfg
from tests.slow_reference import slow_beam, slow_greedy
from tests.test_model import _random_batch, PAD, SOS

EOS, UNK = 3, 0


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    db = _random_batch(rng, B=3, vocab=20)
    cfg = tiny_model_cfg(20, (12, 8), dropout=0.0)
    model = MTN(cfg)
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(5)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    return cfg, model, params, db


def _row(db, b):
    return jax.tree.map(lambda x: x[b:b + 1] if hasattr(x, "shape")
                        and x.ndim > 0 else x, db)


def test_beam_matches_slow_reference(setup):
    cfg, model, params, db = setup
    dcfg = DecodeConfig(maxlen=6, beam=3, nbest=3, penalty=1.0, min_len=1)
    dec = BeamDecoder(cfg, dcfg)
    fast = dec.beam_batch(params, db)
    for b in range(db.query.shape[0]):
        want, best = slow_beam(model, params, _row(db, b), PAD, SOS, EOS,
                               UNK, maxlen=6, beam=3, penalty=1.0, nbest=3)
        got = fast[b]
        assert len(got.tokens) == len(want)
        for (wt, ws), gt, gs in zip(want, got.tokens, got.scores):
            assert wt == gt, f"row {b}: {wt} != {gt}"
            assert ws == pytest.approx(gs, abs=1e-2)


def test_beam_penalty_matches_oracle_exactly(setup):
    """The penalty term (data_utils.py:214 length reward) changes which
    completions win; both extremes must match the oracle token-for-token
    (not just a directional length inequality)."""
    cfg, model, params, db = setup
    for penalty in (0.0, 5.0):
        dec = BeamDecoder(cfg, DecodeConfig(maxlen=8, beam=3, nbest=2,
                                            penalty=penalty))
        fast = dec.beam_batch(params, db)
        for b in range(db.query.shape[0]):
            want, _ = slow_beam(model, params, _row(db, b), PAD, SOS, EOS,
                                UNK, maxlen=8, beam=3, penalty=penalty,
                                nbest=2)
            assert [t for t, _ in want] == fast[b].tokens, \
                f"penalty={penalty} row {b}"
    # and the documented consequence: a large reward lengthens the 1-best
    short = BeamDecoder(cfg, DecodeConfig(maxlen=8, beam=3, nbest=1,
                                          penalty=0.0))
    long = BeamDecoder(cfg, DecodeConfig(maxlen=8, beam=3, nbest=1,
                                         penalty=5.0))
    ls = np.mean([len(r.tokens[0]) for r in short.beam_batch(params, db)])
    ll = np.mean([len(r.tokens[0]) for r in long.beam_batch(params, db)])
    assert ll >= ls


def test_greedy_matches_slow(setup):
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=5))
    fast = dec.greedy_batch(params, db)
    slow = slow_greedy(model, params, db, PAD, SOS, maxlen=5)
    for b in range(db.query.shape[0]):
        want = []
        for t in slow[b, 1:]:
            if int(t) == EOS:
                break
            want.append(int(t))
        assert fast[b] == want


def test_beam_invalid_rows_skipped(setup):
    cfg, model, params, db = setup
    db2 = dataclasses.replace(db, valid=jnp.array([True, False, True]))
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=4, beam=2, nbest=2))
    res = dec.beam_batch(params, db2)
    assert len(res) == 2


def test_min_len_suppresses_early_eos(setup):
    cfg, model, params, db = setup
    early = BeamDecoder(cfg, DecodeConfig(maxlen=5, beam=2, nbest=1,
                                          min_len=1))
    late = BeamDecoder(cfg, DecodeConfig(maxlen=5, beam=2, nbest=1,
                                         min_len=4))
    r_early = early.beam_batch(params, db)
    r_late = late.beam_batch(params, db)
    for a, b in zip(r_early, r_late):
        assert len(b.tokens[0]) >= 4  # completions only recorded at l>=4
        assert len(a.tokens[0]) >= 1


def test_maxlen_one(setup):
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=1, beam=2, nbest=2,
                                        min_len=0))
    res = dec.beam_batch(params, db)
    # at l=0 with min_len=0 the only completion is the empty hypothesis
    for r in res:
        assert r.tokens[0] == []


def test_beam_matches_slow_reference_caption_order():
    """Same oracle check for auto_encoder_ft='caption' (swapped x-path
    attention order + caption-seeded AE, mtn.py:187-194)."""
    rng = np.random.default_rng(11)
    db = _random_batch(rng, B=2, vocab=20)
    cfg = tiny_model_cfg(20, (12, 8), dropout=0.0, auto_encoder_ft="caption",
                         diff_encoder=True)
    model = MTN(cfg)
    from mtn_tpu.train.batch import batch_masks
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(9)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=5, beam=2, nbest=2))
    fast = dec.beam_batch(params, db)
    for b in range(2):
        want, _ = slow_beam(model, params, _row(db, b), PAD, SOS, EOS, UNK,
                            maxlen=5, beam=2, penalty=1.0, nbest=2)
        assert [t for t, _ in want] == fast[b].tokens


def test_nbest_exceeds_beam(setup):
    """run.sh uses nbest=5 with beam=5; nbest > beam must also work (the
    completion pool accumulates across steps, so more than `beam`
    completions exist)."""
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=5, beam=2, nbest=6))
    res = dec.beam_batch(params, db)
    for r in res:
        assert 1 <= len(r.tokens) <= 6
        assert r.scores == sorted(r.scores, reverse=True)


def test_early_stop_preserves_semantics(setup):
    """early_stop (while_loop with the convergence bound) must be
    output-identical to the full maxlen scan, across penalty regimes
    (the bound differs for reward vs penalize)."""
    cfg, model, params, db = setup
    for penalty in (0.0, 1.0, -0.5):
        full = BeamDecoder(cfg, DecodeConfig(maxlen=8, beam=3, nbest=3,
                                             penalty=penalty,
                                             early_stop=False))
        early = BeamDecoder(cfg, DecodeConfig(maxlen=8, beam=3, nbest=3,
                                              penalty=penalty,
                                              early_stop=True))
        for a, b in zip(full.beam_batch(params, db),
                        early.beam_batch(params, db)):
            assert a.tokens == b.tokens, f"penalty={penalty}"
            assert a.scores == pytest.approx(b.scores, abs=1e-5)


def test_early_stop_actually_stops(setup):
    """With penalty=0 the bound converges before maxlen on this fixture
    — assert the while_loop really cut steps (n_steps < maxlen) and the
    n-best is still oracle-exact."""
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=20, beam=2, nbest=2,
                                        penalty=0.0, early_stop=True))
    raw = dec.beam_batch_raw(params, db)
    n_steps = int(np.asarray(raw[3]))
    assert n_steps < 20, "early_stop never fired on the fixture"
    for b, got in zip(range(db.query.shape[0]),
                      dec.beam_results(raw, db.valid)):
        want, _ = slow_beam(model, params, _row(db, b), PAD, SOS, EOS, UNK,
                            maxlen=20, beam=2, penalty=0.0, nbest=2)
        assert [t for t, _ in want] == got.tokens


def test_greedy_early_stop_matches(setup):
    cfg, model, params, db = setup
    full = BeamDecoder(cfg, DecodeConfig(maxlen=8, early_stop=False))
    early = BeamDecoder(cfg, DecodeConfig(maxlen=8, early_stop=True))
    assert full.greedy_batch(params, db) == early.greedy_batch(params, db)


def test_sample_degenerates_to_greedy(setup):
    """top_k=1, temperature→0, and a vanishing nucleus must each pick
    the argmax every step — i.e. reproduce greedy exactly."""
    cfg, model, params, db = setup
    greedy = BeamDecoder(cfg, DecodeConfig(maxlen=5)).greedy_batch(
        params, db)
    for kw in ({"top_k": 1}, {"temperature": 0.0}, {"top_p": 1e-9}):
        dec = BeamDecoder(cfg, DecodeConfig(maxlen=5,
                                            decode_style="sample", **kw))
        assert dec.sample_batch(params, db) == greedy, kw


def test_sample_deterministic_per_seed(setup):
    cfg, model, params, db = setup
    mk = lambda: BeamDecoder(cfg, DecodeConfig(
        maxlen=6, decode_style="sample", temperature=1.0, top_p=0.9))
    a = mk().sample_batch(params, db)
    b = mk().sample_batch(params, db)
    assert a == b  # same default seed → identical draws


def test_sample_fold_varies_across_batches(setup):
    """Without the fold, every batch of a seeded run reuses the exact
    per-(row, position) Gumbel noise; folding the batch counter must
    decorrelate the streams while fold=0 stays the unfolded default."""
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=8, decode_style="sample",
                                        temperature=5.0))
    base = dec.sample_batch(params, db)
    assert dec.sample_batch(params, db, fold=0) == base
    # near-uniform sampling over 20 tokens x 8 positions x 3 rows:
    # identical outputs across folds would be a (1/20)^~24 coincidence
    folded = [dec.sample_batch(params, db, fold=i) for i in (1, 2, 3)]
    assert any(f != base for f in folded)


def test_sample_top_k_clamped_to_vocab(setup):
    """top_k >= vocab is a no-op filter and must not crash lax.top_k
    (k<=V requirement) — it samples exactly like the unfiltered dist."""
    cfg, model, params, db = setup
    plain = BeamDecoder(cfg, DecodeConfig(
        maxlen=5, decode_style="sample", temperature=1.0))
    huge = BeamDecoder(cfg, DecodeConfig(
        maxlen=5, decode_style="sample", temperature=1.0, top_k=10 ** 6))
    assert huge.sample_batch(params, db) == plain.sample_batch(params, db)


def test_sample_early_stop_matches_full(setup):
    """Per-step rng is keyed by position (fold_in(rng, l)), so the
    while_loop early exit cannot change any pre-exit draw."""
    cfg, model, params, db = setup
    full = BeamDecoder(cfg, DecodeConfig(maxlen=8, decode_style="sample",
                                         top_k=3, early_stop=False))
    early = BeamDecoder(cfg, DecodeConfig(maxlen=8, decode_style="sample",
                                          top_k=3, early_stop=True))
    assert full.sample_batch(params, db) == early.sample_batch(params, db)


def test_scan_unroll_preserves_semantics(setup):
    """unroll>1 is a scheduling knob; tokens and scores must be
    identical to the unroll=1 program."""
    cfg, model, params, db = setup
    base = BeamDecoder(cfg, DecodeConfig(maxlen=6, beam=3, nbest=3,
                                         early_stop=False))
    unrolled = BeamDecoder(cfg, DecodeConfig(maxlen=6, beam=3, nbest=3,
                                             scan_unroll=3,
                                             early_stop=False))
    for a, b in zip(base.beam_batch(params, db),
                    unrolled.beam_batch(params, db)):
        assert a.tokens == b.tokens
        assert a.scores == pytest.approx(b.scores, abs=1e-5)


def _assemble_stream(gen, n_valid, eos=EOS):
    """Reassemble stream_tokens yields into per-row token lists cut at
    each row's first <eos> (the _cut_rows law)."""
    rows = [[] for _ in range(n_valid)]
    done = [False] * n_valid
    for step_tokens in gen:
        assert len(step_tokens) == n_valid
        for i, t in enumerate(step_tokens):
            if done[i]:
                continue
            if int(t) == eos:
                done[i] = True
            else:
                rows[i].append(int(t))
    return rows


def test_stream_matches_greedy(setup):
    """Token streaming (host-driven per-step loop) must reproduce the
    single-program greedy decode exactly."""
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=8))
    want = dec.greedy_batch(params, db)
    got = _assemble_stream(dec.stream_tokens(params, db, style="greedy"),
                           len(want))
    assert got == want


def test_stream_matches_sample(setup):
    """Streamed sampling draws the identical tokens as sample_batch for
    the same seed/fold (shared transform + position-keyed rng)."""
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=8, decode_style="sample",
                                        temperature=1.0, top_p=0.9))
    for fold in (0, 2):
        want = dec.sample_batch(params, db, fold=fold)
        got = _assemble_stream(
            dec.stream_tokens(params, db, style="sample", fold=fold),
            len(want))
        assert got == want, f"fold={fold}"


def test_stream_respects_invalid_rows(setup):
    """Invalid (padding) rows are dropped from every yield and do not
    keep the stream alive."""
    cfg, model, params, db = setup
    db2 = dataclasses.replace(
        db, valid=jnp.array([True, False, True]))
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=6))
    want = dec.greedy_batch(params, db2)   # 2 rows
    assert len(want) == 2
    got = _assemble_stream(dec.stream_tokens(params, db2), 2)
    assert got == want


def test_stream_rejects_beam_style(setup):
    cfg, model, params, db = setup
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=6))
    with pytest.raises(ValueError):
        next(dec.stream_tokens(params, db, style="beam_search"))


def test_degenerate_source_decode_padding_invariant():
    """A row whose history is fully masked (the lone-<blank> turn-0
    history under separate_caption) must decode identically whatever
    length the history axis is padded to, and must match the slow
    oracle — the reference decodes such rows at batch size 1 (h_len=1),
    which ops/masks.py::attend_first_if_empty reproduces under static
    padding. (Before that law, the degenerate uniform softmax made the
    output a function of the padded length.)"""
    rng = np.random.default_rng(21)
    cfg = tiny_model_cfg(20, (12, 8), dropout=0.0)
    model = MTN(cfg)
    base = _random_batch(rng, B=2, Lh=4, vocab=20)
    # identical data apart from the (fully masked) history padding length
    db4 = dataclasses.replace(base, his=jnp.full((2, 4), PAD, jnp.int32))
    db12 = dataclasses.replace(base, his=jnp.full((2, 12), PAD, jnp.int32))
    masks, tgt_mask = batch_masks(db4, PAD)
    params = model.init({"params": jax.random.PRNGKey(9)}, db4.query,
                        db4.his, db4.cap, db4.fts, masks, db4.answer_in,
                        tgt_mask, method=MTN.init_all)["params"]
    dcfg = DecodeConfig(maxlen=6, beam=3, nbest=3, penalty=1.0)
    out4 = BeamDecoder(cfg, dcfg).beam_batch(params, db4)
    out12 = BeamDecoder(cfg, dcfg).beam_batch(params, db12)
    for a, b in zip(out4, out12):
        assert a.tokens == b.tokens
        assert a.scores == pytest.approx(b.scores, abs=1e-4)
    # and the shared-law slow oracle agrees token-for-token
    for b_i in range(2):
        want, _ = slow_beam(model, params, _row(db4, b_i), PAD, SOS, EOS,
                            UNK, maxlen=6, beam=3, penalty=1.0, nbest=3)
        assert [t for t, _ in want] == out4[b_i].tokens
