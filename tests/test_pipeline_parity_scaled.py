"""Executed-reference parity at scale + across the config matrix.

tests/test_pipeline_parity.py proves the margin-aware law on a 9-turn,
2-block d16 fixture with one flag combination. This suite (VERDICT r3
next #2) extends the SAME executed-pipeline comparison (the actual
/root/reference train.py + generate.py, CPU torch) along two axes:

1. **Scale** (``scaled``): a mid-size model (4 blocks, d64, ff256, 4
   heads) trained on a ~300-turn corpus with a ~500-word vocabulary and
   decoded over 102 turns — a regime where a systematic metric delta
   (wrong norm law, off-by-one in the beam, drifting logits) would be
   statistically visible instead of hiding inside a handful of turns.
2. **Config coverage**: flag combinations the tiny fixture never
   executes end-to-end — ``auto_encoder_ft=caption`` (the sublayer
   order swap, reference mtn.py:192-202), ``merge_source=1``
   (caption+history folded into the query, data_handler.py:126-127),
   ``diff_embed``/``diff_gen`` (per-stream AE embeddings/
   generators, mtn.py:347-357), and — VERDICT r4 #4c —
   ``max_history_length>0`` (history truncation,
   data_handler.py:117-120) and ``include_caption=summary`` (the
   summary text as the caption stream, data_handler.py:106-112).

Round 5 additions (VERDICT r4 #4): the config matrix runs over TWO
independent (corpus, torch-init, shuffle) seed triples instead of one
(#4b — a subtle systematic delta like a rare tie-break law gets two
chances per config to surface), and ``protocol`` scales the decoded
set to 500+ turns at the mid dims (#4a — protocol-size statistical
visibility with an executed-reference counterpart).

Each case asserts the full margin-aware law AND stage-4 metric-block
equality via tests/refpipe.py. Everything is CPU torch at small dims —
minutes per case, no TPU needed.
"""

from __future__ import annotations

import pytest

from tests import refpipe
from tests.fixtures import make_dialog_json, write_tiny_corpus

pytestmark = pytest.mark.slow

# ~600 synthetic word types so the trained vocabulary lands near 500
# after the cutoff-5 law (plus function-ish glue words that recur)
SCALED_WORDS = tuple(f"w{i:03d}" for i in range(600)) + tuple(
    "a the is are was and of to in on".split()) * 40

TINY_DIMS = ["--nb-blocks", "2", "--d-model", "16", "--d-ff", "32",
             "--att-h", "2"]
MID_DIMS = ["--nb-blocks", "4", "--d-model", "64", "--d-ff", "256",
            "--att-h", "4"]

CASES = {
    # the scale axis: mid-size model, big corpus, 102 decoded turns
    "scaled": dict(
        dims=MID_DIMS, n_dialogs=100, n_test_dialogs=34, words=SCALED_WORDS,
        epochs=2, batch_size=16, warmup=50, turn_batch=16,
        flags=["--include-caption", "caption", "--separate-caption", "1",
               "--cut-a", "1", "--diff-encoder", "1",
               "--auto-encoder-ft", "query"]),
    # the config axis, at tiny dims (each runs the whole pipeline)
    "ae_caption": dict(
        dims=TINY_DIMS, n_dialogs=8, n_test_dialogs=3, words=None,
        epochs=4, batch_size=4, warmup=20, turn_batch=4,
        flags=["--include-caption", "caption", "--separate-caption", "1",
               "--cut-a", "1", "--diff-encoder", "1",
               "--auto-encoder-ft", "caption"]),
    # NB separate-caption must stay 1: the reference model encodes b.cap
    # unconditionally (mtn.py:29), and without separate_caption its
    # make_batch leaves cap=None — the reference crashes. merge_source
    # on top of it folds caption+history into the query stream too.
    "merge_source": dict(
        dims=TINY_DIMS, n_dialogs=8, n_test_dialogs=3, words=None,
        epochs=4, batch_size=4, warmup=20, turn_batch=4,
        flags=["--include-caption", "caption", "--separate-caption", "1",
               "--merge-source", "1", "--diff-encoder", "1",
               "--auto-encoder-ft", "query"]),
    # NB epochs=6 (not the matrix's 4): with per-stream AE embeddings +
    # generators the tiny model spreads its capacity and trains flatter;
    # at 4 epochs the second seed triple left only 4/9 turns with robust
    # margins, tripping assert_margin_aware's teeth guard (the parity
    # law itself held). Two more epochs sharpen the margins.
    "diff_embed_gen": dict(
        dims=TINY_DIMS, n_dialogs=8, n_test_dialogs=3, words=None,
        epochs=6, batch_size=4, warmup=20, turn_batch=4,
        flags=["--include-caption", "caption", "--separate-caption", "1",
               "--cut-a", "1", "--diff-encoder", "1", "--diff-embed", "1",
               "--diff-gen", "1", "--auto-encoder-ft", "query"]),
    # VERDICT r4 #4c: history truncation executed end-to-end through
    # the reference decoder (fuzzed at the data layer before, never
    # driven through generate.py) — keep only the last 2 QA turns
    # (data_handler.py:117-120)
    "max_history": dict(
        dims=TINY_DIMS, n_dialogs=8, n_test_dialogs=3, words=None,
        epochs=4, batch_size=4, warmup=20, turn_batch=4,
        flags=["--include-caption", "caption", "--separate-caption", "1",
               "--cut-a", "1", "--diff-encoder", "1",
               "--max-history-length", "2", "--auto-encoder-ft", "query"]),
    # VERDICT r4 #4c: the summary text as the caption stream
    # (data_handler.py:106-112)
    "caption_summary": dict(
        dims=TINY_DIMS, n_dialogs=8, n_test_dialogs=3, words=None,
        epochs=4, batch_size=4, warmup=20, turn_batch=4,
        flags=["--include-caption", "summary", "--separate-caption", "1",
               "--cut-a", "1", "--diff-encoder", "1",
               "--auto-encoder-ft", "query"]),
    # VERDICT r4 #4a: protocol-size decode — 170 test dialogs x 3 turns
    # = 510 decoded turns at the mid dims
    "protocol": dict(
        dims=MID_DIMS, n_dialogs=100, n_test_dialogs=170,
        words=SCALED_WORDS,
        epochs=2, batch_size=16, warmup=50, turn_batch=16,
        flags=["--include-caption", "caption", "--separate-caption", "1",
               "--cut-a", "1", "--diff-encoder", "1",
               "--auto-encoder-ft", "query"]),
}

# Two independent (corpus, reference-shuffle, torch-init) seed triples
# (VERDICT r4 #4b). The second triple retrains AND re-generates the
# corpus, so every data-law + init + shuffle draw differs.
SEEDS = {1: dict(corpus_seed=11, rand_seed=1, torch_seed=7),
         2: dict(corpus_seed=23, rand_seed=5, torch_seed=13)}


def _run_case(name: str, tmp_path_factory, corpus_seed: int = 11,
              rand_seed: int = 1, torch_seed: int = 7):
    cfg = CASES[name]
    refpipe.require_reference_env()
    root = tmp_path_factory.mktemp(f"refpipe_{name}_s{corpus_seed}")
    kw = dict(n_dialogs=cfg["n_dialogs"], n_turns=3,
              n_test_dialogs=cfg["n_test_dialogs"], seed=corpus_seed)
    if cfg["words"] is not None:
        kw["words"] = cfg["words"]
    corpus = write_tiny_corpus(root / "corpus", **kw)
    model_prefix = str(root / "mtn")
    ref_out = str(root / "ref_result.json")
    nbest_records = refpipe.run_reference_pipeline(
        corpus, model_prefix, ref_out,
        train_args=[*cfg["flags"], *cfg["dims"], "--dropout", "0.1",
                    "--num-epochs", str(cfg["epochs"]),
                    "--rand-seed", str(rand_seed),
                    "--batch-size", str(cfg["batch_size"]),
                    "--max-length", "64", "--report-interval", "20",
                    "--warmup-steps", str(cfg["warmup"])],
        maxlen=12, torch_seed=torch_seed)
    our_out = str(root / "our_result.json")
    refpipe.migrate_and_decode_ours(corpus, model_prefix,
                                    str(root / "ours" / "mtn"), our_out,
                                    maxlen=12,
                                    turn_batch=cfg["turn_batch"])
    rows = refpipe.classify_turns(corpus, ref_out, our_out, nbest_records)
    refpipe.assert_margin_aware(rows)
    refpipe.assert_stage4_equal(corpus, ref_out, our_out, rows)
    return rows


def test_scaled_pipeline_parity(tmp_path_factory):
    rows = _run_case("scaled", tmp_path_factory)
    assert len(rows) >= 100  # the scale claim: 100+ decoded turns


def test_protocol_size_pipeline_parity(tmp_path_factory):
    """VERDICT r4 #4a: executed-reference parity at protocol size —
    500+ decoded turns through the actual reference decoder."""
    rows = _run_case("protocol", tmp_path_factory)
    assert len(rows) >= 500


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("case", ["ae_caption", "merge_source",
                                  "diff_embed_gen", "max_history",
                                  "caption_summary"])
def test_config_matrix_pipeline_parity(case, seed, tmp_path_factory):
    _run_case(case, tmp_path_factory, **SEEDS[seed])
