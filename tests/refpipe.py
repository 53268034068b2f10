"""Shared machinery for executed-reference pipeline parity tests.

Runs the ACTUAL ``/root/reference`` train.py + generate.py (torch, CPU,
``.cuda()`` patched to no-ops), migrates the produced checkpoint, decodes
the same test set with our framework, and provides the margin-aware
comparison law (see tests/test_pipeline_parity.py's module docstring for
the full rationale). Used by both the original tiny fixture and the
scaled / config-matrix suite (tests/test_pipeline_parity_scaled.py,
VERDICT r3 next #2).
"""

from __future__ import annotations

import copy
import json
import os
import pickle
import runpy
import sys
import types
from typing import Dict, List, Optional

import pytest

REF = "/root/reference"

# Cross-framework beam-score noise bound. Per-step logit agreement is
# proven to ~2e-4 (test_reference_parity); beam scores sum ~12 steps of
# logprobs over 5 hypotheses, so accumulated drift is bounded well under
# this. A reference margin above EPS cannot be flipped by transplant
# numerics; a margin below it is a genuine near-tie.
EPS = 0.05


def require_reference_env():
    """Skip unless the reference tree + torch are importable; stub the
    vestigial torchtext import (data_utils.py:8)."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    pytest.importorskip("tqdm")
    if "torchtext" not in sys.modules:
        tt = types.ModuleType("torchtext")
        tt.data = types.SimpleNamespace(Iterator=object, batch=None)
        tt.datasets = types.SimpleNamespace()
        sys.modules["torchtext"] = tt
    return torch


def run_reference_pipeline(corpus, model_prefix: str, ref_out: str,
                           train_args: List[str], maxlen: int = 12,
                           torch_seed: int = 1) -> List[list]:
    """Train + beam-decode with the actual reference pipeline (CPU).

    ``train_args``: everything after the data flags (dims, epochs, model
    flags...). Decodes ``corpus.lbl_test_set`` with the reference
    defaults (beam=5, penalty=1.0, nbest=5 — generate.py:56 never
    forwards the CLI values into beam_search_decode).

    Returns nbest_records: per decoded turn, the reference's own nbest
    completion list ``[(hyp_text, completion_score), ...]`` recorded
    from beam_search_decode's return value (data_utils.py:239-240).
    """
    torch = require_reference_env()
    # The reference hard-codes .cuda() (train.py:160-162,
    # data_handler.py:217, data_utils.py:28); torch>=2.6 also defaults
    # torch.load(weights_only=True) which cannot load the reference's
    # whole-module pickle (train.py:217). Patch both for the run.
    saved = (torch.Tensor.cuda, torch.nn.Module.cuda, torch.load)
    old_argv, old_path = sys.argv, list(sys.path)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _load = torch.load
    torch.load = lambda *a, **k: _load(
        *a, **{**k, "weights_only": False, "map_location": "cpu"})
    sys.path.insert(0, REF)
    nbest_records: List[list] = []
    try:
        sys.argv = [
            "train.py", "--gpu", "-1",
            "--fea-type", *corpus.fea_types,
            "--train-path", corpus.fea_path, "--train-set", corpus.train_set,
            "--valid-path", corpus.fea_path, "--valid-set", corpus.valid_set,
            "--model", model_prefix, *train_args,
        ]
        # the reference does NOT seed torch (train.py:108-109 covers only
        # random/numpy) — pin the xavier init draw here so the trained
        # model is independent of import context
        torch.manual_seed(torch_seed)
        runpy.run_path(os.path.join(REF, "train.py"), run_name="__main__")

        # wrap the reference's beam to record each turn's nbest
        # completion list (token ids + scores) for margin analysis
        import data_utils as ref_data_utils  # cached from the train run
        with open(model_prefix + ".conf", "rb") as f:
            vocab, _ = pickle.load(f)
        vocablist = sorted(vocab.keys(), key=lambda s: vocab[s])
        eos = vocab["<eos>"]
        orig_beam = ref_data_utils.beam_search_decode

        def recording_beam(*a, **k):
            maxhyps, best_state = orig_beam(*a, **k)
            turn = []
            for toks, score in maxhyps:
                words = []
                for w in toks:  # generate.py:59-64 hypstr law
                    if w == eos:
                        break
                    words.append(vocablist[w])
                turn.append((" ".join(words), float(score)))
            nbest_records.append(turn)
            return maxhyps, best_state

        ref_data_utils.beam_search_decode = recording_beam
        sys.argv = [
            "generate.py", "--test-path", corpus.fea_path,
            "--test-set", corpus.lbl_test_set,
            "--model-conf", model_prefix + ".conf",
            "--model", model_prefix + "_best",
            "--maxlen", str(maxlen), "--beam", "5", "--penalty", "1.0",
            "--nbest", "5", "--output", ref_out,
            "--decode-style", "beam_search", "--undisclosed-only", "0",
        ]
        try:
            runpy.run_path(os.path.join(REF, "generate.py"),
                           run_name="__main__")
        finally:
            ref_data_utils.beam_search_decode = orig_beam
    finally:
        sys.argv = old_argv
        sys.path[:] = old_path
        torch.Tensor.cuda, torch.nn.Module.cuda, torch.load = saved
    return nbest_records


def migrate_and_decode_ours(corpus, model_prefix: str, out_prefix: str,
                            our_out: str, maxlen: int = 12,
                            turn_batch: int = 4) -> None:
    """Migrate the reference checkpoint and beam-decode the same test
    set with our generate CLI (f32, reference-default beam settings)."""
    from mtn_tpu.cli.generate import main as generate_main
    from mtn_tpu.utils.migrate import migrate_checkpoint

    best = os.path.realpath(model_prefix + "_best.pth.tar")
    migrate_checkpoint(best, model_prefix + ".conf", out_prefix, epoch=1)
    rc = generate_main([
        "--test-path", corpus.fea_path, "--test-set", corpus.lbl_test_set,
        "--model", out_prefix + "_1", "--maxlen", str(maxlen),
        "--beam", "5", "--penalty", "1.0", "--nbest", "5",
        "--output", our_out, "--decode-style", "beam_search",
        "--undisclosed-only", "0", "--turn-batch", str(turn_batch),
        "--dtype", "float32",
    ])
    assert rc == 0


def result_answers(result_path: str):
    with open(result_path) as f:
        result = json.load(f)
    return [(d["image_id"], t, qa["answer"])
            for d in result["dialogs"]
            for t, qa in enumerate(d["dialog"])]


def classify_turns(corpus, ref_out: str, our_out: str,
                   nbest_records: List[list], eps: float = EPS,
                   min_turns: int = 9) -> List[Dict]:
    """Pair up turns and classify each as robust-match / tied-match /
    mismatch using the reference's own nbest margins."""
    with open(corpus.lbl_test_set) as f:
        n_turns = sum(len(d["dialog"]) for d in json.load(f)["dialogs"])
    ref_answers = result_answers(ref_out)
    our_answers = result_answers(our_out)
    assert len(ref_answers) == len(our_answers) == n_turns >= min_turns
    assert len(nbest_records) == n_turns

    rows = []
    for (rvid, rt, rans), (ovid, ot, oans), nbest in zip(
            ref_answers, our_answers, nbest_records):
        assert (ovid, ot) == (rvid, rt)
        assert nbest and nbest[0][0] == rans, (
            "recorded nbest disagrees with the written result file")
        top = nbest[0][1]
        margin = top - nbest[1][1] if len(nbest) > 1 else float("inf")
        tied = {text for text, sc in nbest if top - sc <= eps}
        rows.append(dict(vid=rvid, turn=rt, ref=rans, ours=oans,
                         margin=margin, tied=tied))
    return rows


def assert_margin_aware(rows: List[Dict], eps: float = EPS) -> None:
    """(a) robust-margin turns match token-for-token; (b) near-tied
    turns decode a reference-scored tied candidate; (c) a majority of
    turns are robust (the comparison keeps teeth)."""
    robust = [r for r in rows if r["margin"] > eps]
    for r in robust:
        assert r["ours"] == r["ref"], (
            f"ROBUST-margin mismatch at {r['vid']} turn {r['turn']} "
            f"(ref margin {r['margin']:.4f} > EPS={eps}): "
            f"ref={r['ref']!r} ours={r['ours']!r}")
    for r in rows:
        if r["margin"] <= eps:
            assert r["ours"] in r["tied"], (
                f"near-tied turn {r['vid']}/{r['turn']} decoded a "
                f"hypothesis the reference did not score within EPS of "
                f"its 1-best: ref={r['ref']!r} ours={r['ours']!r} "
                f"tied={sorted(r['tied'])!r}")
    assert len(robust) * 2 >= len(rows), (
        f"only {len(robust)}/{len(rows)} turns have robust margins — "
        f"the fixture model is too flat for the test to prove anything")


def assert_stage4_equal(corpus, ref_out: str, our_out: str,
                        rows: List[Dict], eps: float = EPS) -> None:
    """Exact stage-4 score parity after normalizing near-tied turns.

    Near-tied turns (reference margin <= EPS) may legitimately decode a
    different-but-equal-scored hypothesis; both result files get the
    reference answer substituted for those (counted, bounded) so the
    score comparison is over genuinely-invariant content — then the
    full convert+score machinery must agree to 1e-12.
    """
    from mtn_tpu.evalmetrics.convert import (build_annotation,
                                             build_hypotheses,
                                             coco_to_corpora)
    from mtn_tpu.evalmetrics.scorer import score_pairs

    normalized = {(r["vid"], r["turn"]): r["ref"]
                  for r in rows if r["margin"] <= eps}
    # teeth: at least half the turns enter the comparison un-normalized
    assert len(normalized) * 2 <= len(rows)

    with open(corpus.lbl_test_set) as f:
        lbl = json.load(f)
    annotation = build_annotation(lbl)
    scores = {}
    for name, path in (("ref", ref_out), ("ours", our_out)):
        with open(path) as f:
            result = json.load(f)
        result = copy.deepcopy(result)
        for d in result["dialogs"]:
            for t, qa in enumerate(d["dialog"]):
                key = (d["image_id"], t)
                if key in normalized:
                    qa["answer"] = normalized[key]
        refs, hyps = coco_to_corpora(annotation, build_hypotheses(result))
        scores[name] = score_pairs(refs, hyps)
    assert scores["ours"] == pytest.approx(scores["ref"], abs=1e-12)
