"""Pipeline-level behavioral parity vs the ACTUAL runnable reference.

Module-level parity (tests/test_reference_parity.py) transplants params
and compares activations. This test goes end-to-end instead: it executes
the reference's own train.py and generate.py (torch, CPU, `.cuda()`
patched to no-ops) on the tiny fixture corpus, migrates the produced
whole-module pickle with utils/migrate.py, beam-decodes the SAME test
set with our framework, and asserts

  (a) the 1-best hypothesis of every turn matches token-for-token
      (reference generate.py:23-83 / data_utils.py:188-242), and
  (b) stage-4 BLEU/ROUGE/CIDEr/METEOR computed on both result files
      agree.

This converts "parity by construction" into "parity by execution".
Note the reference's generate.py:56 does NOT forward --beam/--penalty/
--nbest into beam_search_decode — it always decodes with the defaults
(beam=5, penalty=1.0, nbest=5, data_utils.py:188); we therefore pass
exactly those to our CLI.
"""

from __future__ import annotations

import json
import os
import runpy
import sys
import types
from pathlib import Path

import pytest

REF = "/root/reference"

DIMS = ["--nb-blocks", "2", "--d-model", "16", "--d-ff", "32",
        "--att-h", "2"]


@pytest.fixture(scope="module")
def ref_run(tmp_path_factory):
    """Train + beam-decode with the actual reference pipeline (CPU)."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    pytest.importorskip("tqdm")
    if "torchtext" not in sys.modules:  # vestigial import (data_utils.py:8)
        tt = types.ModuleType("torchtext")
        tt.data = types.SimpleNamespace(Iterator=object, batch=None)
        tt.datasets = types.SimpleNamespace()
        sys.modules["torchtext"] = tt

    root = tmp_path_factory.mktemp("refpipe")
    from tests.fixtures import write_tiny_corpus
    corpus = write_tiny_corpus(root / "corpus", n_dialogs=8, n_turns=3)
    model_prefix = str(root / "mtn")
    ref_out = str(root / "ref_result.json")

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
    try:
        sys.argv = [
            "train.py", "--gpu", "-1",
            "--fea-type", *corpus.fea_types,
            "--train-path", corpus.fea_path, "--train-set", corpus.train_set,
            "--valid-path", corpus.fea_path, "--valid-set", corpus.valid_set,
            "--include-caption", "caption", "--separate-caption", "1",
            "--cut-a", "1", "--merge-source", "0", "--model", model_prefix,
            *DIMS, "--dropout", "0.1", "--diff-encoder", "1",
            "--auto-encoder-ft", "query", "--num-epochs", "2",
            "--rand-seed", "1", "--batch-size", "4", "--max-length", "64",
            "--report-interval", "4", "--warmup-steps", "20",
        ]
        runpy.run_path(os.path.join(REF, "train.py"), run_name="__main__")
        sys.argv = [
            "generate.py", "--test-path", corpus.fea_path,
            "--test-set", corpus.lbl_test_set,
            "--model-conf", model_prefix + ".conf",
            "--model", model_prefix + "_best",
            "--maxlen", "12", "--beam", "5", "--penalty", "1.0",
            "--nbest", "5", "--output", ref_out,
            "--decode-style", "beam_search", "--undisclosed-only", "0",
        ]
        runpy.run_path(os.path.join(REF, "generate.py"), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path[:] = old_path
        torch.Tensor.cuda, torch.nn.Module.cuda, torch.load = saved
    return corpus, model_prefix, ref_out


@pytest.fixture(scope="module")
def our_run(ref_run, tmp_path_factory):
    """Migrate the reference checkpoint, decode the same set with ours."""
    corpus, model_prefix, _ = ref_run
    root = tmp_path_factory.mktemp("ourpipe")
    out_prefix = str(root / "mtn")
    our_out = str(root / "our_result.json")
    from mtn_tpu.cli.generate import main as generate_main
    from mtn_tpu.utils.migrate import migrate_checkpoint

    best = os.path.realpath(model_prefix + "_best.pth.tar")
    migrate_checkpoint(best, model_prefix + ".conf", out_prefix, epoch=1)
    rc = generate_main([
        "--test-path", corpus.fea_path, "--test-set", corpus.lbl_test_set,
        "--model", out_prefix + "_1", "--maxlen", "12",
        "--beam", "5", "--penalty", "1.0", "--nbest", "5",
        "--output", our_out, "--decode-style", "beam_search",
        "--undisclosed-only", "0", "--turn-batch", "4",
        "--dtype", "float32",
    ])
    assert rc == 0
    return our_out


def _answers(result_path: str):
    with open(result_path) as f:
        result = json.load(f)
    return [(d["image_id"], t, qa["answer"])
            for d in result["dialogs"]
            for t, qa in enumerate(d["dialog"])]


def test_beam_outputs_match_reference_token_for_token(ref_run, our_run):
    corpus, _, ref_out = ref_run
    with open(corpus.lbl_test_set) as f:
        n_turns = sum(len(d["dialog"]) for d in json.load(f)["dialogs"])
    ref_answers = _answers(ref_out)
    our_answers = _answers(our_run)
    assert len(ref_answers) == len(our_answers) == n_turns >= 9
    for (rvid, rt, rans), (ovid, ot, oans) in zip(ref_answers, our_answers):
        assert (ovid, ot) == (rvid, rt)
        assert oans == rans, (
            f"hypothesis mismatch at {rvid} turn {rt}: "
            f"ref={rans!r} ours={oans!r}")


def test_stage4_scores_match_reference(ref_run, our_run):
    corpus, _, ref_out = ref_run
    from mtn_tpu.evalmetrics.convert import (build_annotation,
                                             build_hypotheses)
    from mtn_tpu.evalmetrics.scorer import score_pairs
    from mtn_tpu.evalmetrics.convert import coco_to_corpora

    with open(corpus.lbl_test_set) as f:
        lbl = json.load(f)
    annotation = build_annotation(lbl)
    scores = {}
    for name, path in (("ref", ref_out), ("ours", our_run)):
        with open(path) as f:
            result = json.load(f)
        refs, hyps = coco_to_corpora(annotation, build_hypotheses(result))
        scores[name] = score_pairs(refs, hyps)
    assert scores["ours"] == pytest.approx(scores["ref"], abs=1e-12)
