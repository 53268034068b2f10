"""Evaluation metrics: hand-computed oracles + property checks."""

import json
import math

import numpy as np
import pytest

from mtn_tpu.evalmetrics.bleu import corpus_bleu
from mtn_tpu.evalmetrics.cider import cider
from mtn_tpu.evalmetrics.convert import (StopwordFilter, build_annotation,
                                         build_hypotheses, coco_to_corpora)
from mtn_tpu.evalmetrics.meteor import meteor
from mtn_tpu.evalmetrics.rouge import rouge_l
from mtn_tpu.evalmetrics.scorer import score_pairs
from mtn_tpu.evalmetrics.stem import porter_stem
from mtn_tpu.evalmetrics.tokenizer import tokenize


def test_tokenizer_ptb_style():
    assert tokenize("Don't stop.") == ["do", "n't", "stop"]
    assert tokenize("the man's hat , here !") == ["the", "man", "'s", "hat",
                                                  "here"]
    assert tokenize("is there any audio ?") == ["is", "there", "any",
                                                "audio"]


def test_porter_stem():
    assert porter_stem("running") == "run"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("cat") == "cat"


def test_bleu_hand_computed():
    refs = {1: ["the cat sat down"]}
    hyps = {1: ["the cat sat"]}
    bleus = corpus_bleu(refs, hyps)
    bp = math.exp(1 - 4 / 3)
    assert bleus[0] == pytest.approx(bp * 1.0, rel=1e-6)
    assert bleus[1] == pytest.approx(bp * 1.0, rel=1e-6)
    assert bleus[2] == pytest.approx(bp * 1.0, rel=1e-6)


def test_bleu_clipping():
    refs = {1: ["the cat"]}
    hyps = {1: ["the the the the"]}
    bleus = corpus_bleu(refs, hyps)
    # unigram correct clipped at 1; testlen 4 > reflen 2, no BP
    assert bleus[0] == pytest.approx(1 / 4, rel=1e-5)


def test_perfect_match_scores():
    refs = {i: [s] for i, s in enumerate(
        ["a man sits on a couch", "a dog runs in the park",
         "two people are talking", "the cat sleeps on the table"])}
    hyps = {i: [s[0]] for i, s in refs.items()}
    scores = score_pairs(refs, hyps)
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L"):
        assert scores[k] == pytest.approx(1.0, abs=1e-6), k
    assert scores["CIDEr"] == pytest.approx(10.0, abs=1e-6)
    assert scores["METEOR"] > 0.9


def test_disjoint_scores_zero():
    refs = {1: ["aa bb cc"], 2: ["dd ee ff"]}
    hyps = {1: ["xx yy"], 2: ["zz ww"]}
    s = score_pairs(refs, hyps)
    assert s["Bleu_4"] < 1e-6 and s["ROUGE_L"] == 0.0
    assert s["CIDEr"] == 0.0 and s["METEOR"] == 0.0


def test_rouge_hand_computed():
    refs = {1: ["a b c d"]}
    hyps = {1: ["a c d"]}
    # lcs=3, P=1, R=3/4; F = (1+b^2) P R / (R + b^2 P)
    b2 = 1.2 ** 2
    want = (1 + b2) * 1.0 * 0.75 / (0.75 + b2 * 1.0)
    assert rouge_l(refs, hyps) == pytest.approx(want, rel=1e-6)


def test_cider_length_penalty_and_partial():
    refs = {i: [s] for i, s in enumerate(
        ["a man walks", "a dog barks", "the bird flies", "a cat meows"])}
    hyps = dict(refs)
    hyps = {k: [v[0]] for k, v in refs.items()}
    hyps[0] = ["a man walks quickly away from home"]  # longer: penalized
    scores = cider(refs, hyps)
    assert 0 < scores < 10.0


def test_meteor_stem_matching_helps():
    refs = {1: ["the man is running fast"]}
    h_exact = {1: ["the man is running fast"]}
    h_stem = {1: ["the man is runs fast"]}
    h_miss = {1: ["a dog barked loudly yesterday"]}
    assert meteor(refs, h_exact) > meteor(refs, h_stem) > meteor(refs, h_miss)


def test_stopword_filter(tmp_path):
    sw = tmp_path / "stopwords.txt"
    sw.write_text("uh\num+ um\n")
    f = StopwordFilter(str(sw))
    assert f("uh the ummm answer") == "the um answer"
    assert f("uh uh") == ""


def test_converters_match_reference_format(tiny_corpus):
    with open(tiny_corpus.lbl_test_set) as fp:
        data = json.load(fp)
    ann = build_annotation(data)
    n_turns = sum(len(d["dialog"]) for d in data["dialogs"])
    assert ann["type"] == "captions"
    assert len(ann["annotations"]) == len(ann["images"]) == n_turns
    assert ann["annotations"][0]["image_id"] == 1
    assert ann["annotations"][0]["id"] == 1
    assert ann["images"][0]["name"].endswith("_0")
    hyp = build_hypotheses(data)
    assert len(hyp) == n_turns
    assert set(hyp[0].keys()) == {"image_id", "caption"}
    refs, hyps = coco_to_corpora(ann, hyp)
    assert len(refs) == n_turns
    s = score_pairs(refs, hyps)  # hyp == ref here
    assert s["Bleu_4"] == pytest.approx(1.0, abs=1e-6)
