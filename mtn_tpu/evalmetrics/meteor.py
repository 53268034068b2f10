"""METEOR (pure-Python approximation).

The reference scores METEOR via the Java METEOR-1.5 jar inside
coco-caption (SURVEY.md C14, invoked ``-l en -norm``); this image has no
Java and no network, so METEOR is reimplemented with the exact +
Porter-stem matcher stages (no WordNet synonym or paraphrase tables —
those require external resources). Two documented deltas vs the jar
(docs/PARITY.md C14, quantified where measurable in
tests/test_metric_goldens.py): (a) the missing syn/par stages can only
remove matches, so the *match count* approximates the jar's from below;
(b) the scoring constants here are the classic Banerjee & Lavie 2005
parameters below, not METEOR 1.5's language-tuned ones — a formula-level
difference that cannot be bounded without running the jar.

Formula (classic METEOR, Banerjee & Lavie 2005, with exact/stem matcher
weights 1.0/0.6):
  P = m_w/|hyp|, R = m_w/|ref|,
  Fmean = P·R / (alpha·P + (1-alpha)·R)   with alpha=0.9 (= 10PR/(R+9P)),
  Penalty = gamma · (chunks / m)^beta      with gamma=0.5, beta=3,
  score = Fmean · (1 - Penalty),
aggregated over the corpus by summing the sufficient statistics.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from mtn_tpu.evalmetrics.stem import porter_stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5
W_EXACT, W_STEM = 1.0, 0.6


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, float]]:
    """Greedy stage-wise alignment: exact matches first, then stems.
    Returns (hyp_idx, ref_idx, weight) pairs."""
    matches: List[Tuple[int, int, float]] = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    for keyfn, w in ((lambda t: t, W_EXACT), (porter_stem, W_STEM)):
        ref_keys = [keyfn(t) for t in ref]
        for i, ht in enumerate(hyp):
            if used_h[i]:
                continue
            hk = keyfn(ht)
            for j, rk in enumerate(ref_keys):
                if not used_r[j] and hk == rk:
                    matches.append((i, j, w))
                    used_h[i] = used_r[j] = True
                    break
    return sorted(matches)


def _chunks(matches: List[Tuple[int, int, float]]) -> int:
    if not matches:
        return 0
    ch = 1
    for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            ch += 1
    return ch


def _stats(hyp: List[str], ref: List[str]):
    m = _align(hyp, ref)
    mw = sum(w for _, _, w in m)
    return {"mw": mw, "m": len(m), "chunks": _chunks(m),
            "hlen": len(hyp), "rlen": len(ref)}


def _score_from(st) -> float:
    if st["mw"] == 0 or st["hlen"] == 0 or st["rlen"] == 0:
        return 0.0
    p = st["mw"] / st["hlen"]
    r = st["mw"] / st["rlen"]
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    frag = st["chunks"] / st["m"] if st["m"] else 0.0
    return fmean * (1.0 - GAMMA * frag ** BETA)


def meteor(refs: Dict[str, List[str]], hyps: Dict[str, List[str]]) -> float:
    """Corpus METEOR: best-ref segment stats aggregated, then the formula."""
    agg = {"mw": 0.0, "m": 0, "chunks": 0, "hlen": 0, "rlen": 0}
    for img_id, hyp_list in hyps.items():
        hyp = hyp_list[0].split()
        best, best_score = None, -1.0
        for ref_s in refs[img_id]:
            st = _stats(hyp, ref_s.split())
            sc = _score_from(st)
            if sc > best_score:
                best, best_score = st, sc
        if best is not None:
            for k in agg:
                agg[k] += best[k]
    return _score_from(agg)
