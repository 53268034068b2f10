"""Cross-check our METEOR against the actual METEOR-1.5 jar.

This image has no Java and no network, so the in-repo METEOR
(mtn_tpu/evalmetrics/meteor.py) is a reimplementation of the jar's
``-l en -norm`` configuration with two documented resource-bound gaps:
the WordNet-synonym/paraphrase matcher stages and the jar's
frequency-derived function-word list (docs/PARITY.md C14). The day a
user has the jar (the real-data scenario: coco-caption checkout + Java,
the same prerequisites scripts/check_dstc7_data.py targets), this
script turns the documented gap into a MEASURED bound:

    python scripts/check_meteor_vs_jar.py --jar path/to/meteor-1.5.jar \
        refs.txt hyps.txt                 # one segment per line, aligned
    python scripts/check_meteor_vs_jar.py --jar ... --coco eval.json
        # or a stage-4 (_ref.json, _hyp.json) pair via --ref/--hyp

It runs both scorers on the same segments and reports per-segment and
corpus drift, plus a second jar run with the synonym module disabled
(``-m 'exact stem'``) so the drift decomposes into (a) resource-stage
drift and (b) residual law drift — (b) is the number that should be ~0
if our aligner/formula match the jar.

Jar protocol: the pycocoevalcap stdio mode (Meteor-1.5 README):
each ``SCORE ||| ref1 ||| ... ||| hyp`` line returns a stats line, and
``EVAL ||| stats`` returns the segment score; the jar aggregates the
final corpus score after EOF of the score stream.

Prints one JSON line:
{"segments", "corpus_ours", "corpus_jar", "corpus_jar_no_syn",
 "drift_corpus", "drift_no_syn", "seg_drift_mean", "seg_drift_max"}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_pairs(args):
    """-> refs {id: [str, ...]}, hyps {id: [str]}"""
    if args.coco:
        with open(args.coco) as f:
            data = json.load(f)
        refs = {k: list(v) for k, v in data["refs"].items()}
        hyps = {k: [v[0] if isinstance(v, list) else v]
                for k, v in data["hyps"].items()}
        return refs, hyps
    if args.ref and args.hyp:
        from mtn_tpu.evalmetrics.convert import coco_to_corpora
        with open(args.ref) as f:
            ann = json.load(f)
        with open(args.hyp) as f:
            hyp = json.load(f)
        return coco_to_corpora(ann, hyp)
    ref_lines = open(args.files[0]).read().splitlines()
    hyp_lines = open(args.files[1]).read().splitlines()
    if len(ref_lines) != len(hyp_lines):
        raise SystemExit(f"line counts differ: {len(ref_lines)} refs vs "
                         f"{len(hyp_lines)} hyps")
    refs = {i: [r] for i, r in enumerate(ref_lines)}
    hyps = {i: [h] for i, h in enumerate(hyp_lines)}
    return refs, hyps


def run_jar(jar: str, refs, hyps, modules: str = None):
    """Score every segment through the jar's stdio protocol; returns
    (per-segment scores {id: float}, corpus score)."""
    cmd = ["java", "-jar", "-Xmx2G", jar, "-", "-", "-stdio", "-l", "en",
           "-norm"]
    if modules:
        cmd += ["-m", modules]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, text=True)
    ids = sorted(hyps)
    stats = []
    for k in ids:
        line = "SCORE ||| " + " ||| ".join(
            r.replace("|||", " ") for r in refs[k]) \
            + " ||| " + hyps[k][0].replace("|||", " ")
        proc.stdin.write(line + "\n")
        proc.stdin.flush()
        stats.append(proc.stdout.readline().strip())
    seg = {}
    for k, st in zip(ids, stats):
        proc.stdin.write("EVAL ||| " + st + "\n")
        proc.stdin.flush()
        seg[k] = float(proc.stdout.readline().strip())
    # corpus score: aggregate sufficient statistics ourselves the jar's
    # way (space-separated stats sum columnwise, then one EVAL)
    cols = [list(map(float, st.split())) for st in stats]
    agg = [sum(c) for c in zip(*cols)]
    proc.stdin.write("EVAL ||| " + " ".join(
        repr(x) if x != int(x) else str(int(x)) for x in agg) + "\n")
    proc.stdin.flush()
    corpus = float(proc.stdout.readline().strip())
    proc.stdin.close()
    proc.wait(timeout=60)
    return seg, corpus


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--jar", required=True, help="path to meteor-1.5.jar")
    ap.add_argument("--coco", help="json with {'refs':…, 'hyps':…}")
    ap.add_argument("--ref", help="stage-4 _ref.json (coco annotation)")
    ap.add_argument("--hyp", help="stage-4 _hyp.json (coco results)")
    ap.add_argument("files", nargs="*",
                    help="refs.txt hyps.txt (one segment per line)")
    args = ap.parse_args()
    if not os.path.exists(args.jar):
        raise SystemExit(f"jar not found: {args.jar}")

    from mtn_tpu.evalmetrics.meteor import _score_15, _stats, meteor, normalize

    refs, hyps = read_pairs(args)
    ours_corpus = meteor(refs, hyps)
    ours_seg = {}
    for k, h in hyps.items():
        best = max((_score_15(_stats(normalize(h[0]).split(),
                                     normalize(r).split()))
                    for r in refs[k]), default=0.0)
        ours_seg[k] = best

    jar_seg, jar_corpus = run_jar(args.jar, refs, hyps)
    _, jar_nosyn = run_jar(args.jar, refs, hyps, modules="exact stem")

    drifts = [abs(ours_seg[k] - jar_seg[k]) for k in hyps]
    print(json.dumps({
        "segments": len(hyps),
        "corpus_ours": round(ours_corpus, 6),
        "corpus_jar": round(jar_corpus, 6),
        "corpus_jar_no_syn": round(jar_nosyn, 6),
        # total gap vs the full jar (includes the resource stages)…
        "drift_corpus": round(abs(ours_corpus - jar_corpus), 6),
        # …and the law-only gap (same matcher stages as ours): ~0 if the
        # aligner/normalizer/formula match
        "drift_no_syn": round(abs(ours_corpus - jar_nosyn), 6),
        "seg_drift_mean": round(sum(drifts) / max(len(drifts), 1), 6),
        "seg_drift_max": round(max(drifts, default=0.0), 6),
    }))


if __name__ == "__main__":
    main()
