#!/usr/bin/env python
"""Generate a DSTC7-AVSD-scale synthetic dataset under data/.

Same file names/schema as the real download (run.sh:58-69), with a
zipfian ~8k-word vocabulary, 5-turn dialogs, and I3D/VGGish-shaped .npy
features — so the full run.sh pipeline can be exercised at production
scale without the (non-redistributable) real data.
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def make_vocab(rng, n_words=8000):
    syll = ["ba", "do", "ki", "lu", "mo", "na", "pe", "ri", "sa", "tu",
            "ve", "wa", "zo", "el", "in", "or", "us", "ka", "my", "th"]
    words, seen = [], set()
    while len(words) < n_words:
        w = "".join(rng.choice(syll, size=int(rng.integers(2, 5))))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def sentence(rng, words, zipf_a=1.3, lo=4, hi=15):
    n = int(rng.integers(lo, hi))
    idx = np.minimum(rng.zipf(zipf_a, size=n) - 1, len(words) - 1)
    return " ".join(words[i] for i in idx)


def make_split(rng, words, n_dialogs, n_turns, undisclosed=False,
               vid_prefix="VID"):
    dialogs = []
    for d in range(n_dialogs):
        turns = []
        for t in range(n_turns):
            ans = "__UNDISCLOSED__" if (undisclosed and t == n_turns - 1) \
                else sentence(rng, words)
            turns.append({"question": sentence(rng, words), "answer": ans})
        dialogs.append({
            "image_id": f"{vid_prefix}{d:05d}",
            "caption": sentence(rng, words, lo=8, hi=20),
            "summary": sentence(rng, words, lo=8, hi=20),
            "dialog": turns,
        })
    return {"type": "synth", "version": "1.0", "dialogs": dialogs}


def write_features(rng, root, dialogs_list, ftype, dim, frames_lo,
                   frames_hi, testset=False):
    suffix = "_testset" if testset else ""
    out = root / f"{ftype}{suffix}"
    out.mkdir(parents=True, exist_ok=True)
    vids = sorted({d["image_id"] for data in dialogs_list
                   for d in data["dialogs"]})
    for vid in vids:
        T = int(rng.integers(frames_lo, frames_hi))
        arr = rng.standard_normal((T, dim)).astype(np.float32)
        np.save(out / f"{vid}.npy", arr)
    return len(vids)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data")
    ap.add_argument("--train-dialogs", type=int, default=2000)
    ap.add_argument("--valid-dialogs", type=int, default=200)
    ap.add_argument("--test-dialogs", type=int, default=1710)
    ap.add_argument("--turns", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    root = Path(args.root)
    root.mkdir(exist_ok=True)
    words = make_vocab(rng)

    train = make_split(rng, words, args.train_dialogs, args.turns,
                       vid_prefix="TRN")
    valid = make_split(rng, words, args.valid_dialogs, args.turns,
                       vid_prefix="VAL")
    lbl_test = make_split(rng, words, args.test_dialogs, 3,
                          vid_prefix="TST")
    test = json.loads(json.dumps(lbl_test))
    for d in test["dialogs"]:
        d["dialog"][-1]["answer"] = "__UNDISCLOSED__"
    lbl_undisc = json.loads(json.dumps(lbl_test))
    for d in lbl_undisc["dialogs"]:
        d["dialog"] = d["dialog"][-1:]

    (root / "train_set4DSTC7-AVSD.json").write_text(json.dumps(train))
    (root / "valid_set4DSTC7-AVSD.json").write_text(json.dumps(valid))
    (root / "test_set4DSTC7-AVSD.json").write_text(json.dumps(test))
    (root / "lbl_test_set4DSTC7-AVSD.json").write_text(json.dumps(lbl_test))
    (root / "lbl_undisclosedonly_test_set4DSTC7-AVSD.json").write_text(
        json.dumps(lbl_undisc))
    (root / "stopwords.txt").write_text("uh\num+ um\n")

    n1 = write_features(rng, root, [train, valid], "i3d_rgb", 2048, 40, 80)
    n2 = write_features(rng, root, [train, valid], "vggish", 128, 20, 40)
    # stage 3 reads <FeaType>_testset dirs (run.sh:149)
    n3 = write_features(rng, root, [test], "i3d_rgb", 2048, 40, 80,
                        testset=True)
    n4 = write_features(rng, root, [test], "vggish", 128, 20, 40,
                        testset=True)
    print(f"wrote {args.train_dialogs}+{args.valid_dialogs} train/valid "
          f"dialogs, {args.test_dialogs} test dialogs, features: "
          f"{n1}/{n2} train+valid, {n3}/{n4} test videos")


if __name__ == "__main__":
    main()
