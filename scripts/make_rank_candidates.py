"""Build a candidates file for the discriminative rank CLI.

The reference's visdial branch ranks 100 answer options per turn
(reference readme.md:81-86); DSTC7-AVSD ships no option sets, so this
script constructs them the standard retrieval-eval way: each scored
turn's option list is its ground-truth answer plus ``--num-options - 1``
distractor answers drawn (seeded, without replacement) from the other
turns' answers in the same labeled set, shuffled, with ``gt_index``
recording where the ground truth landed.

Usage (undisclosed protocol, matching run.sh stage 3/4)::

    python scripts/make_rank_candidates.py \
        data/lbl_undiscloseonly_test_set4DSTC7-AVSD.json \
        candidates.json --last --num-options 100 --seed 1
    python -m mtn_tpu.cli.rank --test-path data --test-set <test set> \
        --model exps/.../mtn_best --candidates candidates.json \
        --undisclosed-only 1 --output ranks.json
"""

from __future__ import annotations

import argparse
import json
import random


def build_candidates(data: dict, num_options: int, seed: int,
                     last_only: bool) -> dict:
    turns = []  # (dialog idx, scored-turn idx, answer)
    for di, dlg in enumerate(data["dialogs"]):
        scored = dlg["dialog"][-1:] if last_only else dlg["dialog"]
        for ti, qa in enumerate(scored):
            turns.append((di, ti, qa["answer"]))
    # distractor pool: every answer in the file (not just scored turns) —
    # larger and no less fair, since non-final answers are real answers too
    pool = sorted({qa["answer"] for dlg in data["dialogs"]
                   for qa in dlg["dialog"]})
    if len(pool) < 2:
        raise SystemExit("need at least 2 distinct answers to build "
                         "distractors")
    rng = random.Random(seed)
    out = []
    by_dialog: dict = {}
    for di, ti, answer in turns:
        n_distract = min(num_options - 1, len(pool) - 1)
        distractors = []
        # rejection-sample without replacement, excluding the gt string
        seen = {answer}
        while len(distractors) < n_distract:
            cand = pool[rng.randrange(len(pool))]
            if cand not in seen:
                seen.add(cand)
                distractors.append(cand)
        options = distractors + [answer]
        rng.shuffle(options)
        by_dialog.setdefault(di, []).append(
            {"answer_options": options, "gt_index": options.index(answer)})
    for di, dlg in enumerate(data["dialogs"]):
        out.append({"image_id": dlg["image_id"],
                    "dialog": by_dialog.get(di, [])})
    return {"dialogs": out}


def main(argv=None):
    p = argparse.ArgumentParser(
        description="labeled dialog JSON -> rank-CLI candidates JSON")
    p.add_argument("labeled_set", help="dialog JSON with real answers "
                                       "(e.g. lbl_*_test_set4DSTC7-AVSD.json)")
    p.add_argument("output")
    p.add_argument("--num-options", default=100, type=int)
    p.add_argument("--seed", default=1, type=int)
    p.add_argument("--last", "-l", action="store_true",
                   help="score the final turn only (undisclosed protocol)")
    args = p.parse_args(argv)
    with open(args.labeled_set) as f:
        data = json.load(f)
    out = build_candidates(data, args.num_options, args.seed, args.last)
    with open(args.output, "w") as f:
        json.dump(out, f, indent=4)
    n = sum(len(d["dialog"]) for d in out["dialogs"])
    print(f"wrote {n} turns x <= {args.num_options} options to "
          f"{args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
