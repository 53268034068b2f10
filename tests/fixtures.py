"""Synthetic DSTC7-AVSD-format fixtures (tiny, deterministic)."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

WORDS = ("a man sits on couch reading book he closes the it and puts "
         "table is video person are there any people in what doing now "
         "yes no maybe dog cat walks room door opens").split()


def _sentence(rng, lo=3, hi=9, words=WORDS):
    n = int(rng.integers(lo, hi))
    return " ".join(rng.choice(words, size=n))


def make_dialog_json(rng, n_dialogs=6, n_turns=3, undisclosed=False,
                     words=WORDS, id_prefix="VID"):
    dialogs = []
    for d in range(n_dialogs):
        turns = []
        for t in range(n_turns):
            answer = "__UNDISCLOSED__" if (undisclosed and t == n_turns - 1) \
                else _sentence(rng, words=words)
            turns.append({"question": _sentence(rng, words=words),
                          "answer": answer})
        dialogs.append({
            "image_id": f"{id_prefix}{d:03d}",
            "caption": _sentence(rng, 5, 12, words),
            "summary": _sentence(rng, 5, 12, words),
            "dialog": turns,
        })
    return {"type": "test", "version": "0.1", "dialogs": dialogs}


@dataclass
class TinyCorpus:
    root: Path
    train_set: str
    valid_set: str
    test_set: str
    lbl_test_set: str
    fea_path: str            # template with <FeaType>/<ImageID>
    fea_types: list
    ft_dims: list


def write_tiny_corpus(root: Path, n_dialogs=6, n_turns=3,
                      fea_types=("i3d_rgb", "vggish"),
                      ft_dims=(32, 16), seed=0,
                      frames=(4, 12), words=WORDS,
                      n_test_dialogs=3) -> TinyCorpus:
    rng = np.random.default_rng(seed)
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    train = make_dialog_json(rng, n_dialogs, n_turns, words=words)
    valid = make_dialog_json(rng, max(2, n_dialogs // 2), n_turns,
                             words=words)
    lbl_test = make_dialog_json(rng, n_test_dialogs, n_turns, words=words)
    # undisclosed variant of the same test dialogs
    test = json.loads(json.dumps(lbl_test))
    for d in test["dialogs"]:
        d["dialog"][-1]["answer"] = "__UNDISCLOSED__"
    paths = {}
    for name, data in [("train", train), ("valid", valid),
                       ("test", test), ("lbl_test", lbl_test)]:
        p = root / f"{name}_set.json"
        p.write_text(json.dumps(data))
        paths[name] = str(p)
    vids = sorted({d["image_id"] for data in (train, valid, test)
                   for d in data["dialogs"]})
    for ftype, dim in zip(fea_types, ft_dims):
        os.makedirs(root / ftype, exist_ok=True)
        for vid in vids:
            n_frames = int(rng.integers(*frames))
            arr = rng.standard_normal((n_frames, dim)).astype(np.float32)
            np.save(root / ftype / f"{vid}.npy", arr)
    return TinyCorpus(
        root=root, train_set=paths["train"], valid_set=paths["valid"],
        test_set=paths["test"], lbl_test_set=paths["lbl_test"],
        fea_path=str(root / "<FeaType>" / "<ImageID>.npy"),
        fea_types=list(fea_types), ft_dims=list(ft_dims),
    )


def tiny_model_cfg(vocab_size, ft_dims, **kw):
    from mtn_tpu.config import ModelConfig
    defaults = dict(vocab_size=vocab_size, nb_blocks=2, d_model=16, d_ff=32,
                    att_h=2, dropout=0.1, ft_sizes=list(ft_dims),
                    diff_encoder=True, auto_encoder_ft="query", max_len=512)
    defaults.update(kw)
    return ModelConfig(**defaults)
