"""Property-fuzz of the data laws against the reference's OWN functions.

The fixed tiny fixtures prove the laws on one distribution; this module
imports ``/root/reference/data_handler.py`` directly (torch ``.cuda()``
stubbed) and compares, over hundreds of randomized corpora / seeds /
flag combinations (VERDICT r3 next #3):

- ``get_vocabulary`` (incl. the reference's effective-cutoff-5 loop,
  data_handler.py:67-73),
- ``load`` (history/caption/merge_source/undisclosed laws,
  data_handler.py:89-148),
- ``make_batch_indices`` (sort keys + the long-history bsize shrink,
  data_handler.py:150-206),
- ``make_batch`` + ``data_utils.Batch`` (padded tensors, text masks,
  target mask, ntokens, feature tensors/masks, data_handler.py:219-274).

Known, documented deviations are excluded by construction:
- features are random floats, so the reference's all-ones sentinel mask
  (data_utils.py:29) coincides with our explicit-length mask
  (docs/PARITY.md C7) — the fuzz would (correctly) diverge on a real
  frame of exact ones;
- ``cut_a`` draws from different RNG streams (parity is statistical,
  batching.py docstring) — fuzzed with ``cut_a=False``;
- 3-D (T,R,D) features: the reference's path is broken end-to-end
  (docs/PARITY.md C5), nothing to fuzz against.
"""

from __future__ import annotations

import json
import os
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.slow

WORDS = ("a the is are was be been man woman dog cat couch book table "
         "room video audio sound people walk walks sit sits read reads "
         "open opens close closes yes no maybe one two three red blue "
         "door window light dark noise music").split()


@pytest.fixture(scope="module")
def ref_mods():
    """The reference data_handler + data_utils, import-stubbed for CPU."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    if "torchtext" not in sys.modules:  # vestigial import (data_utils.py:8)
        tt = types.ModuleType("torchtext")
        tt.data = types.SimpleNamespace(Iterator=object, batch=None)
        tt.datasets = types.SimpleNamespace()
        sys.modules["torchtext"] = tt
    saved_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        import data_handler as ref_dh
        import data_utils as ref_du
    finally:
        sys.path.remove(REF)
    yield ref_dh, ref_du
    torch.Tensor.cuda = saved_cuda


def _random_corpus(rng, root: Path, undisclosed: bool):
    """A randomized DSTC7-format corpus: Zipf-ish word frequencies (so
    the cutoff boundary is populated), empty sentences allowed, variable
    turn counts, small .npy feature files."""
    # Zipf-ish: low-rank words appear often, tail words hit cutoff 5
    probs = 1.0 / np.arange(1, len(WORDS) + 1)
    probs /= probs.sum()

    def sentence(lo=0, hi=9):
        n = int(rng.integers(lo, hi))
        return " ".join(rng.choice(WORDS, size=n, p=probs))

    n_dialogs = int(rng.integers(2, 7))
    dialogs = []
    for d in range(n_dialogs):
        n_turns = int(rng.integers(1, 5))
        turns = []
        for t in range(n_turns):
            answer = ("__UNDISCLOSED__"
                      if undisclosed and t == n_turns - 1
                      else sentence())
            turns.append({"question": sentence(), "answer": answer})
        dialogs.append({
            "image_id": f"V{d:03d}",
            "caption": sentence(1, 14),
            "summary": sentence(1, 14),
            "dialog": turns,
        })
    path = root / "set.json"
    path.write_text(json.dumps({"dialogs": dialogs}))
    fea_types = ["ftA", "ftB"]
    ft_dims = [int(rng.integers(3, 9)), int(rng.integers(3, 9))]
    for ftype, dim in zip(fea_types, ft_dims):
        os.makedirs(root / ftype, exist_ok=True)
        for d in range(n_dialogs):
            T = int(rng.integers(1, 13))
            np.save(root / ftype / f"V{d:03d}.npy",
                    rng.standard_normal((T, dim)).astype(np.float32))
    return str(path), str(root / "<FeaType>" / "<ImageID>.npy"), fea_types


def _flag_combos(rng, undisclosed: bool):
    """A handful of random flag combinations for one corpus."""
    combos = []
    for _ in range(3):
        include_caption = str(rng.choice(
            ["none", "caption", "summary", "caption,summary"]))
        combos.append(dict(
            include_caption=include_caption,
            separate_caption=(include_caption != "none"
                              and bool(rng.integers(0, 2))),
            max_history_length=int(rng.choice([-1, 0, 1, 2])),
            merge_source=bool(rng.integers(0, 2)),
            undisclosed_only=undisclosed,
            batchsize=int(rng.integers(1, 7)),
            max_length=int(rng.choice([8, 16, 64])),
            skip=[int(rng.integers(1, 4)), int(rng.integers(1, 4))],
            use_features=bool(rng.integers(0, 5)),  # mostly with features
        ))
    return combos


def _assert_same_load(ours, ref):
    assert len(ours.turns) == len(ref["dialogs"])
    for turn, item in zip(ours.turns, ref["dialogs"]):
        # [vid, qa_id, history, question, answer_in, answer_out, (cap)]
        assert turn.vid == item[0] and turn.qa_id == item[1]
        np.testing.assert_array_equal(turn.history, item[2])
        np.testing.assert_array_equal(turn.question, item[3])
        np.testing.assert_array_equal(turn.answer_in, item[4])
        np.testing.assert_array_equal(turn.answer_out, item[5])
        if turn.caption is not None and len(item) > 6:
            np.testing.assert_array_equal(turn.caption, item[6])


def _assert_same_plans(plans, ref_indices, separate_caption):
    assert len(plans) == len(ref_indices)
    for p, r in zip(plans, ref_indices):
        assert p.vids == r[0] and p.qa_ids == r[1]
        assert p.x_len == list(r[2])
        if separate_caption:
            assert (p.h_len, p.q_len, p.a_len, p.c_len, p.n_seqs) == r[3:]
        else:
            assert (p.h_len, p.q_len, p.a_len, p.n_seqs) == r[3:]


def _assert_same_batch(db, masks, tgt_mask, ref_batch, use_features):
    t = lambda x: np.asarray(x.cpu() if hasattr(x, "cpu") else x)
    np.testing.assert_array_equal(np.asarray(db.query), t(ref_batch.query))
    np.testing.assert_array_equal(np.asarray(db.his), t(ref_batch.his))
    np.testing.assert_array_equal(np.asarray(db.answer_in), t(ref_batch.trg))
    np.testing.assert_array_equal(np.asarray(db.answer_out),
                                  t(ref_batch.trg_y))
    if ref_batch.cap is not None:
        np.testing.assert_array_equal(np.asarray(db.cap), t(ref_batch.cap))
    np.testing.assert_array_equal(np.asarray(masks.query),
                                  t(ref_batch.query_mask).astype(bool))
    np.testing.assert_array_equal(np.asarray(masks.his),
                                  t(ref_batch.his_mask).astype(bool))
    if ref_batch.cap_mask is not None:
        np.testing.assert_array_equal(np.asarray(masks.cap),
                                      t(ref_batch.cap_mask).astype(bool))
    np.testing.assert_array_equal(np.asarray(tgt_mask),
                                  t(ref_batch.trg_mask).astype(bool))
    # loss normalizer: real target tokens
    ours_ntokens = int((np.asarray(db.answer_out) != 1).sum())
    assert ours_ntokens == int(t(ref_batch.ntokens))
    if use_features:
        for i, ft in enumerate(ref_batch.fts):
            np.testing.assert_array_equal(np.asarray(db.fts[i]), t(ft))
            np.testing.assert_array_equal(
                np.asarray(masks.vid[i]),
                t(ref_batch.fts_mask[i]).astype(bool))


@pytest.mark.parametrize("seed", range(40))
def test_data_laws_match_reference(ref_mods, tmp_path, seed):
    """~240 randomized (corpus × flags) cases: vocabulary, load,
    batch planning, batch materialization and masks all equal the
    reference's own outputs."""
    ref_dh, _ = ref_mods
    from mtn_tpu.data import load, make_batch_indices
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.data.vocab import get_vocabulary
    from mtn_tpu.train.batch import batch_masks, device_batch

    rng = np.random.default_rng(1000 + seed)
    undisclosed = bool(seed % 4 == 3)
    set_path, fea_path, fea_types = _random_corpus(rng, tmp_path, undisclosed)

    for combo in _flag_combos(rng, undisclosed):
        ic = combo["include_caption"]
        # vocabulary: the reference's cutoff loop makes 5 the effective
        # cutoff regardless of the argument (data_handler.py:67-73)
        ref_vocab = ref_dh.get_vocabulary(set_path, cutoff=int(
            rng.integers(0, 9)), include_caption=ic)
        vocab = get_vocabulary(set_path, cutoff=5, include_caption=ic)
        assert vocab == ref_vocab

        ftypes = fea_types if combo["use_features"] else None
        kw = dict(include_caption=ic,
                  separate_caption=combo["separate_caption"],
                  max_history_length=combo["max_history_length"],
                  merge_source=combo["merge_source"],
                  undisclosed_only=combo["undisclosed_only"])
        ref_data = ref_dh.load(ftypes, fea_path, set_path, ref_vocab, **kw)
        ours = load(ftypes, fea_path, set_path, vocab, **kw)
        _assert_same_load(ours, ref_data)

        ref_idx, ref_n = ref_dh.make_batch_indices(
            ref_data, combo["batchsize"], combo["max_length"],
            separate_caption=combo["separate_caption"])
        plans, n = make_batch_indices(
            ours, combo["batchsize"], combo["max_length"],
            separate_caption=combo["separate_caption"])
        assert n == ref_n
        _assert_same_plans(plans, ref_idx, combo["separate_caption"])

        skip = combo["skip"]
        for plan, r_idx in zip(plans, ref_idx):
            try:
                ref_batch = ref_dh.make_batch(
                    ref_data, r_idx, ref_vocab,
                    separate_caption=combo["separate_caption"],
                    skip=skip, cut_a=False)
            except RuntimeError as e:
                # the reference's own Batch crashes when a stream's
                # post-skip frame count is exactly 1: its
                # fts_mask.squeeze() (data_utils.py:28-30) collapses the
                # T'==1 dim, so expand_as fails ("The expanded size of
                # the tensor..."). Like the broken 3-D path, this is a
                # reference defect with no output to compare against —
                # assert OUR side still materializes the batch, and
                # move on (PARITY.md C7).
                assert "expanded size" in str(e), e
                hb = make_batch(ours, plan,
                                separate_caption=combo["separate_caption"],
                                skip=skip, cut_a=False)
                assert any(f.shape[1] == 1 for f in hb.fts)
                continue
            hb = make_batch(ours, plan,
                            separate_caption=combo["separate_caption"],
                            skip=skip, cut_a=False)
            db = device_batch(hb)
            masks, tgt_mask = batch_masks(db, vocab["<blank>"])
            _assert_same_batch(db, masks, tgt_mask, ref_batch,
                               combo["use_features"])
