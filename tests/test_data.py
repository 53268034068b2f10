"""Data-core tests: vocab, flattening, batch planning, cut_a, padding."""

import json

import numpy as np
import pytest

from mtn_tpu.data import (SPECIALS, build_vocab, get_vocabulary, load,
                          make_batch, make_batch_indices, words2ids)
from mtn_tpu.data.batching import cut_answer
from mtn_tpu.data.vocab import BLANK, EOS, SOS, UNK


def test_specials_fixed_ids():
    assert SPECIALS == {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}


def test_build_vocab_cutoff_semantics():
    freq = {"a": 6, "b": 5, "c": 100}
    v = build_vocab(freq, cutoff=5)
    # freq > 5 survives (reference keeps the cutoff-5 table,
    # data_handler.py:67-73)
    assert "a" in v and "c" in v and "b" not in v
    assert v["a"] == 4 and v["c"] == 5  # first-seen order after specials


def test_words2ids_wraps_and_unks():
    v = dict(SPECIALS, foo=4)
    ids = words2ids("foo bar", v)
    assert ids.tolist() == [v[SOS], 4, v[UNK], v[EOS]]
    assert ids.dtype == np.int32


def test_get_vocabulary_counts_caption_modes(tiny_corpus):
    v_none = get_vocabulary(tiny_corpus.train_set, cutoff=0)
    v_cap = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                           include_caption="caption,summary")
    assert set(v_none) <= set(v_cap)


@pytest.fixture(scope="module")
def tiny_ds(tiny_corpus):
    v = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                       include_caption="caption,summary")
    ds = load(tiny_corpus.fea_types, tiny_corpus.fea_path,
              tiny_corpus.train_set, v, include_caption="caption,summary",
              separate_caption=True)
    return ds


def test_load_flattening(tiny_ds, tiny_corpus):
    raw = json.load(open(tiny_corpus.train_set))
    n_turns = sum(len(d["dialog"]) for d in raw["dialogs"])
    assert len(tiny_ds) == n_turns
    v = tiny_ds.vocab
    t0 = tiny_ds.turns[0]
    # separate caption => history head is a single <blank>
    assert t0.history.tolist() == [v[BLANK]]
    assert t0.caption is not None and len(t0.caption) > 2
    # answer_in keeps <sos>, answer_out keeps <eos>
    assert t0.answer_in[0] == v[SOS] and t0.answer_out[-1] == v[EOS]
    assert np.array_equal(t0.answer_in[1:], t0.answer_out[:-1])
    # second turn history = blank head + q1 + a1
    t1 = tiny_ds.turns[1]
    q1 = tiny_ds.turns[0].question
    expected = 1 + len(q1) + len(t0.answer_in) + 1  # full answer = in + eos
    assert len(t1.history) == expected


def test_load_history_modes(tiny_corpus):
    v = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                       include_caption="caption,summary")
    # caption folded into the history head when not separate
    ds = load(None, "", tiny_corpus.train_set, v,
              include_caption="caption,summary", separate_caption=False)
    assert ds.features is None
    cap_len = len(words2ids(
        json.load(open(tiny_corpus.train_set))["dialogs"][0]["caption"]
        + json.load(open(tiny_corpus.train_set))["dialogs"][0]["summary"], v))
    assert len(ds.turns[0].history) == cap_len
    # max_history_length=1 keeps only the previous turn
    ds1 = load(None, "", tiny_corpus.train_set, v,
               include_caption="caption,summary", separate_caption=True,
               max_history_length=1)
    t2 = ds1.turns[2]  # third turn of dialog 0
    qa1_len = len(ds1.turns[1].question) + len(ds1.turns[1].answer_in) + 1
    assert len(t2.history) == 1 + qa1_len
    # merge_source concatenates caption + history + question
    dsm = load(None, "", tiny_corpus.train_set, v,
               include_caption="caption,summary", separate_caption=True,
               merge_source=True)
    t = dsm.turns[0]
    base = load(None, "", tiny_corpus.train_set, v,
                include_caption="caption,summary",
                separate_caption=True).turns[0]
    assert len(t.question) == len(base.caption) + len(base.history) + \
        len(base.question)


def test_load_undisclosed(tiny_corpus):
    v = get_vocabulary(tiny_corpus.train_set, cutoff=0)
    ds = load(None, "", tiny_corpus.test_set, v, undisclosed_only=True)
    raw = json.load(open(tiny_corpus.test_set))
    assert len(ds) == len(raw["dialogs"])  # one (final) turn per dialog


def test_batch_plan_laws(tiny_ds):
    plans, n = make_batch_indices(tiny_ds, batchsize=4, max_length=8,
                                  separate_caption=True)
    assert sum(p.n_seqs for p in plans) == n == len(tiny_ds)
    # sorted by descending history length across plan boundaries
    h_lens = [p.h_len for p in plans]
    assert h_lens == sorted(h_lens, reverse=True)
    # dynamic batch-size law: bsize = B // (h_len // max_length + 1)
    covered = 0
    for p in plans:
        first_turn = tiny_ds.turns[p.qa_ids[0]]
        in_len = len(first_turn.history)
        # bsize==0 forces a singleton batch (data_handler.py:183)
        assert p.n_seqs <= max(1, int(4 / int(in_len / 8 + 1)))
        covered += p.n_seqs
    # plan maxima are true maxima
    p = plans[0]
    assert p.q_len == max(len(tiny_ds.turns[q].question) for q in p.qa_ids)
    assert p.a_len == max(len(tiny_ds.turns[q].answer_in) for q in p.qa_ids)


def test_cut_answer_law():
    rng = np.random.default_rng(0)
    a_in = np.array([2, 10, 11, 12], dtype=np.int32)
    a_out = np.array([10, 11, 12, 3], dtype=np.int32)
    seen = set()
    for _ in range(200):
        ci, co = cut_answer(a_in, a_out, rng, cut_a_p=1.0)
        end = len(ci)
        seen.add(end)
        # law: answer_out = answer_in[1:end] + [answer_in[end]]
        assert co.tolist() == a_in[1:end].tolist() + [int(a_in[end])]
    assert seen == {1, 2, 3}  # end index uniform over 1..len-1
    # probability ~0.5 at cut_a_p=0.5
    cuts = sum(len(cut_answer(a_in, a_out, rng, 0.5)[0]) < 4
               for _ in range(1000))
    assert 380 < cuts < 620
    # length-1 answers are never cut (reference would crash)
    one = np.array([2], dtype=np.int32)
    ci, co = cut_answer(one, np.array([3], np.int32), rng, 1.0)
    assert ci.tolist() == [2]


def test_make_batch_padding_and_buckets(tiny_ds):
    plans, _ = make_batch_indices(tiny_ds, batchsize=4, max_length=64,
                                  separate_caption=True)
    p = plans[0]
    hb = make_batch(tiny_ds, p, separate_caption=True, length_bucket=8,
                    feature_bucket=4, pad_rows_to=6)
    assert hb.query.shape[0] == 6 and hb.valid.sum() == p.n_seqs
    for arr in (hb.query, hb.his, hb.answer_in, hb.answer_out, hb.cap):
        assert arr.shape[1] % 8 == 0
    for f, l in zip(hb.fts, hb.fts_len):
        assert f.shape[1] % 4 == 0
        assert (l <= f.shape[1]).all()
        # frames beyond the length are zero
        for b in range(f.shape[0]):
            assert np.all(f[b, l[b]:] == 0)
    pad = tiny_ds.vocab[BLANK]
    # padded rows are entirely <blank>
    assert (hb.query[p.n_seqs:] == pad).all()
    # real tokens survive padding
    t = tiny_ds.turns[p.qa_ids[0]]
    assert hb.query[0, :len(t.question)].tolist() == t.question.tolist()
    assert (hb.query[0, len(t.question):] == pad).all()


def test_3d_feature_arrays_flatten_regions_into_frames(tmp_path):
    """3-D per-frame (T, R, D) arrays — the reference's data path for
    them (data_handler.py:237) is broken end-to-end — load here by
    flattening regions into the frame axis: every (frame, region)
    vector becomes one attention key, compatible with the 2-D mask law.
    Frame skip applies to the time axis before the flatten."""
    from mtn_tpu.data.features import FeatureRegistry, load_features
    d = tmp_path / "i3d_rgb"
    d.mkdir()
    rng = np.random.default_rng(0)
    a0 = rng.standard_normal((5, 3, 7)).astype(np.float32)
    a1 = rng.standard_normal((2, 3, 7)).astype(np.float32)
    np.save(d / "VID000.npy", a0)
    np.save(d / "VID001.npy", a1)
    reg = FeatureRegistry(["i3d_rgb"], str(tmp_path / "<FeaType>" /
                                           "<ImageID>.npy"),
                          ["VID000", "VID001"])
    assert reg.n_frames(0, "VID000") == 15  # 5 frames x 3 regions
    assert reg.feature_dims() == [7]
    fts, lens = load_features(reg, ["VID000", "VID001"],
                              max_frames=[15], skip=[1])
    assert fts[0].shape == (2, 15, 7)
    assert lens[0].tolist() == [15, 6]
    np.testing.assert_array_equal(fts[0][0], a0.reshape(15, 7))
    np.testing.assert_array_equal(fts[0][1, :6], a1.reshape(6, 7))
    assert (fts[0][1, 6:] == 0).all()  # zero padding past real keys
    # skip=2 keeps frames 0,2,4 of the time axis, then flattens
    fts, lens = load_features(reg, ["VID000"], max_frames=[15], skip=[2])
    assert lens[0].tolist() == [9]
    np.testing.assert_array_equal(fts[0][0, :9], a0[::2].reshape(9, 7))


def test_4d_feature_arrays_rejected_with_clear_error(tmp_path):
    """Ranks beyond 3 have no defined semantics — the error must say
    so, not fail with an opaque shape mismatch downstream."""
    from mtn_tpu.data.features import FeatureRegistry
    d = tmp_path / "i3d_rgb"
    d.mkdir()
    np.save(d / "VID000.npy", np.zeros((5, 3, 2, 7), dtype=np.float32))
    with pytest.raises(NotImplementedError, match="4-D feature array"):
        FeatureRegistry(["i3d_rgb"], str(tmp_path / "<FeaType>" /
                                         "<ImageID>.npy"), ["VID000"])


def test_feature_path_without_placeholder_rejected_with_clear_error():
    """A bare directory (no <ImageID> template) as the feature path must
    fail loudly at registry build, not with IsADirectoryError deep in a
    header read (or, worse, by silently loading one file for every
    video)."""
    from mtn_tpu.data.features import FeatureRegistry
    with pytest.raises(ValueError, match="<ImageID>"):
        FeatureRegistry(["i3d_rgb"], "data", ["VID000"])
