"""Prefetching pipeline, native C++ loader, checkpointing, logging."""

import json
import os

import jax
import numpy as np
import pytest

from mtn_tpu.config import DataConfig, TrainConfig
from mtn_tpu.data import get_vocabulary, load, make_batch_indices
from mtn_tpu.data.pipeline import BatchIterator, shuffled


@pytest.fixture(scope="module")
def ds(tiny_corpus):
    v = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                       include_caption="caption,summary")
    return load(tiny_corpus.fea_types, tiny_corpus.fea_path,
                tiny_corpus.train_set, v, include_caption="caption,summary",
                separate_caption=True)


def _cfg(**kw):
    d = dict(batch_size=4, separate_caption=True, length_bucket=8,
             feature_bucket=4, prefetch=2)
    d.update(kw)
    return DataConfig(**d)


def test_prefetch_iterator_matches_sync(ds):
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    sync = list(BatchIterator(ds, plans, _cfg(cut_a=False), train=False,
                              prefetch=0))
    pre = list(BatchIterator(ds, plans, _cfg(cut_a=False), train=False,
                             prefetch=2))
    assert len(sync) == len(pre) == len(plans)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a.query, b.query)
        np.testing.assert_array_equal(a.his, b.his)
        for fa, fb in zip(a.fts, b.fts):
            np.testing.assert_array_equal(fa, fb)


def test_seed_keyed_iterator_resumes_exactly(ds):
    """Skipping the first k batches with start=k reproduces the exact
    cut_a draws of an uninterrupted pass — the law behind exact
    `--resume step` (cli/train.py epoch loop)."""
    import jax.random
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    assert len(plans) >= 3
    cfg = _cfg(cut_a=True, prefetch=0)
    key = (7, 0)
    mcfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(mcfg, TrainConfig(warmup_steps=10))

    def run(batches, st):
        # the train step donates its state buffers — clone so st0/part
        # survive being passed to several runs
        import jax.numpy as jnp
        st = jax.tree.map(jnp.array, st)
        for hb in batches:
            st, _ = tr.train_step(st, device_batch(hb), jax.random.PRNGKey(1))
        return st

    st0 = tr.init_state(
        jax.random.PRNGKey(0),
        device_batch(next(iter(BatchIterator(ds, plans[:1],
                                             _cfg(cut_a=False),
                                             train=False, prefetch=0)))))
    full = run(BatchIterator(ds, plans, cfg, train=True, seed_key=key), st0)
    k = 2
    part = run(BatchIterator(ds, plans[:k], cfg, train=True, seed_key=key),
               st0)
    resumed = run(BatchIterator(ds, plans[k:], cfg, train=True,
                                seed_key=key, start=k), part)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shuffled_preserves_set(ds):
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    sh = shuffled(plans, np.random.default_rng(0))
    assert sorted(id(p) for p in sh) == sorted(id(p) for p in plans)


def test_native_loader_matches_numpy(tiny_corpus):
    from mtn_tpu.data import native_loader as nl
    if not nl.available():
        pytest.skip("native loader not built")
    root = tiny_corpus.root
    ftype = tiny_corpus.fea_types[0]
    paths = sorted(str(p) for p in (root / ftype).glob("*.npy"))[:4]
    out, lens = nl.load_batch(paths, max_frames=16, skip=1)
    for i, p in enumerate(paths):
        a = np.load(p)
        assert lens[i] == a.shape[0]
        np.testing.assert_allclose(out[i, : a.shape[0]], a)
        assert (out[i, a.shape[0]:] == 0).all()
    out2, lens2 = nl.load_batch(paths, max_frames=16, skip=3)
    for i, p in enumerate(paths):
        a = np.load(p)[::3]
        assert lens2[i] == a.shape[0]
        np.testing.assert_allclose(out2[i, : a.shape[0]], a)
    # shape probe parity with header reader
    from mtn_tpu.data.features import get_npy_shape
    assert nl.npy_shape(paths[0]) == tuple(get_npy_shape(paths[0]))


def test_native_loader_3d_matches_numpy(tmp_path):
    """3-D (T, R, D) streams take the native path under the same flatten
    law as the numpy fallback (skip on the time axis, regions flatten
    into frames, cap may cut mid-frame) — outputs must be bitwise equal.
    """
    from mtn_tpu.data import native_loader as nl
    if not nl.available():
        pytest.skip("native loader not built")
    rng = np.random.default_rng(3)
    shapes = [(5, 4, 6), (7, 4, 6), (1, 4, 6), (6, 4, 6)]
    dtypes = [np.float32, np.float64, np.float32, np.float64]
    paths = []
    for i, (shape, dt) in enumerate(zip(shapes, dtypes)):
        p = tmp_path / f"v{i}.npy"
        np.save(p, rng.standard_normal(shape).astype(dt))
        paths.append(str(p))

    def numpy_law(p, max_frames, skip):
        a = np.load(p)[::skip].reshape(-1, np.load(p).shape[-1])
        n = min(a.shape[0], max_frames)
        out = np.zeros((max_frames, a.shape[-1]), np.float32)
        out[:n] = a[:n]
        return out, n

    for skip in (1, 2, 3):
        # max_frames=14 is not a multiple of R=4: cuts mid-frame
        out, lens = nl.load_batch(paths, max_frames=14, skip=skip)
        for i, p in enumerate(paths):
            want, n = numpy_law(p, 14, skip)
            assert lens[i] == n
            np.testing.assert_array_equal(out[i], want)
    # header probe reports the full 3-D shape
    assert nl.npy_shape(paths[0]) == shapes[0]
    # end-to-end: load_features native path == python path on 3-D files
    from mtn_tpu.data.features import FeatureRegistry, load_features

    class _Reg(FeatureRegistry):
        def __init__(self):
            self.fea_types = ["r3d"]
            self.streams = [{f"v{i}": (paths[i], shapes[i][0] * shapes[i][1])
                             for i in range(len(paths))}]
            self._has_3d = [True]

    reg = _Reg()
    vids = [f"v{i}" for i in range(len(paths))]
    nat = load_features(reg, vids, [14], [2], use_native=True)
    py = load_features(reg, vids, [14], [2], use_native=False)
    np.testing.assert_array_equal(nat[0][0], py[0][0])
    np.testing.assert_array_equal(nat[1][0], py[1][0])


def test_native_vs_python_feature_path(ds, tiny_corpus):
    from mtn_tpu.data import native_loader as nl
    if not nl.available():
        pytest.skip("native loader not built")
    from mtn_tpu.data.features import load_features
    vids = [t.vid for t in ds.turns[:3]]
    native = load_features(ds.features, vids, [16, 16], [1, 1],
                           use_native=True)
    python = load_features(ds.features, vids, [16, 16], [1, 1],
                           use_native=False)
    for a, b in zip(native[0], python[0]):
        np.testing.assert_allclose(a, b)
    for a, b in zip(native[1], python[1]):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip_and_best(tmp_path, ds):
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    db = device_batch(make_batch(ds, plans[0], separate_caption=True))
    cfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    st, _ = tr.train_step(st, db, jax.random.PRNGKey(1))

    prefix = str(tmp_path / "m")
    ckpt = CheckpointManager(prefix)
    ckpt.save_conf(ds.vocab, model=cfg)
    ckpt.save(1, st, val_loss=5.0)
    st2, _ = tr.train_step(st, db, jax.random.PRNGKey(1))
    ckpt.save(2, st2, val_loss=4.0)
    ckpt.save(3, st2, val_loss=6.0)
    assert ckpt.best_epoch() == 2
    assert ckpt.latest_epoch() == 3

    restored, ep = ckpt.restore(st, "best")
    assert ep == 2
    assert int(restored.step) == int(st2.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    vocab, conf = ckpt.load_conf()
    assert vocab == ds.vocab
    assert conf["model"]["d_model"] == cfg.d_model
    # resumed training continues deterministically
    st3, m3 = tr.train_step(restored, db, jax.random.PRNGKey(1))
    st4, m4 = tr.train_step(st2, db, jax.random.PRNGKey(1))
    assert float(m3["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-6)


def test_trace_logger_schema(tmp_path):
    from mtn_tpu.utils.logging import TraceLogger, dump_params_txt
    prefix = str(tmp_path / "m")
    logs = TraceLogger(prefix)
    logs.train_step(1, 100, 5.0, 1234.5)
    logs.epoch(1, "train", 5.0)
    logs.epoch(1, "val", 4.5)
    train_lines = open(prefix + "_train.csv").read().splitlines()
    assert train_lines[0] == "epoch,step,loss,tokens_per_sec"
    assert train_lines[1].startswith("1,100,5.0")
    trace_lines = open(prefix + "_trace.csv").read().splitlines()
    assert trace_lines[0] == "epoch,split,avg_loss"
    assert trace_lines[1].startswith("1,train,")
    recs = [json.loads(l) for l in open(prefix + "_metrics.jsonl")]
    assert recs[0]["kind"] == "train_step"
    dump_params_txt(prefix + "_params.txt", {"a": 1, "b": "x"})
    assert "a=1" in open(prefix + "_params.txt").read()


def test_step_checkpoint_roundtrip(tmp_path, ds):
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.data import make_batch_indices
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    db = device_batch(make_batch(ds, plans[0], separate_caption=True))
    cfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    for _ in range(3):
        st, _ = tr.train_step(st, db, jax.random.PRNGKey(1))
    ckpt = CheckpointManager(str(tmp_path / "m"))
    ckpt.save_step(st, epoch=2, batch_idx=5)
    ckpt.save_step(st, epoch=2, batch_idx=7)  # rotating slot: overwrites
    restored, ep, bi = ckpt.restore_step(st)
    assert ep == 2 and bi == 7 and int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profiler_trace_smoke(tmp_path):
    from mtn_tpu.utils import profiling
    import jax.numpy as jnp
    with profiling.trace(str(tmp_path / "trace")):
        with profiling.step_annotation("train", 1):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert os.path.isdir(tmp_path / "trace")
    t = profiling.Timer()
    assert t.elapsed() >= 0.0


def test_checkify_fn_catches_nan():
    import jax
    import jax.numpy as jnp
    from mtn_tpu.utils.profiling import checkify_fn

    def bad(x):
        return jnp.log(x)  # nan for negative

    wrapped = checkify_fn(bad)
    assert np.isfinite(float(wrapped(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        wrapped(jnp.asarray(-1.0))


def test_trace_logger_resume_appends(tmp_path):
    from mtn_tpu.utils.logging import TraceLogger
    prefix = str(tmp_path / "m")
    logs = TraceLogger(prefix)
    logs.epoch(1, "train", 5.0)
    logs2 = TraceLogger(prefix, resume=True)
    logs2.epoch(2, "train", 4.0)
    lines = open(prefix + "_trace.csv").read().splitlines()
    assert len(lines) == 3 and lines[1].startswith("1,") \
        and lines[2].startswith("2,")
    # non-resume truncates (reference behavior)
    TraceLogger(prefix)
    assert len(open(prefix + "_trace.csv").read().splitlines()) == 1


def test_checkpoint_keep_prunes_meta(tmp_path, ds):
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.data import make_batch_indices
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    db = device_batch(make_batch(ds, plans[0], separate_caption=True))
    cfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    ckpt = CheckpointManager(str(tmp_path / "m"))
    for e in range(1, 5):
        ckpt.save(e, st, val_loss=10.0 - e, keep=2)
    meta = json.load(open(os.path.join(str(tmp_path / "m") + "_ckpt",
                                       "meta.json")))
    # epochs 1,2 pruned (except best rules); meta matches disk
    for e in meta["epochs"]:
        assert os.path.isdir(os.path.join(str(tmp_path / "m") + "_ckpt",
                                          f"epoch_{e}"))
    assert 4 in meta["epochs"]


def test_async_save_defers_commit_and_matches_sync(tmp_path, ds):
    """--async-save: save() returns before the meta/best-pointer commit
    (the disk write overlaps the caller's next work); any later
    checkpoint op finalizes it, and the restored artifact is identical
    to a blocking save of the same state."""
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    db = device_batch(make_batch(ds, plans[0], separate_caption=True))
    cfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    st, _ = tr.train_step(st, db, jax.random.PRNGKey(1))

    ck_a = CheckpointManager(str(tmp_path / "a"), async_save=True)
    ck_s = CheckpointManager(str(tmp_path / "s"))
    ck_a.save(1, st, val_loss=5.0)
    # commit deferred: meta.json is only written by the finalize step
    assert not os.path.exists(os.path.join(str(tmp_path / "a") + "_ckpt",
                                           "meta.json"))
    assert ck_a.latest_epoch() == 1        # any read finalizes first
    ck_s.save(1, st, val_loss=5.0)
    ra, _ = ck_a.restore(st, "best")
    rs, _ = ck_s.restore(st, "best")
    for a, b in zip(jax.tree.leaves(ra.params), jax.tree.leaves(rs.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a second async save finalizes the first implicitly; flush() makes
    # the last one durable + meta-visible (the CLI calls it at exit)
    st2, _ = tr.train_step(st, db, jax.random.PRNGKey(2))
    ck_a.save(2, st2, val_loss=4.0)
    ck_a.flush()
    assert ck_a.best_epoch() == 2 and ck_a.latest_epoch() == 2


def test_async_step_checkpoint_rotates(tmp_path, ds):
    """Async rotating step checkpoints: the tmp->step_latest rename is
    deferred until the write is durable; back-to-back saves and the
    restore finalize in order."""
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    db = device_batch(make_batch(ds, plans[0], separate_caption=True))
    cfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    st, _ = tr.train_step(st, db, jax.random.PRNGKey(1))
    ck = CheckpointManager(str(tmp_path / "m"), async_save=True)
    ck.save_step(st, epoch=1, batch_idx=3)
    ck.save_step(st, epoch=1, batch_idx=9)  # finalizes the first
    restored, ep, bi = ck.restore_step(st)  # finalizes the second
    assert ep == 1 and bi == 9 and int(restored.step) == int(st.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_feature_transfer_close_and_decodes(ds):
    """--feature-transfer int8: quantized transfer + on-device dequant
    must stay within the row-absmax quantization bound and leave the
    decode path functional."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from tests.fixtures import tiny_model_cfg
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    hb = make_batch(ds, plans[0], separate_caption=True)
    db_f = device_batch(hb)
    db_q = device_batch(hb, "int8")
    for f, q in zip(db_f.fts, db_q.fts):
        f = np.asarray(f, np.float32)
        q = np.asarray(q, np.float32)
        # row-absmax int8 + bf16 dequant: <= ~1/127 relative per frame
        bound = np.abs(f).max(axis=-1, keepdims=True) / 100.0 + 1e-6
        assert np.all(np.abs(f - q) <= bound)
    cfg = tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db_f)
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=3, beam=2, nbest=1))
    res = dec.beam_batch(st.params, db_q)
    assert len(res) == int(np.asarray(db_q.valid).sum())


def test_load_features_dedups_repeated_vids(ds, monkeypatch):
    """A batch with repeated videos (same-dialog turns) reads each file
    once and scatters — rows must be identical to the naive per-row
    load, on both the native and numpy paths."""
    from mtn_tpu.data import features as F
    vids = list(dict.fromkeys(t.vid for t in ds.turns))[:2]
    assert len(vids) == 2
    dup = [vids[0], vids[1], vids[0], vids[0]]
    want = F.load_features(ds.features, dup, [16, 16], [1, 1],
                           use_native=False)

    reads = []
    orig = F._load_npy
    monkeypatch.setattr(F, "_load_npy",
                        lambda p: (reads.append(p), orig(p))[1])
    got_py = F.load_features(ds.features, dup, [16, 16], [1, 1],
                             use_native=False)
    # 2 streams x 2 unique videos, NOT x 4 rows
    assert len(reads) == 4
    for a, b in zip(want[0] + want[1], got_py[0] + got_py[1]):
        np.testing.assert_array_equal(a, b)

    from mtn_tpu.data import native_loader as nl
    if nl.available():
        got_nat = F.load_features(ds.features, dup, [16, 16], [1, 1],
                                  use_native=True)
        for a, b in zip(want[0] + want[1], got_nat[0] + got_nat[1]):
            np.testing.assert_array_equal(a, b)


def test_check_dstc7_data_script(tmp_path, capsys):
    """scripts/check_dstc7_data.py (VERDICT r2 #7): passes on a corpus
    laid out exactly like the real DSTC7 download (including the
    download's 'lbl_undiscloseonly_' eval-file spelling), and fails
    with a nonzero exit when a feature file or a dialogue set is
    missing."""
    import importlib.util
    import shutil

    from tests.fixtures import write_tiny_corpus

    spec = importlib.util.spec_from_file_location(
        "check_dstc7_data",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "check_dstc7_data.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    root = tmp_path / "data"
    c = write_tiny_corpus(root, n_dialogs=4, n_turns=2)
    os.rename(c.train_set, root / "train_set4DSTC7-AVSD.json")
    os.rename(c.valid_set, root / "valid_set4DSTC7-AVSD.json")
    os.rename(c.test_set, root / "test_set4DSTC7-AVSD.json")
    os.rename(c.lbl_test_set, root / "lbl_test_set4DSTC7-AVSD.json")
    # the real download's spelling (reference repo asks for
    # 'undisclosedonly'; both must be accepted)
    shutil.copy(root / "lbl_test_set4DSTC7-AVSD.json",
                root / "lbl_undiscloseonly_test_set4DSTC7-AVSD.json")
    (root / "stopwords.txt").write_text("uh\n")
    for ft in c.fea_types:
        os.symlink(root / ft, root / f"{ft}_testset")

    argv = ["--data-root", str(root), "--fea-types", "i3d_rgb vggish"]
    assert mod.main(argv) == 0
    out = capsys.readouterr().out
    assert "run.sh 2" in out and "lbl_undiscloseonly_" in out

    # break one feature file -> FAIL + exit 1
    victim = next((root / "i3d_rgb").glob("*.npy"))
    victim.unlink()
    assert mod.main(argv) == 1
    assert "FAIL" in capsys.readouterr().out

    # missing dialogue set -> exit 1 (and not a crash)
    (root / "valid_set4DSTC7-AVSD.json").unlink()
    assert mod.main(argv) == 1
