"""Write-once feature-block disk cache (mtn_tpu/data/feature_cache.py).

VERDICT r4 #6: training re-read every video's .npy per epoch (the
reference does a per-example np.load in its hot loop,
data_handler.py:233) and re-quantized under --feature_transfer int8;
the cache stores each plan's padded block ONCE in the transfer dtype
and serves later epochs from mmap. The contract pinned here: cached
batches are BITWISE the uncached batches at the same transfer dtype,
entries are write-once, and editing a source feature file invalidates
its blocks.
"""

import os

import numpy as np
import pytest

from mtn_tpu.config import DataConfig
from mtn_tpu.data import get_vocabulary, load, make_batch_indices
from mtn_tpu.data.batching import make_batch
from mtn_tpu.data.feature_cache import FeatureCache, QuantFeature
from mtn_tpu.data.pipeline import BatchIterator
from mtn_tpu.train.batch import device_batch


@pytest.fixture(scope="module")
def ds(tiny_corpus):
    v = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                       include_caption="caption,summary")
    return load(tiny_corpus.fea_types, tiny_corpus.fea_path,
                tiny_corpus.train_set, v, include_caption="caption,summary",
                separate_caption=True)


def _cfg(**kw):
    d = dict(batch_size=4, separate_caption=True, length_bucket=8,
             feature_bucket=4, prefetch=0, cut_a=False)
    d.update(kw)
    return DataConfig(**d)


def _device_fts(hb, transfer):
    db = device_batch(hb, transfer)
    return [np.asarray(f) for f in db.fts]


@pytest.mark.parametrize("transfer", ["float32", "bfloat16", "int8"])
def test_cached_batches_bitwise_match_uncached(ds, tmp_path, transfer):
    """Epoch 1 (fill) and epoch 2 (serve from mmap) must both put the
    exact bytes of the uncached path on the device."""
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    cache = FeatureCache(str(tmp_path / "fc"), transfer=transfer)
    cfg = _cfg()
    plain = list(BatchIterator(ds, plans, cfg, train=False))
    fill = list(BatchIterator(ds, plans, cfg, train=False,
                              feature_cache=cache))
    served = list(BatchIterator(ds, plans, cfg, train=False,
                                feature_cache=cache))
    assert cache.misses == len(plans) * len(ds.feature_dims())
    assert cache.hits == len(plans) * len(ds.feature_dims())
    for a, b, c in zip(plain, fill, served):
        np.testing.assert_array_equal(a.query, b.query)
        for fa, fb, fc in zip(_device_fts(a, transfer),
                              _device_fts(b, transfer),
                              _device_fts(c, transfer)):
            np.testing.assert_array_equal(fa, fb)
            np.testing.assert_array_equal(fa, fc)
        for la, lb, lc in zip(a.fts_len, b.fts_len, c.fts_len):
            np.testing.assert_array_equal(la, lb)
            np.testing.assert_array_equal(la, lc)


def test_cache_entries_are_write_once(ds, tmp_path):
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    cache = FeatureCache(str(tmp_path / "fc"), transfer="float32")
    cfg = _cfg()
    list(BatchIterator(ds, plans, cfg, train=False, feature_cache=cache))
    files = sorted(os.listdir(cache.dir))
    assert files and not any(".tmp" in f for f in files)
    stamps = {f: os.stat(os.path.join(cache.dir, f)).st_mtime_ns
              for f in files}
    list(BatchIterator(ds, plans, cfg, train=False, feature_cache=cache))
    assert sorted(os.listdir(cache.dir)) == files
    assert all(os.stat(os.path.join(cache.dir, f)).st_mtime_ns == m
               for f, m in stamps.items())


def test_cache_invalidates_on_source_change(ds, tmp_path, tiny_corpus):
    """Editing a feature file on disk (mtime/size) must miss the old
    entries and serve the new bytes."""
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    cache = FeatureCache(str(tmp_path / "fc"), transfer="float32")
    cfg = _cfg()
    list(BatchIterator(ds, plans, cfg, train=False, feature_cache=cache))
    n_entries = len(os.listdir(cache.dir))
    # touch one source file with new content
    path = ds.features.path(0, next(iter(ds.features.streams[0])))
    arr = np.load(path)
    np.save(path, arr + 1.0)
    try:
        fresh = list(BatchIterator(ds, plans, cfg, train=False,
                                   feature_cache=cache))
        plain = list(BatchIterator(ds, plans, cfg, train=False))
        for a, b in zip(plain, fresh):
            for fa, fb in zip(a.fts, b.fts):
                np.testing.assert_array_equal(np.asarray(fa),
                                              np.asarray(fb))
        # the stale entries stay on disk; new keys were added
        assert len(os.listdir(cache.dir)) > n_entries
    finally:
        np.save(path, arr)


def test_quant_feature_pad_rows():
    q = np.full((2, 3, 4), 7, np.int8)
    s = np.ones((2, 3, 1), np.float32)
    qf = QuantFeature(q=q, scale=s)
    assert qf.pad_rows(2) is qf
    padded = qf.pad_rows(5)
    assert padded.q.shape == (5, 3, 4) and padded.scale.shape == (5, 3, 1)
    assert (padded.q[2:] == 0).all() and (padded.scale[2:] == 0).all()
    np.testing.assert_array_equal(padded.q[:2], q)


def test_cache_with_padded_rows_matches(ds, tmp_path):
    """pad_rows_to (the uniform-shapes path) composes with the cache:
    int8 QuantFeature rows pad to exact device zeros like the uncached
    zero rows."""
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    cache = FeatureCache(str(tmp_path / "fc"), transfer="int8")
    kw = dict(separate_caption=True, pad_rows_to=6)
    a = make_batch(ds, plans[0], **kw)
    b = make_batch(ds, plans[0], feature_cache=cache, **kw)   # fill
    c = make_batch(ds, plans[0], feature_cache=cache, **kw)   # serve
    assert isinstance(b.fts[0], QuantFeature)
    for fa, fb, fc in zip(_device_fts(a, "int8"), _device_fts(b, "int8"),
                          _device_fts(c, "int8")):
        assert fa.shape[0] == 6
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(fa, fc)


@pytest.mark.slow
def test_train_cli_with_feature_cache_identical_checkpoint(
        tiny_corpus, tmp_path):
    """`train.py --feature-cache` trains to a bitwise-identical
    checkpoint (the cache changes I/O, never math), and the cache
    directory is populated."""
    import jax

    from mtn_tpu.cli.train import main as train_main
    from mtn_tpu.utils.checkpoint import CheckpointManager

    def run(tag, extra):
        prefix = str(tmp_path / tag / "mtn")
        rc = train_main([
            "--fea-type", *tiny_corpus.fea_types,
            "--train-path", tiny_corpus.fea_path,
            "--train-set", tiny_corpus.train_set,
            "--valid-path", tiny_corpus.fea_path,
            "--valid-set", tiny_corpus.valid_set,
            "--include-caption", "caption", "--separate-caption", "1",
            "--num-epochs", "2", "--batch-size", "4", "--max-length", "64",
            "--model", prefix, "--nb-blocks", "1", "--d-model", "16",
            "--d-ff", "32", "--att-h", "2", "--warmup-steps", "20",
            "--vocab-cutoff", "0", "--dtype", "float32",
            "--feature-transfer", "int8",
            "--length-bucket", "8", "--feature-bucket", "4", *extra])
        assert rc == 0
        return prefix

    cache_dir = str(tmp_path / "cache")
    p_plain = run("plain", [])
    p_cached = run("cached", ["--feature-cache", cache_dir])
    assert os.listdir(cache_dir)

    # compare the final checkpoints bitwise
    def leaves(prefix):
        ckpt = CheckpointManager(prefix)
        vocab, conf = ckpt.load_conf()
        from mtn_tpu.config import TrainConfig, config_from_dict
        from mtn_tpu.serve import Request, encode_requests
        from mtn_tpu.train.batch import device_batch as dbatch
        from mtn_tpu.train.trainer import Trainer
        mcfg = config_from_dict("model", conf["model"])
        dcfg = config_from_dict("data", conf["data"])
        tr = Trainer(mcfg, TrainConfig())
        sample = dbatch(encode_requests([Request("")], mcfg, dcfg, vocab))
        state = tr.init_state(jax.random.PRNGKey(0), sample)
        params, _ = ckpt.restore_params(state, "latest")
        return jax.tree.leaves(params)

    for a, b in zip(leaves(p_plain), leaves(p_cached)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
