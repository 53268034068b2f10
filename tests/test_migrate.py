"""Reference-checkpoint migration: torch pickle -> mtn_tpu artifacts."""

import argparse
import os
import pickle

import numpy as np
import pytest

from tests.test_reference_parity import (FT_SIZES, PAD, _RefBatch, _np,
                                         ref_modules, D, FF, H, N_LAYERS, V)

# end-to-end tier: deselect with -m 'not slow' (pyproject markers)
pytestmark = pytest.mark.slow


def test_migrate_reference_checkpoint(ref_modules, tmp_path):
    ref_mtn, _, _ = ref_modules
    import jax
    import torch
    from mtn_tpu.config import config_from_dict
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.train.batch import batch_masks
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from mtn_tpu.utils.migrate import migrate_checkpoint
    from tests.test_model import _random_batch

    torch.manual_seed(3)
    ref_model = ref_mtn.make_model(
        V, V, N=N_LAYERS, d_model=D, d_ff=FF, h=H, dropout=0.0,
        ft_sizes=FT_SIZES, diff_encoder=True, auto_encoder_ft="query")
    ref_model.eval()
    model_path = str(tmp_path / "mtn_1.pth.tar")
    conf_path = str(tmp_path / "mtn.conf")
    torch.save(ref_model, model_path)
    vocab = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}
    while len(vocab) < V:
        vocab[f"w{len(vocab)}"] = len(vocab)
    train_args = argparse.Namespace(
        fea_type=["a", "b"], include_caption="caption,summary",
        separate_caption=True, max_history_length=-1, merge_source=False,
        batch_size=32, max_length=256, cut_a=True, warmup_steps=1234,
        loss_l=1.0)
    with open(conf_path, "wb") as f:
        pickle.dump((vocab, train_args), f)

    out_prefix = str(tmp_path / "migrated" / "mtn")
    os.makedirs(os.path.dirname(out_prefix))
    params, model_cfg, vocab2 = migrate_checkpoint(model_path, conf_path,
                                                   out_prefix, epoch=7)
    assert vocab2 == vocab
    assert model_cfg.d_model == D and model_cfg.nb_blocks == N_LAYERS
    assert model_cfg.ft_sizes == FT_SIZES

    # migrated params reproduce the reference forward exactly
    model = MTN(model_cfg)
    rng = np.random.default_rng(1)
    db = _random_batch(rng, B=2, ft_dims=tuple(FT_SIZES), vocab=V)
    masks, tgt_mask = batch_masks(db, PAD)
    x, _ = model.apply({"params": params}, db.query, db.his, db.cap,
                       db.fts, masks, db.answer_in, tgt_mask,
                       deterministic=True)
    b = _RefBatch(torch, db, PAD)
    with torch.no_grad():
        ref_x, _ = ref_model.forward(b)
    np.testing.assert_allclose(np.asarray(x), _np(ref_x), atol=2e-4)

    # artifacts restore through the normal checkpoint machinery
    ckpt = CheckpointManager(out_prefix)
    v3, conf = ckpt.load_conf()
    assert v3 == vocab
    assert conf["train"]["warmup_steps"] == 1234
    assert conf["data"]["include_caption"] == "caption,summary"
    assert ckpt.latest_epoch() == 7
    from mtn_tpu.config import TrainConfig
    from mtn_tpu.train.trainer import Trainer
    trainer = Trainer(config_from_dict("model", conf["model"]),
                      TrainConfig())
    st = trainer.init_state(jax.random.PRNGKey(0), db)
    restored, ep = ckpt.restore(st, "latest")
    assert ep == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["generator"]["proj"]["kernel"]),
        np.asarray(params["generator"]["proj"]["kernel"]))


def test_export_roundtrip_identity(ref_modules, tmp_path):
    """Export a trained-here checkpoint to the reference torch format,
    then re-read it with the import mapping: every parameter must come
    back bitwise, the conf sidecar must carry the (vocab, args) shape
    the reference generate.py:130-133 reads, and the exported module's
    forward must match ours."""
    import jax
    import torch
    from mtn_tpu.config import DataConfig, TrainConfig
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.train.batch import batch_masks
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from mtn_tpu.utils.migrate import (export_to_reference,
                                       params_from_reference)
    from tests.fixtures import tiny_model_cfg
    from tests.test_model import _random_batch

    cfg = tiny_model_cfg(V, FT_SIZES, d_model=D, d_ff=FF, att_h=H,
                         nb_blocks=N_LAYERS, dropout=0.0,
                         diff_encoder=True, auto_encoder_ft="query")
    vocab = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3}
    while len(vocab) < V:
        vocab[f"w{len(vocab)}"] = len(vocab)

    rng = np.random.default_rng(5)
    db = _random_batch(rng, B=2, ft_dims=tuple(FT_SIZES), vocab=V)
    trainer = Trainer(cfg, TrainConfig(warmup_steps=10))
    state = trainer.init_state(jax.random.PRNGKey(0), db)
    # randomize every leaf (norm scales/biases are (1,0) at init and
    # would mask mapping errors)
    import jax.random as jrandom
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jrandom.split(jrandom.PRNGKey(11), len(leaves))
    leaves = [l + 0.1 * jrandom.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    state = state.replace(params=params)

    prefix = str(tmp_path / "exp" / "mtn")
    os.makedirs(os.path.dirname(prefix))
    ckpt = CheckpointManager(prefix)
    ckpt.save_conf(vocab, model=cfg,
                   data=DataConfig(fea_type=["a", "b"],
                                   separate_caption=True),
                   train=TrainConfig(warmup_steps=10))
    ckpt.save(1, state, val_loss=1.0)

    out_model = str(tmp_path / "mtn_1.pth.tar")
    out_conf = str(tmp_path / "mtn.conf")
    from tests.test_reference_parity import REF
    ref_model, used_epoch = export_to_reference(
        prefix, out_model, out_conf, epoch="best", reference_path=REF)
    assert used_epoch == 1

    # identity: import mapping of the exported pickle == original params
    exported = torch.load(out_model, map_location="cpu", weights_only=False)
    p2, cfg2 = params_from_reference(exported)
    assert cfg2.d_model == D and cfg2.nb_blocks == N_LAYERS
    assert cfg2.auto_encoder_ft == "query" and cfg2.diff_encoder
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))

    # the exported torch module's forward matches ours
    model = MTN(cfg)
    masks, tgt_mask = batch_masks(db, PAD)
    x, _ = model.apply({"params": params}, db.query, db.his, db.cap,
                       db.fts, masks, db.answer_in, tgt_mask,
                       deterministic=True)
    exported.eval()
    b = _RefBatch(torch, db, PAD)
    with torch.no_grad():
        ref_x, _ = exported.forward(b)
    np.testing.assert_allclose(np.asarray(x), _np(ref_x), atol=2e-4)

    # conf sidecar: reference generate.py reads (vocab, args) attributes
    with open(out_conf, "rb") as f:
        v2, train_args = pickle.load(f)
    assert v2 == vocab
    assert train_args.fea_type == ["a", "b"]
    assert train_args.separate_caption == 1
    assert train_args.auto_encoder_ft == "query"
