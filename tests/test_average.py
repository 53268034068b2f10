"""Checkpoint averaging (utils/average.py): parameter means land in a
fully servable checkpoint family. Beyond-reference capability (the
reference consumes its per-epoch pickles one at a time)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.config import DataConfig, TrainConfig
from mtn_tpu.data.vocab import get_vocabulary
from mtn_tpu.serve import Request, encode_requests
from mtn_tpu.train.batch import device_batch
from mtn_tpu.train.trainer import Trainer
from mtn_tpu.utils.average import _resolve_epochs, average_checkpoints
from mtn_tpu.utils.checkpoint import CheckpointManager
from tests.fixtures import tiny_model_cfg


@pytest.fixture(scope="module")
def family(tiny_corpus, tmp_path_factory):
    """A checkpoint family with epoch params set to constants 1 and 3."""
    out = tmp_path_factory.mktemp("avg")
    prefix = str(out / "mtn")
    vocab = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                           include_caption="caption,summary")
    dims = [32, 16]
    model_cfg = tiny_model_cfg(len(vocab), dims)
    data_cfg = DataConfig(fea_type=list(tiny_corpus.fea_types),
                          include_caption="caption,summary",
                          separate_caption=True)
    ckpt = CheckpointManager(prefix)
    ckpt.save_conf(vocab, model=model_cfg, data=data_cfg,
                   train=TrainConfig())
    trainer = Trainer(model_cfg, TrainConfig())
    sample = device_batch(encode_requests(
        [Request("")], model_cfg, data_cfg, vocab))
    st = trainer.init_state(jax.random.PRNGKey(0), sample)
    fill = lambda c: jax.tree.map(
        lambda x: jnp.full_like(x, c), st.params)
    ckpt.save(1, st.replace(params=fill(1.0)), val_loss=2.0)
    ckpt.save(2, st.replace(params=fill(3.0)), val_loss=1.0)
    return prefix, str(out / "mtn-avg"), trainer, sample, vocab


def test_resolve_epochs_specs():
    assert _resolve_epochs(["all"], [1, 2, 3]) == [1, 2, 3]
    assert _resolve_epochs(["last2"], [1, 2, 3]) == [2, 3]
    assert _resolve_epochs(["last"], [1, 2, 3]) == [3]
    assert _resolve_epochs(["1", "3"], [1, 2, 3]) == [1, 3]
    with pytest.raises(FileNotFoundError):
        _resolve_epochs(["4"], [1, 2, 3])
    with pytest.raises(FileNotFoundError):
        _resolve_epochs(["all"], [])


def test_average_is_parameter_mean(family):
    prefix, out_prefix, trainer, sample, _ = family
    done = average_checkpoints(prefix, ["all"], out_prefix)
    assert done == [1, 2]
    out = CheckpointManager(out_prefix)
    st = trainer.init_state(jax.random.PRNGKey(0), sample)
    params, ep = out.restore_params(st, "best")
    assert ep == 1
    for leaf in jax.tree.leaves(params):
        np.testing.assert_allclose(np.asarray(leaf, np.float32), 2.0)


def test_average_lastk_and_cli(family, tmp_path):
    prefix, _, trainer, sample, _ = family
    out_prefix = str(tmp_path / "avg1")
    from mtn_tpu.utils.average import main
    assert main(["--model", prefix, "--epochs", "last1",
                 "--out", out_prefix]) == 0
    out = CheckpointManager(out_prefix)
    st = trainer.init_state(jax.random.PRNGKey(0), sample)
    params, _ = out.restore_params(st, "best")
    for leaf in jax.tree.leaves(params):
        np.testing.assert_allclose(np.asarray(leaf, np.float32), 3.0)


def test_averaged_family_is_servable(family):
    """The output family carries sidecars + best pointer: the serving
    surface takes `<out>_best` unchanged."""
    prefix, out_prefix, _, _, _ = family
    average_checkpoints(prefix, ["all"], out_prefix)
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    session = ServingSession.from_checkpoint(
        out_prefix + "_best", DecodeConfig(maxlen=4, beam=2, nbest=2,
                                           turn_batch=2))
    answer = session.respond("is there any sound ?")
    assert isinstance(answer, str)
