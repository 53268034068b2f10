"""BASELINE.json config ladder — each listed capability configuration
trains a step and decodes (configs 1-5; see BASELINE.json 'configs')."""

import jax
import numpy as np
import pytest

from mtn_tpu.config import DecodeConfig, TrainConfig
from mtn_tpu.data.batching import HostBatch
from mtn_tpu.decode.beam import BeamDecoder
from mtn_tpu.train.batch import device_batch
from mtn_tpu.train.trainer import Trainer
from tests.fixtures import tiny_model_cfg

# end-to-end tier: deselect with -m 'not slow' (pyproject markers)
pytestmark = pytest.mark.slow

PAD, SOS = 1, 2


def _batch(rng, B, ft_dims, T, vocab=40):
    def toks(L):
        arr = rng.integers(4, vocab, size=(B, L)).astype(np.int32)
        arr[:, 0] = SOS
        return arr
    return device_batch(HostBatch(
        query=toks(6), his=toks(9), answer_in=toks(5), answer_out=toks(5),
        cap=toks(7),
        fts=[rng.standard_normal((B, t, d)).astype(np.float32)
             for t, d in zip(T, ft_dims)],
        fts_len=[np.full((B,), t, np.int32) for t in T],
        valid=np.ones((B,), bool)))


CONFIGS = [
    # (name, ft_dims, T, model kwargs)
    ("c1_text_only_1layer", (), (), dict(nb_blocks=1, diff_encoder=False)),
    ("c2_i3d_rgb_6blocks", (24,), (6,), dict(nb_blocks=6)),
    ("c3_full_multimodal", (24, 12, 8), (6, 4, 5), dict(nb_blocks=2)),
    ("c4_qae_diff_variants", (24, 12), (6, 4),
     dict(nb_blocks=2, diff_embed=True, diff_gen=True)),
    # config 5: image-grounded (VisDial-style) — a single-frame image
    # feature stream (readme.md:81-86 generalization), beam width 5
    ("c5_image_grounded", (32,), (1,), dict(nb_blocks=2)),
]


@pytest.mark.parametrize("name,ft_dims,T,kw",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_config_trains_and_decodes(name, ft_dims, T, kw):
    rng = np.random.default_rng(0)
    db = _batch(rng, B=3, ft_dims=ft_dims, T=T)
    cfg = tiny_model_cfg(40, ft_dims, dropout=0.0, **kw)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    losses = []
    for i in range(3):
        st, m = tr.train_step(st, db, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    beam = 5 if name == "c5_image_grounded" else 2
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=4, beam=beam, nbest=beam))
    res = dec.beam_batch(st.params, db)
    assert len(res) == 3
    assert all(len(r.tokens) >= 1 for r in res)
    # config 1 also exercises greedy (its BASELINE.json description)
    if name == "c1_text_only_1layer":
        g = dec.greedy_batch(st.params, db)
        assert len(g) == 3
