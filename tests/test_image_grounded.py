"""Image-grounded (VisDial-style) dialogues: single-frame feature streams.

The reference README (readme.md:81-86) notes MTN generalizes to
image-grounded dialogues by treating an image feature as a 1-frame video
stream. The full pipeline must therefore handle T=1 `.npy` features:
header registry, frame-skip, bucket padding, masks, training, and beam
decode.
"""

import jax
import numpy as np

from mtn_tpu.config import DecodeConfig, TrainConfig
from mtn_tpu.data import load, make_batch_indices
from mtn_tpu.data.batching import make_batch
from mtn_tpu.decode.beam import BeamDecoder
from mtn_tpu.train.batch import device_batch
from mtn_tpu.train.trainer import Trainer
from tests.fixtures import tiny_model_cfg, write_tiny_corpus


def test_single_frame_image_stream_trains_and_decodes(tmp_path):
    corpus = write_tiny_corpus(tmp_path, n_dialogs=4, n_turns=2,
                               fea_types=("resnet",), ft_dims=(24,),
                               frames=(1, 2))  # always exactly 1 frame
    from mtn_tpu.data.vocab import get_vocabulary
    vocab = get_vocabulary(corpus.train_set, cutoff=0,
                           include_caption="caption,summary")
    data = load(corpus.fea_types, corpus.fea_path, corpus.train_set, vocab,
                include_caption="caption,summary", separate_caption=True)
    plans, n = make_batch_indices(data, batchsize=4, separate_caption=True)
    assert n == 8
    hb = make_batch(data, plans[0], separate_caption=True,
                    length_bucket=8, feature_bucket=4)
    # T=1 rounds up to the feature bucket; the mask must keep ONE frame
    assert hb.fts[0].shape[1] == 4
    assert all(int(l) == 1 for l in hb.fts_len[0])
    db = device_batch(hb)

    cfg = tiny_model_cfg(len(vocab), (24,), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    st, metrics = tr.train_step(st, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    dec = BeamDecoder(cfg, DecodeConfig(maxlen=4, beam=2, nbest=2))
    results = dec.beam_batch(st.params, db)
    assert len(results) == int(np.asarray(db.valid).sum())
    for r in results:
        assert len(r.tokens) >= 1
