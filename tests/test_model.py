"""Model structure + the critical cache-consistency tests.

The cached single-step decoder (init_decode_state/decode_step) must
produce bit-for-bit (up to float tolerance) the same log-probs as the
full training-style forward over the prefix — this validates the KV
caches, the precomputed AE chain, and the cross-attention caches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.config import ModelConfig, TrainConfig
from mtn_tpu.models.mtn import MTN
from mtn_tpu.train.batch import batch_masks, device_batch
from mtn_tpu.train.trainer import Trainer
from tests.fixtures import tiny_model_cfg
from tests.slow_reference import full_forward_logp

PAD, SOS = 1, 2


def _random_batch(rng, B=2, Lq=5, Lh=7, Lc=6, La=4, ft_dims=(12, 8),
                  T=(5, 4), vocab=30):
    from mtn_tpu.data.batching import HostBatch
    def toks(L):
        arr = rng.integers(4, vocab, size=(B, L)).astype(np.int32)
        arr[:, 0] = SOS
        return arr
    hb = HostBatch(
        query=toks(Lq), his=toks(Lh), answer_in=toks(La),
        answer_out=np.concatenate(
            [toks(La)[:, 1:], np.full((B, 1), 3, np.int32)], axis=1),
        cap=toks(Lc),
        fts=[rng.standard_normal((B, t, d)).astype(np.float32)
             for t, d in zip(T, ft_dims)],
        fts_len=[np.full((B,), t, np.int32) for t in T],
        valid=np.ones((B,), bool), qa_ids=list(range(B)))
    return device_batch(hb)


@pytest.mark.parametrize("ae_ft,diff_encoder,diff_embed,diff_gen", [
    ("query", True, False, False),    # canonical run.sh config
    ("query", False, False, False),   # shared AE seed from query memory
    ("caption", True, True, True),    # swapped attn order + diff variants
])
def test_cached_decode_matches_full_forward(ae_ft, diff_encoder, diff_embed,
                                            diff_gen):
    rng = np.random.default_rng(0)
    db = _random_batch(rng)
    cfg = tiny_model_cfg(30, (12, 8), auto_encoder_ft=ae_ft,
                         diff_encoder=diff_encoder, diff_embed=diff_embed,
                         diff_gen=diff_gen, dropout=0.0)
    model = MTN(cfg)
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(0)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    maxlen = 5
    state = model.apply({"params": params}, db.query, db.his, db.cap, db.fts,
                        masks, method=MTN.init_decode_state)
    self_kv = model.apply({"params": params}, method=MTN.init_self_kv,
                          batch_size=db.query.shape[0], maxlen=maxlen)
    prefix = np.full((db.query.shape[0], 1), SOS, np.int32)
    for pos in range(maxlen):
        logp, self_kv = model.apply(
            {"params": params}, state, jnp.asarray(prefix[:, -1]), pos,
            self_kv, method=MTN.decode_step)
        ref = full_forward_logp(model, params, db, PAD, prefix)
        np.testing.assert_allclose(np.asarray(logp), ref, atol=2e-4,
                                   err_msg=f"pos={pos}")
        nxt = np.argmax(ref, axis=-1).astype(np.int32)
        prefix = np.concatenate([prefix, nxt[:, None]], axis=1)


def test_text_only_no_features():
    """Config 1 of BASELINE.json: no video streams at all."""
    rng = np.random.default_rng(1)
    from mtn_tpu.data.batching import HostBatch
    B = 2
    hb = HostBatch(
        query=rng.integers(4, 30, (B, 5)).astype(np.int32),
        his=rng.integers(4, 30, (B, 6)).astype(np.int32),
        answer_in=rng.integers(4, 30, (B, 4)).astype(np.int32),
        answer_out=rng.integers(4, 30, (B, 4)).astype(np.int32),
        cap=None, fts=[], fts_len=[], valid=np.ones((B,), bool))
    db = device_batch(hb)
    cfg = tiny_model_cfg(30, (), diff_encoder=False, auto_encoder_ft="query",
                         dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    st, m = tr.train_step(st, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_param_structure_matches_reference_inventory():
    cfg = tiny_model_cfg(30, (12, 8), diff_encoder=True)
    model = MTN(cfg)
    rng = np.random.default_rng(0)
    db = _random_batch(rng)
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(0)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    enc = params["encoder"]
    # diff_encoder: 3 + 2*s norms (mtn.py:368-371)
    assert set(enc.keys()) == {"norm_query", "norm_vid_0", "norm_vid_1",
                               "norm_cap", "norm_his", "norm_ae_0",
                               "norm_ae_1"}
    layer = params["decoder"]["layer_0"]
    # 5 + 4*s sublayers (mtn.py:179)
    subs = [k for k in layer if k.startswith("sl_")]
    assert len(subs) == 5 + 4 * 2
    # per-stream AE modules exist
    for i in range(2):
        for mod in (f"ae_self_attn_{i}", f"ae_vid_attn_{i}", f"ae_attn_{i}",
                    f"ae_ff_{i}"):
            assert mod in layer


def test_dropout_changes_output_and_eval_is_deterministic():
    rng = np.random.default_rng(0)
    db = _random_batch(rng)
    cfg = tiny_model_cfg(30, (12, 8), dropout=0.3)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    m1 = tr.eval_step(st.params, db)
    m2 = tr.eval_step(st.params, db)
    assert float(m1["loss"]) == float(m2["loss"])
    # two different dropout rngs give different training losses
    l1 = tr._loss_fn(st.params, db, jax.random.PRNGKey(1), False)[0]
    l2 = tr._loss_fn(st.params, db, jax.random.PRNGKey(2), False)[0]
    assert float(l1) != float(l2)


def test_padded_rows_do_not_change_loss():
    """Static-shape batch padding must be loss-invariant (the Noam step
    count, and so metric parity, depends on it — SURVEY.md §7)."""
    rng = np.random.default_rng(3)
    db_small = _random_batch(rng, B=2)
    cfg = tiny_model_cfg(30, (12, 8), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db_small)
    loss_small = float(tr.eval_step(st.params, db_small)["loss"])
    # pad with 2 all-blank rows
    import jax.numpy as jnp
    def pad_rows(x):
        if x.ndim == 0 or x.shape[0] != 2:
            return x
        if x.dtype == jnp.int32:
            fill = jnp.full((2,) + x.shape[1:], PAD, x.dtype)
        elif x.dtype == bool:
            fill = jnp.zeros((2,) + x.shape[1:], x.dtype)
        else:
            fill = jnp.zeros((2,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, fill], axis=0)
    db_big = jax.tree.map(pad_rows, db_small)
    loss_big = float(tr.eval_step(st.params, db_big)["loss"])
    np.testing.assert_allclose(loss_big, loss_small, rtol=1e-5)


def test_length_bucket_padding_does_not_change_loss():
    rng = np.random.default_rng(4)
    db = _random_batch(rng, B=2, Lq=5, La=4)
    cfg = tiny_model_cfg(30, (12, 8), dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    base = float(tr.eval_step(st.params, db)["loss"])
    def pad_len(x, axis, extra):
        pad_width = [(0, 0)] * x.ndim
        pad_width[axis] = (0, extra)
        const = PAD if x.dtype == jnp.int32 else 0
        return jnp.pad(x, pad_width, constant_values=const)
    import dataclasses
    db2 = dataclasses.replace(
        db, query=pad_len(db.query, 1, 3), his=pad_len(db.his, 1, 2),
        cap=pad_len(db.cap, 1, 5), answer_in=pad_len(db.answer_in, 1, 2),
        answer_out=pad_len(db.answer_out, 1, 2),
        fts=tuple(pad_len(f, 1, 3) for f in db.fts))
    padded = float(tr.eval_step(st.params, db2)["loss"])
    np.testing.assert_allclose(padded, base, rtol=1e-5)


def test_training_is_deterministic():
    """Same seeds => bit-identical losses across fresh runs (explicit
    PRNG keys everywhere; the reference relies on global seeds)."""
    from mtn_tpu.config import TrainConfig
    losses = []
    for _ in range(2):
        rng = np.random.default_rng(5)
        db = _random_batch(rng)
        cfg = tiny_model_cfg(30, (12, 8), dropout=0.2)
        tr = Trainer(cfg, TrainConfig(warmup_steps=10))
        st = tr.init_state(jax.random.PRNGKey(3), db)
        run = []
        for _ in range(3):
            st, m = tr.train_step(st, db, jax.random.PRNGKey(4))
            run.append(float(m["loss"]))
        losses.append(run)
    assert losses[0] == losses[1]


def test_fused_decode_qkv_matches_unfused():
    """The fused (D, 3D) self-attention projection computes the same
    dot products as the separate q/k/v projections; the GEMM tiling
    differs, so agreement is to float noise (~1e-6 f32), not bitwise —
    which is why the knob is opt-in under the defaults policy
    (docs/BENCH.md "Decode QKV fusion"). The greedy token chain must
    be unaffected."""
    import dataclasses
    rng = np.random.default_rng(3)
    db = _random_batch(rng)
    cfg = dataclasses.replace(tiny_model_cfg(30, (12, 8), dropout=0.0),
                              fused_decode_qkv=True)
    cfg_off = dataclasses.replace(cfg, fused_decode_qkv=False)
    model, model_off = MTN(cfg), MTN(cfg_off)
    masks, _tgt = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(0)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, _tgt,
                        method=MTN.init_all)["params"]
    maxlen = 5
    state = model.apply({"params": params}, db.query, db.his, db.cap, db.fts,
                        masks, method=MTN.init_decode_state)
    kv_a = model.apply({"params": params}, method=MTN.init_self_kv,
                       batch_size=db.query.shape[0], maxlen=maxlen)
    kv_b = kv_a
    prefix = np.full((db.query.shape[0],), SOS, np.int32)
    step_a = jax.jit(lambda t, p, kv: model.apply(
        {"params": params}, state, t, p, kv, method=MTN.decode_step))
    step_b = jax.jit(lambda t, p, kv: model_off.apply(
        {"params": params}, state, t, p, kv, method=MTN.decode_step))
    for pos in range(maxlen):
        la, kv_a = step_a(jnp.asarray(prefix), pos, kv_a)
        lb, kv_b = step_b(jnp.asarray(prefix), pos, kv_b)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-5, err_msg=f"pos={pos}")
        for (ka, va), (kb, vb) in zip(kv_a, kv_b):
            np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       atol=1e-5)
        # greedy token chain must not flip
        np.testing.assert_array_equal(np.argmax(np.asarray(la), axis=-1),
                                      np.argmax(np.asarray(lb), axis=-1))
        prefix = np.argmax(np.asarray(la), axis=-1).astype(np.int32)


def test_batched_ae_matches_sequential():
    """cfg.batched_ae stacks the per-stream QAE chains into single
    batched GEMMs; deterministic forward, decode state and decode step
    must match the sequential implementation to f32 fuzz (the math is
    identical; only GEMM grouping changes). Streams have different
    video lengths on purpose (the padded-keys-are-exact-zero law)."""
    import dataclasses

    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.decode.beam import BeamDecoder

    rng = np.random.default_rng(3)
    db = _random_batch(rng, B=3, T=(5, 9), vocab=30)
    cfg = tiny_model_cfg(30, (12, 8), dropout=0.0, diff_encoder=True)
    cfg_b = dataclasses.replace(cfg, batched_ae=True)
    model = MTN(cfg)
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(1)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    out_s, ae_s = model.apply({"params": params}, db.query, db.his, db.cap,
                              db.fts, masks, db.answer_in, tgt_mask)
    out_b, ae_b = MTN(cfg_b).apply({"params": params}, db.query, db.his,
                                   db.cap, db.fts, masks, db.answer_in,
                                   tgt_mask)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s),
                               atol=2e-5, rtol=1e-4)
    for a, b in zip(ae_s, ae_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
    # decode: same tokens from the full beam program
    dcfg = DecodeConfig(maxlen=5, beam=2, nbest=2)
    res_s = BeamDecoder(cfg, dcfg).beam_batch(params, db)
    res_b = BeamDecoder(cfg_b, dcfg).beam_batch(params, db)
    assert [r.tokens for r in res_b] == [r.tokens for r in res_s]
    # training path with dropout ON still runs (fresh stacked draws)
    MTN(cfg_b).apply({"params": params}, db.query, db.his, db.cap, db.fts,
                     masks, db.answer_in, tgt_mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(7)})
    # init under batched_ae falls back to the sequential chain, so the
    # param tree is bitwise-identical (checkpoints interchangeable)
    params_b = MTN(cfg_b).init({"params": jax.random.PRNGKey(1)}, db.query,
                               db.his, db.cap, db.fts, masks, db.answer_in,
                               tgt_mask, method=MTN.init_all)["params"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params_b)
