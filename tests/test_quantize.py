"""Weight-only int8 decode path (mtn_tpu/utils/quantize.py).

The quantized program's semantics are "the model run with the
dequantized weights": ``(x @ q) * scale`` ≡ ``x @ (q · scale)`` per
output column (exact in real arithmetic), so the tests pin

1. the quantizer's elementwise error bound and tree structure,
2. closeness of quantized decode logits to the dequantized-f32 model,
3. end-to-end decode across every decoder entry point,
4. the serving surface (weights_quant="int8").
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.config import DecodeConfig
from mtn_tpu.decode.beam import BeamDecoder
from mtn_tpu.models.mtn import MTN
from mtn_tpu.train.batch import batch_masks
from mtn_tpu.utils.quantize import (QuantizedParams, dequantize_kernel,
                                    model_variables, quantize_kernel,
                                    quantize_params)
from tests.fixtures import tiny_model_cfg
from tests.test_model import _random_batch, PAD, SOS


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    db = _random_batch(rng, B=3, vocab=24)
    cfg = tiny_model_cfg(24, (12, 8), dropout=0.0)
    model = MTN(cfg)
    masks, tgt_mask = batch_masks(db, PAD)
    params = model.init({"params": jax.random.PRNGKey(3)}, db.query, db.his,
                        db.cap, db.fts, masks, db.answer_in, tgt_mask,
                        method=MTN.init_all)["params"]
    return cfg, model, params, db


def test_quantize_kernel_error_bound():
    rng = np.random.default_rng(0)
    k = rng.standard_normal((64, 48)).astype(np.float32) * 0.3
    q, scale = quantize_kernel(k)
    assert q.dtype == np.int8 and scale.shape == (48,)
    err = np.abs(k - dequantize_kernel(q, scale))
    # symmetric rounding: elementwise error <= scale/2 (+ float fuzz)
    assert np.all(err <= scale[None, :] * 0.5 + 1e-7)
    # each column's max magnitude maps to ±127
    assert np.all(np.max(np.abs(q), axis=0) == 127)


def test_quantize_params_structure(setup):
    cfg, model, params, db = setup
    qp = quantize_params(params)
    kinds = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(qp.params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        kinds[name] = np.asarray(leaf).dtype
    int8_keys = [k for k, d in kinds.items() if d == np.int8]
    # every attention/FFN/generator kernel went int8 ...
    assert all(k.endswith("kernel") for k in int8_keys)
    assert any("self_attn/w_q" in k for k in int8_keys)
    assert any("ff/w_1" in k for k in int8_keys)
    assert any("generator/proj" in k for k in int8_keys)
    # ... but not the video feature projections, embeds or norms
    assert not any("vid_encoder" in k for k in int8_keys)
    assert kinds["embed_src/lut/embedding"] == np.float32
    # scales mirror the quantized modules
    scales = jax.tree.leaves(qp.qscales)
    assert len(scales) == len(int8_keys)
    # biases stay float
    assert all(d != np.int8 for k, d in kinds.items() if k.endswith("bias"))


def test_quantize_params_skip_generator(setup):
    cfg, model, params, db = setup
    qp = quantize_params(params, skip_generator=True)
    int8_keys = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(qp.params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if np.asarray(leaf).dtype == np.int8:
            int8_keys.append(name)
    # the head(s) stay full precision, the bulk still quantizes
    assert not any("generator" in k for k in int8_keys)
    assert any("self_attn/w_q" in k for k in int8_keys)
    assert any("ff/w_1" in k for k in int8_keys)


def test_quantize_params_device_resident(setup):
    # quantized leaves must be jax Arrays (committed to device), not
    # host numpy — numpy leaves re-upload per jitted call (BENCH.md
    # "Weight-only int8 decode": 10 rps vs 437 through the relay)
    cfg, model, params, db = setup
    qp = quantize_params(params)
    for leaf in jax.tree.leaves(qp.params) + jax.tree.leaves(qp.qscales):
        assert isinstance(leaf, jax.Array), type(leaf)


def _dequantized_tree(params, qp: QuantizedParams):
    """params with every quantized kernel replaced by q·scale."""
    def rec(orig, q, s):
        out = {}
        for key, val in orig.items():
            if isinstance(val, dict) and "kernel" in val and key in (s or {}):
                new = dict(val)
                new["kernel"] = dequantize_kernel(
                    np.asarray(q[key]["kernel"]), np.asarray(
                        s[key]["kernel_scale"]))
                out[key] = new
            elif isinstance(val, dict):
                out[key] = rec(val, q[key], (s or {}).get(key))
            else:
                out[key] = val
        return out
    return rec(params, qp.params, qp.qscales)


def test_quantized_logits_match_dequantized_model(setup):
    """Quantized decode ≡ the dequantized-weights model, up to f32
    op-ordering fuzz ((x@q)·s vs x@(q·s))."""
    cfg, model, params, db = setup
    qp = quantize_params(params)
    deq = _dequantized_tree(params, qp)
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=6, beam=2, nbest=2))
    state_q = dec._decode_state(qp, db)
    state_d = dec._decode_state(deq, db)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        atol=1e-4, rtol=1e-3), state_q, state_d)
    self_kv_q = model.init_self_kv(3, 6)
    toks = jnp.full((3,), SOS, jnp.int32)
    logp_q, _ = dec._step(qp, state_q, toks, 0, self_kv_q)
    logp_d, _ = dec._step(deq, state_d, toks, 0, self_kv_q)
    np.testing.assert_allclose(np.asarray(logp_q), np.asarray(logp_d),
                               atol=1e-4, rtol=1e-3)


def test_quantized_decode_all_entry_points(setup):
    """beam / greedy / sample / rank / stream all accept QuantizedParams
    and produce outputs of the right shape."""
    cfg, model, params, db = setup
    qp = quantize_params(params)
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=5, beam=2, nbest=2))
    res = dec.beam_batch(qp, db)
    assert len(res) == int(np.asarray(db.valid).sum())
    assert all(len(r.tokens) >= 1 for r in res)
    greedy = dec.greedy_batch(qp, db)
    assert len(greedy) == len(res)
    sampled = dec.sample_batch(qp, db)
    assert len(sampled) == len(res)
    scores = dec.rank_batch(qp, db, [[[5, 6], [7]]] * db.query.shape[0])
    assert all(len(s) == 2 for s in scores)
    streamed = [list(t) for t in dec.stream_tokens(qp, db, style="greedy")]
    assert streamed and len(streamed[0]) == len(res)


def test_quantized_fused_qkv_matches_unfused(setup):
    cfg, model, params, db = setup
    qp = quantize_params(params)
    fused_cfg = dataclasses.replace(cfg, fused_decode_qkv=True)
    dcfg = DecodeConfig(maxlen=5, beam=2, nbest=2)
    dec = BeamDecoder(cfg, dcfg)
    dec_f = BeamDecoder(fused_cfg, dcfg)
    state = dec._decode_state(qp, db)
    state_f = dec_f._decode_state(qp, db)
    kv = model.init_self_kv(3, 5)
    toks = jnp.full((3,), SOS, jnp.int32)
    logp, _ = dec._step(qp, state, toks, 0, kv)
    logp_f, _ = dec_f._step(qp, state_f, toks, 0, kv)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp_f),
                               atol=1e-4, rtol=1e-3)


def test_training_path_rejects_nothing_and_stays_float(setup):
    """model_variables on plain params is the identity contract the
    training/parity paths rely on."""
    cfg, model, params, db = setup
    v = model_variables(params)
    assert set(v) == {"params"} and v["params"] is params


@pytest.mark.slow
def test_serving_session_weights_quant(served):
    """ServingSession(weights_quant='int8') serves end-to-end from a
    trained checkpoint, and hot-reload re-quantizes."""
    from mtn_tpu.serve import Request, ServingSession
    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2)
    quant = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                           weights_quant="int8")
    assert isinstance(quant.params, QuantizedParams)
    out = quant.respond_batch([Request(
        question="is there any audio ?",
        history=[("are there people ?", "yes")],
        caption="a man sits on a couch", features=feats)])
    assert len(out) == 1
    ans, score = out[0]
    assert isinstance(ans, str) and isinstance(score, float)
    # token-level agreement vs full precision is measured on real
    # trained checkpoints by scripts/bench_quant.py, not pinned here
    quant.reload()
    assert isinstance(quant.params, QuantizedParams)
    out2 = quant.respond_batch([Request(question="is it raining ?")])
    assert isinstance(out2[0][0], str)
    # the fidelity point: fp head stays float in the served tree
    fp = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                        weights_quant="int8-fp-head")
    gen = fp.params.params["generator"]["proj"]["kernel"]
    assert np.asarray(gen).dtype == np.float32
    out3 = fp.respond_batch([Request(question="is there any audio ?")])
    assert isinstance(out3[0][0], str)


@pytest.mark.slow
def test_serving_session_weights_quant_dp_mesh(served):
    """VERDICT r4 #1: weights_quant now serves under a >1-device mesh.
    The int8 tree is laid out with the same partition rules as f32
    (kernel_scale rules in parallel/sharding.py) and the dp-meshed
    quantized session reproduces the single-device quantized session:
    identical tokens; scores to f32 gemm-tiling noise (dp row sharding
    changes XLA's dot blocking, so reductions reassociate at ulp
    level)."""
    from mtn_tpu.parallel import make_mesh
    from mtn_tpu.serve import Request, ServingSession
    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2, turn_batch=8)
    reqs = [Request(question="is there any audio ?", features=feats),
            Request(question="what is he doing ?",
                    history=[("are there people ?", "yes")],
                    caption="a man sits on a couch")]
    single = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                            weights_quant="int8")
    meshed = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                            mesh=make_mesh(data=8),
                                            weights_quant="int8")
    assert isinstance(meshed.params, QuantizedParams)
    # the served tree really is int8 on the mesh (the HBM saving is per
    # replica, not per server)
    gen = meshed.params.params["generator"]["proj"]["kernel"]
    assert np.asarray(gen).dtype == np.int8
    a = single.respond_batch(reqs)
    b = meshed.respond_batch(reqs)

    def toks(rows):
        return [[ans for ans, _ in r.nbest] for r in rows]

    def scores(rows):
        return [s for r in rows for _, s in r.nbest]

    assert toks(a) == toks(b)
    assert scores(a) == pytest.approx(scores(b), abs=1e-5)
    # rank under the quantized dp mesh (batch axis padded to the data
    # size inside ServingSession.rank)
    cands = ["he sits on the couch", "a dog walks", "yes"]
    ra = single.rank(reqs[1], cands)
    rb = meshed.rank(reqs[1], cands)
    assert [c for c, _, _ in ra] == [c for c, _, _ in rb]
    assert [s for _, s, _ in ra] == pytest.approx(
        [s for _, s, _ in rb], abs=1e-5)
    # hot-reload re-quantizes AND re-shards (same weights -> same
    # program -> bitwise-same output as before the reload)
    meshed.reload()
    assert isinstance(meshed.params, QuantizedParams)
    b2 = meshed.respond_batch(reqs)
    assert [r.nbest for r in b2] == [r.nbest for r in b]


@pytest.mark.slow
def test_serving_session_weights_quant_dp_tp_mesh(served):
    """Quantized serving under dp x tp: the column-parallel kernels'
    per-channel scales shard over `model` alongside their kernels; the
    tp session agrees with single-device to f32 collective tolerance."""
    from mtn_tpu.parallel import make_mesh
    from mtn_tpu.serve import Request, ServingSession
    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2, turn_batch=4)
    req = Request(question="is there any audio ?", features=feats)
    single = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                            weights_quant="int8")
    meshed = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                            mesh=make_mesh(data=4, model=2),
                                            weights_quant="int8")
    a = single.respond_batch([req])[0]
    b = meshed.respond_batch([req])[0]
    assert a[0] == b[0]
    assert a[1] == pytest.approx(b[1], abs=1e-4)


def test_bad_weights_quant_rejected():
    from mtn_tpu.serve import ServingSession
    with pytest.raises(ValueError, match="weights_quant"):
        ServingSession(params={}, model_cfg=None, data_cfg=None, vocab={},
                       weights_quant="int4")
