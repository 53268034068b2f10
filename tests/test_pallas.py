"""Pallas fused attention: numerics parity vs the XLA path (interpreter
mode on CPU; the same kernel compiles via Mosaic on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.ops import pallas_attention as pa
from mtn_tpu.ops.attention import sdpa_xla


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pa, "_INTERPRET", True)


def _rand(shape, rng):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("B,H,Lq,Lk,D", [
    (2, 2, 8, 16, 8),
    (1, 4, 16, 16, 16),
    (3, 2, 1, 24, 8),    # single-query (decode-step shape)
])
def test_matches_xla(B, H, Lq, Lk, D):
    rng = np.random.default_rng(0)
    q, k, v = (_rand((B, H, Lq, D), rng), _rand((B, H, Lk, D), rng),
               _rand((B, H, Lk, D), rng))
    mask = jnp.asarray(rng.random((B, 1, Lq, Lk)) > 0.3)
    got = pa.flash_attention(q, k, v, mask)
    want = sdpa_xla(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_key_padding_mask_broadcast():
    rng = np.random.default_rng(1)
    B, H, Lq, Lk, D = 2, 2, 8, 12, 8
    q, k, v = (_rand((B, H, Lq, D), rng), _rand((B, H, Lk, D), rng),
               _rand((B, H, Lk, D), rng))
    mask = jnp.asarray(rng.random((B, 1, 1, Lk)) > 0.3)  # (B,1,1,Lk)
    got = pa.flash_attention(q, k, v, mask)
    want = sdpa_xla(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_no_mask():
    rng = np.random.default_rng(2)
    B, H, L, D = 2, 2, 8, 8
    q, k, v = (_rand((B, H, L, D), rng),) * 3
    got = pa.flash_attention(q, k, v, None)
    want = sdpa_xla(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_xla():
    rng = np.random.default_rng(3)
    B, H, Lq, Lk, D = 1, 2, 8, 8, 8
    q, k, v = (_rand((B, H, Lq, D), rng), _rand((B, H, Lk, D), rng),
               _rand((B, H, Lk, D), rng))
    mask = jnp.asarray(rng.random((B, 1, Lq, Lk)) > 0.2)

    def loss_pallas(q, k, v):
        return jnp.sum(pa.flash_attention(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, mask) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_supports_gate():
    assert pa.supports((2, 8, 64, 64), (2, 8, 128, 64), jnp.float32)
    assert not pa.supports((2, 8, 4096, 64), (2, 8, 4096, 64), jnp.float32)
    assert not pa.supports((2, 8, 64), (2, 8, 64), jnp.float32)


def test_model_with_pallas_matches(monkeypatch):
    """Whole-model forward with use_pallas_attention=True (interpret) must
    match the XLA path."""
    import mtn_tpu.ops.attention as attn_mod
    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.train.batch import batch_masks
    from tests.fixtures import tiny_model_cfg
    from tests.test_model import _random_batch, PAD
    rng = np.random.default_rng(4)
    db = _random_batch(rng)
    # use_pallas_ffn off on both: this test isolates the attention kernel
    # (the default_backend patch above would otherwise engage the FFN
    # kernel non-interpreted on CPU)
    cfg_x = tiny_model_cfg(30, (12, 8), dropout=0.0, use_pallas_ffn=False)
    cfg_p = tiny_model_cfg(30, (12, 8), dropout=0.0, use_pallas_ffn=False,
                           use_pallas_attention=True)
    masks, tgt_mask = batch_masks(db, PAD)
    model_x, model_p = MTN(cfg_x), MTN(cfg_p)
    params = model_x.init({"params": jax.random.PRNGKey(0)}, db.query,
                          db.his, db.cap, db.fts, masks, db.answer_in,
                          tgt_mask, method=MTN.init_all)["params"]
    out_x, _ = model_x.apply({"params": params}, db.query, db.his, db.cap,
                             db.fts, masks, db.answer_in, tgt_mask,
                             deterministic=True)
    out_p, _ = model_p.apply({"params": params}, db.query, db.his, db.cap,
                             db.fts, masks, db.answer_in, tgt_mask,
                             deterministic=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=5e-5)
