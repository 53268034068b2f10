"""Fused Pallas FFN: numerics parity vs XLA (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.ops import pallas_ffn as pf


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pf, "_INTERPRET", True)


def _mats(rng, N, D, F, dtype=np.float32):
    x = rng.standard_normal((N, D)).astype(dtype)
    w1 = rng.standard_normal((D, F)).astype(dtype)
    b1 = rng.standard_normal((F,)).astype(dtype)
    w2 = rng.standard_normal((F, D)).astype(dtype)
    b2 = rng.standard_normal((D,)).astype(dtype)
    return map(jnp.asarray, (x, w1, b1, w2, b2))


@pytest.mark.parametrize("N", [8, 256, 300])  # incl. a non-block-multiple
def test_matches_xla(N):
    rng = np.random.default_rng(0)
    x, w1, b1, w2, b2 = _mats(rng, N, 16, 32)
    # call the kernel directly: the fused_ffn dispatch gate only takes
    # single-block row counts (where it measured faster), but the kernel
    # itself must stay correct for any N incl. the looping grid
    got = pf._fused(x, w1, b1, w2, b2)
    want = pf._xla_ffn(x, w1, b1, w2, b2)
    assert got.shape == (N, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_dispatch_gate_rows():
    """supports() takes single-block row counts only (measured policy)."""
    assert pf.supports(160, 512, 2048, 2)
    assert pf.supports(256, 512, 2048, 2)
    assert not pf.supports(257, 512, 2048, 2)
    assert not pf.supports(1056, 512, 2048, 2)


def test_3d_input():
    rng = np.random.default_rng(1)
    x, w1, b1, w2, b2 = _mats(rng, 12, 16, 32)
    x3 = x.reshape(3, 4, 16)
    got = pf.fused_ffn(x3, w1, b1, w2, b2)
    want = pf._xla_ffn(x, w1, b1, w2, b2).reshape(3, 4, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    x, w1, b1, w2, b2 = _mats(rng, 8, 16, 32)
    f_p = lambda *a: jnp.sum(pf.fused_ffn(*a) ** 2)
    f_x = lambda *a: jnp.sum(pf._xla_ffn(*a) ** 2)
    g1 = jax.grad(f_p, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(f_x, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_model_with_pallas_ffn_matches():
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.train.batch import batch_masks
    from tests.fixtures import tiny_model_cfg
    from tests.test_model import _random_batch, PAD
    rng = np.random.default_rng(3)
    db = _random_batch(rng)
    cfg_x = tiny_model_cfg(30, (12, 8), dropout=0.0, use_pallas_ffn=False)
    cfg_p = tiny_model_cfg(30, (12, 8), dropout=0.0, use_pallas_ffn=True)
    masks, tgt_mask = batch_masks(db, PAD)
    mx, mp = MTN(cfg_x), MTN(cfg_p)
    params = mx.init({"params": jax.random.PRNGKey(0)}, db.query, db.his,
                     db.cap, db.fts, masks, db.answer_in, tgt_mask,
                     method=MTN.init_all)["params"]
    ox, _ = mx.apply({"params": params}, db.query, db.his, db.cap, db.fts,
                     masks, db.answer_in, tgt_mask, deterministic=True)
    op, _ = mp.apply({"params": params}, db.query, db.his, db.cap, db.fts,
                     masks, db.answer_in, tgt_mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox), atol=5e-5)
