"""Gradient accumulation: the Trainer's scan-accumulated update must
equal the one-big-batch update exactly (macro-batch normalizers in
mtn_loss), and blank filler microbatches must be no-ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtn_tpu.config import TrainConfig
from mtn_tpu.data import get_vocabulary, load, make_batch_indices
from mtn_tpu.data.batching import make_batch
from mtn_tpu.train.batch import (blank_like, device_batch, stack_batches)
from mtn_tpu.train.trainer import Trainer
from tests.fixtures import tiny_model_cfg


@pytest.fixture(scope="module")
def ds(tiny_corpus):
    v = get_vocabulary(tiny_corpus.train_set, cutoff=0,
                       include_caption="caption,summary")
    return load(tiny_corpus.fea_types, tiny_corpus.fea_path,
                tiny_corpus.train_set, v, include_caption="caption,summary",
                separate_caption=True)


@pytest.fixture(scope="module")
def setup(ds):
    import dataclasses
    plans, _ = make_batch_indices(ds, 4, 64, separate_caption=True)
    big = device_batch(make_batch(ds, plans[0], separate_caption=True))
    assert big.query.shape[0] >= 4
    # all dropout off (incl. the reference-fixed 0.1 attention dropout):
    # accumulation draws different dropout masks than one big batch, so
    # exact equivalence is only defined for the deterministic program
    cfg = dataclasses.replace(
        tiny_model_cfg(len(ds.vocab), ds.feature_dims(), dropout=0.0),
        attn_dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), big)
    return tr, st, big


def _clone(st):
    return jax.tree.map(jnp.array, st)


def _assert_states_close(a, b, rtol=1e-4, atol=1e-6):
    assert int(a.step) == int(b.step)
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


def test_accum_two_micro_equals_big_batch(setup):
    """Sum of microbatch losses/grads == one-big-batch loss/grads.

    Post-Adam params are NOT compared across the two programs: after a
    single optimizer step Adam's update is ~lr·sign(grad) elementwise,
    so fp-reassociation noise on near-zero grads flips signs and yields
    O(lr) param deltas — the mathematically meaningful equivalence is at
    the loss/gradient level (the blank-tail test covers the full update
    path bitwise, where the fp op order is identical)."""
    import operator
    tr, st, big = setup
    B = big.query.shape[0]
    h = B // 2
    lo = jax.tree.map(lambda x: x[:h], big)
    hi = jax.tree.map(lambda x: x[h:2 * h], big)
    big2 = jax.tree.map(lambda x: x[:2 * h], big)
    rng = jax.random.PRNGKey(3)

    _, m_big = tr.train_step(_clone(st), big2, rng)
    _, m_acc = tr.train_step_accum(_clone(st), stack_batches([lo, hi]), rng)
    assert float(m_acc["ntokens"]) == float(m_big["ntokens"])
    assert float(m_acc["loss"]) == pytest.approx(float(m_big["loss"]),
                                                 rel=1e-5)

    pad = tr.pad
    ntok = jnp.maximum(
        jnp.sum(big2.answer_out != pad).astype(jnp.float32), 1.0)
    ae_t = (big2.cap if tr.model_cfg.auto_encoder_ft in
            ("caption", "summary") else big2.query)
    ae_ntok = jnp.maximum(jnp.sum(ae_t != pad).astype(jnp.float32), 1.0)
    gfn = jax.jit(jax.grad(
        lambda p, b: tr._loss_fn(p, b, None, True, (ntok, ae_ntok))[0]))
    g_big = gfn(st.params, big2)
    g_acc = jax.tree.map(operator.add, gfn(st.params, lo),
                         gfn(st.params, hi))
    for a, b in zip(jax.tree.leaves(g_big), jax.tree.leaves(g_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_accum_blank_tail_is_noop(setup):
    tr, st, big = setup
    rng = jax.random.PRNGKey(3)
    st_plain, m_plain = tr.train_step(_clone(st), big, rng)
    st_acc, m_acc = tr.train_step_accum(
        _clone(st), stack_batches([big, blank_like(big)]), rng)
    assert float(m_acc["ntokens"]) == float(m_plain["ntokens"])
    assert float(m_acc["loss"]) == pytest.approx(float(m_plain["loss"]),
                                                 rel=1e-5)
    _assert_states_close(st_plain, st_acc)


def test_remat_identical_loss_and_grads(setup, ds):
    """cfg.remat recomputes decoder activations in backward — same param
    tree, same loss, same gradients as the stored-activation program."""
    import dataclasses
    tr, st, big = setup
    cfg_r = dataclasses.replace(tr.model_cfg, remat=True)
    tr_r = Trainer(cfg_r, TrainConfig(warmup_steps=10))
    st_r = tr_r.init_state(jax.random.PRNGKey(0), big)
    assert (jax.tree_util.tree_structure(st.params)
            == jax.tree_util.tree_structure(st_r.params))

    def loss_and_grads(t, params):
        fn = jax.jit(jax.value_and_grad(
            lambda p: t._loss_fn(p, big, None, True)[0]))
        return fn(params)

    l0, g0 = loss_and_grads(tr, st.params)
    l1, g1 = loss_and_grads(tr_r, st.params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # and a full (dropout-active) train step runs under remat
    st2, m = tr_r.train_step(_clone(st_r), big, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"]))


def test_accumulated_grouper_shapes_and_tail(setup):
    from mtn_tpu.train.batch import accumulated
    _, _, big = setup
    groups = list(accumulated([big, big, big], 2, lambda hb: hb))
    assert len(groups) == 2
    assert groups[0].query.shape[0] == 2
    # ragged tail completed with a blank filler: zero valid rows
    assert not bool(np.asarray(groups[1].valid[1]).any())
