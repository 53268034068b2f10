"""Masks, positional encodings, LayerNorm/attention numerics (vs torch
formulas), label-smoothed KL (vs torch KLDivLoss), Noam schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mtn_tpu.ops.masks import causal_mask, length_mask, pad_mask, target_mask
from mtn_tpu.ops.positional import sinusoidal_table
from mtn_tpu.ops.attention import sdpa_xla
from mtn_tpu.train.loss import label_smoothed_kl
from mtn_tpu.train.schedule import noam_rate, noam_schedule


def test_pad_and_target_masks():
    seq = jnp.array([[2, 5, 6, 1, 1], [2, 5, 1, 1, 1]])
    m = pad_mask(seq, pad=1)
    assert m.shape == (2, 1, 5)
    assert m[0, 0].tolist() == [True, True, True, False, False]
    tm = target_mask(seq, pad=1)
    assert tm.shape == (2, 5, 5)
    assert tm[0, 0].tolist() == [True, False, False, False, False]
    assert tm[0, 2].tolist() == [True, True, True, False, False]
    assert tm[0, 4].tolist() == [True, True, True, False, False]  # pad row


def test_length_mask():
    m = length_mask(jnp.array([2, 0]), 4)
    assert m[0, 0].tolist() == [True, True, False, False]
    assert m[1, 0].tolist() == [False] * 4


def test_sinusoidal_table_matches_torch_formula():
    import math
    d, L = 16, 50
    pe = np.asarray(sinusoidal_table(L, d))
    ref = torch.zeros(L, d)
    position = torch.arange(0., L).unsqueeze(1)
    div_term = torch.exp(torch.arange(0., d, 2) * -(math.log(10000.0) / d))
    ref[:, 0::2] = torch.sin(position * div_term)
    ref[:, 1::2] = torch.cos(position * div_term)
    np.testing.assert_allclose(pe, ref.numpy(), atol=1e-6)


def test_ref_layernorm_matches_torch():
    from mtn_tpu.models.layers import RefLayerNorm
    x = np.random.default_rng(0).standard_normal((3, 5, 32)).astype(np.float32)
    ln = RefLayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = ln.apply(params, jnp.asarray(x))
    xt = torch.tensor(x)
    # reference formula (mtn.py:111-114): unbiased std, divide by std+eps
    mean = xt.mean(-1, keepdim=True)
    std = xt.std(-1, keepdim=True)
    ref = (xt - mean) / (std + 1e-6)
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_sdpa_matches_torch():
    rng = np.random.default_rng(1)
    B, H, Lq, Lk, D = 2, 2, 4, 6, 8
    q = rng.standard_normal((B, H, Lq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Lk, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Lk, D)).astype(np.float32)
    mask = rng.random((B, 1, Lq, Lk)) > 0.3
    out = sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(mask))
    qt, kt, vt = map(torch.tensor, (q, k, v))
    scores = qt @ kt.transpose(-2, -1) / np.sqrt(D)
    scores = scores.masked_fill(torch.tensor(~mask), -1e9)
    ref = F.softmax(scores, dim=-1) @ vt
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_label_smoothed_kl_matches_torch_kldiv():
    rng = np.random.default_rng(2)
    N, V, pad, smoothing = 7, 11, 1, 0.1
    logits = rng.standard_normal((N, V)).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
    targets = np.array([4, 5, pad, 6, 7, pad, 8], dtype=np.int32)
    got = float(label_smoothed_kl(jnp.asarray(logp), jnp.asarray(targets),
                                  pad, smoothing))
    # independent torch construction of the smoothed distribution
    # (label_smoothing.py:20-32)
    x = torch.tensor(logp)
    td = torch.full((N, V), smoothing / (V - 2))
    td.scatter_(1, torch.tensor(targets, dtype=torch.int64).unsqueeze(1),
                1.0 - smoothing)
    td[:, pad] = 0
    td[torch.tensor(targets, dtype=torch.int64) == pad] = 0
    ref = F.kl_div(x, td, reduction="sum")
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_label_smoothed_kl_zero_when_all_pad():
    logp = jnp.log(jnp.full((3, 5), 0.2))
    assert float(label_smoothed_kl(logp, jnp.array([1, 1, 1]), 1, 0.1)) == 0.0


def test_noam_rate_closed_form():
    # rate = factor * d^-0.5 * min(step^-0.5, step * warmup^-1.5)
    d, w = 512, 4000
    for step in (1, 100, 4000, 10000):
        got = float(noam_rate(step, d, w))
        want = d ** -0.5 * min(step ** -0.5, step * w ** -1.5)
        assert got == pytest.approx(want, rel=1e-5)  # float32 schedule math
    # schedule shifts optax count by one (first update uses step=1)
    sched = noam_schedule(d, w)
    assert float(sched(0)) == pytest.approx(float(noam_rate(1, d, w)))
    # warmup peak at step == warmup
    rates = [float(noam_rate(s, d, w)) for s in (3999, 4000, 4001)]
    assert rates[1] >= rates[0] and rates[1] >= rates[2]


def test_grad_clip_optimizer():
    """make_optimizer(grad_clip=c): updates equal plain Adam applied to
    grads rescaled to global norm c; clip off (or above the norm) is
    bit-identical to the unclipped optimizer (and keeps its opt_state
    structure, so default-run checkpoints are unaffected)."""
    import jax
    from mtn_tpu.train.schedule import make_optimizer

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    grads = {"w": jnp.full((3, 2), 4.0), "b": jnp.full((2,), 3.0)}
    gnorm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in
                               jax.tree.leaves(grads))))
    plain = make_optimizer(512, 4000)
    clipped = make_optimizer(512, 4000, grad_clip=1.0)

    # state structure: plain stays the optax.adam tuple
    s_plain = plain.init(params)
    s_clip = clipped.init(params)
    assert jax.tree.structure(s_plain) != jax.tree.structure(s_clip)

    u_clip, _ = clipped.update(grads, s_clip, params)
    scaled = jax.tree.map(lambda g: g / gnorm, grads)  # norm 4 -> 1
    u_want, _ = plain.update(scaled, plain.init(params), params)
    for a, b in zip(jax.tree.leaves(u_clip), jax.tree.leaves(u_want)):
        assert jnp.allclose(a, b, rtol=1e-6)

    # clip above the actual norm: identical to no clipping at all
    loose = make_optimizer(512, 4000, grad_clip=100.0)
    u_loose, _ = loose.update(grads, loose.init(params), params)
    u_plain, _ = plain.update(grads, plain.init(params), params)
    for a, b in zip(jax.tree.leaves(u_loose), jax.tree.leaves(u_plain)):
        assert jnp.array_equal(a, b)


def test_early_stopper():
    from mtn_tpu.train.trainer import EarlyStopper

    # patience 2: stops after two consecutive non-improving epochs
    s = EarlyStopper(2)
    assert not s.update(3.0)
    assert not s.update(2.0)       # improved
    assert not s.update(2.5)       # 1 bad
    assert s.update(2.1)           # 2 bad -> stop
    # an improvement resets the counter; ties do NOT count as improvement
    s = EarlyStopper(2)
    assert not s.update(2.0)
    assert not s.update(2.5)       # 1 bad
    assert not s.update(1.9)       # reset
    assert not s.update(1.9)       # tie -> 1 bad
    assert s.update(1.9)           # 2 bad -> stop
    # patience 0 never stops (reference behavior: full num_epochs)
    s = EarlyStopper(0)
    assert not any(s.update(v) for v in (3.0, 4.0, 5.0, 6.0))


def test_early_stopper_seed_from_meta():
    """--resume continuity: patience counting picks up from the
    checkpoint's persisted best pointer instead of restarting at zero."""
    from mtn_tpu.train.trainer import EarlyStopper

    meta = {"best_loss": 2.0, "best_epoch": 2, "epochs": [1, 2, 3, 4]}
    s = EarlyStopper(3)
    s.seed_from_meta(meta, start_epoch=4)  # epochs 3,4 were non-improving
    assert s.best == 2.0 and s.bad_epochs == 2
    assert s.update(2.3)                   # 3rd bad epoch -> stop

    # resuming from the best epoch itself: no bad epochs yet
    s = EarlyStopper(3)
    s.seed_from_meta(meta, start_epoch=2)
    assert s.bad_epochs == 0
    # a fresh run (no best recorded) is untouched
    s = EarlyStopper(3)
    s.seed_from_meta({}, start_epoch=0)
    assert s.best == float("inf") and s.bad_epochs == 0
    # an improvement after resume still resets and tracks the new best
    s = EarlyStopper(2)
    s.seed_from_meta(meta, start_epoch=4)
    assert not s.update(1.5)
    assert s.best == 1.5 and s.bad_epochs == 0
