"""Mesh/sharding tests on the virtual 8-device CPU mesh.

Validates: dp-sharded training matches single-device numerics, tp rules
produce sharded params, and the dp×tp train step runs under GSPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mtn_tpu.config import TrainConfig
from mtn_tpu.parallel import Shardings, make_mesh
from mtn_tpu.train.trainer import Trainer
from tests.fixtures import tiny_model_cfg
from tests.test_model import _random_batch


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data axis
    assert mesh.shape["data"] == len(jax.devices())


def _trained_loss(mesh, shardings, db, steps=3):
    cfg = tiny_model_cfg(32, (16, 8), dropout=0.0, d_model=8, d_ff=16)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10), mesh=mesh,
                 shardings=shardings)
    if shardings is not None:
        db = shardings.put_batch(db)
    st = tr.init_state(jax.random.PRNGKey(0), db)
    base = jax.random.PRNGKey(1)
    for _ in range(steps):
        st, m = tr.train_step(st, db, base)
    return float(m["loss"])


def test_dp_matches_single_device():
    rng = np.random.default_rng(0)
    db = _random_batch(rng, B=8, ft_dims=(16, 8), vocab=32)
    loss_single = _trained_loss(None, None, db)
    mesh = make_mesh(data=8, model=1)
    loss_dp = _trained_loss(mesh, Shardings(mesh), db)
    assert loss_dp == pytest.approx(loss_single, rel=2e-4)


def test_dp_tp_runs_and_matches():
    rng = np.random.default_rng(0)
    db = _random_batch(rng, B=8, ft_dims=(16, 8), vocab=32)
    loss_single = _trained_loss(None, None, db)
    mesh = make_mesh(data=4, model=2)
    loss_tp = _trained_loss(mesh, Shardings(mesh), db)
    assert loss_tp == pytest.approx(loss_single, rel=2e-3)


def test_param_specs_applied():
    mesh = make_mesh(data=4, model=2)
    sh = Shardings(mesh)
    rng = np.random.default_rng(0)
    db = _random_batch(rng, B=8, ft_dims=(16, 8), vocab=32)
    cfg = tiny_model_cfg(32, (16, 8), d_model=8, d_ff=16, dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10), mesh=mesh, shardings=sh)
    st = tr.init_state(jax.random.PRNGKey(0), sh.put_batch(db))
    specs = sh.tree_specs(st.params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {"/".join(str(getattr(k, "key", k)) for k in path): spec
               for path, spec in flat}
    assert any(spec == P(None, "model") for name, spec in by_name.items()
               if "w_1/kernel" in name)
    assert any(spec == P("model", None) for name, spec in by_name.items()
               if "w_2/kernel" in name)
    assert any(spec == P("model", None) for name, spec in by_name.items()
               if "lut/embedding" in name)
    # actually sharded on device
    p = st.params["decoder"]["layer_0"]["ff"]["w_1"]["kernel"]
    assert p.sharding.spec == P(None, "model")


def test_beam_decode_under_dp_mesh():
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.decode.beam import BeamDecoder
    rng = np.random.default_rng(2)
    db = _random_batch(rng, B=8, ft_dims=(16, 8), vocab=32)
    cfg = tiny_model_cfg(32, (16, 8), d_model=8, d_ff=16, dropout=0.0)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10))
    st = tr.init_state(jax.random.PRNGKey(0), db)
    fast = BeamDecoder(cfg, DecodeConfig(maxlen=4, beam=2, nbest=2))
    base = fast.beam_batch(st.params, db)
    mesh = make_mesh(data=8, model=1)
    dec = BeamDecoder(cfg, DecodeConfig(maxlen=4, beam=2, nbest=2), mesh=mesh)
    sh = Shardings(mesh)
    res = dec.beam_batch(st.params, sh.put_batch(db))
    for a, b in zip(base, res):
        assert a.tokens == b.tokens


def test_put_host_batch_matches_put_batch():
    """put_host_batch (host→global slab upload, the multi-process path
    of to_device_fn) must produce arrays identical to
    put_batch(device_batch(hb)) — same shardings, same values — for
    plain f32, bf16, and the int8 feature transfer."""
    from mtn_tpu.data.batching import HostBatch
    from mtn_tpu.train.batch import device_batch
    rng = np.random.default_rng(3)
    B = 8
    hb = HostBatch(
        query=rng.integers(1, 30, (B, 5)).astype(np.int32),
        his=rng.integers(1, 30, (B, 7)).astype(np.int32),
        answer_in=rng.integers(1, 30, (B, 4)).astype(np.int32),
        answer_out=rng.integers(1, 30, (B, 4)).astype(np.int32),
        cap=None,
        fts=[rng.standard_normal((B, 4, 16)).astype(np.float32),
             rng.standard_normal((B, 3, 8)).astype(np.float32)],
        fts_len=[np.full((B,), 4, np.int32), np.full((B,), 3, np.int32)],
        valid=np.ones((B,), bool))
    mesh = make_mesh(data=4, model=2)
    sh = Shardings(mesh)
    for dt in ("float32", "bfloat16", "int8"):
        a = sh.put_batch(device_batch(hb, dt))
        b = sh.put_host_batch(hb, dt)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            assert x.shape == y.shape and x.dtype == y.dtype
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert b.query.sharding.spec == P("data", None)
        assert b.fts[0].sharding.spec == P("data", None, None)
