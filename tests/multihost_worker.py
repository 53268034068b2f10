"""Worker process for tests/test_multihost.py.

Joins a 2-process JAX runtime (4 virtual CPU devices each), builds the
global 8-device dp mesh, and runs 3 train steps of the tiny model with
per-host input sharding. The gradient psum GSPMD inserts crosses the
process boundary over the CPU backend's Gloo transport — the same
program shape as dp-over-DCN on a TPU pod (parallel/multihost.py).

Usage: multihost_worker.py <pid> <nprocs> <port> <out.json> [DxM]

The optional mesh spec (default ``8x1``) selects the layout: ``8x1`` is
pure dp across hosts; ``4x2`` is dp-across-hosts × tp-within-host (the
recommended pod layout, parallel/multihost.py).
"""

import json
import os
import sys


def main():
    pid, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    d, m = (int(v) for v in (sys.argv[5] if len(sys.argv) > 5
                             else "8x1").split("x"))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    from mtn_tpu.parallel import multihost
    multihost.initialize_from_flag(f"localhost:{port},{nprocs},{pid}")

    import jax
    import numpy as np
    from mtn_tpu.config import TrainConfig
    from mtn_tpu.parallel import Shardings, make_mesh
    from mtn_tpu.train.trainer import Trainer
    from tests.fixtures import tiny_model_cfg
    from tests.test_model import _random_batch

    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    rng = np.random.default_rng(0)
    db = _random_batch(rng, B=8, ft_dims=(16, 8), vocab=32)
    mesh = make_mesh(data=d, model=m)  # data axis spans both processes
    sh = Shardings(mesh)
    cfg = tiny_model_cfg(32, (16, 8), dropout=0.0, d_model=8, d_ff=16)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10), mesh=mesh, shardings=sh)
    gb = sh.put_batch(db)
    # per-host input sharding really happened: this process only
    # addresses its own half of the batch rows (dedupe the model-axis
    # replicas — each data row appears once per model column)
    spans = {(s.index[0].start or 0,
              8 if s.index[0].stop is None else s.index[0].stop)
             for s in gb.query.addressable_shards}
    n_local_rows = sum(hi - lo for lo, hi in spans)
    assert n_local_rows == 8 // nprocs, spans

    st = tr.init_state(jax.random.PRNGKey(0), gb)
    base = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):
        st, m = tr.train_step(st, gb, base)
        losses.append(float(m["loss"]))
    with open(out, "w") as f:
        json.dump({"pid": pid, "losses": losses}, f)


if __name__ == "__main__":
    main()
