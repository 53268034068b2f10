"""A/B the training memory knobs on the real TPU at flagship shapes.

Measures, in one process (same-run controls):
  1. baseline train step (batch 32)       — control
  2. remat train step (batch 32)          — ModelConfig.remat=1 cost
  3. accum step (8 x batch 32)            — one update from 256 samples
     with batch-32 activation memory (vs the documented plain batch-256
     row in docs/BENCH.md's batch->MFU curve)

Also reports device memory_stats() peaks where the transport exposes
them. Timings force device-to-host fetches (relay transport — see
docs/DESIGN.md "Benchmark integrity").
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

TRAIN_BATCH = 32
ACCUM = 8
STEPS = 10


def _mem_peak():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", 0))
    except Exception:
        return None


def _time_steps(compiled, state, tdb, rng, n):
    state, m = compiled(state, tdb, rng)  # warmup (donates old state)
    _ = np.asarray(m["loss"])
    t0 = time.time()
    for _ in range(n):
        state, m = compiled(state, tdb, rng)
    _ = np.asarray(m["loss"])
    return time.time() - t0


def main():
    import jax
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import TrainConfig
    from mtn_tpu.train.batch import stack_batches
    from mtn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    base_cfg = _flagship_cfg()
    rows = {}

    def bench(name, cfg, accum=1):
        tdb = _synthetic_batch(rng, B=TRAIN_BATCH, Lq=32, Lh=128, Lc=64,
                               La=24, ft_sizes=cfg.ft_sizes, T=(64, 32))
        trainer = Trainer(cfg, TrainConfig(warmup_steps=9660))
        state = trainer.init_state(jax.random.PRNGKey(1), tdb)
        key = jax.random.PRNGKey(2)
        if accum > 1:
            micros = []
            for i in range(accum):
                micros.append(dataclasses.replace(
                    tdb, query=tdb.query.at[:, 1].set(4 + i)))
            batch = stack_batches(micros)
            step = trainer._build_accum_step()
        else:
            batch = tdb
            step = trainer._build_train_step()
        compiled = step.lower(state, batch, key).compile()
        sec = _time_steps(compiled, state, batch, key, STEPS)
        samples = TRAIN_BATCH * accum * STEPS / sec
        rows[name] = {
            "steps_per_sec": round(STEPS / sec, 2),
            "samples_per_sec": round(samples, 1),
            "peak_bytes": _mem_peak(),
        }
        print(name, rows[name], flush=True)

    bench("baseline_b32", base_cfg)
    bench("remat_b32", dataclasses.replace(base_cfg, remat=True))
    bench("accum8_b32", base_cfg, accum=ACCUM)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
