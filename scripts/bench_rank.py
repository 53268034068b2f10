"""Throughput of the discriminative ranking mode (BeamDecoder.rank_batch).

VisDial protocol shapes: 100 answer options per turn (reference
readme.md:81-86), flagship model, DSTC7-scale context. The rank program
tiles each turn's encoder state over its options and scans the cached
one-token decode step over the (bucketed) candidate length, so the
device batch is turn_batch x n_options rows — far higher arithmetic
intensity per step than the beam's turn_batch x 5.

Prints options/sec and turns/sec per (turn_batch, N, L) point. Timing
forces device-to-host fetches (relay law, docs/DESIGN.md).

Usage: python scripts/bench_rank.py   (real TPU, axon env)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_OPTIONS = 100     # the VisDial protocol's option count
OPT_LEN = 8         # answer length in tokens (DSTC7 answers average ~9)
N_BATCHES = 4
TURN_BATCHES = (4, 8, 16)


def main():
    import jax

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.batch import batch_masks

    cfg = _flagship_cfg()
    rng = np.random.default_rng(0)

    for tb in TURN_BATCHES:
      try:
        from mtn_tpu.models.mtn import MTN
        model = MTN(cfg)
        db = _synthetic_batch(rng, B=tb, Lq=32, Lh=128, Lc=64, La=24,
                              ft_sizes=cfg.ft_sizes, T=(64, 32))
        masks, tgt_mask = batch_masks(db, 1)
        params = jax.jit(lambda r, db=db, masks=masks, tgt_mask=tgt_mask:
                         model.init({"params": r}, db.query, db.his, db.cap,
                                    db.fts, masks, db.answer_in, tgt_mask,
                                    method=MTN.init_all)["params"])(
                             jax.random.PRNGKey(0))
        dec = BeamDecoder(cfg, DecodeConfig(turn_batch=tb))
        cands = [[list(rng.integers(4, cfg.vocab_size, size=OPT_LEN))
                  for _ in range(N_OPTIONS)] for _ in range(tb)]
        t0 = time.time()
        out = dec.rank_batch(params, db, cands)   # compile + run
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(N_BATCHES):
            out = dec.rank_batch(params, db, cands)
        sec = time.time() - t0
        n_turns = tb * N_BATCHES
        n_opts = n_turns * N_OPTIONS
        print(f"turn_batch {tb:3d}: {n_opts / sec:8.1f} options/sec "
              f"({n_turns / sec:6.2f} turns/sec, 100 options x "
              f"{OPT_LEN} tok, compile {compile_s:.0f}s)", flush=True)
      except Exception as e:  # e.g. HBM exhaustion at large tile counts
        print(f"turn_batch {tb:3d}: failed — {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
