"""A/B of cfg.batched_ae (stacked per-stream QAE chains) on the TPU.

The flagship model runs 2 feature streams; per decoder layer the QAE
chain is 3 attentions + 1 FFN *per stream*, all independent across
streams — ~24 extra kernel dispatches per layer that batched_ae
collapses S-fold into stacked einsum GEMMs (models/mtn.py
``_ae_streams_batched``). BENCH.md's roofline attributes the train-step
MFU gap to "inter-kernel gaps, not slow kernels"
(scripts/profile_step.py is the capture); this is the targeted
experiment that tests whether cutting the dispatch count helps
(VERDICT r3 next #4).

Measures, at the bench.py flagship shapes, sequential vs batched:
- train step throughput (steps/s; jit train_step, donated state),
- fixed-scan beam decode rps (batched_ae also batches the decode-state
  precompute's AE chain),
- token equality of the decoded output between the two variants.

Prints one JSON line:
{"train_sps_seq", "train_sps_batched", "train_speedup",
 "rps_seq", "rps_batched", "decode_speedup", "tokens_identical"}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURN_BATCH, BEAM, MAXLEN, NBEST = 32, 5, 30, 5
SHAPES = dict(Lq=32, Lh=128, Lc=64, La=24, T=(64, 32))
TRAIN_STEPS = 12
N_BATCHES = 6


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig, TrainConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    cfg_seq = _flagship_cfg()
    cfg_bat = dataclasses.replace(cfg_seq, batched_ae=True)
    db = _synthetic_batch(rng, B=TURN_BATCH, Lq=SHAPES["Lq"],
                          Lh=SHAPES["Lh"], Lc=SHAPES["Lc"],
                          La=SHAPES["La"], ft_sizes=cfg_seq.ft_sizes,
                          T=SHAPES["T"])
    out = {}
    params = None
    decoded = {}
    for name, cfg in (("seq", cfg_seq), ("batched", cfg_bat)):
        trainer = Trainer(cfg, TrainConfig(batch_size=TURN_BATCH))
        state = trainer.init_state(jax.random.PRNGKey(0), db)
        if params is None:
            # on-device COPY: train_step donates `state`, so aliasing
            # state.params would hand the beam program deleted buffers
            params = jax.tree.map(jnp.copy, state.params)
        rngk = jax.random.PRNGKey(1)
        state, m = trainer.train_step(state, db, rngk)   # compile
        _ = np.asarray(m["loss"])
        t0 = time.time()
        for _ in range(TRAIN_STEPS):
            state, m = trainer.train_step(state, db, rngk)
        _ = np.asarray(m["loss"])                        # forces completion
        sec = time.time() - t0
        out[f"train_sps_{name}"] = round(TRAIN_STEPS / sec, 2)

        dec = BeamDecoder(cfg, DecodeConfig(maxlen=MAXLEN, beam=BEAM,
                                            nbest=NBEST, early_stop=False))
        fn = dec._build_beam().lower(params, db).compile()
        res = fn(params, db)
        _ = [np.asarray(x) for x in res]                 # warmup
        t0 = time.time()
        outs = [fn(params, db) for _ in range(N_BATCHES)]
        _ = [np.asarray(o[0]) for o in outs]
        sec = time.time() - t0
        out[f"rps_{name}"] = round(TURN_BATCH * N_BATCHES / sec, 1)
        decoded[name] = [r.tokens for r in dec.beam_results(res, db.valid)]
        print(f"# {name}: train {out[f'train_sps_{name}']} steps/s, "
              f"decode {out[f'rps_{name}']} rps", file=sys.stderr)

    out["train_speedup"] = round(
        out["train_sps_batched"] / out["train_sps_seq"], 3)
    out["decode_speedup"] = round(out["rps_batched"] / out["rps_seq"], 3)
    out["tokens_identical"] = decoded["seq"] == decoded["batched"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
