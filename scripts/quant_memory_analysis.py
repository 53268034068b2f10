"""Did int8 weights actually cut the decode program's HBM reads?

scripts/bench_quant.py measured int8 ~parity (0.98x) with f32. Two
readings are consistent with that number:

(a) the convert(s8->f32) is fused into the dot's weight read — HBM
    traffic really dropped 4x and the step is NOT weight-read-bound
    (the roofline hypothesis of docs/BENCH.md is falsified), or
(b) XLA hoisted the loop-invariant convert out of the decode scan and
    materialized the dequantized f32 kernels in a temp buffer — the
    per-step traffic never changed and the A/B tested nothing.

The two are distinguishable without a profiler: (b) needs a ~400 MB
f32 temp resident for the whole call, (a) does not. This script
compiles the SAME beam program (flagship bench shapes, synthetic
params) for f32 and int8 weights and prints each compile's
``memory_analysis()`` — argument vs temp bytes. Prints one JSON line:
{"f32_arg_mb", "f32_temp_mb", "int8_arg_mb", "int8_temp_mb",
 "verdict": "fused" | "hoisted"}.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURN_BATCH, BEAM, MAXLEN, NBEST = 32, 5, 30, 5
SHAPES = dict(Lq=32, Lh=128, Lc=64, La=24, T=(64, 32))


def main():
    import jax

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig, TrainConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.quantize import quantize_params

    rng = np.random.default_rng(0)
    cfg = _flagship_cfg()
    db = _synthetic_batch(rng, B=TURN_BATCH, Lq=SHAPES["Lq"],
                          Lh=SHAPES["Lh"], Lc=SHAPES["Lc"],
                          La=SHAPES["La"], ft_sizes=cfg.ft_sizes,
                          T=SHAPES["T"])
    trainer = Trainer(cfg, TrainConfig(batch_size=TURN_BATCH))
    state = trainer.init_state(jax.random.PRNGKey(0), db)
    params = state.params
    qparams = quantize_params(params)

    dec = BeamDecoder(cfg, DecodeConfig(maxlen=MAXLEN, beam=BEAM,
                                        nbest=NBEST, early_stop=False))
    out = {}
    for name, p in (("f32", params), ("int8", qparams)):
        compiled = dec._build_beam().lower(p, db).compile()
        ma = compiled.memory_analysis()
        out[f"{name}_arg_mb"] = round(ma.argument_size_in_bytes / 1e6, 1)
        out[f"{name}_temp_mb"] = round(ma.temp_size_in_bytes / 1e6, 1)
        print(f"# {name}: arg {out[f'{name}_arg_mb']} MB, "
              f"temp {out[f'{name}_temp_mb']} MB", file=sys.stderr)

    # hoisting the dequant needs a temp of roughly the int8 kernels'
    # f32 size (~4x the int8 arg-size drop); half that is the signal
    arg_drop = out["f32_arg_mb"] - out["int8_arg_mb"]
    temp_growth = out["int8_temp_mb"] - out["f32_temp_mb"]
    out["verdict"] = "hoisted" if temp_growth > max(
        0.5 * arg_drop, 10.0) else "fused"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
