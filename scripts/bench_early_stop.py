"""Device-side A/B of DecodeConfig.early_stop on a trained checkpoint.

Usage: python scripts/bench_early_stop.py <model_prefix[_best]> <test_set>
       [n_batches] [turn_batch]

Loads the checkpoint + real (or synthetic-DSTC7) test data, builds
uniform-shape turn batches exactly like the generate CLI, then times the
compiled beam program with early_stop off vs on — same params, same
batches — and verifies the n-bests are identical. Early termination only
pays when the trained model actually ends answers before maxlen, which
is why this needs a checkpoint rather than random params.

Prints one JSON line:
{"rps_full", "rps_early", "speedup", "steps_full", "steps_early_mean",
 "outputs_identical"}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURN_BATCH = 32
BEAM = 5
MAXLEN = 30
NBEST = 5


def main():
    global TURN_BATCH
    model_arg = sys.argv[1]
    test_set = sys.argv[2]
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    if len(sys.argv) > 4:
        TURN_BATCH = int(sys.argv[4])

    import jax
    from mtn_tpu.cli.generate import _split_model_arg
    from mtn_tpu.config import DecodeConfig, TrainConfig, config_from_dict
    from mtn_tpu.data import load, make_batch_indices
    from mtn_tpu.data.batching import make_batch, uniform_plans
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager

    prefix, epoch = _split_model_arg(model_arg)
    ckpt = CheckpointManager(prefix)
    vocab, conf = ckpt.load_conf()
    model_cfg = config_from_dict("model", conf["model"])
    data_cfg = config_from_dict("data", conf["data"])
    fea_type = data_cfg.fea_type if data_cfg.fea_type and \
        data_cfg.fea_type[0] != "none" else None
    fea_path = data_cfg.train_path
    data = load(fea_type, fea_path, test_set, vocab,
                include_caption=data_cfg.include_caption,
                separate_caption=data_cfg.separate_caption,
                max_history_length=data_cfg.max_history_length,
                merge_source=data_cfg.merge_source,
                undisclosed_only=True)

    plans, _ = make_batch_indices(data, TURN_BATCH, max_length=10 ** 9,
                                  separate_caption=data_cfg.separate_caption)
    # uniform shapes: one compiled program per variant (the CLI's law)
    plans = uniform_plans(plans)[:n_batches]
    batches = []
    for p in plans:
        hb = make_batch(data, p, separate_caption=data_cfg.separate_caption,
                        skip=data_cfg.skip,
                        length_bucket=data_cfg.length_bucket,
                        feature_bucket=data_cfg.feature_bucket,
                        pad_rows_to=TURN_BATCH)
        batches.append(device_batch(hb, model_cfg.dtype))

    trainer = Trainer(model_cfg, TrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    params, used = ckpt.restore_params(state, epoch)
    print(f"# checkpoint epoch {used}, {len(batches)} x {TURN_BATCH}-turn "
          f"batches", file=sys.stderr)

    def run(early):
        dec = BeamDecoder(model_cfg, DecodeConfig(
            maxlen=MAXLEN, beam=BEAM, nbest=NBEST, early_stop=early))
        fn = dec._build_beam().lower(params, batches[0]).compile()
        out = fn(params, batches[0])
        _ = [np.asarray(o) for o in out]              # warmup + fetch
        t0 = time.time()
        outs = [fn(params, b) for b in batches]
        steps = [int(np.asarray(o[3])) for o in outs]  # forces completion
        sec = time.time() - t0
        res = [dec.beam_results(o, b.valid)
               for o, b in zip(outs, batches)]
        return len(batches) * TURN_BATCH / sec, steps, res

    rps_full, steps_full, res_full = run(False)
    rps_early, steps_early, res_early = run(True)
    identical = all(
        a.tokens == b.tokens and np.allclose(a.scores, b.scores, atol=1e-3)
        for ra, rb in zip(res_full, res_early) for a, b in zip(ra, rb))
    print(json.dumps({
        "rps_full": round(rps_full, 1),
        "rps_early": round(rps_early, 1),
        "speedup": round(rps_early / rps_full, 3),
        "steps_full": steps_full[0],
        "steps_early_mean": round(float(np.mean(steps_early)), 1),
        "outputs_identical": bool(identical),
    }))


if __name__ == "__main__":
    main()
