"""Device-side A/B of weight-only int8 decode (mtn_tpu/utils/quantize.py)
on a trained checkpoint.

Usage: python scripts/bench_quant.py <model_prefix[_best]> <test_set>
       [n_batches] [turn_batch]

The roofline question this answers (VERDICT r3 next #1, docs/BENCH.md
"MFU and the roofline"): the beam step's arithmetic intensity sits just
below the v5e ridge — HBM-bound on weight reads — and the only byte-
cutting experiment previously run was bf16-*resident* weights (a layout
change, 0.80x). int8 weights + per-channel scales cut the weight bytes
4x vs f32-resident with the dequant fused into the matmul read. This
script measures, on the SAME trained params and batches:

- fixed-maxlen-scan device rps: f32-resident vs int8 (the cross-round
  comparable program, same as bench.py's rps_fixed_maxlen), and the
  shipped early-stop program for both;
- output fidelity: per-turn top-1 answer token agreement and full
  n-best agreement between int8 and f32 decodes;
- weight-byte accounting (int8 vs float bytes in the param tree).

Prints one JSON line:
{"rps_f32", "rps_int8", "speedup", "rps_f32_early", "rps_int8_early",
 "speedup_early", "top1_agree", "nbest_agree", "int8_mbytes",
 "float_mbytes"}
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
    from mtn_tpu.utils.quantize import quantize_params, quantized_size_bytes

    prefix, epoch = _split_model_arg(model_arg)
    ckpt = CheckpointManager(prefix)
    vocab, conf = ckpt.load_conf()
    model_cfg = config_from_dict("model", conf["model"])
    data_cfg = config_from_dict("data", conf["data"])
    fea_type = data_cfg.fea_type if data_cfg.fea_type and \
        data_cfg.fea_type[0] != "none" else None
    data = load(fea_type, data_cfg.train_path, test_set, vocab,
                include_caption=data_cfg.include_caption,
                separate_caption=data_cfg.separate_caption,
                max_history_length=data_cfg.max_history_length,
                merge_source=data_cfg.merge_source,
                undisclosed_only=True)

    plans, _ = make_batch_indices(data, TURN_BATCH, max_length=10 ** 9,
                                  separate_caption=data_cfg.separate_caption)
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
    qparams = quantize_params(params)
    sizes = quantized_size_bytes(qparams)
    print(f"# checkpoint epoch {used}, {len(batches)} x {TURN_BATCH}-turn "
          f"batches; int8 {sizes['int8'] / 1e6:.1f} MB, float "
          f"{sizes['other'] / 1e6:.1f} MB", file=sys.stderr)

    def run(p, early):
        dec = BeamDecoder(model_cfg, DecodeConfig(
            maxlen=MAXLEN, beam=BEAM, nbest=NBEST, early_stop=early))
        fn = dec._build_beam().lower(p, batches[0]).compile()
        out = fn(p, batches[0])
        _ = [np.asarray(o) for o in out]              # warmup + fetch
        t0 = time.time()
        outs = [fn(p, b) for b in batches]
        _ = [np.asarray(o[0]) for o in outs]          # force completion
        sec = time.time() - t0
        res = [dec.beam_results(o, b.valid) for o, b in zip(outs, batches)]
        return len(batches) * TURN_BATCH / sec, res

    variants = [("f32", params), ("int8", qparams)]
    if "--fp-head" in sys.argv:
        # fidelity knob: generator head kept full precision
        variants.append(("int8_fp_head",
                         quantize_params(params, skip_generator=True)))
    out = {}
    res_by = {}
    for name, p in variants:
        rps, res = run(p, early=False)
        rps_early, _ = run(p, early=True)
        out[f"rps_{name}"] = round(rps, 1)
        out[f"rps_{name}_early"] = round(rps_early, 1)
        res_by[name] = res
        print(f"# {name}: fixed {rps:.1f} rps, early {rps_early:.1f} rps",
              file=sys.stderr)

    # fidelity: compare each quantized variant vs f32, n-bests turn by turn
    for name in res_by:
        if name == "f32":
            continue
        top1 = nbest = total = 0
        for rf, rq in zip(res_by["f32"], res_by[name]):
            for bf, bq in zip(rf, rq):
                total += 1
                top1 += int(bf.tokens[0] == bq.tokens[0])
                nbest += int(bf.tokens == bq.tokens)
        suff = "" if name == "int8" else "_fp_head"
        out.update({
            f"speedup{suff}": round(out[f"rps_{name}"] / out["rps_f32"], 3),
            f"speedup_early{suff}": round(
                out[f"rps_{name}_early"] / out["rps_f32_early"], 3),
            f"top1_agree{suff}": round(top1 / max(total, 1), 4),
            f"nbest_agree{suff}": round(nbest / max(total, 1), 4),
        })
    out.update(
        turns=len(batches) * TURN_BATCH,
        int8_mbytes=round(sizes["int8"] / 1e6, 1),
        float_mbytes=round(sizes["other"] / 1e6, 1),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
