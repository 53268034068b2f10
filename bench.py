"""Benchmark: full-test beam-decode throughput (the BASELINE.json metric)
plus train throughput and MFU, all on one TPU chip.

Headline: beam-5 responses/sec on the flagship MTN config at DSTC7-scale
shapes, via the jit-compiled batched cached beam decoder.

Baseline: the reference publishes no speed numbers (BASELINE.md), so the
baseline is self-measured on the SAME chip: a faithful proxy of the
reference decode strategy (generate.py:146 + data_utils.py:188-242) —
batch size 1, one full decoder forward over the whole padded prefix per
hypothesis per step, no KV cache, host top-k between steps (so one
host<->device round trip per hypothesis per step, exactly like the
reference's .cpu() sync at data_utils.py:211). Both sides run through
the same device transport, so the ratio reflects the algorithmic gap
(turn batching + KV/AE caching + on-device beam) on equal footing.
More than half of each proxy turn is *measured* (PROXY_STEPS of MAXLEN
steps timed; the remainder extrapolated linearly — per-step cost is
constant since the proxy always pads to MAXLEN). The actual torch
reference was additionally timed on this host's CPU with
scripts/bench_reference_torch.py; see docs/BENCH.md.

MFU: FLOP counts come from XLA's own cost model on the exact compiled
programs (compiled.cost_analysis()['flops']), divided by measured wall
time and the chip's bf16 peak. MTN is a small model (d512) decoded in
1-token steps, so decode MFU is structurally low (latency-/HBM-bound,
not MXU-bound) — docs/BENCH.md gives the roofline argument.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "rps_fixed_maxlen",
 "rps_early_stop_upper_bound", "early_stop_steps",
 "train_tokens_per_sec", "train_steps_per_sec", "mfu_train",
 "mfu_decode"}. "value" is the shipped default (early-stop beam,
output-identical to the fixed scan) measured on *trained-model-
representative* params: random init converges unrealistically early
(~13/30 steps — an upper bound, reported separately as
"rps_early_stop_upper_bound"), so the generator logits are calibrated
(one scalar temperature on the output projection, bisected on-device)
until the early-stop loop exits at the mean step count measured on an
actually-trained checkpoint (21.8/30, scripts/bench_early_stop.py,
docs/BENCH.md "Early termination"). "early_stop_steps" records the
step count the headline run actually executed so the calibration is
auditable. "rps_fixed_maxlen" is the fixed 30-step program for
cross-round comparability, and decode MFU is computed from it (its
flop count is well-defined).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# DSTC7-scale decode shapes (test split: 1,710 turns; maxlen 30, beam 5 —
# run.sh:48-50, generate.py:101)
TURN_BATCH = 32   # sweet spot from the turn-batch sweep (16/32/64)
BEAM = 5
MAXLEN = 30
NBEST = 5
SHAPES = dict(Lq=32, Lh=128, Lc=64, La=24, T=(64, 32))
N_BATCHES = 8          # timed batches for our decoder
PROXY_TURNS = 3        # timed turns for the reference-style proxy
PROXY_STEPS = 16       # proxy steps actually timed (extrapolated to MAXLEN)
TRAIN_BATCH = 32       # run.sh default batch size
TRAIN_STEPS = 12       # timed train steps
# Early-stop exit point of a *trained* flagship checkpoint (mean steps of
# 30, measured by scripts/bench_early_stop.py on the committed-scale
# trained run — docs/BENCH.md "Early termination"). The headline decode
# is calibrated to converge here, not at the random-init point.
TRAINED_MEAN_STEPS = 21.8
CALIB_TOL = 0.75       # accept calibration within this many steps

# bf16 peak of one chip, by device_kind prefix (jax.devices()[0]).
# Ordered: libtpu reports v5e as "TPU v5 lite" but v5p as plain "TPU v5",
# so the more specific prefixes must be tried first.
_PEAK_BF16 = [
    ("TPU v5 lite", 197e12),   # v5e: 197 TFLOP/s bf16
    ("TPU v5e", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),        # plain "TPU v5" = v5p
    ("TPU v4", 275e12),
    ("TPU v6", 918e12),        # v6e (Trillium)
]


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for prefix, peak in _PEAK_BF16:
        if kind.startswith(prefix):
            return peak
    return 197e12  # assume v5e (the SURVEY target chip)


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig, TrainConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.ops.masks import causal_mask
    from mtn_tpu.train.batch import batch_masks

    cfg = _flagship_cfg()
    model = MTN(cfg)
    rng = np.random.default_rng(0)
    db = _synthetic_batch(rng, B=TURN_BATCH, Lq=SHAPES["Lq"],
                          Lh=SHAPES["Lh"], Lc=SHAPES["Lc"], La=SHAPES["La"],
                          ft_sizes=cfg.ft_sizes, T=SHAPES["T"])
    masks, tgt_mask = batch_masks(db, 1)
    params = jax.jit(lambda r: model.init(
        {"params": r}, db.query, db.his, db.cap, db.fts, masks,
        db.answer_in, tgt_mask, method=MTN.init_all)["params"])(
            jax.random.PRNGKey(0))
    peak = _peak_flops(jax.devices()[0])

    # ---- ours: batched cached beam --------------------------------------
    # NOTE: on this setup device calls go through a network relay;
    # jax.block_until_ready does NOT guarantee execution completed, so all
    # timings force a device-to-host fetch of the results.
    import dataclasses

    # Two programs, both output-identical (tests pin it): the fixed
    # 30-step scan (comparable across rounds; its XLA flop count is
    # well-defined, so decode MFU comes from it) and the default
    # early-stop while_loop (DecodeConfig.early_stop), which exits once
    # the n-bests are provably fixed. Random-init params converge
    # *earlier* than trained ones, so the early-stop number here is an
    # upper bound — the representative trained-checkpoint A/B (1.32×)
    # is in docs/BENCH.md via scripts/bench_early_stop.py.
    batches = []
    for i in range(N_BATCHES):                    # distinct inputs, built
        db_i = dataclasses.replace(                # outside the timed loop
            db, query=db.query.at[:, 1].set(4 + i))
        batches.append(jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, db_i))

    def build_beam(early_stop):
        dec = BeamDecoder(cfg, DecodeConfig(maxlen=MAXLEN, beam=BEAM,
                                            nbest=NBEST,
                                            early_stop=early_stop))
        return dec._build_beam().lower(params, db).compile()

    def time_compiled(compiled, p):
        """Time N_BATCHES dispatches; returns (rps, sec, mean exit step).
        Params are a runtime argument, so one executable serves every
        calibration point."""
        _ = [np.asarray(x) for x in compiled(p, db)]   # warmup this p
        t0 = time.time()
        outs = [compiled(p, db_i) for db_i in batches]
        steps = [float(np.asarray(o[3])) for o in outs]  # forces completion
        sec = time.time() - t0
        return TURN_BATCH * N_BATCHES / sec, sec, float(np.mean(steps))

    fixed_c = build_beam(False)
    es_c = build_beam(True)
    fixed_rps, fixed_sec, _ = time_compiled(fixed_c, params)
    mfu_decode = _flops_of(fixed_c) * N_BATCHES / fixed_sec / peak

    # Random-init params converge unrealistically early — report that
    # figure as the labelled upper bound it is, never as the headline.
    ub_rps, _, ub_steps = time_compiled(es_c, params)

    # -- calibrate the logit peakedness to the trained exit point ---------
    # One scalar s on the output projection (logits -> s*logits before
    # log_softmax): s=1 is random init (~13/30 exit), s→∞ pins the top
    # continuation at logp≈0 so the early-stop bound never closes (30/30).
    # Bisect s until the measured exit step matches the trained
    # checkpoint's 21.8/30 (scripts/bench_early_stop.py).
    def _peaked(s):
        proj = {k: v * s for k, v in params["generator"]["proj"].items()}
        new = dict(params)
        new["generator"] = dict(params["generator"], proj=proj)
        return new

    def exit_steps(p):
        # mean over a spread of the actual timed batches (convergence
        # shifts a step or two with the input), so the calibration
        # target matches what time_compiled later measures
        probes = batches[::3]
        outs = [es_c(p, b) for b in probes]
        return float(np.mean([np.asarray(o[3]) for o in outs]))

    best_s, best_err = 1.0, abs(ub_steps - TRAINED_MEAN_STEPS)
    if ub_steps < TRAINED_MEAN_STEPS - CALIB_TOL:
        lo, hi = 1.0, 2.0
        while exit_steps(_peaked(hi)) < TRAINED_MEAN_STEPS and hi < 64.0:
            lo, hi = hi, hi * 2.0
        for _ in range(10):
            mid = 0.5 * (lo + hi)
            st = exit_steps(_peaked(mid))
            if abs(st - TRAINED_MEAN_STEPS) < best_err:
                best_s, best_err = mid, abs(st - TRAINED_MEAN_STEPS)
            if best_err <= CALIB_TOL:
                break
            if st < TRAINED_MEAN_STEPS:
                lo = mid
            else:
                hi = mid
    calib_params = _peaked(best_s) if best_s != 1.0 else params
    ours_rps, _, es_steps = time_compiled(es_c, calib_params)

    # ---- train step: throughput + MFU ------------------------------------
    from mtn_tpu.train.trainer import Trainer

    tdb = _synthetic_batch(rng, B=TRAIN_BATCH, Lq=SHAPES["Lq"],
                           Lh=SHAPES["Lh"], Lc=SHAPES["Lc"],
                           La=SHAPES["La"], ft_sizes=cfg.ft_sizes,
                           T=SHAPES["T"])
    trainer = Trainer(cfg, TrainConfig(warmup_steps=9660))
    state = trainer.init_state(jax.random.PRNGKey(1), tdb)
    base_rng = jax.random.PRNGKey(2)
    tstep = trainer._build_train_step()
    train_compiled = tstep.lower(state, tdb, base_rng).compile()
    train_flops = _flops_of(train_compiled)
    state, m = train_compiled(state, tdb, base_rng)   # warmup (donates old)
    _ = np.asarray(m["loss"])
    t0 = time.time()
    for _ in range(TRAIN_STEPS):
        state, m = train_compiled(state, tdb, base_rng)
    _ = np.asarray(m["loss"])                     # force completion
    train_sec = time.time() - t0
    steps_per_sec = TRAIN_STEPS / train_sec
    # answer tokens/sec, the reference's tokens/sec meaning (train.py:45-48)
    ans_tokens = int(np.asarray(jnp.sum(tdb.answer_out != 1)))
    train_tokens_per_sec = ans_tokens * steps_per_sec
    mfu_train = train_flops * TRAIN_STEPS / train_sec / peak

    # ---- baseline proxy: reference-style batch-1 no-cache beam ----------
    row = jax.tree.map(
        lambda x: x[:1] if hasattr(x, "ndim") and x.ndim > 0 else x, db)
    row_masks, _ = batch_masks(row, 1)
    Lpad = MAXLEN + 1
    cm = causal_mask(Lpad)

    @jax.jit
    def full_forward(params, tgt, pos):
        # full decoder forward over the padded prefix; logp at `pos`
        x, _ = model.apply({"params": params}, row.query, row.his, row.cap,
                           row.fts, row_masks, tgt,
                           jnp.broadcast_to(cm, (1, Lpad, Lpad)),
                           deterministic=True)
        xs = jax.lax.dynamic_slice_in_dim(x, pos, 1, axis=1)
        return model.apply({"params": params}, xs[:, 0],
                           method=MTN.generate_logprobs)

    tgt = jnp.full((1, Lpad), 1, jnp.int32).at[0, 0].set(2)
    jax.block_until_ready(full_forward(params, tgt, 0))  # compile
    t0 = time.time()
    for turn in range(PROXY_TURNS):
        n_hyp = 1
        for step in range(PROXY_STEPS):
            for h in range(n_hyp):
                logp = np.asarray(full_forward(params, tgt, step))
                order = np.argsort(logp[0])[::-1][:BEAM]  # host-side top-k
            n_hyp = BEAM
    proxy_sec = time.time() - t0
    # forwards actually executed per turn vs a full reference turn
    done = 1 + (PROXY_STEPS - 1) * BEAM
    full = 1 + (MAXLEN - 1) * BEAM
    proxy_per_turn = (proxy_sec / PROXY_TURNS) * (full / done)
    proxy_rps = 1.0 / proxy_per_turn

    print(json.dumps({
        "metric": "beam_decode_responses_per_sec",
        "value": round(ours_rps, 3),
        "unit": "responses/sec",
        "vs_baseline": round(ours_rps / proxy_rps, 2),
        "rps_fixed_maxlen": round(fixed_rps, 3),
        "rps_early_stop_upper_bound": round(ub_rps, 3),
        "early_stop_steps": round(es_steps, 1),
        "train_tokens_per_sec": round(train_tokens_per_sec, 1),
        "train_steps_per_sec": round(steps_per_sec, 2),
        "mfu_train": round(mfu_train, 4),
        "mfu_decode": round(mfu_decode, 4),
    }))


if __name__ == "__main__":
    main()
