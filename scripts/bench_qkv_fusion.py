"""A/B: decode-time self-attention QKV fusion (ModelConfig.fused_decode_qkv).

Decode steps are overhead-bound (docs/BENCH.md "MFU and the roofline":
inter-kernel gaps, not slow kernels), so cutting two GEMM dispatches per
layer per step — projecting q/k/v of the same pre-normed tensor with one
(D, 3D) GEMM instead of three (D, D) GEMMs — is a kernel-count
experiment. This times the fixed-scan flagship beam (the bench.py
program) with the fusion on vs off, interleaved A/B/A/B to cancel relay
drift. Numerics: the fused GEMM computes the same dot products but is
NOT bitwise (different tiling; ~1e-6 f32 drift on CPU), so per the
defaults policy the knob can only ship default-on if it also measures
a real win — run this to decide.

Usage: python scripts/bench_qkv_fusion.py   (real TPU, axon env)
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

TURN_BATCH, MAXLEN, BEAM, NBEST, N_BATCHES, ROUNDS = 32, 30, 5, 5, 6, 4


def main():
    import jax

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.train.batch import batch_masks

    cfg_on = dataclasses.replace(_flagship_cfg(), fused_decode_qkv=True)
    cfg_off = dataclasses.replace(cfg_on, fused_decode_qkv=False)
    model = MTN(cfg_on)
    rng = np.random.default_rng(0)
    db = _synthetic_batch(rng, B=TURN_BATCH, Lq=32, Lh=128, Lc=64, La=24,
                          ft_sizes=cfg_on.ft_sizes, T=(64, 32))
    masks, tgt_mask = batch_masks(db, 1)
    params = jax.jit(lambda r: model.init(
        {"params": r}, db.query, db.his, db.cap, db.fts, masks,
        db.answer_in, tgt_mask, method=MTN.init_all)["params"])(
            jax.random.PRNGKey(0))

    batches = []
    for i in range(N_BATCHES):
        db_i = dataclasses.replace(db, query=db.query.at[:, 1].set(4 + i))
        batches.append(jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, db_i))

    def build(cfg):
        dec = BeamDecoder(cfg, DecodeConfig(maxlen=MAXLEN, beam=BEAM,
                                            nbest=NBEST, early_stop=False))
        t0 = time.time()
        c = dec._build_beam().lower(params, db).compile()
        print(f"compiled fused={cfg.fused_decode_qkv} "
              f"in {time.time() - t0:.0f}s", flush=True)
        return c

    def time_one(compiled):
        t0 = time.time()
        outs = [compiled(params, db_i) for db_i in batches]
        for o in outs:
            np.asarray(o[0])  # force device-to-host fetch (relay law)
        sec = time.time() - t0
        return TURN_BATCH * N_BATCHES / sec

    c_on, c_off = build(cfg_on), build(cfg_off)
    # warmup both
    np.asarray(c_on(params, db)[0]), np.asarray(c_off(params, db)[0])

    on_rps, off_rps = [], []
    for r in range(ROUNDS):
        on_rps.append(time_one(c_on))
        off_rps.append(time_one(c_off))
        print(f"round {r}: fused {on_rps[-1]:.1f} rps | "
              f"unfused {off_rps[-1]:.1f} rps", flush=True)

    # Diagnostic only: on RANDOM params beam candidates are near-tied,
    # so the ~1e-6 fused-GEMM drift flips winners and positional
    # agreement is expected to be ~0 (the same near-tie effect
    # docs/PARITY.md documents for cross-framework comparison). On a
    # trained checkpoint the CLI output is byte-identical — see
    # docs/BENCH.md "Decode QKV fusion".
    toks_on = np.asarray(c_on(params, db)[0])
    toks_off = np.asarray(c_off(params, db)[0])
    agree = float((toks_on == toks_off).mean())
    print(f"fused   mean {np.mean(on_rps):.1f} rps (min {min(on_rps):.1f} "
          f"max {max(on_rps):.1f})")
    print(f"unfused mean {np.mean(off_rps):.1f} rps (min {min(off_rps):.1f} "
          f"max {max(off_rps):.1f})")
    print(f"ratio fused/unfused: {np.mean(on_rps) / np.mean(off_rps):.3f}")
    print(f"token agreement on random params (expected ~0, see comment): "
          f"{agree:.4f}")


if __name__ == "__main__":
    main()
