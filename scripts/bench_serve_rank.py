"""Concurrent rank-serving throughput (AsyncServer.submit_rank, real TPU).

Prices the continuous-batching rank path end-to-end — host encode +
feature upload + candidate tokenization + tiled rank launch + download —
against the lock-serialized one-request-at-a-time alternative, at the
VisDial protocol (100 options/turn). Uses the flagship config with
random params and a synthetic vocab (the serving cost is shape-, not
value-dependent; bench.py uses the same device).

Usage: python scripts/bench_serve_rank.py [--int8]   (real TPU, axon env)

--int8 re-runs the concurrent measurement with feature_transfer="int8"
(the serving wire-format knob) for a same-process A/B.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REQUESTS = 32
N_OPTIONS = 100
TURN_BATCH = 8     # the measured rank sweet spot (docs/BENCH.md)


def main():
    import jax

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DataConfig, DecodeConfig
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    from mtn_tpu.train.batch import batch_masks

    cfg = _flagship_cfg()
    model = MTN(cfg)
    rng = np.random.default_rng(0)
    db = _synthetic_batch(rng, B=4, Lq=32, Lh=128, Lc=64, La=24,
                          ft_sizes=cfg.ft_sizes, T=(64, 32))
    masks, tgt_mask = batch_masks(db, 1)
    params = jax.jit(lambda r: model.init(
        {"params": r}, db.query, db.his, db.cap, db.fts, masks,
        db.answer_in, tgt_mask, method=MTN.init_all)["params"])(
            jax.random.PRNGKey(0))
    vocab = {"<blank>": 0, "<unk>": 1, "<sos>": 2, "<eos>": 3}
    words = [f"w{i}" for i in range(cfg.vocab_size - 4)]
    vocab.update({w: i + 4 for i, w in enumerate(words)})
    data_cfg = DataConfig(fea_type=["i3d_rgb", "vggish"],
                          length_bucket=8, feature_bucket=4)
    session = ServingSession(params, cfg, data_cfg, vocab,
                             DecodeConfig(turn_batch=TURN_BATCH))

    def make_request(i):
        return Request(
            question=f"{words[i % 50]} {words[7]} {words[11]} ?",
            history=[(f"{words[3]} {words[4]} ?", f"{words[5]} {words[6]}")],
            caption=" ".join(words[20:28]),
            features={"i3d_rgb": rng.standard_normal((64, 2048))
                      .astype(np.float32),
                      "vggish": rng.standard_normal((32, 128))
                      .astype(np.float32)})

    cands = [" ".join(rng.choice(words[:500], size=8))
             for _ in range(N_OPTIONS)]
    reqs = [make_request(i) for i in range(N_REQUESTS)]

    # warmup (compiles the rank bucket) + sequential baseline
    session.rank(reqs[0], cands)
    t0 = time.time()
    for r in reqs:
        session.rank(r, cands)
    seq_s = time.time() - t0
    seq_ops = N_REQUESTS * N_OPTIONS / seq_s

    srv = AsyncServer(session, max_in_flight=3, max_wait_ms=5)
    # warmup the batched (turn_batch-padded) launch shape
    [f.result() for f in [srv.submit_rank(r, cands)
                          for r in reqs[:TURN_BATCH]]]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=16) as ex:
        futs = list(ex.map(lambda r: srv.submit_rank(r, cands), reqs))
    results = [f.result(timeout=600) for f in futs]
    con_s = time.time() - t0
    srv.stop()
    assert all(len(r) == N_OPTIONS for r in results)
    con_ops = N_REQUESTS * N_OPTIONS / con_s
    print(f"sequential session.rank : {seq_ops:8.1f} options/sec "
          f"({N_REQUESTS / seq_s:5.2f} turns/sec)")
    print(f"AsyncServer submit_rank : {con_ops:8.1f} options/sec "
          f"({N_REQUESTS / con_s:5.2f} turns/sec, {srv.launches} launches)")
    print(f"speedup: {con_ops / seq_ops:.2f}x")

    if "--int8" in sys.argv[1:]:
        s8 = ServingSession(params, cfg, data_cfg, vocab,
                            DecodeConfig(turn_batch=TURN_BATCH),
                            feature_transfer="int8")
        srv8 = AsyncServer(s8, max_in_flight=3, max_wait_ms=5)
        [f.result() for f in [srv8.submit_rank(r, cands)
                              for r in reqs[:TURN_BATCH]]]   # warmup
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=16) as ex:
            futs = list(ex.map(lambda r: srv8.submit_rank(r, cands), reqs))
        _ = [f.result(timeout=600) for f in futs]
        i8_s = time.time() - t0
        srv8.stop()
        i8_ops = N_REQUESTS * N_OPTIONS / i8_s
        print(f"submit_rank int8 wire   : {i8_ops:8.1f} options/sec "
              f"({N_REQUESTS / i8_s:5.2f} turns/sec, "
              f"{srv8.launches} launches)")


if __name__ == "__main__":
    main()
