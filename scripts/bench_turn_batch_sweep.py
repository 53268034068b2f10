"""Turn-batch sweep: device-side AND end-to-end rps per turn_batch.

VERDICT r4 weak #4: the repo's operating point (turn_batch 32; 64
rejected) was chosen on e2e numbers where THIS host's device-relay
transport dominates (62-154 rps run-to-run on identical configs), so a
local-PCIe deployment cannot tell which conclusions are device truths.
This sweep separates them in one run, per turn_batch:

- **device rps**: the compiled fixed-scan beam program timed over
  device-resident batches (dispatch → fetch of the output scalars
  only). A property of the chip + program — transport-independent.
- **e2e rps**: the same decode driven the way stage 3 drives it — a
  fresh HOST batch per call (numpy → device upload of tokens +
  features, then decode, then full n-best fetch). On a relay host this
  is transport-bound; on local PCIe it approaches the device number.

Usage: python scripts/bench_turn_batch_sweep.py [batch_sizes...]
       (defaults: 8 16 32 64)

Prints one JSON line per batch size plus a final summary line:
{"sweep": [{"turn_batch", "device_rps", "e2e_rps", "device_ms_per_turn",
            "upload_mb"}...], "device_best", "e2e_best"}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEAM = 5
MAXLEN = 30
NBEST = 5
SHAPES = dict(Lq=32, Lh=128, Lc=64, La=24, T=(64, 32))
N_DEVICE = 6     # timed dispatches, device-resident inputs
N_E2E = 6        # timed host->device->decode->host round trips


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]

    import jax
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.models.mtn import MTN
    from mtn_tpu.train.batch import batch_masks

    cfg = _flagship_cfg()
    model = MTN(cfg)
    rng = np.random.default_rng(0)

    def host_batch(B, salt):
        """A fresh host-side (numpy) batch — the e2e path re-uploads it."""
        db = _synthetic_batch(np.random.default_rng(salt), B=B,
                              Lq=SHAPES["Lq"], Lh=SHAPES["Lh"],
                              Lc=SHAPES["Lc"], La=SHAPES["La"],
                              ft_sizes=cfg.ft_sizes, T=SHAPES["T"])
        return jax.tree.map(np.asarray, db)

    db0 = jax.tree.map(jax.numpy.asarray, host_batch(sizes[0], 0))
    masks, tgt_mask = batch_masks(db0, 1)
    params = jax.jit(lambda r: model.init(
        {"params": r}, db0.query, db0.his, db0.cap, db0.fts, masks,
        db0.answer_in, tgt_mask, method=MTN.init_all)["params"])(
            jax.random.PRNGKey(0))

    rows = []
    for B in sizes:
        dec = BeamDecoder(cfg, DecodeConfig(maxlen=MAXLEN, beam=BEAM,
                                            nbest=NBEST, early_stop=False,
                                            turn_batch=B))
        hb = host_batch(B, B)
        dev_db = jax.tree.map(jax.numpy.asarray, hb)
        compiled = dec._build_beam().lower(params, dev_db).compile()

        # ---- device-side: device-resident inputs, scalar fetch ----------
        dev_batches = []
        for i in range(N_DEVICE):
            d = dataclasses.replace(dev_db,
                                    query=dev_db.query.at[:, 1].set(4 + i))
            dev_batches.append(jax.tree.map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, d))
        _ = [np.asarray(x) for x in compiled(params, dev_batches[0])]
        t0 = time.time()
        outs = [compiled(params, d) for d in dev_batches]
        # force completion with a device->host fetch (relay law)
        _ = [float(np.asarray(o[3])) for o in outs]
        dev_sec = time.time() - t0
        device_rps = B * N_DEVICE / dev_sec

        # ---- e2e: fresh host batch, upload + decode + n-best fetch ------
        e2e_hbs = [host_batch(B, 1000 + B + i) for i in range(N_E2E)]
        upload_mb = sum(
            a.nbytes for a in jax.tree.leaves(e2e_hbs[0])) / 1e6
        # warmup one full round trip (same shapes -> same executable)
        w = jax.tree.map(jax.numpy.asarray, e2e_hbs[0])
        _ = [np.asarray(x) for x in compiled(params, w)]
        t0 = time.time()
        for h in e2e_hbs:
            d = jax.tree.map(jax.numpy.asarray, h)       # upload
            out = compiled(params, d)
            _ = [np.asarray(x) for x in out[:3]]         # full n-best fetch
        e2e_sec = time.time() - t0
        e2e_rps = B * N_E2E / e2e_sec

        row = {"turn_batch": B,
               "device_rps": round(device_rps, 1),
               "e2e_rps": round(e2e_rps, 1),
               "device_ms_per_turn": round(1000.0 / device_rps, 3),
               "upload_mb": round(upload_mb, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = lambda k: max(rows, key=lambda r: r[k])["turn_batch"]  # noqa: E731
    print(json.dumps({"sweep": rows,
                      "device_best": best("device_rps"),
                      "e2e_best": best("e2e_rps")}))


if __name__ == "__main__":
    main()
