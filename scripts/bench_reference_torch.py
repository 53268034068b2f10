"""Time the ACTUAL reference decoder (torch, CPU) at flagship shapes.

Secondary baseline datapoint for docs/BENCH.md (VERDICT r1 weak #3): the
headline `vs_baseline` in bench.py compares against a reference-*style*
JAX proxy on the same TPU chip (same transport — the fair algorithmic
comparison); this script additionally measures the reference's own
`beam_search_decode` (/root/reference/data_utils.py:188-242) running the
real torch model (mtn.make_model, flagship dims) on this host's CPU, so
BENCH.md can record a measured — not estimated — reference number.

Usage: python scripts/bench_reference_torch.py [n_turns] [maxlen]
Prints one JSON line {"sec_per_turn", "responses_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REF = "/root/reference"

# flagship decode shapes (run.sh defaults; docs/BENCH.md header)
LQ, LH, LC = 32, 128, 64
FT_SIZES = (2048, 128)
T = (64, 32)
VOCAB = 6000
BEAM, PENALTY, NBEST = 5, 1.0, 5


def main(n_turns: int = 3, maxlen: int = 30):
    import numpy as np
    import torch

    # same compat shim as tests/test_pipeline_parity.py::ref_run (keep in
    # sync): torchtext stub for the vestigial import (data_utils.py:8),
    # .cuda() no-ops, and torch.load defaulting to full-pickle CPU loads
    if "torchtext" not in sys.modules:
        tt = types.ModuleType("torchtext")
        tt.data = types.SimpleNamespace(Iterator=object, batch=None)
        tt.datasets = types.SimpleNamespace()
        sys.modules["torchtext"] = tt
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _load = torch.load
    torch.load = lambda *a, **k: _load(
        *a, **{**k, "weights_only": False, "map_location": "cpu"})
    sys.path.insert(0, REF)
    import data_utils as ref_du
    import mtn as ref_mtn

    torch.manual_seed(0)
    model = ref_mtn.make_model(
        VOCAB, VOCAB, N=6, d_model=512, d_ff=2048, h=8, dropout=0.1,
        ft_sizes=list(FT_SIZES), diff_encoder=True, auto_encoder_ft="query")
    model.eval()

    rng = np.random.default_rng(0)

    def toks(L):
        a = rng.integers(4, VOCAB, size=(1, L))
        a[:, 0] = 2
        return torch.from_numpy(a).long()

    # reference feature path: (T, B, D) numpy, ones-padding sentinel
    fts = [rng.standard_normal((t, 1, d)).astype(np.float32)
           for t, d in zip(T, FT_SIZES)]
    batch = ref_du.Batch(toks(LQ), toks(LH), None, fts=fts, cap=toks(LC),
                         pad=1)

    with torch.no_grad():
        # warmup (thread pools, lazy allocs)
        ref_du.beam_search_decode(model, batch, 2, 2, 0, 3, 1, beam=BEAM,
                                  penalty=PENALTY, nbest=NBEST)
        t0 = time.time()
        for _ in range(n_turns):
            ref_du.beam_search_decode(model, batch, maxlen, 2, 0, 3, 1,
                                      beam=BEAM, penalty=PENALTY,
                                      nbest=NBEST)
        sec = time.time() - t0
    per_turn = sec / n_turns
    print(json.dumps({
        "what": "reference torch beam_search_decode, CPU, flagship shapes",
        "n_turns": n_turns, "maxlen": maxlen, "beam": BEAM,
        "torch_threads": torch.get_num_threads(),
        "sec_per_turn": round(per_turn, 3),
        "responses_per_sec": round(1.0 / per_turn, 4),
        "full_split_hours_est": round(per_turn * 1710 / 3600, 2),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
