"""Ahead-of-time decode export: a hermetic serving artifact via jax.export.

The live serving path (serve.py) restores an Orbax checkpoint, builds the
flax model, and traces+compiles the beam program on first use — Python
model code and checkpoint I/O at deploy time, plus the (relay-expensive,
CLAUDE.md) cold trace. This module exports the ENTIRE beam-decode program
— encoder, auto-encoder chain, KV-cached early-stop beam loop, with the
trained parameters baked in as StableHLO constants — into one serialized
``jax.export`` artifact. The reference has no such deployment story (its
serving surface is re-running generate.py over pickled nn.Modules,
generate.py:93-117); this is the TPU-native equivalent of a frozen
inference graph:

- **hermetic**: the artifact directory carries the serialized program,
  the vocabulary, and the config sidecars. Loading never touches Orbax,
  never constructs the flax module, and never re-traces Python — the
  program is deserialized and compiled directly by XLA.
- **multi-platform**: exported by default for both ``cpu`` and ``tpu``
  lowerings (jax.export shape/platform polymorphism), so one artifact
  smoke-tests on a CPU host and serves on TPU chips.
- **shape-frozen**: the batch row count and every sequence/feature length
  is fixed at export time (recorded in ``meta.json``); the loader pads
  requests to those shapes (and chunks batches), exactly like the
  uniform-shapes decode path (DecodeConfig.uniform_shapes).

Usage::

    python -m mtn_tpu.utils.aot export --model exps/x/mtn_best \
        --out exps/x/aot --batch 16 --frames 64,32
    python -m mtn_tpu.utils.aot info exps/x/aot
    python -m mtn_tpu.utils.aot run exps/x/aot --question "what is he doing ?"

The loaded session decodes bit-identically to the live
``ServingSession`` *at the same frozen shapes* on the same platform
(tests/test_aot.py): it is the same traced program, serialized. The
same-shapes qualifier is load-bearing and inherited from the reference's
mask law, not from AOT: a request with no history/caption has an
all-``<blank>`` (fully masked) source, the ``-1e9`` mask fill
(ops/attention.py, parity with reference mtn.py:221-231) degenerates to
a uniform softmax over however many padded positions exist, so decode
output for such rows varies with the padded length — in live serving
(bucket sizes) exactly as here (frozen sizes).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_BLOB = "decode.jaxexport"
_META = "meta.json"
_VOCAB = "vocab.json"
_CONF = "conf.json"


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def export_decode(model_arg: str, out_dir: str, *, batch: int = 8,
                  query_len: int = 32, his_len: int = 128,
                  cap_len: int = 64, frames: Optional[Sequence[int]] = None,
                  decode_cfg=None, platforms: Sequence[str] = ("cpu", "tpu"),
                  model_overrides: Optional[Dict] = None) -> dict:
    """Export the beam-decode program for ``model_arg`` (a checkpoint
    prefix, same grammar as serving/generate) into ``out_dir``.

    Returns the meta dict that was written. ``frames`` gives the frozen
    frame count per feature stream (defaults to 64 for every stream —
    the run.sh I3D scale after frame-skip)."""
    import jax
    import jax.numpy as jnp

    from mtn_tpu.config import DecodeConfig, _to_jsonable
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.train.batch import DeviceBatch

    dcfg = decode_cfg or DecodeConfig()
    session = ServingSession.from_checkpoint(
        model_arg, dcfg, model_overrides=model_overrides)
    mcfg, datacfg = session.model_cfg, session.data_cfg
    n_streams = len(mcfg.ft_sizes)
    frames = list(frames) if frames else [64] * n_streams
    if len(frames) != n_streams:
        raise ValueError(f"--frames needs {n_streams} entries "
                         f"(streams {datacfg.fea_type}), got {len(frames)}")

    decoder = session.decoder
    beam_fn = decoder._build_beam()
    params = session.params
    pad = decoder.pad

    # Flat positional signature (no custom pytrees) so the deserialized
    # call needs nothing registered: (query, his, cap, *fts, *fts_len).
    def flat_fn(query, his, cap, *fts_and_lens):
        fts = tuple(fts_and_lens[:n_streams])
        fts_len = tuple(fts_and_lens[n_streams:])
        B = query.shape[0]
        dummy_ans = jnp.full((B, 1), pad, jnp.int32)
        db = DeviceBatch(query=query, his=his, cap=cap,
                         answer_in=dummy_ans, answer_out=dummy_ans,
                         fts=fts, fts_len=fts_len,
                         valid=jnp.ones((B,), bool))
        return beam_fn(params, db)

    s = jax.ShapeDtypeStruct
    arg_shapes = (
        [s((batch, query_len), jnp.int32), s((batch, his_len), jnp.int32),
         s((batch, cap_len), jnp.int32)]
        + [s((batch, frames[i], mcfg.ft_sizes[i]), jnp.float32)
           for i in range(n_streams)]
        + [s((batch,), jnp.int32) for _ in range(n_streams)])

    exp = jax.export.export(jax.jit(flat_fn),
                            platforms=list(platforms))(*arg_shapes)
    blob = exp.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(blob)
    meta = {
        "model_arg": model_arg,
        "epoch": session.epoch,
        "batch": batch,
        "query_len": query_len,
        "his_len": his_len,
        "cap_len": cap_len,
        "frames": frames,
        "streams": list(datacfg.fea_type),
        "ft_sizes": list(mcfg.ft_sizes),
        "platforms": list(platforms),
        "decode": _to_jsonable(dcfg),
        "jax_version": jax.__version__,
        "blob_bytes": len(blob),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    with open(os.path.join(out_dir, _VOCAB), "w") as f:
        json.dump(session.vocab, f)
    with open(os.path.join(out_dir, _CONF), "w") as f:
        json.dump({"model": _to_jsonable(mcfg),
                   "data": _to_jsonable(datacfg)}, f, indent=2,
                  sort_keys=True)
    log.info("exported %s -> %s (%.1f MB, platforms=%s)", model_arg,
             out_dir, len(blob) / 1e6, ",".join(platforms))
    return meta


# ---------------------------------------------------------------------------
# load + serve
# ---------------------------------------------------------------------------

class AotSession:
    """Serve an exported decode artifact.

    Mirrors ``ServingSession.respond/respond_batch`` (same Request
    objects, same ``DecodeResult`` n-best rows, same history/caption
    encoding law via ``encode_requests``) but runs the deserialized
    program: no checkpoint restore, no flax module, no Python re-trace.
    Oversized batches are chunked to the exported row count; sequences
    longer than the exported lengths raise (tokens) or are
    frame-truncated (features — the same cap law as bucketed serving).
    Drop-in for the HTTP front-end's lock-serialized path
    (``python -m mtn_tpu.serve_http --aot <dir>``); the live-only
    surfaces (rank/stream/hot-reload) intentionally do not exist here —
    serve_http answers 501 for them."""

    #: serving front-ends (serve_http) key off this to route the
    #: live-only surfaces (rank/stream/reload) to 501 Not Implemented
    is_aot = True

    def __init__(self, art_dir: str):
        import dataclasses

        import jax

        with open(os.path.join(art_dir, _META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(art_dir, _VOCAB)) as f:
            self.vocab = {k: int(v) for k, v in json.load(f).items()}
        with open(os.path.join(art_dir, _CONF)) as f:
            conf = json.load(f)
        from mtn_tpu.config import config_from_dict
        from mtn_tpu.data.vocab import vocab_list
        self.model_cfg = config_from_dict("model", conf["model"])
        self.data_cfg = config_from_dict("data", conf["data"])
        # the decode config frozen into the exported program; turn_batch
        # reflects the artifact's row count (the serving launch size)
        self.decode_cfg = dataclasses.replace(
            config_from_dict("decode", self.meta["decode"]),
            turn_batch=int(self.meta["batch"]))
        self.model_arg = self.meta.get("model_arg")
        self.epoch = self.meta.get("epoch")
        self.vlist = vocab_list(self.vocab)
        with open(os.path.join(art_dir, _BLOB), "rb") as f:
            self._exp = jax.export.deserialize(f.read())
        self._pad = self.vocab["<blank>"]
        self._eos = self.vocab["<eos>"]

    # -- host-side shape fitting -----------------------------------------
    def _fit_tokens(self, arr: np.ndarray, L: int, what: str) -> np.ndarray:
        if arr.shape[1] > L:
            raise ValueError(
                f"{what} length {arr.shape[1]} exceeds the exported "
                f"{what}_len {L}; re-export with a larger --{what}-len")
        out = np.full((arr.shape[0], L), self._pad, np.int32)
        out[:, :arr.shape[1]] = arr
        return out

    def _fit_features(self, arr: np.ndarray, ln: np.ndarray,
                      T: int) -> Tuple[np.ndarray, np.ndarray]:
        B, t, D = arr.shape
        out = np.zeros((B, T, D), np.float32)
        out[:, :min(t, T)] = arr[:, :T]
        return out, np.minimum(ln, T).astype(np.int32)

    def respond_batch(self, requests) -> List["DecodeResult"]:
        from mtn_tpu.decode.beam import completions_to_results, detokenize
        from mtn_tpu.serve import DecodeResult, encode_requests

        rows = int(self.meta["batch"])
        out: List[DecodeResult] = []
        for at in range(0, len(requests), rows):
            chunk = list(requests[at:at + rows])
            hb = encode_requests(chunk, self.model_cfg, self.data_cfg,
                                 self.vocab, pad_rows_to=rows)
            args = [self._fit_tokens(hb.query, self.meta["query_len"], "query"),
                    self._fit_tokens(hb.his, self.meta["his_len"], "his"),
                    self._fit_tokens(hb.cap, self.meta["cap_len"], "cap")]
            lens = []
            for i, T in enumerate(self.meta["frames"]):
                ft, ln = self._fit_features(hb.fts[i], hb.fts_len[i], T)
                args.append(ft)
                lens.append(ln)
            comp_scores, comp_buf, comp_len, _ = self._exp.call(
                *args, *lens)
            results = completions_to_results(
                np.asarray(comp_scores), np.asarray(comp_buf),
                np.asarray(comp_len), hb.valid)
            out.extend(DecodeResult(
                [(a, float(sc)) for a, sc in
                 r.texts(self.vlist, self._eos)]) for r in results)
        return out

    def respond(self, question: str, history=(), caption: str = "",
                features: Optional[Dict[str, np.ndarray]] = None) -> str:
        from mtn_tpu.serve import Request
        req = Request(question=question, history=list(history),
                      caption=caption, features=features or {})
        return self.respond_batch([req])[0][0]

    def warmup(self, stream: bool = False) -> float:
        """Deserialize-compile-and-run the exported program on one blank
        request; returns elapsed seconds. Mirrors
        ``ServingSession.warmup`` so ``--warmup`` works in AOT serving
        (``stream`` is accepted-inert — the artifact carries only the
        beam program)."""
        import time

        from mtn_tpu.serve import Request

        t0 = time.monotonic()
        self.respond_batch([Request(question="hello ?")])
        return time.monotonic() - t0


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: Optional[Sequence[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    p = argparse.ArgumentParser(prog="python -m mtn_tpu.utils.aot",
                                description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="export a decode artifact")
    pe.add_argument("--model", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--batch", type=int, default=8)
    pe.add_argument("--query-len", type=int, default=32)
    pe.add_argument("--his-len", type=int, default=128)
    pe.add_argument("--cap-len", type=int, default=64)
    pe.add_argument("--frames", default="",
                    help="comma list, one per feature stream (default 64)")
    pe.add_argument("--platforms", default="cpu,tpu")
    pe.add_argument("--beam", type=int, default=None)
    pe.add_argument("--nbest", type=int, default=None)
    pe.add_argument("--maxlen", type=int, default=None)
    pe.add_argument("--penalty", type=float, default=None)
    pe.add_argument("--min-len", type=int, default=None)

    pi = sub.add_parser("info", help="print artifact metadata")
    pi.add_argument("artifact")

    pr = sub.add_parser("run", help="decode one question via the artifact")
    pr.add_argument("artifact")
    pr.add_argument("--question", required=True)
    pr.add_argument("--caption", default="")
    pr.add_argument("--feature", action="append", default=[],
                    metavar="NAME=PATH.npy")

    args = p.parse_args(argv)
    if args.cmd == "export":
        from mtn_tpu.config import DecodeConfig
        dcfg = DecodeConfig()
        for field in ("beam", "nbest", "maxlen", "penalty", "min_len"):
            v = getattr(args, field)
            if v is not None:
                setattr(dcfg, field, v)
        frames = ([int(x) for x in args.frames.split(",") if x]
                  if args.frames else None)
        meta = export_decode(
            args.model, args.out, batch=args.batch,
            query_len=args.query_len, his_len=args.his_len,
            cap_len=args.cap_len, frames=frames, decode_cfg=dcfg,
            platforms=[s for s in args.platforms.split(",") if s])
        print(json.dumps({"out": args.out,
                          "blob_bytes": meta["blob_bytes"]}))
        return 0
    if args.cmd == "info":
        with open(os.path.join(args.artifact, _META)) as f:
            print(json.dumps(json.load(f), indent=2, sort_keys=True))
        return 0
    if args.cmd == "run":
        feats = {}
        for spec in args.feature:
            name, _, path = spec.partition("=")
            feats[name] = np.load(path)
        from mtn_tpu.serve import Request
        session = AotSession(args.artifact)
        req = Request(question=args.question, caption=args.caption,
                      features=feats)
        for text, score in session.respond_batch([req])[0].nbest:
            print(json.dumps({"answer": text, "score": score}))
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
