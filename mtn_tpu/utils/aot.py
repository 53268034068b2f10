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
(tests/test_aot.py): it is the same traced program, serialized.
Fully-masked sources (blank history/caption) are padding-invariant by
the decode-time degenerate-source law
(ops/masks.py::attend_first_if_empty — such rows attend key 0 only,
the reference's batchsize-1 decode semantics), so frozen sizes do not
perturb them.

One artifact can carry several frozen batch-row buckets (``--batches
1,4,16`` — a short burst is served by the smallest fitting program),
a greedy or sampling program instead of the beam (``--decode-style``;
the sample program takes ``(seed, fold)`` and reproduces the live draw
law), the discriminative rank program (``--rank N,L`` → the artifact
serves ``/v1/rank``), and — by default — the streaming
prefix/per-token-step programs (→ ``/v1/stream``; tokens identical to
the live streaming path). ``--weights-quant int8|int8-fp-head`` bakes
weight-only int8 kernels + per-channel scales as the constants (~4x
smaller artifact/HBM, live-quantized-session numerics). A served
artifact hot-swaps on re-export (:meth:`AotSession.reload`,
``/admin/reload``, or ``--watch-seconds`` polling ``export_id``).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import uuid as _uuid
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_BLOB = "decode.jaxexport"          # legacy single-bucket artifact name
_RANK_BLOB = "rank.jaxexport"
_STREAM_PREFIX_BLOB = "stream_prefix.jaxexport"
_META = "meta.json"
_VOCAB = "vocab.json"
_CONF = "conf.json"


def _bucket_blob(B: int) -> str:
    return f"decode_b{B}.jaxexport"


def _stream_step_blob(style: str) -> str:
    return f"stream_step_{style}.jaxexport"


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def export_decode(model_arg: str, out_dir: str, *, batch: int = 8,
                  query_len: int = 32, his_len: int = 128,
                  cap_len: int = 64, frames: Optional[Sequence[int]] = None,
                  decode_cfg=None, platforms: Sequence[str] = ("cpu", "tpu"),
                  model_overrides: Optional[Dict] = None,
                  batches: Optional[Sequence[int]] = None,
                  rank: Optional[Tuple[int, int]] = None,
                  weights_quant: str = "",
                  stream: bool = True) -> dict:
    """Export the decode program(s) for ``model_arg`` (a checkpoint
    prefix, same grammar as serving/generate) into ``out_dir``.

    Returns the meta dict that was written. ``frames`` gives the frozen
    frame count per feature stream (defaults to 64 for every stream —
    the run.sh I3D scale after frame-skip).

    ``batches``: several frozen batch-row buckets in ONE artifact (e.g.
    ``[1, 4, 16]``) — one serialized program per bucket, so a short
    request burst is served by the smallest fitting program instead of
    paying the max-batch shape. Default: just ``[batch]``.

    ``decode_cfg.decode_style`` selects the exported program family:
    ``beam_search`` (n-best completions), ``greedy`` or ``sample``
    (token rows; the sample program takes ``(seed, fold)`` scalars and
    reproduces the live session's draw law exactly).

    ``rank=(N, L)`` additionally exports the discriminative rank
    program (VisDial-style candidate scoring, BeamDecoder._build_rank)
    frozen at N candidates of padded length L per turn, batch 1 — the
    serving shape (ServingSession.rank scores one turn per call).

    ``weights_quant`` ("int8" / "int8-fp-head"): bake weight-only
    int8 kernels + per-channel f32 scales as the program's constants
    instead of f32 weights (mtn_tpu/utils/quantize.py) — ~4x smaller
    artifact and ~4x less HBM per serving replica for the quantized
    kernels, with the live quantized session's exact numerics
    (VERDICT r4 #1; measured perf-neutral, BENCH.md "Weight-only int8
    decode").
    """
    import jax
    import jax.numpy as jnp

    from mtn_tpu.config import DecodeConfig, _to_jsonable
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.train.batch import DeviceBatch

    dcfg = decode_cfg or DecodeConfig()
    style = dcfg.decode_style
    if style not in ("beam_search", "greedy", "sample"):
        raise ValueError(f"decode_style {style!r} cannot be exported")
    session = ServingSession.from_checkpoint(
        model_arg, dcfg, model_overrides=model_overrides,
        weights_quant=weights_quant)
    mcfg, datacfg = session.model_cfg, session.data_cfg
    n_streams = len(mcfg.ft_sizes)
    frames = list(frames) if frames else [64] * n_streams
    if len(frames) != n_streams:
        raise ValueError(f"--frames needs {n_streams} entries "
                         f"(streams {datacfg.fea_type}), got {len(frames)}")
    buckets = sorted(set(int(b) for b in (batches or [batch])))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batches must be positive, got {buckets}")

    decoder = session.decoder
    params = session.params
    pad = decoder.pad

    def to_batch(query, his, cap, fts_and_lens):
        fts = tuple(fts_and_lens[:n_streams])
        fts_len = tuple(fts_and_lens[n_streams:])
        B = query.shape[0]
        dummy_ans = jnp.full((B, 1), pad, jnp.int32)
        return DeviceBatch(query=query, his=his, cap=cap,
                           answer_in=dummy_ans, answer_out=dummy_ans,
                           fts=fts, fts_len=fts_len,
                           valid=jnp.ones((B,), bool))

    # Flat positional signatures (no custom pytrees) so the deserialized
    # call needs nothing registered: (query, his, cap, *fts, *fts_len
    # [, seed, fold] [, cand, cand_len]).
    if style == "beam_search":
        inner = decoder._build_beam()

        def flat_fn(query, his, cap, *fts_and_lens):
            return inner(params, to_batch(query, his, cap, fts_and_lens))
        extra_shapes = []
    elif style == "greedy":
        inner = decoder._build_greedy()

        def flat_fn(query, his, cap, *fts_and_lens):
            return inner(params, to_batch(query, his, cap, fts_and_lens))
        extra_shapes = []
    else:  # sample
        inner = decoder._build_sample()

        def flat_fn(query, his, cap, *fts_and_lens_seed):
            seed, fold = fts_and_lens_seed[-2], fts_and_lens_seed[-1]
            # the live draw law (BeamDecoder.sample_batch): PRNGKey(seed)
            # folded by the caller's batch counter when it is nonzero
            key = jax.random.PRNGKey(seed)
            key = jax.lax.cond(fold != 0,
                               lambda k: jax.random.fold_in(k, fold),
                               lambda k: k, key)
            return inner(params,
                         to_batch(query, his, cap, fts_and_lens_seed[:-2]),
                         key)
        s0 = jax.ShapeDtypeStruct((), jnp.int32)
        extra_shapes = [s0, s0]

    s = jax.ShapeDtypeStruct

    def arg_shapes(B):
        return (
            [s((B, query_len), jnp.int32), s((B, his_len), jnp.int32),
             s((B, cap_len), jnp.int32)]
            + [s((B, frames[i], mcfg.ft_sizes[i]), jnp.float32)
               for i in range(n_streams)]
            + [s((B,), jnp.int32) for _ in range(n_streams)]
            + extra_shapes)

    os.makedirs(out_dir, exist_ok=True)
    blob_bytes = {}
    for B in buckets:
        exp = jax.export.export(jax.jit(flat_fn),
                                platforms=list(platforms))(*arg_shapes(B))
        blob = exp.serialize()
        name = _bucket_blob(B)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        blob_bytes[name] = len(blob)
    rank_meta = None
    if rank is not None:
        N, L = int(rank[0]), int(rank[1])
        rank_fn = decoder._build_rank(N, L)

        def flat_rank_fn(query, his, cap, *rest):
            cand, cand_len = rest[-2], rest[-1]
            return rank_fn(params, to_batch(query, his, cap, rest[:-2]),
                           cand, cand_len)

        shapes = arg_shapes(1)[:3 + 2 * n_streams] + [
            s((1, N, L), jnp.int32), s((1, N), jnp.int32)]
        exp = jax.export.export(jax.jit(flat_rank_fn),
                                platforms=list(platforms))(*shapes)
        blob = exp.serialize()
        with open(os.path.join(out_dir, _RANK_BLOB), "wb") as f:
            f.write(blob)
        blob_bytes[_RANK_BLOB] = len(blob)
        rank_meta = {"n": N, "len": L, "batch": 1}

    # -- streaming programs (VERDICT r4 #2): the live path's
    # prefix/per-token-step split (BeamDecoder._build_stream),
    # exported at B=1 with the (state, kv) pytrees flattened to plain
    # leaf tuples so the deserialized call needs nothing registered.
    # The host drives the loop (AotSession.stream): state leaves are
    # step inputs each call, kv leaves are the carried cache.
    stream_meta = None
    if stream:
        maxlen = dcfg.maxlen
        temp = dcfg.temperature
        transform = decoder._sample_transform()

        def prefix_raw(query, his, cap, *ftl):
            b = to_batch(query, his, cap, ftl)
            st = decoder._decode_state(params, b)
            kv = decoder.model.init_self_kv(b.query.shape[0], maxlen)
            return st, kv

        base_shapes = arg_shapes(1)[:3 + 2 * n_streams]
        st_aval, kv_aval = jax.eval_shape(prefix_raw, *base_shapes)
        st_leaves, st_td = jax.tree.flatten(st_aval)
        kv_leaves, kv_td = jax.tree.flatten(kv_aval)

        def flat_prefix(*args):
            st, kv = prefix_raw(*args)
            return tuple(jax.tree.leaves(st)) + tuple(jax.tree.leaves(kv))

        exp = jax.export.export(jax.jit(flat_prefix),
                                platforms=list(platforms))(*base_shapes)
        blob = exp.serialize()
        with open(os.path.join(out_dir, _STREAM_PREFIX_BLOB), "wb") as f:
            f.write(blob)
        blob_bytes[_STREAM_PREFIX_BLOB] = len(blob)

        def make_step(sty):
            def flat_step(cur, l, seed, fold, *leaves):
                st = jax.tree.unflatten(st_td, leaves[:len(st_leaves)])
                kv = jax.tree.unflatten(kv_td, leaves[len(st_leaves):])
                logp, kv2 = decoder._step(params, st, cur, l, kv)
                if sty == "greedy" or temp <= 0.0:
                    # _build_stream's law: sample with temp<=0 is argmax
                    nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                else:
                    # the live draw law: PRNGKey(seed), caller-fold when
                    # nonzero, then per-position fold (stream_tokens +
                    # _build_stream)
                    key = jax.random.PRNGKey(seed)
                    key = jax.lax.cond(
                        fold != 0,
                        lambda k: jax.random.fold_in(k, fold),
                        lambda k: k, key)
                    nxt = jax.random.categorical(
                        jax.random.fold_in(key, l),
                        transform(logp)).astype(jnp.int32)
                return (nxt,) + tuple(jax.tree.leaves(kv2))
            return flat_step

        s0 = jax.ShapeDtypeStruct((), jnp.int32)
        step_shapes = [s((1,), jnp.int32), s0, s0, s0] \
            + list(st_leaves) + list(kv_leaves)
        styles = ["greedy", "sample"]
        for sty in styles:
            exp = jax.export.export(jax.jit(make_step(sty)),
                                    platforms=list(platforms))(*step_shapes)
            blob = exp.serialize()
            name = _stream_step_blob(sty)
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            blob_bytes[name] = len(blob)
        stream_meta = {"maxlen": maxlen, "styles": styles, "batch": 1,
                       "n_state_leaves": len(st_leaves),
                       "n_kv_leaves": len(kv_leaves)}

    meta = {
        "model_arg": model_arg,
        "epoch": session.epoch,
        "batch": max(buckets),          # serving launch size (turn_batch)
        "batches": buckets,
        "style": style,
        "query_len": query_len,
        "his_len": his_len,
        "cap_len": cap_len,
        "frames": frames,
        "streams": list(datacfg.fea_type),
        "ft_sizes": list(mcfg.ft_sizes),
        "platforms": list(platforms),
        "decode": _to_jsonable(dcfg),
        "weights_quant": weights_quant,
        "rank": rank_meta,
        "stream": stream_meta,
        # Unique per export; the serving watcher (serve_http
        # --watch-seconds with --aot) hot-swaps the artifact when this
        # changes. meta.json is written LAST, after every blob, so a
        # new export_id implies the blobs beside it are complete.
        "export_id": _uuid.uuid4().hex,
        "jax_version": jax.__version__,
        "blob_bytes": sum(blob_bytes.values()),
        "blobs": blob_bytes,
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
    Oversized batches are chunked to the exported row buckets (each
    chunk uses the smallest bucket that fits, so short bursts don't pay
    the max-batch shape); sequences longer than the exported lengths
    raise (tokens) or are frame-truncated (features — the same cap law
    as bucketed serving). Drop-in for the HTTP front-end's
    lock-serialized path (``python -m mtn_tpu.serve_http --aot <dir>``);
    artifacts exported with ``rank=(N, L)`` also serve ``/v1/rank`` via
    :meth:`rank`, artifacts with streaming programs (the default) serve
    ``/v1/stream`` via :meth:`stream`, and :meth:`reload` hot-swaps a
    re-exported artifact — a surface whose program is absent from the
    artifact answers 501."""

    #: serving front-ends (serve_http) key off this to route the
    #: live-only surfaces (stream/reload) to 501 Not Implemented
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
        # reflects the artifact's largest row bucket (the launch size)
        self.decode_cfg = dataclasses.replace(
            config_from_dict("decode", self.meta["decode"]),
            turn_batch=int(self.meta["batch"]))
        self.style = self.meta.get("style", "beam_search")
        self.model_arg = self.meta.get("model_arg")
        self.epoch = self.meta.get("epoch")
        self.weights_quant = self.meta.get("weights_quant", "")
        self.vlist = vocab_list(self.vocab)
        self._dir = art_dir
        self._deserialize = jax.export.deserialize
        self._exps: Dict[int, object] = {}
        self.buckets = sorted(int(b) for b in self.meta.get(
            "batches", [self.meta["batch"]]))
        self._legacy = not os.path.exists(
            os.path.join(art_dir, _bucket_blob(self.buckets[0])))
        self._rank_exp = None
        if self.meta.get("rank"):
            with open(os.path.join(art_dir, _RANK_BLOB), "rb") as f:
                self._rank_exp = self._deserialize(f.read())
            # serve_http routes /v1/rank via hasattr(session, "rank")
            self.rank = self._rank
        self._stream_prefix_exp = None
        self._stream_step_exps: Dict[str, object] = {}
        if self.meta.get("stream"):
            # serve_http routes /v1/stream via hasattr(session, "stream")
            self.stream = self._stream
        self._pad = self.vocab["<blank>"]
        self._eos = self.vocab["<eos>"]
        self._sample_calls = 0

    def _exp_for(self, B: int):
        """The deserialized program for row bucket ``B`` (lazy-loaded)."""
        if B not in self._exps:
            name = _BLOB if self._legacy else _bucket_blob(B)
            with open(os.path.join(self._dir, name), "rb") as f:
                self._exps[B] = self._deserialize(f.read())
        return self._exps[B]

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

    def _flat_args(self, hb, rows: int):
        args = [self._fit_tokens(hb.query, self.meta["query_len"], "query"),
                self._fit_tokens(hb.his, self.meta["his_len"], "his"),
                self._fit_tokens(hb.cap, self.meta["cap_len"], "cap")]
        lens = []
        for i, T in enumerate(self.meta["frames"]):
            ft, ln = self._fit_features(hb.fts[i], hb.fts_len[i], T)
            args.append(ft)
            lens.append(ln)
        return args + lens

    def _chunk_sizes(self, n: int) -> List[int]:
        """Greedy bucket plan for n requests: drain with the largest
        bucket, then the smallest bucket that fits the remainder."""
        sizes, biggest = [], self.buckets[-1]
        while n > 0:
            if n >= biggest:
                sizes.append(biggest)
                n -= biggest
            else:
                sizes.append(next(b for b in self.buckets if b >= n))
                n = 0
        return sizes

    def respond_batch(self, requests) -> List["DecodeResult"]:
        from mtn_tpu.decode.beam import completions_to_results, detokenize
        from mtn_tpu.serve import DecodeResult, encode_requests

        out: List[DecodeResult] = []
        at = 0
        for rows in self._chunk_sizes(len(requests)):
            chunk = list(requests[at:at + rows])
            at += rows
            hb = encode_requests(chunk, self.model_cfg, self.data_cfg,
                                 self.vocab, pad_rows_to=rows)
            flat = self._flat_args(hb, rows)
            exp = self._exp_for(rows)
            if self.style == "beam_search":
                comp_scores, comp_buf, comp_len, _ = exp.call(*flat)
                results = completions_to_results(
                    np.asarray(comp_scores), np.asarray(comp_buf),
                    np.asarray(comp_len), hb.valid)
                out.extend(DecodeResult(
                    [(a, float(sc)) for a, sc in
                     r.texts(self.vlist, self._eos)]) for r in results)
            else:
                if self.style == "sample":
                    seed = np.int32(self.decode_cfg.sample_seed)
                    fold = np.int32(self._sample_calls)
                    self._sample_calls += 1
                    toks = np.asarray(exp.call(*flat, seed, fold))
                else:
                    toks = np.asarray(exp.call(*flat))
                for b in range(toks.shape[0]):
                    if not hb.valid[b]:
                        continue
                    text = detokenize(toks[b, 1:], self.vlist, self._eos)
                    out.append(DecodeResult([(text, 0.0)]))
        return out

    # -- discriminative ranking (exported with rank=(N, L)) ---------------
    def _rank(self, request, candidates: Sequence[str],
              include_eos: bool = True):
        """VisDial-style candidate ranking via the exported rank
        program — same signature and return value as
        ``ServingSession.rank``: ``[(candidate, logp, rank), ...]`` in
        input order. Candidate count/length are frozen at export
        (meta['rank']); oversize raises with a re-export pointer."""
        from mtn_tpu.data.vocab import words2ids
        from mtn_tpu.evalmetrics.retrieval import rank_of
        from mtn_tpu.serve import encode_requests

        if not candidates:
            raise ValueError("no candidates to rank")
        rmeta = self.meta["rank"]
        N, L = int(rmeta["n"]), int(rmeta["len"])
        if len(candidates) > N:
            raise ValueError(
                f"{len(candidates)} candidates exceed the exported rank "
                f"capacity {N}; re-export with a larger --rank")
        extra = 1 if include_eos else 0
        cand = np.full((1, N, L), self._pad, np.int32)
        clen = np.zeros((1, N), np.int32)
        for i, c in enumerate(candidates):
            # ServingSession._cand_ids law: strip words2ids' <sos>/<eos>
            toks = words2ids(c, self.vocab)[1:-1].tolist()
            toks = toks + ([self._eos] if include_eos else [])
            if len(toks) > L:
                raise ValueError(
                    f"candidate {i} needs {len(toks)} tokens, exported "
                    f"rank length is {L}; re-export with a larger --rank")
            cand[0, i, :len(toks)] = toks
            clen[0, i] = len(toks)
        hb = encode_requests([request], self.model_cfg, self.data_cfg,
                             self.vocab, pad_rows_to=int(rmeta["batch"]))
        flat = self._flat_args(hb, int(rmeta["batch"]))
        scores = np.asarray(self._rank_exp.call(*flat, cand, clen))[0]
        scores = [float(s) for s in scores[:len(candidates)]]
        return [(c, s, rank_of(scores, i))
                for i, (c, s) in enumerate(zip(candidates, scores))]

    # -- token streaming (exported with stream=True) -----------------------
    def _stream(self, request, style: Optional[str] = None):
        """Generator of answer words for ONE request, emitted per
        decoded token — the AOT counterpart of ``ServingSession.stream``
        (same style-default law, same sample rng fold law). The host
        drives the exported prefix/step program pair; the per-step
        device fetch is the interactive-latency trade."""
        smeta = self.meta["stream"]
        if style is None:
            style = self.style
            if style == "beam_search":
                style = "greedy"
        if style not in smeta["styles"]:
            raise ValueError(f"style {style!r} not exported "
                             f"(artifact has {smeta['styles']})")
        if self._stream_prefix_exp is None:
            with open(os.path.join(self._dir, _STREAM_PREFIX_BLOB),
                      "rb") as f:
                self._stream_prefix_exp = self._deserialize(f.read())
        if style not in self._stream_step_exps:
            with open(os.path.join(self._dir, _stream_step_blob(style)),
                      "rb") as f:
                self._stream_step_exps[style] = self._deserialize(f.read())
        from mtn_tpu.serve import encode_requests
        rows = int(smeta["batch"])
        hb = encode_requests([request], self.model_cfg, self.data_cfg,
                             self.vocab, pad_rows_to=rows)
        flat = self._flat_args(hb, rows)
        leaves = list(self._stream_prefix_exp.call(*flat))
        ns = int(smeta["n_state_leaves"])
        state_leaves, kv_leaves = leaves[:ns], leaves[ns:]
        seed = np.int32(self.decode_cfg.sample_seed)
        fold = np.int32(0)
        if style == "sample":
            fold = np.int32(self._sample_calls)
            self._sample_calls += 1
        step = self._stream_step_exps[style]
        cur = np.full((rows,), self.vocab["<sos>"], np.int32)
        for l in range(int(smeta["maxlen"])):
            out = step.call(cur, np.int32(l), seed, fold,
                            *state_leaves, *kv_leaves)
            cur = np.asarray(out[0])
            kv_leaves = list(out[1:])
            t = int(cur[0])   # the one valid row
            if t == self._eos:
                return
            yield self.vlist[t]

    def reload(self, art_dir: Optional[str] = None):
        """Hot-swap this session to a (re-)exported artifact — the AOT
        counterpart of ``ServingSession.reload``. Loads the artifact at
        ``art_dir`` (default: this session's directory, i.e. pick up an
        in-place re-export) and adopts its state. NOT internally
        synchronized: callers that serve concurrently must hold the
        serving lock across the call (serve_http's AOT paths all
        serialize behind one lock, so its reload route/watcher do).
        Returns the new artifact's source-checkpoint epoch."""
        fresh = AotSession(art_dir or self._dir)
        # adopt wholesale — including the conditional stream/rank attrs
        # (an artifact without them must lose the route, so clear first)
        self.__dict__.clear()
        self.__dict__.update(fresh.__dict__)
        # the conditional attrs were bound to `fresh`; re-bind to self
        # so their state reads/writes (e.g. _sample_calls) stay coherent
        if "rank" in self.__dict__:
            self.rank = self._rank
        if "stream" in self.__dict__:
            self.stream = self._stream
        return self.epoch

    @property
    def export_id(self) -> Optional[str]:
        """Unique id written at export (None for pre-r5 artifacts)."""
        return self.meta.get("export_id")

    def respond(self, question: str, history=(), caption: str = "",
                features: Optional[Dict[str, np.ndarray]] = None) -> str:
        from mtn_tpu.serve import Request
        req = Request(question=question, history=list(history),
                      caption=caption, features=features or {})
        return self.respond_batch([req])[0][0]

    def warmup(self, stream: bool = False) -> float:
        """Deserialize-compile-and-run the exported programs on one
        blank request; returns elapsed seconds. Mirrors
        ``ServingSession.warmup``: ``stream=True`` additionally drives
        the exported streaming prefix/step pair (ignored when the
        artifact carries no stream programs)."""
        import time

        from mtn_tpu.serve import Request

        t0 = time.monotonic()
        self.respond_batch([Request(question="hello ?")])
        if stream and self.meta.get("stream"):
            for _ in self._stream(Request(question="hello ?")):
                pass
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
    pe.add_argument("--batches", default="",
                    help="comma list of frozen batch-row buckets (e.g. "
                         "1,4,16) — one program per bucket in one "
                         "artifact; short requests use the smallest "
                         "fitting bucket. Default: just --batch")
    pe.add_argument("--query-len", type=int, default=32)
    pe.add_argument("--his-len", type=int, default=128)
    pe.add_argument("--cap-len", type=int, default=64)
    pe.add_argument("--frames", default="",
                    help="comma list, one per feature stream (default 64)")
    pe.add_argument("--platforms", default="cpu,tpu")
    pe.add_argument("--decode-style", default="beam_search",
                    choices=["beam_search", "greedy", "sample"],
                    help="program family to export")
    pe.add_argument("--temperature", type=float, default=None)
    pe.add_argument("--top-k", type=int, default=None)
    pe.add_argument("--top-p", type=float, default=None)
    pe.add_argument("--sample-seed", type=int, default=None)
    pe.add_argument("--beam", type=int, default=None)
    pe.add_argument("--nbest", type=int, default=None)
    pe.add_argument("--maxlen", type=int, default=None)
    pe.add_argument("--penalty", type=float, default=None)
    pe.add_argument("--min-len", type=int, default=None)
    pe.add_argument("--rank", default="",
                    help="N,L — additionally export the discriminative "
                         "rank program frozen at N candidates of padded "
                         "length L (serves /v1/rank in --aot serving)")
    pe.add_argument("--stream", default=1, type=int,
                    help="export the streaming prefix/per-token-step "
                         "programs (greedy+sample, B=1) so --aot serving "
                         "answers /v1/stream (default on; 0 disables)")
    pe.add_argument("--weights-quant", default="",
                    choices=["", "int8", "int8-fp-head"],
                    help="bake weight-only int8 kernels (+ per-channel "
                         "scales) as the exported constants: ~4x smaller "
                         "artifact / HBM per replica, live-quantized-"
                         "session numerics (int8-fp-head keeps the vocab "
                         "head f32 — the fidelity point)")

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
        dcfg = DecodeConfig(decode_style=args.decode_style)
        for field in ("beam", "nbest", "maxlen", "penalty", "min_len",
                      "temperature", "top_k", "top_p", "sample_seed"):
            v = getattr(args, field)
            if v is not None:
                setattr(dcfg, field, v)
        frames = ([int(x) for x in args.frames.split(",") if x]
                  if args.frames else None)
        batches = ([int(x) for x in args.batches.split(",") if x]
                   if args.batches else None)
        rank = None
        if args.rank:
            parts = [int(x) for x in args.rank.split(",")]
            if len(parts) != 2:
                p.error("--rank needs N,L (e.g. 100,24)")
            rank = (parts[0], parts[1])
        meta = export_decode(
            args.model, args.out, batch=args.batch,
            query_len=args.query_len, his_len=args.his_len,
            cap_len=args.cap_len, frames=frames, decode_cfg=dcfg,
            platforms=[s for s in args.platforms.split(",") if s],
            batches=batches, rank=rank, weights_quant=args.weights_quant,
            stream=bool(args.stream))
        print(json.dumps({"out": args.out,
                          "blob_bytes": meta["blob_bytes"],
                          "batches": meta["batches"],
                          "style": meta["style"],
                          "rank": meta["rank"],
                          "weights_quant": meta["weights_quant"]}))
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
