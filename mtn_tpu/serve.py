"""Interactive serving session for a trained MTN model.

The reference has no serving layer — "inference" is the offline batch
script (SURVEY.md §1: no service/API layer). This module provides one:
load a checkpoint once, then answer dialogue turns with the cached
batched beam decoder. Inputs are bucket-padded so repeated calls reuse
the same compiled decode executable.

Usage::

    session = ServingSession.from_checkpoint("exps/x/mtn_best")
    answer = session.respond(
        question="is there any audio ?",
        history=[("are there people ?", "yes there is a man")],
        caption="a man sits on a couch reading a book",
        features={"i3d_rgb": arr1, "vggish": arr2},   # (T, D) each
    )
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mtn_tpu.config import DecodeConfig, config_from_dict
from mtn_tpu.data.batching import HostBatch, pad_seqs
from mtn_tpu.data.vocab import BLANK, vocab_list, words2ids
from mtn_tpu.decode.beam import BeamDecoder
from mtn_tpu.train.batch import device_batch


def _round_up(n: int, m: int) -> int:
    return n if m <= 1 else -(-n // m) * m


class ServerOverloaded(RuntimeError):
    """Load-shedding signal: the serving queue is at capacity. HTTP
    maps this to 503 + Retry-After so callers back off instead of
    piling onto an unbounded queue."""


class DeadlineExceeded(RuntimeError):
    """A request's deadline passed before its decode launched. Expired
    requests are shed *before* consuming device time (there is no way
    to cancel a launched XLA program), so under overload the device
    only works on requests whose caller is still waiting. HTTP maps
    this to 504."""


class DecodeResult(tuple):
    """An ``(answer, score)`` pair that also carries the full n-best.

    Unpacks exactly like the 2-tuple every caller already uses;
    ``.nbest`` is the ranked ``[(answer_i, score_i), ...]`` list (the
    reference's generate.py writes n-best hypothesis logs, so the
    serving layer exposes them too — beam sessions have ``nbest``
    entries, greedy/sample sessions a single one)."""

    def __new__(cls, nbest):
        self = tuple.__new__(cls, nbest[0])
        self.nbest = list(nbest)
        return self


@dataclasses.dataclass
class Request:
    question: str
    history: List[Tuple[str, str]] = dataclasses.field(default_factory=list)
    caption: str = ""
    features: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    # absolute time.monotonic() seconds; None = no deadline. Checked at
    # launch time (AsyncServer) / after the session lock is acquired
    # (serve_http lock path) — an expired request is shed with
    # DeadlineExceeded instead of occupying the device.
    deadline: Optional[float] = None

    def expired(self) -> bool:
        import time as _time
        return self.deadline is not None and _time.monotonic() > self.deadline


def encode_requests(requests: Sequence[Request], model_cfg, data_cfg, vocab,
                    length_bucket: int = 1, feature_bucket: int = 1,
                    pad_rows_to: int = 0) -> HostBatch:
    """Turn raw dialogue requests into a padded HostBatch (the serving
    counterpart of data_handler's load+make_batch path, using the same
    history-construction law)."""
    blank = np.array([vocab[BLANK]], dtype=np.int32)
    sep_cap = data_cfg.include_caption != "none" and data_cfg.separate_caption
    h_seqs, q_seqs, c_seqs = [], [], []
    ft_arrays: List[List[np.ndarray]] = [[] for _ in model_cfg.ft_sizes]
    for r in requests:
        caption = words2ids(r.caption, vocab) if r.caption else blank
        turns = list(r.history)
        if data_cfg.max_history_length > 0:  # data_handler.py:117-120 law
            turns = turns[-data_cfg.max_history_length:]
        qa = [np.concatenate([words2ids(q, vocab), words2ids(a, vocab)])
              for q, a in turns]
        head = blank if sep_cap else caption
        history = np.concatenate([head] + qa).astype(np.int32) if qa else head
        question = words2ids(r.question, vocab)
        if data_cfg.merge_source:  # data_handler.py:126-127 law
            question = np.concatenate(
                (caption, history, question)).astype(np.int32)
        h_seqs.append(history)
        q_seqs.append(question)
        c_seqs.append(caption if sep_cap else blank)
        for i, dim in enumerate(model_cfg.ft_sizes):
            name = (data_cfg.fea_type[i]
                    if i < len(data_cfg.fea_type) else str(i))
            ft = r.features.get(name) if r.features else None
            if ft is None:
                ft = np.zeros((1, dim), np.float32)
            ft = np.asarray(ft, np.float32)
            if ft.ndim == 3:  # (T, R, D) spatial: flatten regions
                ft = ft.reshape(-1, ft.shape[-1])
            ft_arrays[i].append(ft)
    n = len(requests)
    B = max(n, pad_rows_to) if pad_rows_to else n
    pad = vocab[BLANK]
    lb = max(length_bucket, 1)
    fb = max(feature_bucket, 1)

    def padded(seqs):
        L = _round_up(max(len(s) for s in seqs), lb)
        return pad_seqs(seqs, L, pad, B)

    fts, fts_len = [], []
    for i, dim in enumerate(model_cfg.ft_sizes):
        T = _round_up(max(a.shape[0] for a in ft_arrays[i]), fb)
        arr = np.zeros((B, T, dim), np.float32)
        ln = np.zeros((B,), np.int32)
        for j, a in enumerate(ft_arrays[i]):
            n_fr = min(a.shape[0], T)
            arr[j, :n_fr] = a[:n_fr, :dim]
            ln[j] = n_fr
        fts.append(arr)
        fts_len.append(ln)
    ans = np.full((B, lb), pad, np.int32)
    return HostBatch(query=padded(q_seqs), his=padded(h_seqs),
                     answer_in=ans, answer_out=ans, cap=padded(c_seqs),
                     fts=fts, fts_len=fts_len,
                     valid=(np.arange(B) < n))


def _restore_params(ckpt, epoch, model_cfg, data_cfg, vocab):
    """Restore checkpoint params into an abstract state built from
    ``model_cfg`` (shared by from_checkpoint and reload)."""
    import jax
    from mtn_tpu.config import TrainConfig
    from mtn_tpu.train.trainer import Trainer

    trainer = Trainer(model_cfg, TrainConfig())
    sample = device_batch(encode_requests(
        [Request("")], model_cfg, data_cfg, vocab))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    return ckpt.restore_params(state, epoch)


class ServingSession:
    """Single-model interactive decoder (thread-unsafe; one per worker)."""

    def __init__(self, params, model_cfg, data_cfg, vocab: Dict[str, int],
                 decode_cfg: Optional[DecodeConfig] = None, mesh=None,
                 feature_transfer: str = "", weights_quant: str = ""):
        # Opt-in weight-only int8 for the served decode programs
        # (mtn_tpu/utils/quantize.py): kernels stored int8 + per-channel
        # scales, dequant fused into the matmul reads. "" = full
        # precision (the parity-proven default); "int8-fp-head" keeps
        # the vocab-projection head(s) full precision — the measured
        # fidelity point (BENCH.md "Weight-only int8 decode": top-1
        # agreement 96.4% vs 93.8% full-int8, same speed).
        if weights_quant not in ("", "int8", "int8-fp-head"):
            raise ValueError(f"weights_quant {weights_quant!r} "
                             "(expected '', 'int8' or 'int8-fp-head')")
        self.weights_quant = weights_quant
        # Under a >1-device mesh the served param tree is laid out with
        # the training/CLI partition rules (replicated under pure dp,
        # Megatron-paired under tp) and every request batch is sharded
        # over the ``data`` axis — the same GSPMD decode the generate
        # CLI runs. Quantized trees shard with the same specs: int8
        # kernels follow their f32 kernels' rules and the per-channel
        # scales follow their kernel's output axis (VERDICT r4 #1 —
        # the int8 HBM saving now reaches every mesh replica).
        self.mesh = mesh
        self.shardings = None
        if mesh is not None and any(n > 1 for n in mesh.shape.values()):
            from mtn_tpu.parallel.sharding import Shardings
            self.shardings = Shardings(mesh)
            tb = (decode_cfg or DecodeConfig()).turn_batch
            data = mesh.shape.get("data", 1)
            if data > 1 and tb % data != 0:
                raise ValueError(
                    f"turn_batch {tb} does not divide over the mesh's "
                    f"data axis ({data}); pick a multiple (the serving "
                    "CLI shrinks the axis automatically via "
                    "make_mesh_from_args)")
        self.params = self._place(self._maybe_quantize(params))
        self.model_cfg = model_cfg
        self.data_cfg = data_cfg
        self.vocab = vocab
        self.vlist = vocab_list(vocab)
        self.decode_cfg = decode_cfg or DecodeConfig()
        # Host->device feature wire format (same knob as the generate
        # CLI's --feature_transfer): "" follows the model compute dtype;
        # "int8" ships quantized features + f32 row scales (~1/4 the
        # bytes, error <= 1/254 per frame) for transfer-bound hosts —
        # docs/BENCH.md "Feature transfer".
        self.feature_dtype = feature_transfer or model_cfg.dtype
        from mtn_tpu.train.batch import to_device_fn
        self._to_device = to_device_fn(self.feature_dtype, self.shardings)
        self.decoder = BeamDecoder(model_cfg, self.decode_cfg, mesh=mesh)
        self._lb = max(self.data_cfg.length_bucket, 1)
        self._fb = max(self.data_cfg.feature_bucket, 1)
        self._sample_calls = 0  # fold per-call so noise isn't reused
        self.epoch = None       # checkpoint epoch currently served

    def _maybe_quantize(self, params):
        wq = getattr(self, "weights_quant", "")
        if wq:
            from mtn_tpu.utils.quantize import quantize_params
            return quantize_params(params,
                                   skip_generator=(wq == "int8-fp-head"))
        return params

    def _place(self, params):
        """Lay a (possibly quantized) param tree out over the mesh."""
        if self.shardings is not None:
            return self.shardings.shard_state(params)
        return params

    def _data_size(self) -> int:
        return self.mesh.shape.get("data", 1) if self.shardings else 1

    @classmethod
    def from_checkpoint(cls, model_arg: str,
                        decode_cfg: Optional[DecodeConfig] = None,
                        mesh=None, model_overrides: Optional[Dict] = None,
                        feature_transfer: str = "",
                        weights_quant: str = "") -> "ServingSession":
        """``model_overrides``: ModelConfig fields to set on top of the
        sidecar config — serving-time knobs with no param-tree effect
        (e.g. ``{"fused_decode_qkv": True}``, dtype, the Pallas flags).
        ``feature_transfer``: feature wire format ("", "bfloat16",
        "int8") — see :class:`ServingSession`. ``weights_quant``:
        "int8" serves weight-only-quantized decode programs."""
        from mtn_tpu.cli.generate import _split_model_arg
        from mtn_tpu.utils.checkpoint import CheckpointManager

        prefix, epoch = _split_model_arg(model_arg)
        ckpt = CheckpointManager(prefix)
        vocab, conf = ckpt.load_conf()
        model_cfg = config_from_dict("model", conf["model"])
        for key, val in (model_overrides or {}).items():
            if not hasattr(model_cfg, key):
                raise ValueError(f"unknown ModelConfig field {key!r}")
            setattr(model_cfg, key, val)
        data_cfg = config_from_dict("data", conf["data"])
        params, used_epoch = _restore_params(ckpt, epoch, model_cfg,
                                             data_cfg, vocab)
        session = cls(params, model_cfg, data_cfg, vocab, decode_cfg,
                      mesh=mesh, feature_transfer=feature_transfer,
                      weights_quant=weights_quant)
        session.model_arg = model_arg
        session.epoch = used_epoch
        return session

    def reload(self, model_arg: Optional[str] = None) -> object:
        """Hot-swap the served parameters from a checkpoint.

        Same-architecture only: the restore target is built from THIS
        session's model config, so the new tree always matches and every
        compiled program is reused (no recompile, no downtime); a
        checkpoint from a different architecture fails the restore and
        is surfaced as ValueError. The swap is a single atomic attribute
        assignment, so launches already in flight finish on the old
        weights and subsequent launches use the new ones. Returns the
        restored epoch.
        """
        from mtn_tpu.cli.generate import _split_model_arg
        from mtn_tpu.utils.checkpoint import CheckpointManager

        arg = model_arg or getattr(self, "model_arg", None)
        if not arg:
            raise ValueError("no checkpoint path: session was not built "
                             "via from_checkpoint and model_arg is None")
        prefix, epoch = _split_model_arg(arg)
        try:
            new_params, used_epoch = _restore_params(
                CheckpointManager(prefix), epoch, self.model_cfg,
                self.data_cfg, self.vocab)
        except (ValueError, FileNotFoundError):
            raise
        except Exception as e:  # orbax structure/shape/read failures
            raise ValueError(
                f"cannot restore {arg} into the served architecture: "
                f"{type(e).__name__}: {e}")
        self.params = self._place(self._maybe_quantize(new_params))  # atomic
        self.model_arg = arg
        self.epoch = used_epoch
        return used_epoch

    def warmup(self, stream: bool = False) -> float:
        """Compile-and-run every decode program this session serves on a
        blank padded request, so the first real request pays no compile
        latency (cold XLA compiles are seconds to minutes). Covers the
        configured decode style; ``stream=True`` additionally builds the
        streaming prefix/step pair. A sample-style warmup advances the
        per-call rng fold like any other call. Returns seconds spent."""
        import time as _time
        t0 = _time.monotonic()
        blank = Request(question="")
        self.respond_batch([blank])
        if stream:
            for _ in self.stream(blank):
                pass
        return _time.monotonic() - t0

    def respond_batch(self, requests: Sequence[Request]
                      ) -> List[Tuple[str, float]]:
        # pad the batch axis to turn_batch so every request batch of size
        # <= turn_batch reuses the same compiled beam program (oversize
        # batches still pad to a data-axis multiple under a mesh)
        rows = self.decode_cfg.turn_batch \
            if len(requests) <= self.decode_cfg.turn_batch \
            else _round_up(len(requests), self._data_size())
        hb = encode_requests(requests, self.model_cfg, self.data_cfg,
                             self.vocab, self._lb, self._fb,
                             pad_rows_to=rows)
        db = self._to_device(hb)
        from mtn_tpu.decode.beam import detokenize
        style = self.decode_cfg.decode_style
        if style in ("greedy", "sample"):
            if style == "sample":
                rows_out = self.decoder.sample_batch(
                    self.params, db, fold=self._sample_calls)
                self._sample_calls += 1
            else:
                rows_out = self.decoder.greedy_batch(self.params, db)
            return [DecodeResult(
                [(detokenize(r, self.vlist, self.vocab["<eos>"]), 0.0)])
                for r in rows_out]
        results = self.decoder.beam_batch(self.params, db)
        return [DecodeResult([(a, float(s)) for a, s in
                              res.texts(self.vlist, self.vocab["<eos>"])])
                for res in results]

    def respond(self, question: str, history: Sequence[Tuple[str, str]] = (),
                caption: str = "",
                features: Optional[Dict[str, np.ndarray]] = None) -> str:
        req = Request(question=question, history=list(history),
                      caption=caption, features=features or {})
        return self.respond_batch([req])[0][0]

    def _cand_ids(self, candidates: Sequence[str]) -> List[List[int]]:
        """Candidate strings -> token-id lists for rank_batch. words2ids
        wraps with <sos>/<eos>; rank_batch supplies its own <sos> input
        prefix and (include_eos) <eos> target, so strip both wrappers."""
        return [words2ids(c, self.vocab)[1:-1].tolist() for c in candidates]

    def rank(self, request: Request, candidates: Sequence[str],
             include_eos: bool = True) -> List[Tuple[str, float, int]]:
        """VisDial-style discriminative mode: score the given answer
        candidates by generative log-likelihood under the dialogue
        context and rank them (reference readme.md:81-86 — its visdial
        branch "selects the best answer candidate based on the log
        likelihood among the answer options").

        Returns ``[(candidate, logp, rank), ...]`` in the INPUT order;
        ``rank`` is the 1-indexed position under descending
        log-likelihood (tie law: evalmetrics.retrieval.rank_of).
        Retrieval metrics over a test run come from
        ``evalmetrics.retrieval.retrieval_metrics``.
        """
        from mtn_tpu.evalmetrics.retrieval import rank_of
        if not candidates:
            raise ValueError("no candidates to rank")
        # B=1: ranking tiles the turn over N candidates on-device, so
        # padding the batch axis to turn_batch would multiply that work
        # by unused rows; the (N, L)-bucketed rank program recompiles
        # only per candidate-count bucket. (Under a mesh the batch axis
        # still pads to the data-axis size so the dp layout divides.)
        hb = encode_requests([request], self.model_cfg, self.data_cfg,
                             self.vocab, self._lb, self._fb,
                             pad_rows_to=self._data_size())
        db = self._to_device(hb)
        cands = [self._cand_ids(candidates)] + \
            [[] for _ in range(db.query.shape[0] - 1)]
        scores = self.decoder.rank_batch(self.params, db, cands,
                                         include_eos=include_eos)[0]
        return [(c, s, rank_of(scores, i))
                for i, (c, s) in enumerate(zip(candidates, scores))]

    def stream(self, request: Request, style: Optional[str] = None):
        """Generator of answer words for ONE request, emitted as they
        are decoded (per-step device fetches; see
        BeamDecoder.stream_tokens). ``style`` is 'greedy' or 'sample';
        default follows decode_cfg, with beam sessions streaming
        greedily (an n-best cannot stream). Ends at <eos> or maxlen."""
        if style is None:
            style = self.decode_cfg.decode_style
            if style == "beam_search":
                style = "greedy"
        hb = encode_requests([request], self.model_cfg, self.data_cfg,
                             self.vocab, self._lb, self._fb,
                             pad_rows_to=self.decode_cfg.turn_batch)
        db = self._to_device(hb)
        fold = 0
        if style == "sample":
            fold = self._sample_calls
            self._sample_calls += 1
        eos = self.vocab["<eos>"]
        for step_tokens in self.decoder.stream_tokens(
                self.params, db, style=style, fold=fold):
            t = int(step_tokens[0])   # the one valid row
            if t == eos:
                return
            yield self.vlist[t]


class AsyncServer:
    """Continuous-batching wrapper around a :class:`ServingSession`.

    Callers ``submit`` requests at any time and get a
    ``concurrent.futures.Future``. A scheduler thread packs waiting
    requests into ``turn_batch``-padded batches (so every launch reuses
    the one compiled beam program), keeps up to ``max_in_flight``
    batches dispatched on the device at once (the XLA dispatch queue
    hides host latency, exactly like the generate CLI's pipeline), and
    resolves futures as batches drain in order.

    Batching policy: a batch launches as soon as the device has a free
    in-flight slot AND either ``turn_batch`` requests are waiting or
    ``max_wait_ms`` has passed since the oldest waiting request — the
    standard latency/throughput knob of continuous-batching servers.

    Backpressure: with ``max_queue > 0``, ``submit`` raises
    :class:`ServerOverloaded` once that many requests are already
    waiting (approximate under concurrency — qsize races with the
    scheduler — which is the standard load-shedding trade: the bound
    protects the queue from runaway growth, not an exact count).
    """

    def __init__(self, session: ServingSession, max_in_flight: int = 2,
                 max_wait_ms: float = 5.0, max_queue: int = 0):
        import queue
        import threading
        if session.decode_cfg.decode_style != "beam_search":
            raise ValueError(
                "AsyncServer drives the beam program; build the "
                "ServingSession with decode_style='beam_search' "
                f"(got {session.decode_cfg.decode_style!r})")
        self.session = session
        self.max_in_flight = max_in_flight
        self.max_wait = max_wait_ms / 1e3
        self.max_queue = max_queue
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.launches = 0       # program launches (for tests/metrics)
        self.n_expired = 0      # requests shed at launch (DeadlineExceeded)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, request: Request):
        return self._submit("beam", request, None)

    def submit_rank(self, request: Request, candidates: Sequence[str],
                    include_eos: bool = True):
        """Enqueue a discriminative-ranking request; the scheduler packs
        concurrent rank requests into one tiled rank launch (grouped by
        include_eos — it changes the scored event). The future resolves
        to the ``ServingSession.rank`` structure:
        ``[(candidate, logp, rank), ...]`` in input order."""
        if not candidates:
            raise ValueError("no candidates to rank")
        return self._submit("rank", request, (list(candidates), include_eos))

    def _submit(self, kind, request, extra):
        from concurrent.futures import Future
        if self.max_queue and self._q.qsize() >= self.max_queue:
            raise ServerOverloaded(
                f"decode queue full ({self.max_queue} requests waiting)")
        fut: Future = Future()
        self._q.put((kind, request, extra, fut))
        return fut

    def queue_depth(self) -> int:
        """Approximate number of requests waiting for a launch slot."""
        return self._q.qsize()

    def respond(self, request: Request, timeout: Optional[float] = None):
        return self.submit(request).result(timeout)

    def stop(self):
        self._stop.set()
        self._thread.join()

    # -- scheduler thread ---------------------------------------------------
    def _collect(self):
        """Gather up to turn_batch waiting (request, future) pairs,
        launching early only after max_wait_ms from the first one."""
        import queue
        import time as _time
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = _time.time() + self.max_wait
        cap = self.session.decode_cfg.turn_batch
        while len(batch) < cap:
            remaining = deadline - _time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _launch(self, items):
        """Launch one homogeneous group (all "beam" or all "rank" with one
        include_eos — the scheduler partitions before calling)."""
        # Claim each future before doing work: a caller may have
        # cancelled it while it sat in the queue, and set_result on a
        # cancelled future raises InvalidStateError (which would kill
        # this scheduler thread). set_running_or_notify_cancel() both
        # filters those out and makes the survivors uncancellable.
        items = [it for it in items if it[3].set_running_or_notify_cancel()]
        # shed expired requests before they consume a launch slot: a
        # dispatched XLA program cannot be cancelled, so the deadline
        # check happens at the last host-side moment
        live = []
        for it in items:
            if it[1].expired():
                self.n_expired += 1
                it[3].set_exception(DeadlineExceeded(
                    "deadline passed before the decode launched"))
            else:
                live.append(it)
        items = live
        if not items:
            return None
        kind = items[0][0]
        s = self.session
        reqs = [r for _, r, _, _ in items]
        hb = encode_requests(reqs, s.model_cfg, s.data_cfg, s.vocab,
                             s._lb, s._fb,
                             pad_rows_to=s.decode_cfg.turn_batch)
        db = s._to_device(hb)
        if kind == "rank":
            include_eos = items[0][2][1]
            cand_ids = [s._cand_ids(extra[0]) for _, _, extra, _ in items]
            cand_ids += [[] for _ in range(db.query.shape[0] - len(items))]
            raw = s.decoder.rank_batch_raw(s.params, db, cand_ids,
                                           include_eos=include_eos)
        else:
            raw = s.decoder.beam_batch_raw(s.params, db)  # async dispatch
        self.launches += 1
        return (kind, items, raw, db.valid)

    def _drain(self, inflight_item):
        from mtn_tpu.evalmetrics.retrieval import rank_of
        kind, items, raw, valid = inflight_item
        s = self.session
        try:
            if kind == "rank":
                rows = s.decoder.rank_results(raw, valid)  # blocks
                for (_, _, extra, fut), scores in zip(items, rows):
                    if not fut.done():
                        fut.set_result([
                            (c, sc, rank_of(scores, i))
                            for i, (c, sc) in enumerate(zip(extra[0],
                                                            scores))])
                return
            results = s.decoder.beam_results(raw, valid)  # blocks
            for (_, _, _, fut), res in zip(items, results):
                if not fut.done():
                    fut.set_result(DecodeResult(
                        [(a, float(sc)) for a, sc in
                         res.texts(s.vlist, s.vocab["<eos>"])]))
        except BaseException as e:  # surface device errors to callers
            for _, _, _, fut in items:
                if not fut.done():
                    fut.set_exception(e)

    @staticmethod
    def _partition(items):
        """Split a collected FIFO run into homogeneous launch groups:
        beam items together; rank items grouped by include_eos (it
        changes the scored event, so groups never mix)."""
        beams, ranks = [], {}
        for it in items:
            if it[0] == "beam":
                beams.append(it)
            else:
                ranks.setdefault(it[2][1], []).append(it)
        return ([beams] if beams else []) + list(ranks.values())

    def _loop(self):
        in_flight = []
        while not self._stop.is_set() or not self._q.empty() or in_flight:
            pairs = [] if (self._stop.is_set() and self._q.empty()) \
                else self._collect()
            for group in self._partition(pairs):
                try:
                    item = self._launch(group)
                    if item is not None:
                        in_flight.append(item)
                except BaseException as e:  # encode/dispatch failure
                    for _, _, _, fut in group:
                        if not fut.done():
                            fut.set_exception(e)
            # drain when at device capacity, or whenever there is
            # nothing new to launch (so lone batches resolve promptly)
            if in_flight and (not pairs
                              or len(in_flight) >= self.max_in_flight):
                self._drain(in_flight.pop(0))
        # A submit() racing stop() can enqueue after the final emptiness
        # check above; fail such leftovers instead of hanging callers.
        import queue
        while True:
            try:
                _, _, _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if fut.set_running_or_notify_cancel():
                fut.set_exception(RuntimeError("AsyncServer stopped"))
