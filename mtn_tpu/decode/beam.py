"""Jit-compiled batched beam search with KV + auto-encoder caches.

Semantics parity with the reference ``beam_search_decode``
(data_utils.py:188-242):

- the beam expands every surviving hypothesis each step; candidate
  expansions *skip* ``<unk>`` and ``<eos>`` (data_utils.py:220-221);
- a completed hypothesis is recorded at every step ``l >= min_len`` with
  score ``lp + logp[<eos>] + penalty·(len+1)`` (length reward,
  data_utils.py:213-217);
- all ``maxlen`` steps run regardless of completions, and the final
  n-best is the global top-``nbest`` over every recorded completion
  (with ``DecodeConfig.early_stop`` the loop instead terminates as soon
  as a score bound proves no later completion can enter any n-best —
  provably output-identical, fewer steps);
- the reference's replace-argmin insertion over per-hypothesis descending
  candidates is equivalent to a global top-``beam`` over the
  (beam × vocab) candidate matrix, which is how it is computed here.

Performance design (the ≥20× opportunity, SURVEY.md §3.2): the reference
decodes one dialogue turn at a time (generate.py:146) and re-runs the
full decoder over the whole prefix for each of the ~beam×maxlen steps
with a host sync per hypothesis. Here:

- many dialogue turns are decoded per device batch (``turn_batch``);
- encoder outputs, the full auto-encoder chain, and every cross-attention
  K/V are computed once per turn (``MTN.init_decode_state``) and tiled
  over the beam;
- each step advances ONE token for all (turns × beam) rows with a
  self-attention KV cache inside one ``lax.scan`` — no host round-trips
  until the scan finishes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtn_tpu.config import DecodeConfig, ModelConfig
from mtn_tpu.data.vocab import SPECIALS
from mtn_tpu.models.mtn import MTN, DecodeState
from mtn_tpu.train.batch import DeviceBatch, batch_masks
from mtn_tpu.utils.quantize import model_variables

NEG_INF = -1.0e30


def _round_up_int(n: int, m: int) -> int:
    return n if m <= 1 else -(-n // m) * m


def detokenize(tokens, vlist, eos: int = SPECIALS["<eos>"]) -> str:
    """Token ids -> space-joined words, cut at <eos> (generate.py:59-64)."""
    words = []
    for t in tokens:
        if int(t) == eos:
            break
        words.append(vlist[int(t)])
    return " ".join(words)


@dataclass
class BeamResult:
    """Host-side n-best for one turn."""

    tokens: List[List[int]]   # nbest token lists (no <sos>/<eos>)
    scores: List[float]

    def texts(self, vlist, eos: int = SPECIALS["<eos>"]):
        return [(detokenize(t, vlist, eos), s)
                for t, s in zip(self.tokens, self.scores)]


def completions_to_results(comp_scores, comp_buf, comp_len,
                           valid) -> List[BeamResult]:
    """Host-side conversion of the beam program's completion pool
    (``(B, nbest)`` scores, ``(B, nbest, maxlen+1)`` token buffers with
    the <sos> prefix, ``(B, nbest)`` lengths) into one :class:`BeamResult`
    per *valid* row. Module-level (no model needed) so AOT-deserialized
    decode programs (utils/aot.py) share the exact law with the live
    decoder, including the reference's empty-pool fallback
    (data_utils.py:241-242)."""
    results = []
    for b in range(comp_scores.shape[0]):
        if not valid[b]:
            continue
        toks, scs = [], []
        for n in range(comp_scores.shape[1]):
            if comp_scores[b, n] <= NEG_INF / 2:
                continue
            L = int(comp_len[b, n])
            toks.append([int(t) for t in comp_buf[b, n, 1:L + 1]])
            scs.append(float(comp_scores[b, n]))
        if not toks:  # reference fallback (data_utils.py:241-242)
            toks, scs = [[]], [0.0]
        results.append(BeamResult(tokens=toks, scores=scs))
    return results


class BeamDecoder:
    def __init__(self, model_cfg: ModelConfig, decode_cfg: DecodeConfig,
                 pad: int = SPECIALS["<blank>"], sos: int = SPECIALS["<sos>"],
                 eos: int = SPECIALS["<eos>"], unk: int = SPECIALS["<unk>"],
                 mesh=None):
        self.model = MTN(model_cfg)
        self.cfg = decode_cfg
        self.pad, self.sos, self.eos, self.unk = pad, sos, eos, unk
        self.mesh = mesh
        self._beam_fn = None
        self._greedy_fn = None
        self._sample_fn = None
        self._rank_fns = {}

    # ------------------------------------------------------------------
    def _decode_state(self, params, batch: DeviceBatch) -> DecodeState:
        # `params` throughout the decoder is either a plain param tree
        # or a quantize.QuantizedParams bundle (opt-in int8 weights) —
        # model_variables() builds the right apply collections for both
        masks, _ = batch_masks(batch, self.pad)
        return self.model.apply(
            model_variables(params), batch.query, batch.his, batch.cap,
            batch.fts, masks, method=MTN.init_decode_state)

    def _step(self, params, state, tokens, pos, self_kv):
        return self.model.apply(model_variables(params), state, tokens, pos,
                                self_kv, method=MTN.decode_step)

    # ------------------------------------------------------------------
    def _build_beam(self):
        cfg = self.cfg
        beam, nbest = cfg.beam, cfg.nbest
        maxlen, min_len, penalty = cfg.maxlen, cfg.min_len, cfg.penalty
        eos, unk, sos = self.eos, self.unk, self.sos

        def beam_fn(params, batch: DeviceBatch):
            B = batch.query.shape[0]
            state = self._decode_state(params, batch)
            # tile every per-turn tensor over the beam: row b*beam+k = turn b
            state = jax.tree.map(lambda x: jnp.repeat(x, beam, axis=0), state)
            self_kv = self.model.init_self_kv(B * beam, maxlen)

            tok_buf = jnp.full((B, beam, maxlen + 1), self.pad, jnp.int32)
            tok_buf = tok_buf.at[:, :, 0].set(sos)
            scores = jnp.full((B, beam), NEG_INF, jnp.float32)
            scores = scores.at[:, 0].set(0.0)  # 1 live hypothesis at step 0
            comp_scores = jnp.full((B, nbest), NEG_INF, jnp.float32)
            comp_buf = jnp.full((B, nbest, maxlen + 1), self.pad, jnp.int32)
            comp_len = jnp.zeros((B, nbest), jnp.int32)

            def step(carry, l):
                tok_buf, scores, self_kv, comp_scores, comp_buf, comp_len = carry
                cur = jax.lax.dynamic_index_in_dim(
                    tok_buf, l, axis=2, keepdims=False).reshape(B * beam)
                logp, self_kv = self._step(params, state, cur, l, self_kv)
                V = logp.shape[-1]
                logp = logp.reshape(B, beam, V)
                # -- record completions (score: data_utils.py:214) --------
                eos_sc = scores + logp[:, :, eos] \
                    + penalty * (l + 1).astype(jnp.float32)
                eos_sc = jnp.where(l >= min_len, eos_sc, NEG_INF)
                all_sc = jnp.concatenate([comp_scores, eos_sc], axis=1)
                all_buf = jnp.concatenate([comp_buf, tok_buf], axis=1)
                all_len = jnp.concatenate(
                    [comp_len, jnp.full((B, beam), l, jnp.int32)], axis=1)
                comp_scores, top = jax.lax.top_k(all_sc, nbest)
                comp_buf = jnp.take_along_axis(all_buf, top[:, :, None],
                                               axis=1)
                comp_len = jnp.take_along_axis(all_len, top, axis=1)
                # -- expand continuations (skip unk/eos) ------------------
                cand = scores[:, :, None] + logp
                cand = cand.at[:, :, unk].set(NEG_INF)
                cand = cand.at[:, :, eos].set(NEG_INF)
                # two-stage top-k: each parent contributes at most `beam`
                # winners, so top-beam per parent then top-beam over the
                # beam^2 survivors selects exactly the global top-beam
                # (ties keep the same parent-major preference order as a
                # flat top-k over beam*V)
                v1, i1 = jax.lax.top_k(cand.reshape(B * beam, V), beam)
                scores, idx2 = jax.lax.top_k(
                    v1.reshape(B, beam * beam), beam)
                parent = idx2 // beam
                token = jnp.take_along_axis(
                    i1.reshape(B, beam * beam), idx2, axis=1).astype(jnp.int32)
                tok_buf = jnp.take_along_axis(tok_buf, parent[:, :, None],
                                              axis=1)
                write = jnp.arange(maxlen + 1)[None, None, :] == (l + 1)
                tok_buf = jnp.where(write, token[:, :, None], tok_buf)

                def reorder(kv):
                    k, v = kv
                    def ro(x):
                        x = x.reshape((B, beam) + x.shape[1:])
                        idx = parent.reshape(parent.shape + (1,) * (x.ndim - 2))
                        x = jnp.take_along_axis(x, idx, axis=1)
                        return x.reshape((B * beam,) + x.shape[2:])
                    return ro(k), ro(v)

                self_kv = tuple(reorder(kv) for kv in self_kv)
                return (tok_buf, scores, self_kv, comp_scores, comp_buf,
                        comp_len), None

            carry = (tok_buf, scores, self_kv, comp_scores, comp_buf,
                     comp_len)
            if not cfg.early_stop:
                carry, _ = jax.lax.scan(step, carry, jnp.arange(maxlen),
                                        unroll=cfg.scan_unroll)
                n_steps = jnp.full((), maxlen, jnp.int32)
            else:
                # while_loop with a convergence bound. Active scores only
                # decay (each appended logp ≤ 0) and a completion at step
                # l' scores ≤ score_active + penalty·(l'+1), so once
                #   max(scores) + max-future-length-reward < nbest-th
                # completion score for every row, later steps provably
                # cannot change any n-best — identical output, fewer
                # steps. (Ties: the completion top_k is stable and
                # prefers pool entries, so `>=` keeps exactness.)
                def future_reward(l):
                    # cond sees l = index of the next step to run; a
                    # completion recorded during step l' gets reward
                    # penalty·(l'+1), l' ∈ [l, maxlen-1]
                    if penalty >= 0.0:
                        return penalty * maxlen      # latest completion
                    return penalty * (l + 1.0)       # earliest completion

                def cond(c):
                    l = c[0]
                    _, scores, _, comp_scores, _, _ = c[1]
                    bound = jnp.max(scores, axis=1) + future_reward(l)
                    live = bound >= comp_scores[:, -1]
                    return jnp.logical_and(l < maxlen, jnp.any(live))

                def body(c):
                    l, inner = c
                    inner, _ = step(inner, l)
                    return l + 1, inner

                n_steps, carry = jax.lax.while_loop(
                    cond, body, (jnp.zeros((), jnp.int32), carry))
            _, _, _, comp_scores, comp_buf, comp_len = carry
            return comp_scores, comp_buf, comp_len, n_steps

        if self.mesh is not None:
            with self.mesh:
                return jax.jit(beam_fn)
        return jax.jit(beam_fn)

    # ------------------------------------------------------------------
    def _run_token_loop(self, step, toks, self_kv, maxlen):
        """Run a one-token-per-step loop: full-maxlen scan, or (with
        cfg.early_stop) a while_loop that exits once every row has
        emitted <eos> — tokens after a row's first <eos> are never read
        (_cut_rows stops there), so the two are output-identical."""
        if not self.cfg.early_stop:
            (toks, _), _ = jax.lax.scan(step, (toks, self_kv),
                                        jnp.arange(maxlen),
                                        unroll=self.cfg.scan_unroll)
            return toks
        eos = self.eos

        def cond(c):
            l, (toks, _) = c
            done = jnp.any(toks[:, 1:] == eos, axis=1)
            return jnp.logical_and(l < maxlen, ~jnp.all(done))

        def body(c):
            l, inner = c
            inner, _ = step(inner, l)
            return l + 1, inner

        _, (toks, _) = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), (toks, self_kv)))
        return toks

    def _build_greedy(self):
        maxlen = self.cfg.maxlen

        def greedy_fn(params, batch: DeviceBatch):
            B = batch.query.shape[0]
            state = self._decode_state(params, batch)
            self_kv = self.model.init_self_kv(B, maxlen)
            toks = jnp.full((B, maxlen + 1), self.pad, jnp.int32)
            toks = toks.at[:, 0].set(self.sos)

            def step(carry, l):
                toks, self_kv = carry
                cur = jax.lax.dynamic_index_in_dim(toks, l, axis=1,
                                                   keepdims=False)
                logp, self_kv = self._step(params, state, cur, l, self_kv)
                nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                write = jnp.arange(maxlen + 1)[None, :] == (l + 1)
                toks = jnp.where(write, nxt[:, None], toks)
                return (toks, self_kv), None

            return self._run_token_loop(step, toks, self_kv, maxlen)

        if self.mesh is not None:
            with self.mesh:
                return jax.jit(greedy_fn)
        return jax.jit(greedy_fn)

    # ------------------------------------------------------------------
    def _sample_transform(self):
        """The temperature / top-k / top-p logits transform, shared by
        the scan-based sampler and the streaming step so both draw
        identical tokens from the same rng."""
        cfg = self.cfg
        temp, top_k, top_p = cfg.temperature, cfg.top_k, cfg.top_p

        def transform(logp):
            # logp: (B, V) log-probs; categorical() renormalizes, so
            # operating on shifted/unnormalized logits is fine
            logits = logp / max(temp, 1e-6)
            if top_k and top_k > 0:
                # clamp: lax.top_k requires k <= V, and top_k >= V is a
                # no-op filter anyway
                k = min(int(top_k), logits.shape[-1])
                kth = jax.lax.top_k(logits, k)[0][:, -1:]
                logits = jnp.where(logits < kth, NEG_INF, logits)
            if top_p and top_p > 0.0:
                V = logits.shape[-1]
                srt, idx = jax.lax.top_k(logits, V)    # full descending
                probs = jax.nn.softmax(srt, axis=-1)
                # keep tokens until cumulative mass reaches p (the
                # first token always survives)
                keep_sorted = (jnp.cumsum(probs, axis=-1)
                               - probs) < top_p
                keep = jnp.zeros_like(keep_sorted).at[
                    jnp.arange(logits.shape[0])[:, None], idx
                ].set(keep_sorted)
                logits = jnp.where(keep, logits, NEG_INF)
            return logits

        return transform

    def _build_sample(self):
        """Ancestral sampling with temperature / top-k / top-p — a
        serving-grade decode mode the reference lacks (its only styles
        are greedy and beam, generate.py:104). Same cached one-token
        step as greedy; the distribution transform runs per step fully
        on device."""
        cfg = self.cfg
        maxlen = cfg.maxlen
        temp = cfg.temperature
        transform = self._sample_transform()

        def sample_fn(params, batch: DeviceBatch, rng):
            B = batch.query.shape[0]
            state = self._decode_state(params, batch)
            self_kv = self.model.init_self_kv(B, maxlen)
            toks = jnp.full((B, maxlen + 1), self.pad, jnp.int32)
            toks = toks.at[:, 0].set(self.sos)

            def step(carry, l):
                toks, self_kv = carry
                cur = jax.lax.dynamic_index_in_dim(toks, l, axis=1,
                                                   keepdims=False)
                logp, self_kv = self._step(params, state, cur, l, self_kv)
                if temp <= 0.0:  # degenerate: greedy
                    nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                else:
                    # rng keyed by position, not iteration count, so the
                    # early-stop while_loop cannot change any draw
                    nxt = jax.random.categorical(
                        jax.random.fold_in(rng, l),
                        transform(logp)).astype(jnp.int32)
                write = jnp.arange(maxlen + 1)[None, :] == (l + 1)
                toks = jnp.where(write, nxt[:, None], toks)
                return (toks, self_kv), None

            return self._run_token_loop(step, toks, self_kv, maxlen)

        if self.mesh is not None:
            with self.mesh:
                return jax.jit(sample_fn)
        return jax.jit(sample_fn)

    def sample_batch(self, params, batch: DeviceBatch,
                     rng=None, fold: int = 0) -> List[List[int]]:
        """Sample one continuation per row; tokens after <sos>, cut at
        <eos> (same output convention as greedy_batch).

        ``fold`` distinguishes batches within one seeded run: without
        it every batch would reuse the identical per-position Gumbel
        noise (rows at the same index in different batches would draw
        correlated samples). Callers pass their batch counter."""
        if self._sample_fn is None:
            self._sample_fn = self._build_sample()
        if rng is None:
            rng = jax.random.PRNGKey(self.cfg.sample_seed)
            if fold:
                rng = jax.random.fold_in(rng, fold)
        toks, valid = self._gather(
            self._sample_fn(params, batch, rng), batch.valid)
        return self._cut_rows(toks, valid)

    def _cut_rows(self, toks, valid) -> List[List[int]]:
        out = []
        for b in range(toks.shape[0]):
            if not valid[b]:
                continue
            row = []
            for t in toks[b, 1:]:
                if int(t) == self.eos:
                    break
                row.append(int(t))
            out.append(row)
        return out

    # ------------------------------------------------------------------
    def beam_batch_raw(self, params, batch: DeviceBatch):
        """Dispatch the beam program asynchronously; returns device arrays
        (fetch later with :meth:`beam_results`) so many batches can be in
        flight while the host prepares the next inputs."""
        if self._beam_fn is None:
            self._beam_fn = self._build_beam()
        return self._beam_fn(params, batch)

    @staticmethod
    def _gather(*arrays):
        """Fetch arrays to host; under a multi-host run the rows are
        sharded across processes, so allgather the full value first
        (every host then assembles the complete result set)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return [np.asarray(multihost_utils.process_allgather(
                a, tiled=True)) for a in arrays]
        return [np.asarray(a) for a in jax.device_get(list(arrays))]

    def beam_results(self, raw, valid) -> List[BeamResult]:
        """Fetch + convert one dispatched batch (blocks on the device)."""
        comp_scores, comp_buf, comp_len, valid = self._gather(
            raw[0], raw[1], raw[2], valid)
        return completions_to_results(comp_scores, comp_buf, comp_len, valid)

    def beam_batch(self, params, batch: DeviceBatch) -> List[BeamResult]:
        """Beam-decode every row; returns one BeamResult per *valid* row."""
        return self.beam_results(self.beam_batch_raw(params, batch),
                                 batch.valid)

    def greedy_batch(self, params, batch: DeviceBatch) -> List[List[int]]:
        """Greedy-decode every row; tokens after <sos>, cut at <eos>."""
        if self._greedy_fn is None:
            self._greedy_fn = self._build_greedy()
        toks, valid = self._gather(self._greedy_fn(params, batch),
                                   batch.valid)
        return self._cut_rows(toks, valid)

    # -- discriminative candidate ranking --------------------------------
    def _build_rank(self, N: int, L: int):
        """Teacher-forced log-likelihood scorer for N candidates of
        (padded) length L per turn — the VisDial-style discriminative
        mode (reference readme.md:81-86: at test time "the model selects
        the best answer candidate based on the log likelihood among the
        answer options"). One compiled program per (N, L) bucket: the
        encoder/cross-attention state is computed once per turn and
        tiled over the N candidates (like the beam's tiling over
        hypotheses), then a lax.scan feeds each candidate through the
        same cached one-token decode step the generative decoders use,
        accumulating log P(token | context, prefix) over real (non-pad)
        positions."""
        def rank_fn(params, batch: DeviceBatch, cand, cand_len):
            B = batch.query.shape[0]
            state = self._decode_state(params, batch)
            state = jax.tree.map(lambda x: jnp.repeat(x, N, axis=0), state)
            self_kv = self.model.init_self_kv(B * N, L)
            rows = cand.reshape(B * N, L)
            lens = cand_len.reshape(B * N)
            inputs = jnp.concatenate(
                [jnp.full((B * N, 1), self.sos, jnp.int32), rows[:, :-1]],
                axis=1)

            def step(carry, l):
                total, self_kv = carry
                cur = jax.lax.dynamic_index_in_dim(
                    inputs, l, axis=1, keepdims=False)
                logp, self_kv = self._step(params, state, cur, l, self_kv)
                tgt = jax.lax.dynamic_index_in_dim(
                    rows, l, axis=1, keepdims=False)
                tok_lp = jnp.take_along_axis(
                    logp, tgt[:, None], axis=1)[:, 0]
                total = total + jnp.where(l < lens, tok_lp, 0.0)
                return (total, self_kv), None

            (total, _), _ = jax.lax.scan(
                step, (jnp.zeros((B * N,), jnp.float32), self_kv),
                jnp.arange(L))
            return total.reshape(B, N)

        return self._jit(rank_fn)

    def rank_batch(self, params, batch: DeviceBatch,
                   candidates: Sequence[Sequence[Sequence[int]]],
                   include_eos: bool = True,
                   len_bucket: int = 8, cand_bucket: int = 8
                   ) -> List[List[float]]:
        """Score answer candidates by generative log-likelihood.

        ``candidates[b]`` is the list of candidate token-id sequences for
        batch row b (one entry per row, valid or not; invalid rows are
        dropped from the output like every other batch decoder).
        Returns, per *valid* row, ``[log P(candidate | context), ...]``
        in the input candidate order — rank with ``evalmetrics.retrieval``.

        ``include_eos`` (default on) appends <eos> to every candidate so
        the score is the likelihood of the complete answer event the
        generative loss trains (answer tokens + <eos>); without it the
        score is the bare token-sequence likelihood. N and L are bucketed
        so serving traffic with varying option counts reuses compiled
        programs; padded candidates score 0 and are dropped on output.
        """
        raw = self.rank_batch_raw(params, batch, candidates,
                                  include_eos=include_eos,
                                  len_bucket=len_bucket,
                                  cand_bucket=cand_bucket)
        return self.rank_results(raw, batch.valid)

    def rank_batch_raw(self, params, batch: DeviceBatch,
                       candidates: Sequence[Sequence[Sequence[int]]],
                       include_eos: bool = True,
                       len_bucket: int = 8, cand_bucket: int = 8):
        """Dispatch the rank program asynchronously (the rank analogue of
        :meth:`beam_batch_raw`); fetch later with :meth:`rank_results` so
        many batches can be in flight (continuous-batching serving)."""
        B = batch.query.shape[0]
        if len(candidates) != B:
            raise ValueError(
                f"candidates has {len(candidates)} rows, batch has {B}")
        n_counts = [len(c) for c in candidates]
        n_max = max(n_counts, default=0)
        if n_max == 0:
            return (None, n_counts)
        extra = 1 if include_eos else 0
        l_max = max((len(t) for c in candidates for t in c), default=0) + extra
        N = max(_round_up_int(n_max, cand_bucket), 1)
        L = max(_round_up_int(max(l_max, 1), len_bucket), 1)
        cand = np.full((B, N, L), self.pad, np.int32)
        clen = np.zeros((B, N), np.int32)
        for b, cands in enumerate(candidates):
            for n, toks in enumerate(cands):
                toks = list(toks) + ([self.eos] if include_eos else [])
                cand[b, n, :len(toks)] = toks
                clen[b, n] = len(toks)
        key = (N, L)
        if key not in self._rank_fns:
            self._rank_fns[key] = self._build_rank(N, L)
        scores = self._rank_fns[key](params, batch, jnp.asarray(cand),
                                     jnp.asarray(clen))
        return (scores, n_counts)

    def rank_results(self, raw, valid) -> List[List[float]]:
        """Fetch + trim one dispatched rank batch (blocks on the device)."""
        scores_dev, n_counts = raw
        if scores_dev is None:  # no candidates anywhere in the batch
            return [[] for b in range(len(n_counts))
                    if bool(np.asarray(valid)[b])]
        scores, valid = self._gather(scores_dev, valid)
        return [[float(s) for s in scores[b][:n_counts[b]]]
                for b in range(len(n_counts)) if valid[b]]

    # -- streaming ------------------------------------------------------
    def _jit(self, fn):
        if self.mesh is not None:
            with self.mesh:
                return jax.jit(fn)
        return jax.jit(fn)

    def _build_stream(self, style: str):
        """Two compiled programs instead of one whole-loop program: a
        prefix (encoder + caches) and a one-token step. The host drives
        the loop and sees every token as it lands — the streaming
        counterpart of greedy/sample_batch. The step's position argument
        is a traced scalar, so all maxlen iterations reuse the single
        compiled step executable."""
        maxlen = self.cfg.maxlen
        temp = self.cfg.temperature
        transform = self._sample_transform()

        def prefix_fn(params, batch: DeviceBatch):
            state = self._decode_state(params, batch)
            self_kv = self.model.init_self_kv(batch.query.shape[0], maxlen)
            return state, self_kv

        def step_fn(params, state, cur, l, self_kv, rng):
            logp, self_kv = self._step(params, state, cur, l, self_kv)
            if style == "greedy" or temp <= 0.0:
                nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            else:
                # identical draw law to sample_fn: rng keyed by position
                nxt = jax.random.categorical(
                    jax.random.fold_in(rng, l),
                    transform(logp)).astype(jnp.int32)
            return nxt, self_kv

        return self._jit(prefix_fn), self._jit(step_fn)

    def stream_tokens(self, params, batch: DeviceBatch, style: str = "greedy",
                      rng=None, fold: int = 0):
        """Generator of per-step token arrays (one int per *valid* row),
        ending after every valid row has emitted <eos> or at maxlen.

        Concatenating a row's yields (cut at its first <eos>) equals the
        corresponding greedy_batch / sample_batch output — proven in
        tests/test_beam.py. Each step costs one device round-trip; this
        is the interactive-latency trade (tokens appear as they are
        decoded) versus the single-program batch decoders."""
        if style not in ("greedy", "sample"):
            raise ValueError(f"stream_tokens: style {style!r} "
                             "(beam n-bests cannot stream)")
        if jax.process_count() > 1:
            raise RuntimeError("stream_tokens is single-host serving "
                               "(per-step host fetches)")
        key = f"_stream_{style}"
        fns = getattr(self, key, None)
        if fns is None:
            fns = self._build_stream(style)
            setattr(self, key, fns)
        prefix_fn, step_fn = fns
        if rng is None:
            rng = jax.random.PRNGKey(self.cfg.sample_seed)
            if fold:
                rng = jax.random.fold_in(rng, fold)
        state, self_kv = prefix_fn(params, batch)
        B = batch.query.shape[0]
        valid = np.asarray(batch.valid)
        cur = jnp.full((B,), self.sos, jnp.int32)
        done = ~valid.copy()
        for l in range(self.cfg.maxlen):
            cur, self_kv = step_fn(params, state, cur, l, self_kv, rng)
            host = np.asarray(cur)
            yield host[valid]
            done |= host == self.eos
            if done.all():
                return
