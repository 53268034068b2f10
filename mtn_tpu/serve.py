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


@dataclasses.dataclass
class Request:
    question: str
    history: List[Tuple[str, str]] = dataclasses.field(default_factory=list)
    caption: str = ""
    features: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)


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
            ft_arrays[i].append(np.asarray(ft, np.float32))
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


class ServingSession:
    """Single-model interactive decoder (thread-unsafe; one per worker)."""

    def __init__(self, params, model_cfg, data_cfg, vocab: Dict[str, int],
                 decode_cfg: Optional[DecodeConfig] = None, mesh=None):
        self.params = params
        self.model_cfg = model_cfg
        self.data_cfg = data_cfg
        self.vocab = vocab
        self.vlist = vocab_list(vocab)
        self.decode_cfg = decode_cfg or DecodeConfig()
        self.decoder = BeamDecoder(model_cfg, self.decode_cfg, mesh=mesh)
        self._lb = max(self.data_cfg.length_bucket, 1)
        self._fb = max(self.data_cfg.feature_bucket, 1)

    @classmethod
    def from_checkpoint(cls, model_arg: str,
                        decode_cfg: Optional[DecodeConfig] = None,
                        mesh=None) -> "ServingSession":
        import jax
        from mtn_tpu.cli.generate import _split_model_arg
        from mtn_tpu.config import TrainConfig
        from mtn_tpu.train.trainer import Trainer
        from mtn_tpu.utils.checkpoint import CheckpointManager

        prefix, epoch = _split_model_arg(model_arg)
        ckpt = CheckpointManager(prefix)
        vocab, conf = ckpt.load_conf()
        model_cfg = config_from_dict("model", conf["model"])
        data_cfg = config_from_dict("data", conf["data"])
        trainer = Trainer(model_cfg, TrainConfig())
        sample = device_batch(encode_requests(
            [Request("")], model_cfg, data_cfg, vocab))
        state = trainer.init_state(jax.random.PRNGKey(0), sample)
        params, _ = ckpt.restore_params(state, epoch)
        return cls(params, model_cfg, data_cfg, vocab, decode_cfg, mesh=mesh)

    def respond_batch(self, requests: Sequence[Request]
                      ) -> List[Tuple[str, float]]:
        # pad the batch axis to turn_batch so every request batch of size
        # <= turn_batch reuses the same compiled beam program
        rows = self.decode_cfg.turn_batch \
            if len(requests) <= self.decode_cfg.turn_batch else 0
        hb = encode_requests(requests, self.model_cfg, self.data_cfg,
                             self.vocab, self._lb, self._fb,
                             pad_rows_to=rows)
        results = self.decoder.beam_batch(
            self.params, device_batch(hb, self.model_cfg.dtype))
        from mtn_tpu.decode.beam import detokenize
        return [(detokenize(res.tokens[0], self.vlist,
                            self.vocab["<eos>"]), res.scores[0])
                for res in results]

    def respond(self, question: str, history: Sequence[Tuple[str, str]] = (),
                caption: str = "",
                features: Optional[Dict[str, np.ndarray]] = None) -> str:
        req = Request(question=question, history=list(history),
                      caption=caption, features=features or {})
        return self.respond_batch([req])[0][0]
