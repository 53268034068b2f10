from mtn_tpu.data.vocab import SPECIALS, build_vocab, get_vocabulary, words2ids
from mtn_tpu.data.dataset import load
from mtn_tpu.data.batching import make_batch_indices, make_batch, HostBatch
from mtn_tpu.data.pipeline import BatchIterator

__all__ = [
    "SPECIALS",
    "build_vocab",
    "get_vocabulary",
    "words2ids",
    "load",
    "make_batch_indices",
    "make_batch",
    "HostBatch",
    "BatchIterator",
]
