"""Configuration dataclasses for the whole framework.

Flag names mirror the reference CLIs (reference: train.py:57-95,
generate.py:89-116, run.sh:12-52) so a user of the reference can move over
without relearning the surface. Configs are plain dataclasses, JSON-round-
trippable, and saved next to checkpoints (replacing the reference's pickled
``(vocab, args)`` ``.conf`` sidecar, train.py:166-168).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence


@dataclass
class ModelConfig:
    """Architecture of the MTN encoder-decoder (reference: mtn.py:332-414)."""

    vocab_size: int = 0
    nb_blocks: int = 6            # N transformer decoder blocks
    d_model: int = 512
    d_ff: int = 2048
    att_h: int = 8
    dropout: float = 0.1
    # attention-probability dropout: the reference hard-codes 0.1
    # regardless of --dropout (mtn.py:339 default arg, never overridden);
    # kept as its own knob so it can be disabled independently
    attn_dropout: float = 0.1
    ft_sizes: List[int] = field(default_factory=list)  # per-stream feature dims
    separate_his_embed: bool = False
    separate_cap_embed: bool = False
    diff_encoder: bool = False    # per-stream AE norms in the text encoder
    diff_embed: bool = False      # per-stream AE embeddings
    diff_gen: bool = False        # per-stream AE generators
    auto_encoder_ft: Optional[str] = None  # 'query' | 'caption' | 'summary'
    # TPU-specific knobs (no reference equivalent):
    dtype: str = "float32"        # compute dtype: 'float32' | 'bfloat16'
    param_dtype: str = "float32"
    max_len: int = 5000           # positional-encoding table length (mtn.py:293)
    # Both Pallas kernels are opt-in, by measurement (docs/BENCH.md
    # "Pallas kernels", scripts/bench_pallas.py): at MTN's flagship
    # shapes fused XLA is faster for attention (Lq<=64: 0.80-0.88x) and
    # equal end-to-end for the FFN (beam A/B: 423.9 vs 423.8 rps), so
    # enabling them by default would buy nothing and (FFN) perturb bf16
    # beam numerics vs the proven-parity XLA program. The kernels win at
    # larger shapes (attention from ~(128,128): 1.69x bwd) — available
    # for longer-sequence configs.
    use_pallas_attention: bool = False
    use_pallas_ffn: bool = False
    # decode-time self-attention projects q/k/v from the same pre-normed
    # tensor; fusing the three (D, D) kernels into one (D, 3D) GEMM cuts
    # two kernel dispatches per layer per decode step. Same dot products
    # but a different GEMM tiling (~1e-6 f32 drift,
    # tests/test_model.py::test_fused_decode_qkv_matches_unfused), so per
    # the defaults policy (docs/BENCH.md) it ships OPT-IN; measurement in
    # docs/BENCH.md "Decode QKV fusion" (scripts/bench_qkv_fusion.py).
    fused_decode_qkv: bool = False
    # batch the per-stream Query-Aware Auto-Encoder chains (AE self-attn
    # → AE-vid attn → AE FFN) into stacked einsum GEMMs over a stream
    # axis — ONE kernel per sublayer instead of n_streams — cutting QAE
    # dispatches S-fold. Mathematically equivalent (streams are
    # independent; padded vid keys are exact-zero after softmax);
    # dropout draw ORDER differs, so stochastic training matches only in
    # distribution. Opt-in by the defaults policy (docs/BENCH.md
    # "Batched QAE"); measured by scripts/bench_batched_ae.py.
    batched_ae: bool = False
    # rematerialization: recompute each decoder layer's activations in
    # the backward pass (jax.checkpoint via nn.remat) instead of storing
    # them — trades ~1 extra forward of FLOPs for O(1-layer) activation
    # memory; numerics identical (tests/test_accum.py). For configs that
    # outgrow HBM (long sequences, big batches, larger d_model).
    remat: bool = False

    @property
    def n_streams(self) -> int:
        return len(self.ft_sizes)


@dataclass
class DataConfig:
    """Input pipeline (reference: data_handler.py + run.sh:12-23)."""

    fea_type: List[str] = field(default_factory=list)  # e.g. ['vggish','i3d_flow']
    train_path: str = ""          # '<FeaType>/<ImageID>.npy' template
    train_set: str = ""
    valid_path: str = ""
    valid_set: str = ""
    include_caption: str = "none"  # 'none'|'caption'|'summary'|'caption,summary'
    separate_caption: bool = False
    max_history_length: int = -1
    merge_source: bool = False
    batch_size: int = 32
    max_length: int = 256          # batch-size shrink gate (data_handler.py:182)
    cut_a: bool = False            # random answer truncation (data_handler.py:255-260)
    cut_a_p: float = 0.5
    skip: List[int] = field(default_factory=lambda: [1, 1, 1])  # frame skip per stream
    vocab_cutoff: int = 5          # effective reference cutoff (data_handler.py:67-73)
    # TPU-specific: static-shape bucketing (XLA compiles one program per bucket
    # signature; reference shapes are fully dynamic).
    length_bucket: int = 32        # round text lengths up to multiples of this
    feature_bucket: int = 32       # round video-frame counts up to multiples
    pad_batch_to_full: bool = True # pad batch dim to `batch_size` with masked rows
    prefetch: int = 2              # host-side prefetch depth (reference had none)
    use_native_loader: bool = True # C++ .npy reader if the library is built
    feature_dtype: str = "float32" # 'bfloat16' halves host->device transfer


@dataclass
class TrainConfig:
    """Optimization (reference: train.py:86-93,190-191)."""

    num_epochs: int = 15
    batch_size: int = 32
    warmup_steps: int = 4000
    loss_l: float = 1.0            # lambda on the auto-encoder loss terms
    rand_seed: int = 1
    report_interval: int = 100
    label_smoothing: float = 0.1
    model: str = ""                # output prefix (checkpoints, CSV logs)
    save_optimizer_state: bool = True  # reference never saved it (train.py:217)
    keep_checkpoints: int = 0      # 0 = keep all (reference kept all epochs)
    # >1: gradient accumulation — one optimizer update per accum_steps
    # batches via lax.scan over stacked microbatches (Trainer accum step);
    # the update equals the one-big-batch update exactly (macro-batch
    # token-count normalizers), with one microbatch of activation memory
    accum_steps: int = 1
    # > 0: clip gradients to this global L2 norm before Adam (the
    # reference never clips; default off preserves its update math and
    # the opt_state checkpoint structure)
    grad_clip: float = 0.0
    # > 0: stop training after this many epochs without a new best
    # validation loss (the reference always runs num_epochs)
    patience: int = 0


@dataclass
class DecodeConfig:
    """Generation (reference: generate.py:89-116, run.sh:47-52)."""

    maxlen: int = 30
    beam: int = 5
    penalty: float = 1.0
    nbest: int = 5
    min_len: int = 1
    decode_style: str = "beam_search"  # 'beam_search'|'greedy'|'sample'
    # sampling decode (beyond the reference's greedy/beam): softmax
    # temperature, then top-k and/or nucleus (top-p) truncation of the
    # tempered distribution; temperature 0 degenerates to greedy
    temperature: float = 1.0
    top_k: int = 0        # 0: no top-k truncation
    top_p: float = 0.0    # 0: no nucleus truncation
    sample_seed: int = 1
    undisclosed_only: bool = False
    labeled_test: Optional[str] = None
    # TPU-specific: decode many dialogue turns per device batch (the reference
    # decodes at batch size 1, generate.py:146).
    turn_batch: int = 16
    # Pad every decode batch to the test set's (bucket-rounded) global
    # maxima so the whole decode runs ONE compiled program. Padding is
    # compute-cheap on TPU; recompiles are not.
    uniform_shapes: bool = True
    # '' (compute dtype) | 'bfloat16' | 'int8': host->device feature
    # transfer precision; int8 ships row-quantized features + f32 scales
    # and dequantizes on device (for transfer-bound hosts).
    feature_transfer: str = ""
    # lax.scan unroll factor for the decode step loop: >1 trades program
    # size (and compile time) for less per-step loop overhead.
    scan_unroll: int = 1
    # Early termination (default on): run the beam as a lax.while_loop
    # that stops as soon as NO active hypothesis can still enter any
    # row's n-best (provable bound: active scores only decay, so
    # max(score) + max-remaining-length-reward < nbest-th completion
    # score ⇒ converged). Output-identical to the full maxlen scan
    # (tests pin it); measured 1.32× device-side decode on a trained
    # checkpoint (docs/BENCH.md, scripts/bench_early_stop.py).
    early_stop: bool = True


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    return obj


def dump_config(path: str, **sections: Any) -> None:
    """Write named config sections (+ arbitrary metadata) as JSON."""
    payload = {name: _to_jsonable(cfg) for name, cfg in sections.items()}
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


_SECTION_TYPES = {
    "model": ModelConfig,
    "data": DataConfig,
    "train": TrainConfig,
    "decode": DecodeConfig,
}


def config_from_dict(section: str, d: dict):
    cls = _SECTION_TYPES[section]
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})
