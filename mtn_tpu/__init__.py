"""mtn_tpu — a TPU-native framework for video-grounded dialogue transformers.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the full
capability surface of the MTN reference (henryhungle/MTN, ACL'19):

- ``mtn_tpu.data``        — DSTC7-AVSD dialogue + video-feature input pipeline
                            (vocab, per-turn flattening, length-bucketed batch
                            planner, host prefetch, static-shape padding).
- ``mtn_tpu.models``      — the MTN encoder-decoder with the Query-Aware
                            Auto-Encoder, written in flax.linen with explicit
                            decode-time caches.
- ``mtn_tpu.ops``         — masks, positional encodings, attention (XLA path
                            and fused Pallas TPU kernels).
- ``mtn_tpu.train``       — label-smoothed KL loss, Noam schedule (optax),
                            jitted mesh-aware train step.
- ``mtn_tpu.decode``      — jit-compiled batched beam search (lax.scan over
                            steps, KV + auto-encoder caches, default
                            provably-exact early termination) plus greedy
                            and temperature/top-k/nucleus sampling.
- ``mtn_tpu.parallel``    — device mesh + sharding rules (dp/tp) over ICI,
                            multi-host (DCN) execution support.
- ``mtn_tpu.evalmetrics`` — COCO-caption metrics (BLEU/METEOR/ROUGE-L/CIDEr)
                            in pure Python 3, DSTC7 format converters, and
                            VisDial retrieval metrics (R@k/mean rank/MRR).
- ``mtn_tpu.utils``       — Orbax checkpointing, CSV/metric logging, profiling.
- ``mtn_tpu.cli``         — `train` / `generate` / `evaluate` entry points
                            with the reference's flag surface (run.sh stage
                            CLI parity), plus `rank` (discriminative
                            VisDial-style candidate scoring).
- ``mtn_tpu.serve``       — interactive sessions + continuous-batching
                            ``AsyncServer`` over the cached decoder;
                            ``mtn_tpu.serve_http`` is the stdlib HTTP
                            front-end (SSE streaming, hot-reload, drain,
                            Prometheus metrics — docs/SERVING.md).
"""

__version__ = "0.1.0"
