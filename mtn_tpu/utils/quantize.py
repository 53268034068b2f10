"""Weight-only int8 quantization for the decode/serving path.

Motivation (docs/BENCH.md "MFU and the roofline"): each beam-decode
step is a GEMV-like pass over turn_batch×beam rows whose arithmetic
intensity sits just below the v5e ridge — i.e. the step is HBM-bound on
*weight reads*. The previously tried mitigation (bf16-resident weights)
changed the resident layout but not the downstream math and measured
0.80×; this module instead shrinks the bytes themselves: every linear
kernel consumed by the decode program is stored as int8 with a
per-output-channel float32 scale, and the dequantization is fused into
the matmul read (``y = (x @ q) * scale + b`` — the int8→compute-dtype
convert happens on-chip, HBM traffic is the int8 tensor).

Scheme: symmetric per-output-channel. For kernel ``K`` of shape
``(d_in, d_out)``::

    scale_j = max_i |K_ij| / 127        (shape (d_out,), float32)
    q_ij    = clip(round(K_ij / scale_j), -127, 127)  (int8)

so ``|K_ij - q_ij·scale_j| ≤ scale_j / 2`` elementwise. The scaled
product ``(x @ q) · scale`` equals ``x @ (q·scale)`` exactly in real
arithmetic and to rounding order in floats; the quantized program's
numerics are therefore those of running the model with the dequantized
weights (tests/test_quantize.py pins this).

This is OPT-IN and decode-only by policy (docs/BENCH.md defaults
policy): training and the parity suite always run the full-precision
path. The reference has no quantization support at all (its decode
loads the f32 torch checkpoint as-is, generate.py:123-131).

Usage::

    qparams = quantize_params(params)          # → QuantizedParams
    decoder.beam_batch(qparams, batch)         # drop-in for `params`

Every :class:`~mtn_tpu.decode.beam.BeamDecoder` entry point (beam /
greedy / sample / rank / stream) accepts either a plain param tree or a
:class:`QuantizedParams` bundle — dispatch happens in
:func:`model_variables`, and the quantized read path lives in
``ParamLinear`` (mtn_tpu/models/layers.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
from flax import struct

# Module names whose "kernel" is consumed by ParamLinear (the only
# modules with a quantized read path). "proj" appears both under the
# generator (quantize) and vid_encoder_* (excluded by default: it runs
# once per turn in encode, not per decode step, and feature projections
# are the model's interface to raw float inputs).
_QUANT_MODULES = ("w_q", "w_k", "w_v", "w_o", "w_1", "w_2", "proj")


@struct.dataclass
class QuantizedParams:
    """A param tree with int8 kernels plus the matching scale tree.

    ``params`` mirrors the ordinary param tree (int8 ``kernel`` leaves
    where quantized); ``qscales`` mirrors the module structure with one
    ``kernel_scale`` leaf per quantized kernel, passed to ``apply`` as
    its own variable collection.
    """

    params: Any
    qscales: Any


def model_variables(params) -> dict:
    """The ``apply`` variables dict for plain or quantized params."""
    if isinstance(params, QuantizedParams):
        return {"params": params.params, "qscales": params.qscales}
    return {"params": params}


def raw_params(params):
    """The underlying param tree (quantized or not)."""
    if isinstance(params, QuantizedParams):
        return params.params
    return params


def quantize_kernel(kernel: np.ndarray,
                    bits: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel quantization of one (d_in, d_out)
    kernel. Returns ``(q int8, scale float32 (d_out,))``."""
    k = np.asarray(kernel, np.float32)
    qmax = float(2 ** (bits - 1) - 1)
    scale = np.max(np.abs(k), axis=0) / qmax
    scale = np.maximum(scale, np.float32(1e-12))
    q = np.clip(np.rint(k / scale), -qmax, qmax).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize_kernel(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale[None, :]


def quantize_params(params, include_vid_encoder: bool = False,
                    bits: int = 8,
                    skip_generator: bool = False) -> QuantizedParams:
    """Quantize every decode-path linear kernel in a param tree.

    ``params``: the model param tree (as restored from a checkpoint).
    Quantizes ``kernel`` leaves of the attention projections
    (w_q/w_k/w_v/w_o), FFN layers (w_1/w_2) and generator head(s)
    (proj); embeddings, LayerNorms, biases and the positional tables
    stay full precision. ``include_vid_encoder`` additionally quantizes
    the per-stream video feature projections. ``skip_generator`` keeps
    the vocab-projection head(s) full precision — the logits are where
    rounding error most directly moves the argmax/beam order, and the
    head is a small fraction of the model's bytes (fidelity knob,
    measured by scripts/bench_quant.py).
    """
    def rec(node, path):
        if not isinstance(node, dict):
            return node, None
        out, scales = {}, {}
        for key, val in node.items():
            in_vid = any(p.startswith("vid_encoder") for p in path + (key,))
            in_gen = any(p == "generator" or p.startswith("ae_generator")
                         for p in path + (key,))
            if (isinstance(val, dict) and "kernel" in val
                    and key in _QUANT_MODULES
                    and (include_vid_encoder or not in_vid)
                    and not (skip_generator and in_gen)):
                q, scale = quantize_kernel(val["kernel"], bits)
                new_val = dict(val)
                new_val["kernel"] = q
                out[key] = new_val
                scales[key] = {"kernel_scale": scale}
            else:
                sub, sub_scales = rec(val, path + (key,))
                out[key] = sub
                if sub_scales:
                    scales[key] = sub_scales
        return out, scales

    if hasattr(params, "unfreeze"):  # FrozenDict
        params = params.unfreeze()
    qtree, stree = rec(params, ())
    if not stree:
        raise ValueError("quantize_params: no quantizable kernels found")
    # Commit the quantized leaves to device. The quantization math above
    # runs in numpy (host), but a checkpoint-restored param tree is
    # device-resident — leaving the int8 kernels as host numpy would
    # make every jitted decode call re-upload ~all the model bytes
    # through the host↔device transport (measured: 10 rps vs 437 on the
    # relay — the whole quantization win erased and then some).
    import jax
    import jax.numpy as jnp
    qtree = jax.tree.map(jnp.asarray, qtree)
    stree = jax.tree.map(jnp.asarray, stree)
    return QuantizedParams(params=qtree, qscales=stree)


def quantized_size_bytes(qp: QuantizedParams) -> dict:
    """Byte accounting: {'int8': n, 'other': n} over the param tree."""
    import jax
    i8 = other = 0
    for leaf in jax.tree.leaves(qp.params):
        n = int(np.prod(np.shape(leaf))) * np.dtype(
            np.asarray(leaf).dtype).itemsize
        if np.asarray(leaf).dtype == np.int8:
            i8 += n
        else:
            other += n
    return {"int8": i8, "other": other}
