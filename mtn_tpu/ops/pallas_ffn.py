"""Fused position-wise FFN Pallas kernel: ``relu(x·W1+b1)·W2+b2``.

The TPU counterpart of a fused CUDA MLP kernel (the reference's FFN is
two torch Linears + ReLU, mtn.py:269-280): one grid step processes a row
block entirely in VMEM — the (rows, d_ff) hidden activation never
round-trips through HBM. Both weight matrices stay resident in VMEM
across the row grid (d_model·d_ff·2 ≈ 8 MB at the canonical 512/2048
f32, half in bf16). Matmuls accumulate in float32 on the MXU.

Like the attention kernel, the backward pass reuses the XLA formulation
via ``jax.vjp`` (identical math), and dispatch falls back to plain XLA
off-TPU or when shapes exceed the VMEM gate. Dropout inside the FFN
(training) is handled by the caller — the kernel is selected only on
deterministic paths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INTERPRET = False
ROW_BLOCK = 256


def supports(n_rows: int, d_model: int, d_ff: int, itemsize: int) -> bool:
    # measured on v5e (scripts/bench_pallas.py, d512/ff2048 bf16): the
    # kernel wins at single-block row counts (160 rows: 1.49x — the beam
    # decode step) and loses once the row grid loops (1056 rows: 0.70x,
    # 4096: 0.54x — XLA's multi-pass tiling beats weights-resident
    # looping there), so dispatch only takes the single-block case
    if n_rows > ROW_BLOCK:
        return False
    weights = (d_model * d_ff * 2 + d_ff + d_model) * itemsize
    acts = ROW_BLOCK * (2 * d_model + d_ff) * 4
    return weights + acts < 12 * 1024 * 1024


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[...].astype(jnp.float32), 0.0)
    y = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = (y + b2_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _pallas_ffn_2d(x, w1, b1, w2, b2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = x.shape
    F = w1.shape[1]
    pad = (-N) % ROW_BLOCK
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)], axis=0)
    grid = (x.shape[0] // ROW_BLOCK,)
    out = pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * x.shape[0] * D * F,
            bytes_accessed=(x.size + w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=0),
    )(x, w1, b1, w2, b2)
    return out[:N] if pad else out


def _xla_ffn(x, w1, b1, w2, b2):
    h = jnp.maximum(
        jnp.dot(x, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    return (jnp.dot(h, w2, preferred_element_type=jnp.float32)
            + b2.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def _fused(x, w1, b1, w2, b2):
    return _pallas_ffn_2d(x, w1, b1, w2, b2)


def _fused_fwd(x, w1, b1, w2, b2):
    return _pallas_ffn_2d(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_xla_ffn, x, w1, b1, w2, b2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ffn(x: jnp.ndarray, w1, b1, w2, b2) -> jnp.ndarray:
    """x: (..., d_model). Relu-MLP fused in VMEM (TPU) with XLA fallback."""
    D = x.shape[-1]
    F = w1.shape[1]
    lead = x.shape[:-1]
    n_rows = 1
    for s in lead:
        n_rows *= s
    use = (jax.default_backend() == "tpu" or _INTERPRET) and \
        supports(n_rows, D, F, x.dtype.itemsize)
    x2 = x.reshape(n_rows, D)
    out = _fused(x2, w1, b1, w2, b2) if use else _xla_ffn(x2, w1, b1, w2, b2)
    return out.reshape(*lead, D)
