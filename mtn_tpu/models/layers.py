"""Core transformer building blocks (flax.linen).

Numerics parity notes vs the reference (mtn.py):

- :class:`RefLayerNorm` matches the reference LayerNorm (mtn.py:103-114):
  it divides by ``std + eps`` where ``std`` is the *unbiased* (ddof=1)
  standard deviation — torch ``Tensor.std`` default — not the usual
  ``sqrt(var + eps)``.
- :class:`ScaledEmbed` multiplies embeddings by ``sqrt(d_model)``
  (mtn.py:282-289); :class:`PosEncoding` adds the sinusoidal table and
  applies dropout (mtn.py:291-309).
- :class:`MultiHeadAttention` keeps the reference's fixed attention-prob
  dropout of 0.1 (make_model constructs ``MultiHeadedAttention(h,
  d_model)`` with the default dropout at mtn.py:339, independent of the
  ``--dropout`` flag).
- Pre-norm residual sublayers: ``x + dropout(f(norm(x)))``
  (SublayerConnection, mtn.py:116-127).

Decode-time extras (no reference equivalent — the reference re-runs the
full decoder per step, data_utils.py:202-206): attention modules expose
``project_kv`` / ``attend_with_kv`` so cross-attention K/V and the
auto-encoder chain can be computed once and cached.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtn_tpu.ops.attention import multi_head_attention
from mtn_tpu.ops.positional import sinusoidal_table


class RefLayerNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        a = self.param("scale", nn.initializers.ones, (d,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (d,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # unbiased std (ddof=1), matching torch Tensor.std / mtn.py:113
        var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / (d - 1)
        y = a * (xf - mean) / (jnp.sqrt(var) + self.eps) + b
        return y.astype(x.dtype)


class ScaledEmbed(nn.Module):
    vocab_size: int
    d_model: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.d_model,
                       embedding_init=nn.initializers.xavier_uniform(),
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="lut")(tokens)
        return emb * jnp.asarray(jnp.sqrt(self.d_model), emb.dtype)


class PosEncoding(nn.Module):
    d_model: int
    dropout: float
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe = sinusoidal_table(self.max_len, self.d_model, self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 offset: int = 0) -> jnp.ndarray:
        L = x.shape[-2]
        x = x + jax.lax.dynamic_slice_in_dim(self.pe, offset, L, axis=0)
        return self.drop(x, deterministic=deterministic)

    def at(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Add the PE row for a traced position (single-step decode)."""
        row = jax.lax.dynamic_slice_in_dim(self.pe, pos, 1, axis=0)
        return x + row


class MultiHeadAttention(nn.Module):
    """h-head scaled dot-product attention (mtn.py:233-267)."""

    n_heads: int
    d_model: int
    attn_dropout: float = 0.1   # reference-fixed (mtn.py:339 default)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        assert self.d_model % self.n_heads == 0
        # ParamLinear ≡ nn.Dense numerically (same ops, init and param
        # paths) but carries the int8 weight read path (see ParamLinear)
        dense = lambda name: ParamLinear(
            self.d_model, self.d_model, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        self.w_q, self.w_k, self.w_v = dense("w_q"), dense("w_k"), dense("w_v")
        self.w_o = dense("w_o")

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        B, L, _ = x.shape
        d_k = self.d_model // self.n_heads
        return x.reshape(B, L, self.n_heads, d_k).transpose(0, 2, 1, 3)

    def _merge(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, L, d_k = x.shape
        return x.transpose(0, 2, 1, 3).reshape(B, L, H * d_k)

    def project_kv(self, kv_in: jnp.ndarray):
        """(B, Lk, D) -> cached ((B,H,Lk,Dk), (B,H,Lk,Dk))."""
        return self._split(self.w_k(kv_in)), self._split(self.w_v(kv_in))

    def fused_qkv(self, x: jnp.ndarray):
        """q/k/v projections of the SAME input in one GEMM.

        Decode-time self-attention projects q, k and v from one tensor
        (the pre-normed current position), so the three (D, D) kernels
        can be concatenated along the output axis into a single
        (D, 3D) GEMM — each output column keeps its dot product (and
        reduction axis) unchanged, the kernel count per decode step
        drops by two per layer. Returns head-split
        ((B,H,L,Dk), (B,H,L,Dk), (B,H,L,Dk)).
        """
        dt = self.dtype
        mods = (self.w_q, self.w_k, self.w_v)
        kernel = jnp.concatenate([m.kernel for m in mods],
                                 axis=1).astype(dt)
        bias = jnp.concatenate([m.bias for m in mods]).astype(dt)
        qkv = jnp.dot(x.astype(dt), kernel)
        scales = [m.scale() for m in mods]
        if scales[0] is not None:
            # int8 kernels: per-column scales concatenate like the
            # kernels do, and (x@q)·scale ≡ x@(q·scale) per column
            qkv = qkv * jnp.concatenate(scales).astype(dt)
        qkv = qkv + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return self._split(q), self._split(k), self._split(v)

    def attend_pre_q(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """attend_with_kv with q already projected+head-split (decode
        path, deterministic — used with ``fused_qkv``)."""
        out = multi_head_attention(q, k, v, mask, dropout_rate=0.0,
                                   dropout_rng=None,
                                   use_pallas=self.use_pallas)
        return self.w_o(self._merge(out))

    def attend_with_kv(self, q_in: jnp.ndarray, k: jnp.ndarray,
                       v: jnp.ndarray, mask: Optional[jnp.ndarray],
                       deterministic: bool = True) -> jnp.ndarray:
        q = self._split(self.w_q(q_in))
        rng = None
        rate = 0.0 if deterministic else self.attn_dropout
        if rate > 0.0:
            rng = self.make_rng("dropout")
        out = multi_head_attention(q, k, v, mask, dropout_rate=rate,
                                   dropout_rng=rng,
                                   use_pallas=self.use_pallas)
        return self.w_o(self._merge(out))

    def __call__(self, q_in: jnp.ndarray, k_in: jnp.ndarray,
                 v_in: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        if mask is not None:
            mask = mask[:, None]  # add head axis (data_utils-style (B,1,·,Lk))
        k, v = self._split(self.w_k(k_in)), self._split(self.w_v(v_in))
        return self.attend_with_kv(q_in, k, v, mask, deterministic)


class ParamLinear(nn.Module):
    """Dense with directly accessible kernel/bias (same param paths as
    nn.Dense) so fused Pallas ops can consume the raw weights.

    Also the model's weight-only int8 read path
    (mtn_tpu/utils/quantize.py): when the stored kernel is int8, its
    per-output-channel scale is read from the ``qscales`` variable
    collection and the dequantization is folded around the matmul as
    ``(x @ q) * scale + b`` — HBM reads stay int8, the convert happens
    on-chip. Full-precision apply (training, parity suite) is
    untouched: without a ``qscales`` collection the kernel is float and
    the original path runs.
    """

    d_in: int
    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                                 (self.d_in, self.features),
                                 self.param_dtype)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), self.param_dtype)

    def scale(self) -> Optional[jnp.ndarray]:
        """Per-output-channel dequant scale for an int8 kernel (None
        when running full precision)."""
        if jnp.dtype(self.kernel.dtype) != jnp.int8:
            return None
        if not self.has_variable("qscales", "kernel_scale"):
            raise ValueError(
                "int8 kernel but no 'qscales' collection was passed to "
                "apply — build variables with quantize.model_variables()")
        return self.get_variable("qscales", "kernel_scale")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.scale()
        if scale is not None:
            y = jnp.dot(x.astype(self.dtype), self.kernel.astype(self.dtype))
            return y * scale.astype(self.dtype) + self.bias.astype(self.dtype)
        return jnp.dot(x.astype(self.dtype),
                       self.kernel.astype(self.dtype)) \
            + self.bias.astype(self.dtype)


class FeedForward(nn.Module):
    """FFN: Linear -> ReLU -> dropout -> Linear (mtn.py:269-280).

    With ``use_pallas`` and no active dropout, runs the fused VMEM kernel
    (mtn_tpu.ops.pallas_ffn) over the same parameters.
    """

    d_model: int
    d_ff: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.w_1 = ParamLinear(self.d_model, self.d_ff, self.dtype,
                               self.param_dtype, name="w_1")
        self.w_2 = ParamLinear(self.d_ff, self.d_model, self.dtype,
                               self.param_dtype, name="w_2")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        if self.use_pallas and (deterministic or self.dropout == 0.0) \
                and jnp.dtype(self.w_1.kernel.dtype) != jnp.int8:
            from mtn_tpu.ops.pallas_ffn import fused_ffn
            dt = self.dtype
            return fused_ffn(x.astype(dt), self.w_1.kernel.astype(dt),
                             self.w_1.bias.astype(dt),
                             self.w_2.kernel.astype(dt),
                             self.w_2.bias.astype(dt))
        h = nn.relu(self.w_1(x))
        h = self.drop(h, deterministic=deterministic)
        return self.w_2(h)


class Sublayer(nn.Module):
    """Pre-norm residual connection: ``x + dropout(f(norm(x)))``."""

    dropout: float
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm = RefLayerNorm(param_dtype=self.param_dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, f, deterministic: bool = True):
        return x + self.drop(f(self.norm(x)), deterministic=deterministic)

    def normed(self, x):
        """Pre-norm input (used by the decode path to cache self-attn K/V
        consistently with the training-time sublayer)."""
        return self.norm(x)


class Generator(nn.Module):
    """Linear + log_softmax over the vocabulary (mtn.py:62-69)."""

    vocab_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        logits = ParamLinear(x.shape[-1], self.vocab_size, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
