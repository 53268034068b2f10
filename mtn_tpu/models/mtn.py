"""MTN encoder-decoder for video-grounded dialogue (TPU-native rewrite).

Architecture parity with the reference (mtn.py:10-218,332-414):

- text "encoding" is ``Embed·sqrt(d) + sinusoidal PE + dropout`` followed by
  a single per-stream LayerNorm (the reference Encoder applies *only*
  LayerNorms, mtn.py:75-101) — query/caption/history share the query
  embedding (mtn.py:52,54);
- video streams are encoded per feature type with
  ``Linear(ft_dim→d) + ReLU + PE`` (mtn.py:377-379);
- the decoder threads ``(x, ae_fts)`` through N layers; each layer runs
  ``5 + 4·n_streams`` pre-norm residual sublayers (mtn.py:166-218):
  target self-attention → history cross-attention → {caption, query}
  cross-attention (order swapped by ``auto_encoder_ft``) → per stream the
  Query-Aware Auto-Encoder (AE self-attn → AE→video attn → AE FFN →
  x→AE attn) → final FFN;
- on the first layer the AE state seeds from the attended source memory
  (query or caption, mtn.py:192-202) unless ``diff_encoder`` provides
  per-stream encoded AE inputs;
- final LayerNorm on x plus per-stream AE norms (mtn.py:161-164).

TPU-native additions with no reference counterpart:

- ``init_decode_state`` computes the *entire* auto-encoder chain and all
  cross-attention K/V projections once per utterance — they are
  independent of the generated prefix, yet the reference recomputes them
  for every hypothesis at every step (data_utils.py:202-206);
- ``decode_step`` advances one token with a self-attention KV cache, so a
  beam step is O(prefix) instead of O(prefix²) attention work and is
  batched over (turns × beam) rows (see mtn_tpu/decode/beam.py).

Functional deviations (documented): ``separate_his_embed`` /
``separate_cap_embed`` construct embeddings the reference never uses in
its encode path (mtn.py:52,54 always use ``query_embed``); here the flags
actually select the separate embeddings. Defaults (off) match reference
behavior exactly. The dead ``EncoderLayer`` branch (mtn.py:360,391-393 is
unreachable) is not reproduced.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from mtn_tpu.config import ModelConfig
from mtn_tpu.models.layers import (FeedForward, Generator, MultiHeadAttention,
                                   ParamLinear, PosEncoding, RefLayerNorm,
                                   ScaledEmbed, Sublayer)


@struct.dataclass
class Encoded:
    """Encoder outputs (per-stream lists are tuples for pytree stability)."""

    query: jnp.ndarray
    vid: Tuple[jnp.ndarray, ...]
    cap: jnp.ndarray
    his: jnp.ndarray
    ae: Optional[Tuple[jnp.ndarray, ...]]


@struct.dataclass
class SourceMasks:
    query: jnp.ndarray          # (B, 1, Lq) bool
    his: jnp.ndarray            # (B, 1, Lh)
    cap: jnp.ndarray            # (B, 1, Lc)
    vid: Tuple[jnp.ndarray, ...]  # per stream (B, 1, T_i)


@struct.dataclass
class LayerDecodeCache:
    """Per-decoder-layer cached cross-attention K/V (computed once)."""

    his_kv: Tuple[jnp.ndarray, jnp.ndarray]
    cap_kv: Tuple[jnp.ndarray, jnp.ndarray]
    src_kv: Tuple[jnp.ndarray, jnp.ndarray]
    ae_kv: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # per stream


@struct.dataclass
class DecodeState:
    layers: Tuple[LayerDecodeCache, ...]
    masks: SourceMasks
    ae_mask: jnp.ndarray        # (B, 1, L_ae)


class VideoEncoder(nn.Module):
    """Per-stream ``Linear + ReLU + PE(+dropout)`` (mtn.py:377-379)."""

    d_model: int
    dropout: float
    max_len: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ft: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = ParamLinear(ft.shape[-1], self.d_model, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(ft)
        x = nn.relu(x)
        return PosEncoding(self.d_model, self.dropout, self.max_len,
                           self.dtype, name="pe")(x, deterministic)


class NormEncoder(nn.Module):
    """The reference "Encoder": one LayerNorm per stream (mtn.py:75-101).

    Norm order (and so parameter identity) matches the reference walk:
    query, vid_0..vid_{s-1}, cap, his, [ae_0..ae_{s-1}].
    """

    n_streams: int
    diff_encoder: bool
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm_query = RefLayerNorm(param_dtype=self.param_dtype)
        self.norm_vid = [RefLayerNorm(param_dtype=self.param_dtype,
                                      name=f"norm_vid_{i}")
                         for i in range(self.n_streams)]
        self.norm_cap = RefLayerNorm(param_dtype=self.param_dtype)
        self.norm_his = RefLayerNorm(param_dtype=self.param_dtype)
        if self.diff_encoder:
            self.norm_ae = [RefLayerNorm(param_dtype=self.param_dtype,
                                         name=f"norm_ae_{i}")
                            for i in range(self.n_streams)]

    def __call__(self, query, vid: Sequence[jnp.ndarray], cap, his,
                 ae: Optional[Sequence[jnp.ndarray]] = None):
        out_query = self.norm_query(query)
        out_vid = tuple(self.norm_vid[i](v) for i, v in enumerate(vid))
        out_cap = self.norm_cap(cap)
        out_his = self.norm_his(his)
        out_ae = None
        if ae is not None:
            out_ae = tuple(self.norm_ae[i](a) for i, a in enumerate(ae))
        return out_query, out_vid, out_cap, out_his, out_ae


class DecoderLayer(nn.Module):
    """One MTN decoder block (mtn.py:166-218)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pt = jnp.dtype(cfg.param_dtype)
        mha = lambda name: MultiHeadAttention(
            cfg.att_h, cfg.d_model, dtype=dt, param_dtype=pt,
            use_pallas=cfg.use_pallas_attention,
            attn_dropout=cfg.attn_dropout, name=name)
        ffn = lambda name: FeedForward(cfg.d_model, cfg.d_ff, cfg.dropout,
                                       dtype=dt, param_dtype=pt,
                                       use_pallas=cfg.use_pallas_ffn,
                                       name=name)
        sub = lambda name: Sublayer(cfg.dropout, param_dtype=pt, name=name)
        s = cfg.n_streams
        self.self_attn = mha("self_attn")
        self.his_attn = mha("his_attn")
        self.cap_attn = mha("cap_attn")
        self.src_attn = mha("src_attn")     # reference q_attn
        self.ae_self_attn = [mha(f"ae_self_attn_{i}") for i in range(s)]
        self.ae_vid_attn = [mha(f"ae_vid_attn_{i}") for i in range(s)]
        self.ae_attn = [mha(f"ae_attn_{i}") for i in range(s)]
        self.ae_ff = [ffn(f"ae_ff_{i}") for i in range(s)]
        self.ff = ffn("ff")
        self.sl_self = sub("sl_self")
        self.sl_his = sub("sl_his")
        self.sl_cap = sub("sl_cap")
        self.sl_src = sub("sl_src")
        self.sl_ae_self = [sub(f"sl_ae_self_{i}") for i in range(s)]
        self.sl_ae_vid = [sub(f"sl_ae_vid_{i}") for i in range(s)]
        self.sl_ae_ff = [sub(f"sl_ae_ff_{i}") for i in range(s)]
        self.sl_x_ae = [sub(f"sl_x_ae_{i}") for i in range(s)]
        self.sl_ff = sub("sl_ff")

    # -- full (training) forward -------------------------------------------
    def __call__(self, x, enc: Encoded, masks: SourceMasks, tgt_mask,
                 ae_fts, deterministic: bool = True):
        det = deterministic
        ae_src = self.cfg.auto_encoder_ft
        x = self.sl_self(x, lambda y: self.self_attn(
            y, y, y, tgt_mask, det), det)
        x = self.sl_his(x, lambda y: self.his_attn(
            y, enc.his, enc.his, masks.his, det), det)
        if ae_src in ("caption", "summary"):
            x = self.sl_src(x, lambda y: self.src_attn(
                y, enc.query, enc.query, masks.query, det), det)
            x = self.sl_cap(x, lambda y: self.cap_attn(
                y, enc.cap, enc.cap, masks.cap, det), det)
            seed, ae_mask = enc.cap, masks.cap
        else:  # 'query' (mandatory in practice, train.py:34-39)
            x = self.sl_cap(x, lambda y: self.cap_attn(
                y, enc.cap, enc.cap, masks.cap, det), det)
            x = self.sl_src(x, lambda y: self.src_attn(
                y, enc.query, enc.query, masks.query, det), det)
            seed, ae_mask = enc.query, masks.query
        if ae_fts is None:
            ae_fts = seed
        # the AE chains are independent of x (and of each other), so
        # computing them all first ≡ interleaving them with the x
        # updates; _ae_streams batches them when cfg.batched_ae
        out_ae = self._ae_streams(ae_fts, enc, masks, ae_mask, det)
        for i in range(self.cfg.n_streams):
            ae = out_ae[i]
            x = self.sl_x_ae[i](x, lambda y, ae=ae: self.ae_attn[i](
                y, ae, ae, ae_mask, det), det)
        x = self.sl_ff(x, lambda y: self.ff(y, det), det)
        return x, tuple(out_ae)

    def _ae_stream(self, i, ae, vid_ft, vid_mask, ae_mask, det):
        """AE sublayers for stream i: self-attn → vid-attn → FFN."""
        ae = self.sl_ae_self[i](ae, lambda y: self.ae_self_attn[i](
            y, y, y, ae_mask, det), det)
        ae = self.sl_ae_vid[i](ae, lambda y: self.ae_vid_attn[i](
            y, vid_ft, vid_ft, vid_mask, det), det)
        ae = self.sl_ae_ff[i](ae, lambda y: self.ae_ff[i](y, det), det)
        return ae

    def _ae_streams(self, ae_fts, enc: Encoded, masks: SourceMasks, ae_mask,
                    det) -> List[jnp.ndarray]:
        """All streams' AE chains; dispatches to the batched
        implementation when ``cfg.batched_ae`` (and >1 stream)."""
        pick = lambda i: (ae_fts[i] if isinstance(ae_fts, (list, tuple))
                          else ae_fts)
        # during init the batched path cannot run: it reads sibling
        # modules' .variables directly, which exist only after creation.
        # Falling back to the sequential chain also guarantees the param
        # tree is created in the exact sequential structure/order, so
        # batched_ae checkpoints are interchangeable with sequential ones.
        if self.cfg.batched_ae and self.cfg.n_streams > 1 \
                and not self.is_initializing():
            stacked = self._ae_streams_batched(
                [pick(i) for i in range(self.cfg.n_streams)],
                enc.vid, masks.vid, ae_mask, det)
            return [stacked[i] for i in range(self.cfg.n_streams)]
        return [self._ae_stream(i, pick(i), enc.vid[i], masks.vid[i],
                                ae_mask, det)
                for i in range(self.cfg.n_streams)]

    def _ae_streams_batched(self, ae_list, enc_vid, vid_masks, ae_mask,
                            det) -> jnp.ndarray:
        """The per-stream QAE chains as stacked batched GEMMs.

        The S chains are independent (each consumes only its own AE
        state and video stream), so each sublayer runs as ONE einsum
        over a stacked (S, B, L, D) tensor instead of S module calls —
        the dispatch-count experiment of docs/BENCH.md "Batched QAE".
        Per-stream video lengths are padded to the max and masked; a
        fully-masked key scores exp(-1e9)→0 in the f32 softmax, so the
        padding is mathematically invisible. Dropout (residual + attn
        probs) draws fresh rngs over the stacked shape — same
        distribution as the sequential loop, different draw order.
        Int8-quantized kernels (utils/quantize.py) are handled by
        stacking their per-channel scales alongside."""
        cfg = self.cfg
        S, D, H = cfg.n_streams, cfg.d_model, cfg.att_h
        dt = jnp.dtype(cfg.dtype)
        maxT = max(int(v.shape[1]) for v in enc_vid)
        vid = jnp.stack([
            jnp.pad(v, ((0, 0), (0, maxT - v.shape[1]), (0, 0)))
            for v in enc_vid])                                # (S,B,T,D)
        vmask = jnp.stack([
            jnp.pad(m, ((0, 0), (0, 0), (0, maxT - m.shape[-1])))
            for m in vid_masks])                              # (S,B,1,T)
        ae = jnp.stack(ae_list)                               # (S,B,L,D)
        B = ae.shape[1]
        amask = jnp.broadcast_to(ae_mask[None], (S,) + ae_mask.shape)

        stk = lambda f: jnp.stack([f(i) for i in range(S)])

        def drop(x):
            if det or cfg.dropout == 0.0:
                return x
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - cfg.dropout, x.shape)
            return jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)

        def norm(x, subs):
            # RefLayerNorm math (layers.py) with stacked scale/bias
            a = stk(lambda i: subs[i].norm.variables["params"]["scale"])
            b = stk(lambda i: subs[i].norm.variables["params"]["bias"])
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.sum(jnp.square(xf - mean), axis=-1,
                          keepdims=True) / (D - 1)
            y = a[:, None, None, :] * (xf - mean) / (jnp.sqrt(var) + 1e-6) \
                + b[:, None, None, :]
            return y.astype(x.dtype)

        def lin(x, mods, name):
            subs = [getattr(m, name) for m in mods]
            W = stk(lambda i: subs[i].kernel)
            y = jnp.einsum("sbld,sde->sble", x.astype(dt), W.astype(dt))
            scale0 = subs[0].scale()
            if scale0 is not None:  # int8 kernels: per-channel scales
                y = y * stk(lambda i: subs[i].scale()).astype(
                    dt)[:, None, None, :]
            return y + stk(lambda i: subs[i].bias).astype(
                dt)[:, None, None, :]

        def mha(mods, xq, xkv, mask):
            from mtn_tpu.ops.attention import multi_head_attention
            q, k, v = (lin(xq, mods, "w_q"), lin(xkv, mods, "w_k"),
                       lin(xkv, mods, "w_v"))
            split = lambda t: t.reshape(
                S * B, -1, H, D // H).transpose(0, 2, 1, 3)
            rate = 0.0 if det else cfg.attn_dropout
            rng = self.make_rng("dropout") if rate > 0.0 else None
            out = multi_head_attention(
                split(q), split(k), split(v),
                mask.reshape(S * B, 1, 1, mask.shape[-1]),
                dropout_rate=rate, dropout_rng=rng,
                use_pallas=cfg.use_pallas_attention)
            out = out.transpose(0, 2, 1, 3).reshape(S, B, -1, D)
            return lin(out, mods, "w_o")

        y = norm(ae, self.sl_ae_self)
        ae = ae + drop(mha(self.ae_self_attn, y, y, amask))
        ae = ae + drop(mha(self.ae_vid_attn, norm(ae, self.sl_ae_vid),
                           vid, vmask))
        h = jax.nn.relu(lin(norm(ae, self.sl_ae_ff), self.ae_ff, "w_1"))
        ae = ae + drop(lin(drop(h), self.ae_ff, "w_2"))
        return ae

    # -- decode-time precompute --------------------------------------------
    def precompute(self, enc: Encoded, masks: SourceMasks, ae_fts
                   ) -> Tuple[LayerDecodeCache, Tuple[jnp.ndarray, ...]]:
        """Advance the AE chain one layer and cache all cross K/V."""
        ae_src = self.cfg.auto_encoder_ft
        if ae_src in ("caption", "summary"):
            seed, ae_mask = enc.cap, masks.cap
        else:
            seed, ae_mask = enc.query, masks.query
        if ae_fts is None:
            ae_fts = seed
        out_ae = self._ae_streams(ae_fts, enc, masks, ae_mask, det=True)
        ae_kv = [self.ae_attn[i].project_kv(out_ae[i])
                 for i in range(self.cfg.n_streams)]
        cache = LayerDecodeCache(
            his_kv=self.his_attn.project_kv(enc.his),
            cap_kv=self.cap_attn.project_kv(enc.cap),
            src_kv=self.src_attn.project_kv(enc.query),
            ae_kv=tuple(ae_kv),
        )
        return cache, tuple(out_ae)

    # -- single-token decode step ------------------------------------------
    def step(self, x, cache: LayerDecodeCache, masks: SourceMasks, ae_mask,
             self_k, self_v, pos, self_q=None):
        """x: (B, 1, D) current-position activations. ``self_k/v``:
        (B, H, maxlen, Dk) caches already containing this step's K/V at
        index ``pos``. ``self_q``: optionally the current position's
        head-split q, already projected by ``fused_self_qkv`` (the
        sublayer's pre-norm of x is CSE'd with the one that fed the
        fused projection). Returns updated x."""
        maxlen = self_k.shape[2]
        # causal mask over the cache: attend to positions <= pos
        valid = (jnp.arange(maxlen) <= pos)[None, None, None, :]
        if self_q is not None:
            x = self.sl_self(x, lambda y: self.self_attn.attend_pre_q(
                self_q, self_k, self_v, valid), True)
        else:
            x = self.sl_self(x, lambda y: self.self_attn.attend_with_kv(
                y, self_k, self_v, valid), True)
        hd = lambda m: m[:, None]  # add head axis
        x = self.sl_his(x, lambda y: self.his_attn.attend_with_kv(
            y, *cache.his_kv, hd(masks.his)), True)
        ae_src = self.cfg.auto_encoder_ft
        if ae_src in ("caption", "summary"):
            x = self.sl_src(x, lambda y: self.src_attn.attend_with_kv(
                y, *cache.src_kv, hd(masks.query)), True)
            x = self.sl_cap(x, lambda y: self.cap_attn.attend_with_kv(
                y, *cache.cap_kv, hd(masks.cap)), True)
        else:
            x = self.sl_cap(x, lambda y: self.cap_attn.attend_with_kv(
                y, *cache.cap_kv, hd(masks.cap)), True)
            x = self.sl_src(x, lambda y: self.src_attn.attend_with_kv(
                y, *cache.src_kv, hd(masks.query)), True)
        for i in range(self.cfg.n_streams):
            x = self.sl_x_ae[i](x, lambda y, i=i: self.ae_attn[i].attend_with_kv(
                y, *cache.ae_kv[i], hd(ae_mask)), True)
        x = self.sl_ff(x, lambda y: self.ff(y, True), True)
        return x

    def self_qkv(self, x):
        """Project current-position q-input's K/V for the self cache."""
        return self.self_attn.project_kv(x)

    def fused_self_qkv(self, x):
        """Current position's (q, k, v), head-split, in one GEMM."""
        return self.self_attn.fused_qkv(x)

    def self_norm_in(self, x):
        """Pre-norm input to self-attention (needed before caching K/V)."""
        return self.sl_self.normed(x)


class Decoder(nn.Module):
    """N stacked decoder layers + final norms (mtn.py:149-164)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        # nn.remat transforms __call__ only (the training path); the
        # decode-time methods (precompute/step/self_qkv) are grad-free
        # and stay untransformed. Scope/param names are unchanged, so
        # remat on/off checkpoints are interchangeable.
        # static_argnums counts self: 6 = the `deterministic` bool
        layer_cls = (nn.remat(DecoderLayer, static_argnums=(6,))
                     if cfg.remat else DecoderLayer)
        self.layers = [layer_cls(cfg, name=f"layer_{i}")
                       for i in range(cfg.nb_blocks)]
        self.norm = RefLayerNorm(param_dtype=jnp.dtype(cfg.param_dtype))
        self.ae_norm = [RefLayerNorm(param_dtype=jnp.dtype(cfg.param_dtype),
                                     name=f"ae_norm_{i}")
                        for i in range(cfg.n_streams)]

    def __call__(self, x, enc: Encoded, masks: SourceMasks, tgt_mask,
                 ae_fts, deterministic: bool = True):
        for layer in self.layers:
            x, ae_fts = layer(x, enc, masks, tgt_mask, ae_fts, deterministic)
        out_ae = tuple(self.ae_norm[i](ft) for i, ft in enumerate(ae_fts))
        return self.norm(x), out_ae

    def precompute(self, enc: Encoded, masks: SourceMasks, ae_fts):
        caches = []
        for layer in self.layers:
            cache, ae_fts = layer.precompute(enc, masks, ae_fts)
            caches.append(cache)
        return tuple(caches)

    def step(self, x, state: DecodeState, self_kv, pos):
        """One decode position through all layers.

        ``self_kv``: tuple per layer of (k, v) caches (B, H, maxlen, Dk).
        Returns (normed x, updated self_kv tuple).
        """
        new_kv = []
        for layer, cache, (k_cache, v_cache) in zip(self.layers, state.layers,
                                                    self_kv):
            if self.cfg.fused_decode_qkv:
                q_t, k_t, v_t = layer.fused_self_qkv(layer.self_norm_in(x))
            else:
                q_t = None
                k_t, v_t = layer.self_qkv(layer.self_norm_in(x))
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_t, pos,
                                                          axis=2)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_t, pos,
                                                          axis=2)
            x = layer.step(x, cache, state.masks, state.ae_mask, k_cache,
                           v_cache, pos, self_q=q_t)
            new_kv.append((k_cache, v_cache))
        return self.norm(x), tuple(new_kv)


class MTN(nn.Module):
    """The full encoder-decoder (reference EncoderDecoder, mtn.py:10-60)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pt = jnp.dtype(cfg.param_dtype)
        self.embed_src = ScaledEmbed(cfg.vocab_size, cfg.d_model, dt, pt,
                                     name="embed_src")
        self.embed_tgt = ScaledEmbed(cfg.vocab_size, cfg.d_model, dt, pt,
                                     name="embed_tgt")
        pe = lambda name: PosEncoding(cfg.d_model, cfg.dropout, cfg.max_len,
                                      dt, name=name)
        self.pe_src = pe("pe_src")
        self.pe_tgt = pe("pe_tgt")
        if cfg.separate_his_embed:
            self.embed_his = ScaledEmbed(cfg.vocab_size, cfg.d_model, dt, pt,
                                         name="embed_his")
            self.pe_his = pe("pe_his")
        if cfg.separate_cap_embed:
            self.embed_cap = ScaledEmbed(cfg.vocab_size, cfg.d_model, dt, pt,
                                         name="embed_cap")
            self.pe_cap = pe("pe_cap")
        if cfg.diff_embed:
            self.ae_embeds = [ScaledEmbed(cfg.vocab_size, cfg.d_model, dt, pt,
                                          name=f"ae_embed_{i}")
                              for i in range(cfg.n_streams)]
            self.ae_pes = [pe(f"ae_pe_{i}") for i in range(cfg.n_streams)]
        self.vid_encoders = [VideoEncoder(cfg.d_model, cfg.dropout,
                                          cfg.max_len, dt, pt,
                                          name=f"vid_encoder_{i}")
                             for i in range(cfg.n_streams)]
        self.encoder = NormEncoder(cfg.n_streams, cfg.diff_encoder, pt,
                                   name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        self.generator = Generator(cfg.vocab_size, dt, pt, name="generator")
        if cfg.diff_gen:
            self.ae_generators = [Generator(cfg.vocab_size, dt, pt,
                                            name=f"ae_generator_{i}")
                                  for i in range(cfg.n_streams)]

    # -- encoding -----------------------------------------------------------
    def _embed_query(self, tokens, det):
        return self.pe_src(self.embed_src(tokens), det)

    def _embed_his(self, tokens, det):
        if self.cfg.separate_his_embed:
            return self.pe_his(self.embed_his(tokens), det)
        return self._embed_query(tokens, det)

    def _embed_cap(self, tokens, det):
        if self.cfg.separate_cap_embed:
            return self.pe_cap(self.embed_cap(tokens), det)
        return self._embed_query(tokens, det)

    def encode(self, query, his, cap, fts: Sequence[jnp.ndarray],
               deterministic: bool = True) -> Encoded:
        cfg = self.cfg
        det = deterministic
        q_emb = self._embed_query(query, det)
        his_emb = self._embed_his(his, det)
        cap_emb = self._embed_cap(cap, det)
        vid = [self.vid_encoders[i](ft.astype(jnp.dtype(cfg.dtype)), det)
               for i, ft in enumerate(fts)]
        ae = None
        if cfg.diff_encoder:
            src_tokens = cap if cfg.auto_encoder_ft in ("caption", "summary") \
                else query
            ae = []
            for i in range(cfg.n_streams):
                if cfg.diff_embed:
                    ae.append(self.ae_pes[i](self.ae_embeds[i](src_tokens),
                                             det))
                else:
                    ae.append(self._embed_query(src_tokens, det))
        q, v, c, h, a = self.encoder(q_emb, vid, cap_emb, his_emb, ae)
        return Encoded(query=q, vid=v, cap=c, his=h, ae=a)

    # -- training forward ---------------------------------------------------
    def __call__(self, query, his, cap, fts, masks: SourceMasks, tgt,
                 tgt_mask, deterministic: bool = True):
        enc = self.encode(query, his, cap, fts, deterministic)
        x = self.pe_tgt(self.embed_tgt(tgt), deterministic)
        ae_fts = list(enc.ae) if enc.ae is not None else None
        return self.decoder(x, enc, masks, tgt_mask, ae_fts, deterministic)

    def init_all(self, query, his, cap, fts, masks: SourceMasks, tgt,
                 tgt_mask):
        """Forward pass touching every submodule (for parameter init)."""
        x, ae_outs = self(query, his, cap, fts, masks, tgt, tgt_mask,
                          deterministic=True)
        logp = self.generator(x)
        ae_logps = self.ae_logprobs(ae_outs) if ae_outs else []
        return logp, ae_logps

    def generate_logprobs(self, x):
        return self.generator(x)

    def ae_logprobs(self, ae_outs: Sequence[jnp.ndarray]):
        if self.cfg.diff_gen:
            return [self.ae_generators[i](a) for i, a in enumerate(ae_outs)]
        return [self.generator(a) for a in ae_outs]

    # -- decode-time API ----------------------------------------------------
    def init_decode_state(self, query, his, cap, fts,
                          masks: SourceMasks) -> DecodeState:
        # decode-time degenerate-source law: a fully-masked source row
        # (lone-<blank> history/caption) attends position 0 only — the
        # reference's batchsize-1 decode semantics, padding-invariant
        # (ops/masks.py::attend_first_if_empty; training keeps raw masks)
        from mtn_tpu.ops.masks import attend_first_if_empty as _fix
        masks = SourceMasks(query=_fix(masks.query), his=_fix(masks.his),
                            cap=_fix(masks.cap),
                            vid=tuple(_fix(m) for m in masks.vid))
        enc = self.encode(query, his, cap, fts, deterministic=True)
        ae_fts = list(enc.ae) if enc.ae is not None else None
        caches = self.decoder.precompute(enc, masks, ae_fts)
        ae_mask = masks.cap if self.cfg.auto_encoder_ft in (
            "caption", "summary") else masks.query
        return DecodeState(layers=caches, masks=masks, ae_mask=ae_mask)

    def decode_step(self, state: DecodeState, tokens, pos, self_kv):
        """tokens: (B,) int32 current input token; pos: scalar position.

        Returns ((B, V) float32 log-probs, updated self_kv)."""
        x = self.embed_tgt(tokens[:, None])           # (B, 1, D)
        x = self.pe_tgt.at(x, pos)
        x, self_kv = self.decoder.step(x, state, self_kv, pos)
        logp = self.generator(x[:, 0])
        return logp, self_kv

    def init_self_kv(self, batch_size: int, maxlen: int):
        """Zeroed per-layer self-attention KV caches."""
        cfg = self.cfg
        d_k = cfg.d_model // cfg.att_h
        shape = (batch_size, cfg.att_h, maxlen, d_k)
        z = jnp.zeros(shape, dtype=jnp.dtype(cfg.dtype))
        return tuple((z, z) for _ in range(cfg.nb_blocks))


def make_model(cfg: ModelConfig) -> MTN:
    """Model factory (reference make_model, mtn.py:332-414)."""
    return MTN(cfg)
