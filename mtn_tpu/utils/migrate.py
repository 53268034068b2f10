"""Migrate reference (PyTorch) MTN checkpoints into mtn_tpu parameters.

A user of the reference has per-epoch whole-module pickles
(``torch.save(model, ...)``, reference train.py:217) and a pickled
``(vocab, args)`` sidecar (train.py:166-168). This tool converts both
into this framework's native artifacts (flax param tree + JSON config/
vocab sidecars + an Orbax checkpoint) so trained models carry over
without retraining.

The parameter mapping is the exact inverse of the transplant used by the
reference-parity tests (tests/test_reference_parity.py), which prove the
two parameterizations are numerically identical.

Requires torch (CPU is fine) at migration time only.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from mtn_tpu.config import DataConfig, ModelConfig


def _linear(torch_lin) -> Dict[str, np.ndarray]:
    return {"kernel": torch_lin.weight.detach().numpy().T.copy(),
            "bias": torch_lin.bias.detach().numpy().copy()}


def _norm(torch_norm) -> Dict[str, np.ndarray]:
    return {"scale": torch_norm.a_2.detach().numpy().copy(),
            "bias": torch_norm.b_2.detach().numpy().copy()}


def _mha(torch_mha) -> Dict[str, Any]:
    return {name: _linear(torch_mha.linears[i])
            for i, name in enumerate(("w_q", "w_k", "w_v", "w_o"))}


def _ff(torch_ff) -> Dict[str, Any]:
    return {"w_1": _linear(torch_ff.w_1), "w_2": _linear(torch_ff.w_2)}


def _embed(torch_seq) -> Dict[str, Any]:
    return {"lut": {"embedding":
                    torch_seq[0].lut.weight.detach().numpy().copy()}}


def params_from_reference(ref_model) -> Tuple[dict, ModelConfig]:
    """Reference EncoderDecoder module -> (flax params dict, ModelConfig)."""
    n_streams = len(ref_model.vid_encoder)
    n_layers = len(ref_model.decoder.layers)
    d_model = ref_model.generator.proj.in_features
    vocab_size = ref_model.generator.proj.out_features
    d_ff = ref_model.decoder.layers[0].feed_forward.w_1.out_features
    att_h = ref_model.decoder.layers[0].self_attn.h
    ft_sizes = [enc[0].in_features for enc in ref_model.vid_encoder]
    diff_encoder = bool(ref_model.diff_encoder)
    ae_ft = ref_model.auto_encoder_ft
    diff_embed = ref_model.auto_encoder_embed is not None
    diff_gen = ref_model.auto_encoder_generator is not None

    params: Dict[str, Any] = {}
    params["embed_src"] = _embed(ref_model.query_embed)
    params["embed_tgt"] = _embed(ref_model.tgt_embed)
    if ref_model.his_embed is not None:
        params["embed_his"] = _embed(ref_model.his_embed)
    if ref_model.cap_embed is not None:
        params["embed_cap"] = _embed(ref_model.cap_embed)
    if diff_embed:
        for i in range(n_streams):
            params[f"ae_embed_{i}"] = _embed(ref_model.auto_encoder_embed[i])
    for i in range(n_streams):
        params[f"vid_encoder_{i}"] = {
            "proj": _linear(ref_model.vid_encoder[i][0])}
    # encoder norms in the reference walk order (mtn.py:83-101)
    enc: Dict[str, Any] = {}
    norms = ref_model.query_encoder.norm
    enc["norm_query"] = _norm(norms[0])
    for i in range(n_streams):
        enc[f"norm_vid_{i}"] = _norm(norms[1 + i])
    enc["norm_cap"] = _norm(norms[1 + n_streams])
    enc["norm_his"] = _norm(norms[2 + n_streams])
    if diff_encoder:
        for i in range(n_streams):
            enc[f"norm_ae_{i}"] = _norm(norms[3 + n_streams + i])
    params["encoder"] = enc

    decoder: Dict[str, Any] = {}
    for li, layer in enumerate(ref_model.decoder.layers):
        lp: Dict[str, Any] = {
            "self_attn": _mha(layer.self_attn),
            "his_attn": _mha(layer.his_attn),
            "cap_attn": _mha(layer.cap_attn),
            "src_attn": _mha(layer.src_attn),
            "ff": _ff(layer.feed_forward),
        }
        for i in range(n_streams):
            lp[f"ae_self_attn_{i}"] = _mha(layer.auto_encoder_self_attn[i])
            lp[f"ae_vid_attn_{i}"] = _mha(layer.auto_encoder_vid_attn[i])
            lp[f"ae_attn_{i}"] = _mha(layer.auto_encoder_attn[i])
            lp[f"ae_ff_{i}"] = _ff(layer.auto_encoder_feed_forward[i])
        # sublayer count order (mtn.py:181-218)
        if ae_ft in ("caption", "summary"):
            order = ["sl_self", "sl_his", "sl_src", "sl_cap"]
        else:
            order = ["sl_self", "sl_his", "sl_cap", "sl_src"]
        for i in range(n_streams):
            order += [f"sl_ae_self_{i}", f"sl_ae_vid_{i}",
                      f"sl_ae_ff_{i}", f"sl_x_ae_{i}"]
        order.append("sl_ff")
        for idx, name in enumerate(order):
            lp[name] = {"norm": _norm(layer.sublayer[idx].norm)}
        decoder[f"layer_{li}"] = lp
    decoder["norm"] = _norm(ref_model.decoder.norm)
    for i in range(n_streams):
        decoder[f"ae_norm_{i}"] = _norm(ref_model.decoder.ae_norm[i])
    params["decoder"] = decoder
    params["generator"] = {"proj": _linear(ref_model.generator.proj)}
    if diff_gen:
        for i in range(n_streams):
            params[f"ae_generator_{i}"] = {
                "proj": _linear(ref_model.auto_encoder_generator[i].proj)}

    cfg = ModelConfig(
        vocab_size=vocab_size, nb_blocks=n_layers, d_model=d_model,
        d_ff=d_ff, att_h=att_h, ft_sizes=ft_sizes,
        separate_his_embed=ref_model.his_embed is not None,
        separate_cap_embed=ref_model.cap_embed is not None,
        diff_encoder=diff_encoder, diff_embed=diff_embed,
        diff_gen=diff_gen, auto_encoder_ft=ae_ft)
    return params, cfg


def migrate_checkpoint(model_path: str, conf_path: str, out_prefix: str,
                       epoch: int = 1) -> Tuple[dict, ModelConfig, dict]:
    """Reference ``<model>.pth.tar`` + ``<model>.conf`` -> mtn_tpu
    artifacts under ``out_prefix`` (conf/vocab JSON + Orbax checkpoint
    with fresh optimizer state)."""
    import torch

    import jax.numpy as jnp
    from mtn_tpu.config import TrainConfig
    from mtn_tpu.train.schedule import make_optimizer
    from mtn_tpu.train.trainer import TrainState
    from mtn_tpu.utils.checkpoint import CheckpointManager

    with open(conf_path, "rb") as f:
        vocab, train_args = pickle.load(f)
    ref_model = torch.load(model_path, map_location="cpu",
                           weights_only=False)
    params_np, model_cfg = params_from_reference(ref_model)
    params = _to_jnp(params_np)

    data_cfg = DataConfig(
        fea_type=list(getattr(train_args, "fea_type", []) or []),
        include_caption=getattr(train_args, "include_caption", "none"),
        separate_caption=bool(getattr(train_args, "separate_caption", False)),
        max_history_length=getattr(train_args, "max_history_length", -1),
        merge_source=bool(getattr(train_args, "merge_source", False)),
        batch_size=getattr(train_args, "batch_size", 32),
        max_length=getattr(train_args, "max_length", 256),
        cut_a=bool(getattr(train_args, "cut_a", False)))
    train_cfg = TrainConfig(
        warmup_steps=getattr(train_args, "warmup_steps", 4000),
        loss_l=getattr(train_args, "loss_l", 1.0))

    ckpt = CheckpointManager(out_prefix)
    ckpt.save_conf(vocab, model=model_cfg, data=data_cfg, train=train_cfg)
    optimizer = make_optimizer(model_cfg.d_model, train_cfg.warmup_steps)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    ckpt.save(epoch, state)
    return params, model_cfg, vocab


def _to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
