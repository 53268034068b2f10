"""Migrate MTN checkpoints between the reference (PyTorch) format and
mtn_tpu — in BOTH directions.

Import (``migrate_checkpoint``): a user of the reference has per-epoch
whole-module pickles (``torch.save(model, ...)``, reference
train.py:217) and a pickled ``(vocab, args)`` sidecar (train.py:166-168).
This converts both into this framework's native artifacts (flax param
tree + JSON config/vocab sidecars + an Orbax checkpoint) so trained
models carry over without retraining.

Export (``export_to_reference``): the inverse — a model trained here is
written back as a reference-format whole-module pickle + ``.conf``,
loadable by the reference's own ``generate.py:130-133``. Exporting
requires the reference repo on disk (its classes define the pickle;
any consumer of such a pickle needs them importable anyway).

The parameter mapping is the exact inverse of the transplant used by the
reference-parity tests (tests/test_reference_parity.py), which prove the
two parameterizations are numerically identical.

Requires torch (CPU is fine) at migration time only.

CLI::

    python -m mtn_tpu.utils.migrate import <model.pth.tar> <model.conf> <out_prefix>
    python -m mtn_tpu.utils.migrate export exps/x/mtn_best <out.pth.tar> <out.conf>
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


# ---------------------------------------------------------------------------
# Export: mtn_tpu -> reference torch format
# ---------------------------------------------------------------------------

def _set_linear(torch, lin, p):
    lin.weight.copy_(torch.tensor(np.asarray(p["kernel"], np.float32).T))
    lin.bias.copy_(torch.tensor(np.asarray(p["bias"], np.float32)))


def _set_norm(torch, norm, p):
    norm.a_2.copy_(torch.tensor(np.asarray(p["scale"], np.float32)))
    norm.b_2.copy_(torch.tensor(np.asarray(p["bias"], np.float32)))


def _set_mha(torch, mha, p):
    for i, name in enumerate(("w_q", "w_k", "w_v", "w_o")):
        _set_linear(torch, mha.linears[i], p[name])


def _set_ff(torch, ff, p):
    _set_linear(torch, ff.w_1, p["w_1"])
    _set_linear(torch, ff.w_2, p["w_2"])


def _set_embed(torch, seq, p):
    seq[0].lut.weight.copy_(torch.tensor(
        np.asarray(p["lut"]["embedding"], np.float32)))


def load_params_into_reference(ref_model, params) -> None:
    """Copy a flax param tree into a reference torch EncoderDecoder —
    the exact inverse of :func:`params_from_reference` (full config
    space: separate embeds, diff_embed/diff_gen, both sublayer orders).
    """
    import torch

    n_streams = len(ref_model.vid_encoder or [])
    ae_ft = ref_model.auto_encoder_ft
    with torch.no_grad():
        _set_embed(torch, ref_model.query_embed, params["embed_src"])
        _set_embed(torch, ref_model.tgt_embed, params["embed_tgt"])
        if ref_model.his_embed is not None:
            _set_embed(torch, ref_model.his_embed, params["embed_his"])
        if ref_model.cap_embed is not None:
            _set_embed(torch, ref_model.cap_embed, params["embed_cap"])
        if ref_model.auto_encoder_embed is not None:
            for i in range(n_streams):
                _set_embed(torch, ref_model.auto_encoder_embed[i],
                           params[f"ae_embed_{i}"])
        for i in range(n_streams):
            _set_linear(torch, ref_model.vid_encoder[i][0],
                        params[f"vid_encoder_{i}"]["proj"])
        # encoder norms, reference walk order (mtn.py:83-101)
        enc = params["encoder"]
        norms = ref_model.query_encoder.norm
        _set_norm(torch, norms[0], enc["norm_query"])
        for i in range(n_streams):
            _set_norm(torch, norms[1 + i], enc[f"norm_vid_{i}"])
        _set_norm(torch, norms[1 + n_streams], enc["norm_cap"])
        _set_norm(torch, norms[2 + n_streams], enc["norm_his"])
        if ref_model.diff_encoder:
            for i in range(n_streams):
                _set_norm(torch, norms[3 + n_streams + i],
                          enc[f"norm_ae_{i}"])
        for li, layer in enumerate(ref_model.decoder.layers):
            lp = params["decoder"][f"layer_{li}"]
            _set_mha(torch, layer.self_attn, lp["self_attn"])
            _set_mha(torch, layer.his_attn, lp["his_attn"])
            _set_mha(torch, layer.cap_attn, lp["cap_attn"])
            _set_mha(torch, layer.src_attn, lp["src_attn"])
            _set_ff(torch, layer.feed_forward, lp["ff"])
            for i in range(n_streams):
                _set_mha(torch, layer.auto_encoder_self_attn[i],
                         lp[f"ae_self_attn_{i}"])
                _set_mha(torch, layer.auto_encoder_vid_attn[i],
                         lp[f"ae_vid_attn_{i}"])
                _set_mha(torch, layer.auto_encoder_attn[i],
                         lp[f"ae_attn_{i}"])
                _set_ff(torch, layer.auto_encoder_feed_forward[i],
                        lp[f"ae_ff_{i}"])
            # sublayer norm count order (mtn.py:181-218)
            if ae_ft in ("caption", "summary"):
                order = ["sl_self", "sl_his", "sl_src", "sl_cap"]
            else:
                order = ["sl_self", "sl_his", "sl_cap", "sl_src"]
            for i in range(n_streams):
                order += [f"sl_ae_self_{i}", f"sl_ae_vid_{i}",
                          f"sl_ae_ff_{i}", f"sl_x_ae_{i}"]
            order.append("sl_ff")
            for idx, name in enumerate(order):
                _set_norm(torch, layer.sublayer[idx].norm,
                          lp[name]["norm"])
        _set_norm(torch, ref_model.decoder.norm, params["decoder"]["norm"])
        for i in range(n_streams):
            _set_norm(torch, ref_model.decoder.ae_norm[i],
                      params["decoder"][f"ae_norm_{i}"])
        _set_linear(torch, ref_model.generator.proj, params["generator"]["proj"])
        if ref_model.auto_encoder_generator is not None:
            for i in range(n_streams):
                _set_linear(torch, ref_model.auto_encoder_generator[i].proj,
                            params[f"ae_generator_{i}"]["proj"])


def _import_reference(reference_path: str):
    """Import the reference's mtn module (stubbing vestigial torchtext)."""
    import sys
    import types
    if "torchtext" not in sys.modules:
        tt = types.ModuleType("torchtext")
        tt.data = types.SimpleNamespace(Iterator=object, batch=None)
        tt.datasets = types.SimpleNamespace()
        sys.modules["torchtext"] = tt
    sys.path.insert(0, reference_path)
    try:
        import mtn as ref_mtn  # noqa
    finally:
        sys.path.remove(reference_path)
    return ref_mtn


def build_reference_model(model_cfg: ModelConfig, reference_path: str):
    """Construct a reference torch model matching a ModelConfig."""
    ref_mtn = _import_reference(reference_path)
    return ref_mtn.make_model(
        model_cfg.vocab_size, model_cfg.vocab_size,
        N=model_cfg.nb_blocks, d_model=model_cfg.d_model,
        d_ff=model_cfg.d_ff, h=model_cfg.att_h, dropout=model_cfg.dropout,
        separate_his_embed=model_cfg.separate_his_embed,
        separate_cap_embed=model_cfg.separate_cap_embed,
        ft_sizes=list(model_cfg.ft_sizes) or None,
        diff_encoder=model_cfg.diff_encoder,
        diff_embed=model_cfg.diff_embed, diff_gen=model_cfg.diff_gen,
        auto_encoder_ft=model_cfg.auto_encoder_ft)


def export_to_reference(prefix: str, out_model: str, out_conf: str,
                        epoch="best",
                        reference_path: str = "/root/reference"):
    """mtn_tpu checkpoint -> reference-format artifacts.

    Writes ``out_model`` (whole-module ``torch.save`` pickle, the
    reference train.py:217 format) and ``out_conf`` (pickled
    ``(vocab, args)``, train.py:166-168) so the reference's own
    ``generate.py`` can load them. Returns the transplanted torch model.
    """
    import argparse

    import jax
    import torch

    from mtn_tpu.config import TrainConfig, config_from_dict
    from mtn_tpu.serve import Request, encode_requests
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(prefix)
    vocab, conf = ckpt.load_conf()
    model_cfg = config_from_dict("model", conf["model"])
    data_cfg = config_from_dict("data", conf.get("data", {}))

    # abstract state to restore the trained params into
    trainer = Trainer(model_cfg, TrainConfig())
    sample = device_batch(encode_requests(
        [Request("")], model_cfg, data_cfg, vocab))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    params, used_epoch = ckpt.restore_params(state, epoch)

    ref_model = build_reference_model(model_cfg, reference_path)
    ref_model.eval()
    load_params_into_reference(ref_model, params)
    torch.save(ref_model, out_model)

    # (vocab, args) sidecar with the argparse-namespace shape the
    # reference pickles (generate.py reads attributes off it)
    args = argparse.Namespace(
        fea_type=list(data_cfg.fea_type),
        include_caption=data_cfg.include_caption,
        separate_caption=int(data_cfg.separate_caption),
        max_history_length=data_cfg.max_history_length,
        merge_source=int(data_cfg.merge_source),
        batch_size=data_cfg.batch_size, max_length=data_cfg.max_length,
        cut_a=int(data_cfg.cut_a),
        nb_blocks=model_cfg.nb_blocks, d_model=model_cfg.d_model,
        d_ff=model_cfg.d_ff, att_h=model_cfg.att_h,
        dropout=model_cfg.dropout,
        separate_his_embed=int(model_cfg.separate_his_embed),
        separate_cap_embed=int(model_cfg.separate_cap_embed),
        diff_encoder=int(model_cfg.diff_encoder),
        diff_embed=int(model_cfg.diff_embed),
        diff_gen=int(model_cfg.diff_gen),
        auto_encoder_ft=model_cfg.auto_encoder_ft)
    with open(out_conf, "wb") as f:
        pickle.dump((vocab, args), f)
    return ref_model, used_epoch


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser(
        description="Migrate checkpoints between the reference torch "
                    "format and mtn_tpu (both directions)")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_imp = sub.add_parser("import", help="reference -> mtn_tpu")
    p_imp.add_argument("model_path")
    p_imp.add_argument("conf_path")
    p_imp.add_argument("out_prefix")
    p_imp.add_argument("--epoch", type=int, default=1)
    p_exp = sub.add_parser("export", help="mtn_tpu -> reference")
    p_exp.add_argument("prefix",
                       help="checkpoint prefix, optionally suffixed like "
                            "the generate CLI's --model: 'exps/x/mtn_best', "
                            "'exps/x/mtn_latest', 'exps/x/mtn_7'")
    p_exp.add_argument("out_model")
    p_exp.add_argument("out_conf")
    p_exp.add_argument("--reference-path", default="/root/reference")
    args = parser.parse_args(argv)
    if args.cmd == "import":
        migrate_checkpoint(args.model_path, args.conf_path, args.out_prefix,
                           epoch=args.epoch)
    else:
        from mtn_tpu.cli.generate import _split_model_arg
        prefix, epoch = _split_model_arg(args.prefix)
        export_to_reference(prefix, args.out_model, args.out_conf,
                            epoch=epoch,
                            reference_path=args.reference_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
