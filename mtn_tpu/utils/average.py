"""Checkpoint averaging: combine several epoch checkpoints into one.

Averaging the last k checkpoints is the standard transformer eval trick
(Vaswani et al. 2017 averaged the last 5/20); the reference has no such
tool (its per-epoch pickles are only ever consumed one at a time,
generate.py:58). Here the averaged parameters are written as a fully
servable checkpoint family — ``<out>.conf.json`` / ``<out>.vocab.json``
sidecars plus ``<out>_ckpt/epoch_1`` with a best pointer — so every
downstream surface (generate CLI, serving, export) takes it unchanged::

    python -m mtn_tpu.utils.average --model exps/x/mtn \
        --epochs last3 --out exps/x/mtn-avg
    python generate.py --model exps/x/mtn-avg_best ...

Only parameters are averaged (in float32, cast back to the stored
dtypes). The written checkpoint ships a FRESH optimizer state and
step 0 (built from the sidecar config, not restored): an averaged
checkpoint is an eval/serving artifact. Resuming *training* from it
restarts the Noam schedule from step 0 — do not use it as a training
resume point.
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Sequence


def _resolve_epochs(spec: Sequence[str], available: List[int]) -> List[int]:
    """['2','3'] -> [2, 3]; ['last3'] -> newest 3; ['all'] -> all."""
    if not available:
        raise FileNotFoundError("no epoch checkpoints to average")
    if len(spec) == 1 and spec[0] == "all":
        return list(available)
    if len(spec) == 1 and spec[0].startswith("last"):
        k = int(spec[0][4:] or 1)
        if k <= 0:
            raise ValueError(f"bad epoch spec {spec[0]!r}")
        return list(available[-k:])
    epochs = [int(s) for s in spec]
    missing = [e for e in epochs if e not in available]
    if missing:
        raise FileNotFoundError(
            f"epochs {missing} not found (available: {available})")
    return epochs


def average_checkpoints(model_prefix: str, epochs_spec: Sequence[str],
                        out_prefix: str) -> List[int]:
    """Average ``epochs_spec`` of ``model_prefix`` into ``out_prefix``.

    Returns the list of epochs that were averaged."""
    import jax
    import jax.numpy as jnp

    from mtn_tpu.config import TrainConfig, config_from_dict
    from mtn_tpu.serve import Request, encode_requests
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(model_prefix)
    vocab, conf = ckpt.load_conf()
    model_cfg = config_from_dict("model", conf["model"])
    data_cfg = config_from_dict("data", conf["data"])
    epochs = _resolve_epochs(epochs_spec,
                             ckpt._meta().get("epochs", []))

    # abstract target state built from the sidecar config alone (no
    # dataset needed): the same recipe serving uses
    trainer = Trainer(model_cfg, TrainConfig())
    sample = device_batch(encode_requests(
        [Request("")], model_cfg, data_cfg, vocab))
    abstract = trainer.init_state(jax.random.PRNGKey(0), sample)

    acc = None
    for e in sorted(epochs):
        # params-only restore: works whatever optimizer structure the
        # source run used (e.g. --grad-clip); the averaged artifact is
        # a servable checkpoint, so it ships a fresh opt_state
        params, _ = ckpt.restore_params(abstract, e)
        p32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        acc = p32 if acc is None else jax.tree.map(jnp.add, acc, p32)
    mean = jax.tree.map(lambda s: s / len(epochs), acc)
    avg_params = jax.tree.map(lambda m, ref: jnp.asarray(m, ref.dtype),
                              mean, abstract.params)
    out_state = abstract.replace(params=avg_params)

    out = CheckpointManager(out_prefix)
    out.save_conf(vocab, **{name: conf[name] for name in conf})
    # one servable epoch; val_loss=0.0 makes it the best pointer so
    # `<out>_best` resolves (the conventional downstream model arg)
    out.save(1, out_state, val_loss=0.0)
    logging.info("averaged epochs %s of %s -> %s (epoch_1/best)",
                 sorted(epochs), model_prefix, out_prefix)
    return sorted(epochs)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Average epoch checkpoints into one servable "
                    "checkpoint family")
    parser.add_argument("--model", required=True,
                        help="source checkpoint prefix (e.g. exps/x/mtn)")
    parser.add_argument("--epochs", nargs="+", default=["all"],
                        help="epoch numbers, or 'lastK', or 'all'")
    parser.add_argument("--out", required=True,
                        help="output prefix (e.g. exps/x/mtn-avg)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    average_checkpoints(args.model, args.epochs, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
