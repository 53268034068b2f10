"""Orbax checkpointing with full resume support.

The reference pickles the whole torch module per epoch and never saves
optimizer state — mid-training resume is impossible (train.py:215-217,
SURVEY.md §5). Here every checkpoint stores ``(params, opt_state, step)``
plus a JSON sidecar (vocab + configs replacing the pickled ``.conf``,
train.py:166-168), with a ``best`` pointer selected by validation loss
(train.py:218-225 semantics).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from mtn_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, model_prefix: str):
        self.prefix = model_prefix
        self.dir = os.path.abspath(model_prefix + "_ckpt")
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.dir, "meta.json")

    # -- sidecar (vocab + configs) -----------------------------------------
    def save_conf(self, vocab: dict, **config_sections):
        from mtn_tpu.config import dump_config
        dump_config(self.prefix + ".conf.json", **config_sections)
        with open(self.prefix + ".vocab.json", "w") as f:
            json.dump(vocab, f)

    def load_conf(self) -> Tuple[dict, dict]:
        with open(self.prefix + ".conf.json") as f:
            conf = json.load(f)
        with open(self.prefix + ".vocab.json") as f:
            vocab = json.load(f)
        return vocab, conf

    # -- checkpoints --------------------------------------------------------
    def _epoch_dir(self, epoch) -> str:
        return os.path.join(self.dir, f"epoch_{epoch}")

    def save(self, epoch, state: TrainState, val_loss: Optional[float] = None,
             keep: int = 0):
        path = self._epoch_dir(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = self._meta()
        meta["epochs"] = sorted(set(meta.get("epochs", []) + [epoch]))
        if val_loss is not None:
            if meta.get("best_loss") is None or val_loss < meta["best_loss"]:
                meta["best_loss"] = val_loss
                meta["best_epoch"] = epoch
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)
        if keep > 0:
            pruned = []
            for old in meta["epochs"][:-keep]:
                if old != meta.get("best_epoch"):
                    shutil.rmtree(self._epoch_dir(old), ignore_errors=True)
                    pruned.append(old)
            if pruned:
                meta["epochs"] = [e for e in meta["epochs"]
                                  if e not in pruned]
                with open(self._meta_path, "w") as f:
                    json.dump(meta, f)

    def _meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}

    def save_step(self, state: TrainState, epoch: int):
        """Step-indexed mid-epoch checkpoint (single rotating slot).

        The reference can only restart whole trainings (SURVEY §5). Resume
        semantics: params/opt_state/step are exact; the interrupted epoch's
        batch iteration restarts from its beginning (a documented trade-off
        to avoid persisting the host-side shuffle iterator).
        """
        path = os.path.join(self.dir, "step_latest")
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state)
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        meta = self._meta()
        meta["step"] = int(state.step)
        meta["step_epoch"] = epoch
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    def restore_step(self, abstract_state: TrainState):
        """Returns (state, epoch_of_interruption) or raises."""
        path = os.path.join(self.dir, "step_latest")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no step checkpoint under {self.dir}")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        state = self._ckptr.restore(path, target)
        return state, self._meta().get("step_epoch", 0)

    def best_epoch(self):
        return self._meta().get("best_epoch")

    def latest_epoch(self):
        eps = self._meta().get("epochs", [])
        return eps[-1] if eps else None

    def restore(self, abstract_state: TrainState,
                epoch="best") -> Tuple[TrainState, Any]:
        if epoch == "best":
            epoch = self.best_epoch()
        elif epoch == "latest":
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        state = self._ckptr.restore(self._epoch_dir(epoch), target)
        return state, epoch

    def restore_params(self, abstract_state: TrainState, epoch="best"):
        state, ep = self.restore(abstract_state, epoch)
        return state.params, ep
