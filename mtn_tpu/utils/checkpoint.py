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
    """Multi-host aware: orbax save/restore calls are collective (all
    processes participate), while direct filesystem mutations (rmtree,
    rename, meta.json) run on process 0 only, fenced by device barriers
    — correct for the shared-filesystem layout of a TPU pod
    (parallel/multihost.py)."""

    def __init__(self, model_prefix: str, async_save: bool = False):
        self.prefix = model_prefix
        self.dir = os.path.abspath(model_prefix + "_ckpt")
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.dir, "meta.json")
        # async_save: orbax's StandardCheckpointer is an AsyncCheckpointer
        # whose save() returns once the arrays are copied OFF the device
        # (so donated training buffers may be reused immediately); the
        # disk write runs in a background thread. In async mode the
        # wait + meta/best-pointer commit are deferred until the next
        # checkpoint operation (any save/restore/meta read) or an
        # explicit flush(), taking the write off the training critical
        # path. The artifact is identical to a blocking save; only
        # crash visibility differs (a crash before the commit leaves the
        # last epoch's files on disk but unreferenced by meta.json).
        self.async_save = async_save
        self._pending = None  # deferred commit closure

    def _finalize_pending(self):
        """Complete an in-flight async save: block until the write is
        durable, then run its deferred meta commit (collective: every
        process calls this at the same points, so barriers line up)."""
        if self._pending is None:
            return
        fn, self._pending = self._pending, None
        self._ckptr.wait_until_finished()
        fn()

    def flush(self):
        """Public finalize — call at end of training (and before process
        exit) so the last async save is durable and meta-visible."""
        self._finalize_pending()

    @staticmethod
    def _primary() -> bool:
        return jax.process_index() == 0

    @staticmethod
    def _barrier(tag: str):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(tag)

    # -- sidecar (vocab + configs) -----------------------------------------
    def save_conf(self, vocab: dict, **config_sections):
        if not self._primary():
            return
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
        self._finalize_pending()
        path = self._epoch_dir(epoch)
        if self._primary() and os.path.exists(path):
            shutil.rmtree(path)
        self._barrier(f"ckpt_epoch_rm_{epoch}")
        self._ckptr.save(path, state)
        if self.async_save:
            self._pending = lambda: self._commit_epoch(epoch, val_loss, keep)
            return
        self._ckptr.wait_until_finished()
        self._commit_epoch(epoch, val_loss, keep)

    def _commit_epoch(self, epoch, val_loss, keep):
        """Meta/best-pointer/prune mutations for a durable epoch save."""
        if not self._primary():
            self._barrier(f"ckpt_epoch_meta_{epoch}")
            return
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
        self._barrier(f"ckpt_epoch_meta_{epoch}")

    def _meta(self) -> dict:
        # reads see a consistent view: any in-flight async save commits
        # first (no-op re-entrantly — _finalize_pending clears _pending
        # before running the commit, which itself calls _meta)
        self._finalize_pending()
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}

    def save_step(self, state: TrainState, epoch: int, batch_idx: int = 0):
        """Step-indexed mid-epoch checkpoint (single rotating slot).

        The reference can only restart whole trainings (SURVEY §5). Resume
        is exact: params/opt_state/step come from the checkpoint, and
        ``batch_idx`` (number of batches already consumed in ``epoch``)
        lets the trainer skip exactly those batches. Because the epoch
        shuffle and per-batch cut_a draws are keyed by
        (seed, epoch[, batch]) rather than a sequential stream
        (cli/train.py, pipeline.BatchIterator seed_key), the resumed run
        reproduces an uninterrupted run bit-for-bit.
        """
        self._finalize_pending()
        path = os.path.join(self.dir, "step_latest")
        tmp = path + ".tmp"
        step = int(state.step)  # fetch now: state may be donated later
        if self._primary() and os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._barrier(f"ckpt_step_rm_{step}")
        self._ckptr.save(tmp, state)
        if self.async_save:
            self._pending = lambda: self._commit_step(step, epoch,
                                                      int(batch_idx))
            return
        self._ckptr.wait_until_finished()
        self._commit_step(step, epoch, int(batch_idx))

    def _commit_step(self, step: int, epoch: int, batch_idx: int):
        """tmp -> step_latest rename + meta, once the write is durable."""
        path = os.path.join(self.dir, "step_latest")
        if self._primary():
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(path + ".tmp", path)
            meta = self._meta()
            meta["step"] = step
            meta["step_epoch"] = epoch
            meta["step_batch"] = batch_idx
            with open(self._meta_path, "w") as f:
                json.dump(meta, f)
        self._barrier(f"ckpt_step_meta_{step}")

    def restore_step(self, abstract_state: TrainState):
        """Returns (state, epoch_of_interruption, batches_consumed)."""
        self._finalize_pending()
        path = os.path.join(self.dir, "step_latest")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no step checkpoint under {self.dir}")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        state = self._ckptr.restore(path, target)
        meta = self._meta()
        return state, meta.get("step_epoch", 0), meta.get("step_batch", 0)

    def best_epoch(self):
        return self._meta().get("best_epoch")

    def latest_epoch(self):
        eps = self._meta().get("epochs", [])
        return eps[-1] if eps else None

    def restore(self, abstract_state: TrainState,
                epoch="best") -> Tuple[TrainState, Any]:
        self._finalize_pending()
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
        """Params-only restore (decode/serving/export/averaging).

        Restores just the ``params`` subtree via an orbax partial
        restore, so it works regardless of the opt_state structure the
        checkpoint was trained with (e.g. ``--grad-clip`` chains the
        optimizer and changes that structure) — consumers of weights
        never need the training hyperparameters. Full-state ``restore``
        above (train resume) still requires the matching optimizer.
        """
        self._finalize_pending()
        if epoch == "best":
            epoch = self.best_epoch()
        elif epoch == "latest":
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        target = {"params": jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                         abstract_state.params)}
        restored = ocp.PyTreeCheckpointer().restore(
            self._epoch_dir(epoch),
            args=ocp.args.PyTreeRestore(
                item=target,
                # shardings come from the target (the caller's mesh),
                # not the sharding file the run was saved with
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    target),
                partial_restore=True))
        return restored["params"], epoch
