"""Jitted training/eval steps for MTN (single-device and mesh-aware).

The whole reference per-batch train iteration (forward mtn.py:28-30, loss
+ backward + Noam/Adam step, data_utils.py:132-156) is one compiled XLA
program. With a mesh (mtn_tpu.parallel), the batch is sharded over the
``data`` axis and selected parameters over ``model``; GSPMD inserts the
gradient reductions over ICI — there is no hand-written collective here.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mtn_tpu.config import ModelConfig, TrainConfig
from mtn_tpu.models.mtn import MTN
from mtn_tpu.train.batch import DeviceBatch, batch_masks, device_batch
from mtn_tpu.train.loss import mtn_loss
from mtn_tpu.train.schedule import make_optimizer
from mtn_tpu.data.vocab import SPECIALS, BLANK


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


class EarlyStopper:
    """Patience-based early stopping on validation loss (strict
    improvement, matching the best-pointer rule in utils/checkpoint.py:
    ties do NOT reset patience). The reference always runs its full
    ``num_epochs`` (train.py:192); ``patience <= 0`` reproduces that."""

    def __init__(self, patience: int):
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0

    def update(self, val_loss: float) -> bool:
        """Record one epoch's validation loss; True => stop now."""
        if val_loss < self.best:
            self.best = val_loss
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.patience > 0 and self.bad_epochs >= self.patience

    def seed_from_meta(self, meta: dict, start_epoch: int) -> None:
        """Continue best/patience accounting across a --resume restart.

        The checkpoint's meta.json best pointer is the source of truth;
        without this, a resumed run restarts the patience window at zero
        and its in-memory best disagrees with the persisted best, so
        --patience N could allow more than N non-improving epochs total.
        """
        if meta.get("best_loss") is None:
            return
        self.best = float(meta["best_loss"])
        best_epoch = int(meta.get("best_epoch") or 0)
        done = [e for e in meta.get("epochs", []) if e <= start_epoch]
        self.bad_epochs = sum(1 for e in done if e > best_epoch)


class Trainer:
    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 pad: int = SPECIALS[BLANK], mesh=None, shardings=None,
                 feature_dtype: str = "float32"):
        self.model = MTN(model_cfg)
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.pad = pad
        self.mesh = mesh
        self.shardings = shardings
        self.feature_dtype = feature_dtype
        self.optimizer = make_optimizer(model_cfg.d_model,
                                        train_cfg.warmup_steps,
                                        grad_clip=train_cfg.grad_clip)
        self._train_step = None
        self._eval_step = None
        self._accum_step = None

    # -- initialization -----------------------------------------------------
    def init_state(self, rng: jax.Array, sample: DeviceBatch) -> TrainState:
        masks, tgt_mask = batch_masks(sample, self.pad)
        params = self.model.init(
            {"params": rng}, sample.query, sample.his, sample.cap,
            sample.fts, masks, sample.answer_in, tgt_mask,
            method=MTN.init_all)["params"]
        opt_state = self.optimizer.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32))
        if self.shardings is not None:
            state = self.shardings.shard_state(state)
        return state

    # -- loss ---------------------------------------------------------------
    def _loss_fn(self, params, batch: DeviceBatch, rng, deterministic: bool,
                 norm=None):
        masks, tgt_mask = batch_masks(batch, self.pad)
        rngs = {} if deterministic else {"dropout": rng}
        (x, ae_outs), _ = self.model.apply(
            {"params": params}, batch.query, batch.his, batch.cap,
            batch.fts, masks, batch.answer_in, tgt_mask,
            deterministic=deterministic, rngs=rngs,
            mutable=[])
        resp_logp = self.model.apply({"params": params}, x,
                                     method=MTN.generate_logprobs)
        ae_logps = self.model.apply({"params": params}, ae_outs,
                                    method=MTN.ae_logprobs) if ae_outs else []
        cfg = self.model_cfg
        ae_targets = (batch.cap if cfg.auto_encoder_ft in ("caption", "summary")
                      else batch.query)
        loss, metrics = mtn_loss(resp_logp, batch.answer_out, ae_logps,
                                 ae_targets, self.pad,
                                 self.train_cfg.label_smoothing,
                                 self.train_cfg.loss_l, norm=norm)
        return loss, metrics

    # -- steps --------------------------------------------------------------
    def _build_train_step(self):
        def step_fn(state: TrainState, batch: DeviceBatch, base_rng):
            if self.shardings is not None:
                batch = self.shardings.constrain_batch(batch)
            rng = jax.random.fold_in(base_rng, state.step)
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (loss, metrics), grads = grad_fn(state.params, batch, rng, False)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                                  state.params, updates)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1)
            return new_state, metrics

        donate = (0,)
        if self.mesh is not None:
            with self.mesh:
                return jax.jit(step_fn, donate_argnums=donate)
        return jax.jit(step_fn, donate_argnums=donate)

    def _build_accum_step(self):
        """Gradient accumulation: one optimizer update from A microbatches.

        The input is a DeviceBatch whose leaves carry a leading (A,)
        microbatch axis (train.batch.stack_batches). A `lax.scan` runs
        the forward/backward per microbatch, summing grads — peak
        activation memory is that of ONE microbatch. Losses/grads use
        the *macro-batch* token counts as normalizers (mtn_loss `norm`),
        so the update equals the one-big-batch update exactly (up to fp
        reassociation); ragged tails are filled with `blank_like`
        microbatches, which contribute zero tokens and zero grads
        (padded-rows loss invariance, tests/test_model.py).
        """
        import operator

        def step_fn(state: TrainState, stacked: DeviceBatch, base_rng):
            rng = jax.random.fold_in(base_rng, state.step)
            cfg = self.model_cfg
            ae_t = (stacked.cap
                    if cfg.auto_encoder_ft in ("caption", "summary")
                    else stacked.query)
            ntok = jnp.maximum(
                jnp.sum(stacked.answer_out != self.pad).astype(jnp.float32),
                1.0)
            ae_ntok = jnp.maximum(
                jnp.sum(ae_t != self.pad).astype(jnp.float32), 1.0)
            norm = (ntok, ae_ntok)
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)

            def body(carry, micro):
                gacc, lacc, i = carry
                if self.shardings is not None:
                    micro = self.shardings.constrain_batch(micro)
                (loss, _), grads = grad_fn(state.params, micro,
                                           jax.random.fold_in(rng, i),
                                           False, norm)
                gacc = jax.tree.map(operator.add, gacc, grads)
                return (gacc, lacc + loss, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, _), _ = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32),
                       jnp.zeros((), jnp.int32)), stacked)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                                  state.params, updates)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1)
            metrics = {"ntokens": ntok, "loss": loss,
                       "loss_x_ntok": loss * ntok}
            return new_state, metrics

        donate = (0,)
        if self.mesh is not None:
            with self.mesh:
                return jax.jit(step_fn, donate_argnums=donate)
        return jax.jit(step_fn, donate_argnums=donate)

    def _build_eval_step(self):
        def step_fn(params, batch: DeviceBatch):
            if self.shardings is not None:
                batch = self.shardings.constrain_batch(batch)
            _, metrics = self._loss_fn(params, batch, None, True)
            return metrics
        if self.mesh is not None:
            with self.mesh:
                return jax.jit(step_fn)
        return jax.jit(step_fn)

    def train_step(self, state: TrainState, batch: DeviceBatch,
                   base_rng) -> Tuple[TrainState, dict]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step(state, batch, base_rng)

    def train_step_accum(self, state: TrainState, stacked: DeviceBatch,
                         base_rng) -> Tuple[TrainState, dict]:
        """One update from microbatches stacked on a leading (A,) axis."""
        if self._accum_step is None:
            self._accum_step = self._build_accum_step()
        return self._accum_step(state, stacked, base_rng)

    def eval_step(self, params, batch: DeviceBatch) -> dict:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step(params, batch)

    # -- epoch loops (reference run_epoch, train.py:22-52) ------------------
    def run_epoch(self, state: TrainState, batches, base_rng=None,
                  train: bool = True,
                  report_fn: Optional[Callable[[int, float, float], None]] = None,
                  step_callback: Optional[Callable[[TrainState, int], None]] = None,
                  step_callback_every: int = 0
                  ) -> Tuple[TrainState, float]:
        """Returns (state, epoch average loss per token).

        Metric fetches are windowed (a few steps behind the dispatch
        frontier) so the host never blocks the device on a per-step
        scalar read — important on high-latency transports.
        """
        import collections
        import time
        total_loss = 0.0
        total_tokens = 0.0
        tokens = 0.0
        start = time.time()
        interval = self.train_cfg.report_interval
        pending = collections.deque()  # (step_idx, metrics) not yet fetched
        last = [0.0, 1.0]              # last fetched (loss_x, ntok)

        def fetch_one():
            nonlocal total_loss, total_tokens, tokens
            _, m = pending.popleft()
            last[0] = float(m["loss_x_ntok"])
            last[1] = float(m["ntokens"])
            total_loss += last[0]
            total_tokens += last[1]
            tokens += last[1]

        for j, hb in enumerate(batches):
            batch = hb if isinstance(hb, DeviceBatch) \
                else device_batch(hb, self.feature_dtype)
            if train:
                if batch.query.ndim == 3:  # stacked (A, B, Lq): accumulate
                    state, metrics = self.train_step_accum(state, batch,
                                                           base_rng)
                else:
                    state, metrics = self.train_step(state, batch, base_rng)
            else:
                metrics = self.eval_step(state.params, batch)
            pending.append((j, metrics))
            while len(pending) > 4:
                fetch_one()
            if train and report_fn and (j + 1) % interval == 0:
                while pending:
                    fetch_one()
                elapsed = max(time.time() - start, 1e-9)
                report_fn(j + 1, last[0] / max(last[1], 1.0),
                          tokens / elapsed)
                start = time.time()
                tokens = 0.0
            if train and step_callback and step_callback_every > 0 and \
                    (j + 1) % step_callback_every == 0:
                step_callback(state, j + 1)
        while pending:
            fetch_one()
        return state, total_loss / max(total_tokens, 1.0)
