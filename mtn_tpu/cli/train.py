"""Training entry point — flag surface mirrors the reference
(train.py:57-95) plus TPU-native knobs; run.sh stage 2 calls this.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from mtn_tpu.cli.common import add_logging_args, add_tpu_args
    parser = argparse.ArgumentParser(description="Train MTN on TPU")
    parser.add_argument("--gpu", "-g", default=0, type=int,
                        help="accepted for run.sh parity; device selection "
                             "is handled by JAX")
    parser.add_argument("--fea-type", nargs="+", type=str,
                        help="feature stream names (or 'none')")
    parser.add_argument("--train-path", default="", type=str)
    parser.add_argument("--train-set", default="", type=str)
    parser.add_argument("--valid-path", default="", type=str)
    parser.add_argument("--valid-set", default="", type=str)
    parser.add_argument("--include-caption", default="none", type=str)
    parser.add_argument("--separate-caption", default=0, type=int)
    parser.add_argument("--cut-a", default=0, type=int)
    parser.add_argument("--merge-source", default=0, type=int)
    parser.add_argument("--exclude-video", action="store_true")
    parser.add_argument("--fixed-word-emb", default=0, type=int,
                        help="accepted for parity; unused (as in reference)")
    parser.add_argument("--model", default=None, type=str,
                        help="output prefix for checkpoints/logs")
    parser.add_argument("--nb-blocks", default=6, type=int)
    parser.add_argument("--d-model", default=512, type=int)
    parser.add_argument("--d-ff", default=2048, type=int)
    parser.add_argument("--att-h", default=8, type=int)
    parser.add_argument("--dropout", default=0.1, type=float)
    parser.add_argument("--attn-dropout", default=0.1, type=float,
                        help="attention-probability dropout; the "
                             "reference hard-codes 0.1 regardless of "
                             "--dropout (mtn.py:339)")
    parser.add_argument("--separate-his-embed", default=0, type=int)
    parser.add_argument("--separate-cap-embed", default=0, type=int)
    parser.add_argument("--diff-encoder", default=0, type=int)
    parser.add_argument("--diff-embed", default=0, type=int)
    parser.add_argument("--diff-gen", default=0, type=int)
    parser.add_argument("--auto-encoder-ft", default=None, type=str)
    parser.add_argument("--num-epochs", "-e", default=15, type=int)
    parser.add_argument("--rand-seed", "-s", default=1, type=int)
    parser.add_argument("--batch-size", "-b", default=32, type=int)
    parser.add_argument("--max-length", default=20, type=int)
    parser.add_argument("--max-history-length", default=-1, type=int)
    parser.add_argument("--report-interval", default=100, type=int)
    parser.add_argument("--warmup-steps", default=4000, type=int)
    parser.add_argument("--loss-l", default=1.0, type=float)
    parser.add_argument("--vocab-cutoff", default=5, type=int,
                        help="keep words with freq > cutoff "
                             "(reference effective value: 5)")
    parser.add_argument("--resume", default=None, type=str,
                        help="resume from checkpoint: 'latest'|'best'|epoch|"
                             "'auto' (latest if one exists, else fresh)")
    parser.add_argument("--keep-checkpoints", default=0, type=int)
    parser.add_argument("--checkpoint-every-steps", default=0, type=int,
                        help="also save a rotating step-indexed checkpoint "
                             "every N train steps (resume with "
                             "--resume step)")
    parser.add_argument("--feature-cache", default="", type=str,
                        help="directory for the write-once padded-"
                             "feature-block disk cache: epoch 1 stores "
                             "each batch's feature block in the transfer "
                             "dtype (int8 quantizes ONCE), later epochs "
                             "mmap it instead of re-reading every .npy "
                             "(mtn_tpu/data/feature_cache.py)")
    parser.add_argument("--async-save", default=0, type=int,
                        help="non-blocking checkpoint writes: save() "
                             "returns once arrays are copied off-device; "
                             "the disk write + best-pointer commit overlap "
                             "the next epoch's training (identical "
                             "artifacts; meta.json lags until the next "
                             "checkpoint op or end of training)")
    parser.add_argument("--remat", default=0, type=int,
                        help="rematerialize decoder layers in backward "
                             "(jax.checkpoint): ~1 extra forward of FLOPs "
                             "for O(1-layer) activation memory")
    parser.add_argument("--batched-ae", default=0, type=int,
                        help="run the per-stream QAE chains as stacked "
                             "batched GEMMs (one kernel per sublayer "
                             "instead of n_streams; measured 1.05x train "
                             "step — docs/BENCH.md 'Batched QAE'). "
                             "Checkpoints are interchangeable with the "
                             "sequential path; dropout draw order differs")
    parser.add_argument("--accum-steps", default=1, type=int,
                        help="gradient accumulation: one optimizer update "
                             "per N batches (exact one-big-batch math, one "
                             "microbatch of activation memory; requires "
                             "--uniform-shapes 1)")
    parser.add_argument("--grad-clip", default=0.0, type=float,
                        help="> 0: clip gradients to this global L2 norm "
                             "before Adam (changes the opt_state structure; "
                             "resume only from checkpoints saved with the "
                             "same setting)")
    parser.add_argument("--patience", default=0, type=int,
                        help="> 0: stop after this many epochs without a "
                             "new best validation loss")
    parser.add_argument("--uniform-shapes", default=0, type=int,
                        help="pad every batch to the dataset's global "
                             "maxima: ONE compiled train step (more padding "
                             "compute, zero recompiles — useful when "
                             "compiles are expensive)")
    parser.add_argument("--multihost", default="", type=str,
                        help="join a multi-host run: 'auto' (TPU pod) or "
                             "'host:port,nprocs,procid' — dp shards span "
                             "hosts over DCN; each host transfers only its "
                             "rows of every batch (parallel/multihost.py)")
    add_tpu_args(parser)
    add_logging_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from mtn_tpu.cli.common import (make_mesh_from_args, print_args,
                                    setup_logging)
    setup_logging(args.verbose)
    print_args(args)
    if args.multihost:
        from mtn_tpu.parallel.multihost import initialize_from_flag
        initialize_from_flag(args.multihost)
    import jax
    from mtn_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mtn_tpu.data import get_vocabulary, load, make_batch_indices
    from mtn_tpu.data.pipeline import BatchIterator, shuffled
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager
    from mtn_tpu.utils.logging import TraceLogger, dump_params_txt
    from mtn_tpu.utils import profiling

    if args.dtype == "float32":
        # full-precision matmuls for reference-parity numerics; bfloat16
        # compute uses the MXU natively
        jax.config.update("jax_default_matmul_precision", "highest")
    if args.nan_checks:
        profiling.enable_nan_checks(True)

    logging.info("Extracting words from %s", args.train_set)
    vocab = get_vocabulary(args.train_set, cutoff=args.vocab_cutoff,
                           include_caption=args.include_caption)
    logging.info("#vocab = %d", len(vocab))
    fea_type = None if (args.exclude_video or not args.fea_type) \
        else args.fea_type
    common = dict(include_caption=args.include_caption,
                  separate_caption=bool(args.separate_caption),
                  max_history_length=args.max_history_length,
                  merge_source=bool(args.merge_source))
    logging.info("Loading training data from %s", args.train_set)
    train_data = load(fea_type, args.train_path, args.train_set, vocab,
                      **common)
    logging.info("Loading validation data from %s", args.valid_set)
    valid_data = load(fea_type, args.valid_path, args.valid_set, vocab,
                      **common)
    feature_dims = train_data.feature_dims()
    logging.info("Detected feature dims: %s", feature_dims)
    train_plans, n_train = make_batch_indices(
        train_data, args.batch_size, max_length=args.max_length,
        separate_caption=bool(args.separate_caption))
    valid_plans, n_valid = make_batch_indices(
        valid_data, args.batch_size, max_length=args.max_length,
        separate_caption=bool(args.separate_caption))
    logging.info("#train sample = %d  #train batch = %d", n_train,
                 len(train_plans))
    logging.info("#validation sample = %d  #validation batch = %d", n_valid,
                 len(valid_plans))
    if args.uniform_shapes:
        import dataclasses as _dc
        all_plans = train_plans + valid_plans
        h = max(p.h_len for p in all_plans)
        q = max(p.q_len for p in all_plans)
        a = max(p.a_len for p in all_plans)
        c = max(p.c_len for p in all_plans)
        x = [max(p.x_len[i] for p in all_plans)
             for i in range(len(all_plans[0].x_len))]
        fix = lambda ps: [_dc.replace(p, h_len=h, q_len=q, a_len=a, c_len=c,
                                      x_len=list(x)) for p in ps]
        train_plans, valid_plans = fix(train_plans), fix(valid_plans)
        logging.info("uniform shapes: h=%d q=%d a=%d c=%d x=%s", h, q, a, c, x)

    model_cfg = ModelConfig(
        vocab_size=len(vocab), nb_blocks=args.nb_blocks,
        d_model=args.d_model, d_ff=args.d_ff, att_h=args.att_h,
        dropout=args.dropout, ft_sizes=feature_dims,
        separate_his_embed=bool(args.separate_his_embed),
        separate_cap_embed=bool(args.separate_cap_embed),
        diff_encoder=bool(args.diff_encoder),
        diff_embed=bool(args.diff_embed), diff_gen=bool(args.diff_gen),
        auto_encoder_ft=args.auto_encoder_ft, dtype=args.dtype,
        use_pallas_attention=bool(args.use_pallas_attention),
        use_pallas_ffn=bool(args.use_pallas_ffn),
        remat=bool(args.remat), attn_dropout=args.attn_dropout,
        batched_ae=bool(args.batched_ae))
    data_cfg = DataConfig(
        fea_type=(list(fea_type) if fea_type else []),
        train_path=args.train_path,
        train_set=args.train_set, valid_path=args.valid_path,
        valid_set=args.valid_set, include_caption=args.include_caption,
        separate_caption=bool(args.separate_caption),
        max_history_length=args.max_history_length,
        merge_source=bool(args.merge_source), batch_size=args.batch_size,
        max_length=args.max_length, cut_a=bool(args.cut_a),
        vocab_cutoff=args.vocab_cutoff, length_bucket=args.length_bucket,
        feature_bucket=args.feature_bucket, prefetch=args.prefetch,
        feature_dtype=args.feature_transfer or args.dtype)
    feature_cache = None
    if args.feature_cache:
        from mtn_tpu.data.feature_cache import FeatureCache
        feature_cache = FeatureCache(args.feature_cache,
                                     transfer=data_cfg.feature_dtype)
        logging.info("feature cache: %s (transfer %s)", args.feature_cache,
                     data_cfg.feature_dtype)
    if args.accum_steps > 1 and not args.uniform_shapes:
        raise SystemExit("--accum-steps > 1 requires --uniform-shapes 1 "
                         "(accumulation groups stack equal-shape batches)")
    if args.accum_steps > 1 and jax.process_count() > 1:
        raise SystemExit("--accum-steps is not supported with --multihost "
                         "yet: microbatch stacking runs eager ops on "
                         "global arrays that span non-addressable devices")
    # run_epoch counts macro steps under accumulation: divide the batch-
    # unit cadences by accum so reports/step-checkpoints keep firing at
    # (approximately) the same batch intervals
    report_every = max(1, args.report_interval // args.accum_steps)
    ckpt_every = (max(1, args.checkpoint_every_steps // args.accum_steps)
                  if args.checkpoint_every_steps > 0 else 0)
    train_cfg = TrainConfig(
        num_epochs=args.num_epochs, batch_size=args.batch_size,
        warmup_steps=args.warmup_steps, loss_l=args.loss_l,
        rand_seed=args.rand_seed, report_interval=report_every,
        model=args.model, keep_checkpoints=args.keep_checkpoints,
        accum_steps=args.accum_steps, grad_clip=args.grad_clip,
        patience=args.patience)

    mesh, shardings = make_mesh_from_args(args, batch_size=args.batch_size)
    trainer = Trainer(model_cfg, train_cfg, mesh=mesh, shardings=shardings,
                      feature_dtype=data_cfg.feature_dtype)

    primary = jax.process_index() == 0
    os.makedirs(os.path.dirname(args.model) or ".", exist_ok=True)
    ckpt = CheckpointManager(args.model, async_save=bool(args.async_save))
    ckpt.save_conf(vocab, model=model_cfg, data=data_cfg, train=train_cfg)
    if primary:
        dump_params_txt(args.model + "_params.txt", vars(args))
    logs = TraceLogger(args.model, resume=bool(args.resume), primary=primary)
    logging.info("Saving training results to %s", logs.train_csv.path)

    rng = jax.random.PRNGKey(args.rand_seed)
    init_it = BatchIterator(train_data, train_plans[:1], data_cfg,
                            train=False, prefetch=0)
    from mtn_tpu.train.batch import to_device_fn
    to_device = to_device_fn(data_cfg.feature_dtype, shardings)
    sample = to_device(next(iter(init_it)))
    state = trainer.init_state(rng, sample)
    start_epoch = 0
    resume = args.resume
    if resume == "auto":
        resume = "latest" if ckpt.latest_epoch() is not None else None
    resume_batch = 0
    if resume == "step":
        state, ep, resume_batch = ckpt.restore_step(state)
        start_epoch = int(ep)
        logging.info(
            "Resumed step checkpoint (step %d): continuing epoch %d at "
            "batch %d — exact resume (shuffle and cut_a draws are keyed "
            "by (seed, epoch, batch), so the trajectory matches an "
            "uninterrupted run)",
            int(state.step), start_epoch + 1, resume_batch)
    elif resume:
        state, ep = ckpt.restore(state, resume)
        start_epoch = int(ep)
        logging.info("Resumed from epoch %d (step %d)", start_epoch,
                     int(state.step))

    logging.info("----------------")
    logging.info("Start training")
    logging.info("----------------")
    min_valid_loss = float("inf")
    bestmodel_num = 0
    from mtn_tpu.train.trainer import EarlyStopper
    stopper = EarlyStopper(args.patience)
    if resume:
        # continue best/patience accounting across the restart (the
        # persisted best pointer in meta.json is the source of truth)
        stopper.seed_from_meta(ckpt._meta(), start_epoch)
        if stopper.best < min_valid_loss:
            min_valid_loss = stopper.best
            bestmodel_num = int(ckpt._meta().get("best_epoch") or 0)
    base_rng = jax.random.PRNGKey(args.rand_seed + 1)
    with profiling.trace(args.profile_dir):
        for epoch in range(start_epoch, args.num_epochs):
            # epoch shuffle and per-batch cut_a draws are keyed by
            # (seed, epoch[, batch]) — pure functions, not a sequential
            # stream — so a `--resume step` run can skip the consumed
            # prefix and still reproduce an uninterrupted trajectory
            plans_ep = shuffled(train_plans,
                                np.random.default_rng(
                                    [args.rand_seed, epoch]))
            start_b = resume_batch if epoch == start_epoch else 0
            it = BatchIterator(train_data, plans_ep[start_b:],
                               data_cfg, train=True,
                               seed_key=(args.rand_seed, epoch),
                               start=start_b, transform=to_device,
                               feature_cache=feature_cache)
            accum = args.accum_steps
            if accum > 1:
                from mtn_tpu.train.batch import accumulated
                it = accumulated(it, accum, to_device, pad=trainer.pad)
            # with accumulation, run_epoch counts macro steps; logged
            # step/batch indices stay in batch (micro) units, and the
            # report/checkpoint cadences are divided by accum so they
            # keep firing at (approximately) the same batch intervals
            state, train_loss = trainer.run_epoch(
                state, it, base_rng, train=True,
                report_fn=lambda step, loss, tps, s0=start_b, a=accum: (
                    print("Epoch: %d Step: %d Loss: %f Tokens per Sec: %f"
                          % (epoch + 1, s0 + step * a, loss, tps)),
                    logs.train_step(epoch + 1, s0 + step * a, loss, tps)),
                step_callback=(lambda st, j, e=epoch, s0=start_b, a=accum:
                               ckpt.save_step(st, e, s0 + j * a)),
                step_callback_every=ckpt_every)
            logging.info("epoch: %d  train loss: %f", epoch + 1, train_loss)
            logging.info("-------validation--------")
            vit = BatchIterator(valid_data, valid_plans, data_cfg,
                                train=False, transform=to_device,
                                feature_cache=feature_cache)
            _, valid_loss = trainer.run_epoch(state, vit, train=False)
            logging.info("epoch: %d validation loss: %f", epoch + 1,
                         valid_loss)
            logs.epoch(epoch + 1, "train", train_loss)
            logs.epoch(epoch + 1, "val", valid_loss)
            ckpt.save(epoch + 1, state, val_loss=valid_loss,
                      keep=args.keep_checkpoints)
            if valid_loss < min_valid_loss:
                logging.info("validation loss reduced %.4f -> %.4f",
                             min_valid_loss, valid_loss)
                min_valid_loss = valid_loss
                bestmodel_num = epoch + 1
            if stopper.update(valid_loss):
                logging.info(
                    "early stopping: no validation improvement in %d "
                    "epochs (best %.4f at epoch %d)", args.patience,
                    min_valid_loss, bestmodel_num)
                logging.info("----------------")
                break
            logging.info("----------------")
    ckpt.flush()  # async mode: last save durable + meta-visible on exit
    logging.info("the best model is epoch %d.", bestmodel_num)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
