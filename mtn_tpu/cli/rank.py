"""Discriminative (VisDial-style) evaluation entry point.

The reference's visdial branch evaluates MTN discriminatively: at each
test turn it ranks a set of answer options by generative log-likelihood
and reports retrieval metrics (reference readme.md:81-86 — the model
"selects the best answer candidate based on the log likelihood among
the answer options"). The branch itself (and the VisDial dataset
schema) is not part of the reference checkout, so this CLI defines the
candidates protocol over the DSTC7 dialog shape:

candidates JSON (``--candidates``) mirrors the test-set schema::

    {"dialogs": [{"image_id": "...", "dialog": [
        {"answer_options": ["a cat", ...], "gt_index": 3}, ...]}, ...]}

with one ``dialog`` entry per *scored* turn (the last turn only under
``--undisclosed-only 1``, matching the test-set shape; every turn
otherwise). ``gt_index`` is optional per turn; when every scored turn
has one, the VisDial retrieval metric block (R@1/5/10, mean rank, MRR —
``evalmetrics.retrieval``) is computed, printed as ``r@1: ...`` lines,
and embedded in the output JSON. ``scripts/make_rank_candidates.py``
builds a candidates file from a labeled test set (ground truth + pooled
distractor answers), so the full discriminative run on real DSTC7 data
is two commands.

Output JSON: the candidates dialogs with per-turn ``scores`` (one
log-likelihood per option, input order) and ``gt_rank`` (1-indexed,
tie law: ``evalmetrics.retrieval.rank_of``), plus ``metrics``.

Turns are grouped into length-sorted uniform-shape device batches
(like the generate CLI) and scored by ``BeamDecoder.rank_batch``; the
(N, L) candidate buckets are sized to the global maxima so the whole
run uses ONE compiled program.
"""

from __future__ import annotations

import argparse
import copy
import json
import logging
import time


def build_parser() -> argparse.ArgumentParser:
    from mtn_tpu.cli.common import add_logging_args, add_tpu_args
    parser = argparse.ArgumentParser(
        description="Rank answer candidates by generative log-likelihood")
    parser.add_argument("--test-path", default="", type=str)
    parser.add_argument("--test-set", default="", type=str)
    parser.add_argument("--model", "-m", default="", type=str,
                        help="model prefix, optionally with _<epoch|best> "
                             "suffix (generate CLI style)")
    parser.add_argument("--candidates", default="", type=str, required=True,
                        help="candidates JSON (see module docstring; build "
                             "one with scripts/make_rank_candidates.py)")
    parser.add_argument("--output", "-o", default="", type=str,
                        help="write scores/ranks/metrics JSON here")
    parser.add_argument("--undisclosed-only", default=0, type=int)
    parser.add_argument("--turn-batch", default=4, type=int,
                        help="dialogue turns scored per device batch (each "
                             "turn is tiled over its options on device, so "
                             "the effective row count is turn_batch x "
                             "n_options)")
    parser.add_argument("--include-eos", default=1, type=int,
                        help="score the answer+<eos> event the generative "
                             "loss trains (0: bare token sequence)")
    parser.add_argument("--multihost", default="", type=str,
                        help="join a multi-host run: 'auto' (TPU pod) or "
                             "'host:port,nprocs,procid' — turn batches "
                             "shard across hosts and process 0 writes "
                             "the output (parallel/multihost.py)")
    add_tpu_args(parser)
    add_logging_args(parser)
    return parser


def _align_candidates(dataset, cand_data, undisclosed: bool):
    """qa_id -> (turn ref dict) for every scored turn, validating that the
    candidates file mirrors the test set's dialog/turn structure."""
    dialogs = dataset.original["dialogs"]
    cdialogs = cand_data.get("dialogs")
    if not isinstance(cdialogs, list) or len(cdialogs) != len(dialogs):
        raise ValueError(
            f"candidates file has {len(cdialogs or [])} dialogs, "
            f"test set has {len(dialogs)}")
    turn_cands = []
    for idx, (dlg, cdlg) in enumerate(zip(dialogs, cdialogs)):
        if cdlg.get("image_id") != dlg["image_id"]:
            raise ValueError(
                f"dialog {idx}: candidates image_id {cdlg.get('image_id')!r}"
                f" != test set {dlg['image_id']!r}")
        scored = dlg["dialog"][-1:] if undisclosed else dlg["dialog"]
        cturns = cdlg.get("dialog", [])
        if len(cturns) != len(scored):
            raise ValueError(
                f"dialog {idx} ({dlg['image_id']}): candidates has "
                f"{len(cturns)} turns, {len(scored)} are scored")
        for t, ct in enumerate(cturns):
            opts = ct.get("answer_options")
            if not isinstance(opts, list) or not opts or \
                    not all(isinstance(o, str) and o.strip() for o in opts):
                raise ValueError(
                    f"dialog {idx} turn {t}: 'answer_options' must be a "
                    "non-empty list of non-empty strings")
            gt = ct.get("gt_index")
            if gt is not None and not (isinstance(gt, int)
                                       and 0 <= gt < len(opts)):
                raise ValueError(
                    f"dialog {idx} turn {t}: gt_index {gt!r} out of "
                    f"{len(opts)} options")
            turn_cands.append(ct)
    if len(turn_cands) != len(dataset):
        raise ValueError(
            f"{len(turn_cands)} candidate turns vs {len(dataset)} scored "
            "turns — does --undisclosed-only match the candidates file?")
    return turn_cands


def rank_dataset(params, model_cfg, dataset, turn_cands, data_cfg, vocab,
                 turn_batch: int = 4, include_eos: bool = True,
                 feature_transfer: str = "", mesh=None, shardings=None):
    """Score every turn's options; returns (scores_per_qa_id, wall, n).

    ``turn_cands[qa_id]["answer_options"]`` are the option strings; the
    returned list holds one ``[logp, ...]`` per qa_id in option order.
    """
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.data import make_batch_indices
    from mtn_tpu.data.batching import make_batch, uniform_plans
    from mtn_tpu.data.vocab import words2ids
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.batch import to_device_fn

    # tokenize once; words2ids wraps with <sos>/<eos> — rank_batch supplies
    # its own <sos> prefix and <eos> target (answer_in/answer_out law), so
    # strip both wrappers
    tok = [[words2ids(o, vocab)[1:-1].tolist()
            for o in ct["answer_options"]] for ct in turn_cands]
    n_opts = max(len(t) for t in tok)
    max_len = max((len(o) for t in tok for o in t), default=0) \
        + (1 if include_eos else 0)
    decoder = BeamDecoder(model_cfg, DecodeConfig(turn_batch=turn_batch),
                          mesh=mesh)
    transfer = feature_transfer or model_cfg.dtype
    to_device = to_device_fn(transfer, shardings)
    plans, n = make_batch_indices(dataset, batchsize=turn_batch,
                                  max_length=10 ** 9,
                                  separate_caption=data_cfg.separate_caption)
    # one compiled program: uniform context shapes + global (N, L) buckets
    plans = uniform_plans(plans)
    scores = {}
    t0 = time.time()
    for plan in plans:
        hb = make_batch(dataset, plan,
                        separate_caption=data_cfg.separate_caption,
                        skip=data_cfg.skip,
                        length_bucket=data_cfg.length_bucket,
                        feature_bucket=data_cfg.feature_bucket,
                        pad_rows_to=turn_batch)
        db = to_device(hb)
        cands = [tok[plan.qa_ids[b]] if b < len(plan.qa_ids) else []
                 for b in range(db.query.shape[0])]
        out = decoder.rank_batch(params, db, cands,
                                 include_eos=include_eos,
                                 len_bucket=max(max_len, 1),
                                 cand_bucket=max(n_opts, 1))
        for qa_id, row in zip(plan.qa_ids, out):
            scores[qa_id] = row
    wall = time.time() - t0
    return [scores[i] for i in range(len(turn_cands))], wall, n


def main(argv=None):
    args = build_parser().parse_args(argv)
    from mtn_tpu.cli.common import print_args, setup_logging
    setup_logging(args.verbose)
    print_args(args)
    if args.multihost:
        from mtn_tpu.parallel.multihost import initialize_from_flag
        initialize_from_flag(args.multihost)
    import jax

    from mtn_tpu.cli.generate import _split_model_arg
    from mtn_tpu.config import TrainConfig, config_from_dict
    from mtn_tpu.data import load, make_batch_indices
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.evalmetrics.retrieval import rank_of, retrieval_metrics
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.utils.checkpoint import CheckpointManager

    prefix, epoch = _split_model_arg(args.model)
    logging.info("Loading model params from %s (epoch=%s)", prefix, epoch)
    ckpt = CheckpointManager(prefix)
    vocab, conf = ckpt.load_conf()
    model_cfg = config_from_dict("model", conf["model"])
    data_cfg = config_from_dict("data", conf["data"])
    model_cfg.dtype = args.dtype
    model_cfg.use_pallas_attention = bool(args.use_pallas_attention)
    model_cfg.use_pallas_ffn = bool(args.use_pallas_ffn)
    model_cfg.fused_decode_qkv = bool(args.fused_decode_qkv)
    if args.dtype == "float32":
        jax.config.update("jax_default_matmul_precision", "highest")

    fea_type = data_cfg.fea_type if data_cfg.fea_type and \
        data_cfg.fea_type[0] != "none" else None
    test_data = load(fea_type, args.test_path, args.test_set, vocab,
                     include_caption=data_cfg.include_caption,
                     separate_caption=data_cfg.separate_caption,
                     max_history_length=data_cfg.max_history_length,
                     merge_source=data_cfg.merge_source,
                     undisclosed_only=bool(args.undisclosed_only))
    logging.info("#test sample = %d", len(test_data))
    with open(args.candidates) as f:
        cand_data = json.load(f)
    turn_cands = _align_candidates(test_data, cand_data,
                                   bool(args.undisclosed_only))

    trainer = Trainer(model_cfg, TrainConfig())
    plans, _ = make_batch_indices(test_data, 1,
                                  separate_caption=data_cfg.separate_caption)
    sample = device_batch(make_batch(
        test_data, plans[0], separate_caption=data_cfg.separate_caption))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    params, used_epoch = ckpt.restore_params(state, epoch)
    logging.info("Restored checkpoint epoch %s", used_epoch)

    from mtn_tpu.cli.common import make_mesh_from_args
    mesh, shardings = make_mesh_from_args(args, batch_size=args.turn_batch)
    if mesh is not None:
        logging.info("ranking under mesh %s", dict(mesh.shape))
        # params were restored onto one device; lay them out over the mesh
        # (replicated under pure dp, tp-sharded when --mesh-model > 1)
        params = shardings.shard_state(params)
    logging.info("--------------------rank--------------------")
    all_scores, wall, n = rank_dataset(
        params, model_cfg, test_data, turn_cands, data_cfg, vocab,
        turn_batch=args.turn_batch, include_eos=bool(args.include_eos),
        feature_transfer=args.feature_transfer, mesh=mesh,
        shardings=shardings)
    n_scored = sum(len(s) for s in all_scores)
    logging.info("scored %d options over %d turns in %.2fs "
                 "(%.1f options/sec)", n_scored, n, wall,
                 n_scored / max(wall, 1e-9))

    out_dialogs = copy.deepcopy(cand_data["dialogs"])
    gt_ranks = []
    qa_id = 0
    for dlg in out_dialogs:
        for turn in dlg["dialog"]:
            turn["scores"] = all_scores[qa_id]
            gt = turn.get("gt_index")
            if gt is not None:
                turn["gt_rank"] = rank_of(all_scores[qa_id], gt)
                gt_ranks.append(turn["gt_rank"])
            qa_id += 1
    result = {"dialogs": out_dialogs}
    if len(gt_ranks) == len(turn_cands):
        result["metrics"] = retrieval_metrics(gt_ranks)
        for k, v in result["metrics"].items():
            print(f"{k}: {v:.4f}")
    elif gt_ranks:
        logging.warning(
            "gt_index present on %d/%d turns — retrieval metrics need all "
            "of them; emitting per-turn gt_rank only", len(gt_ranks),
            len(turn_cands))
    # every process holds the full (allgathered) score set; process 0
    # writes it (hosts share a filesystem on a pod)
    if args.output and jax.process_index() == 0:
        logging.info("writing ranks to %s", args.output)
        with open(args.output, "w") as f:
            json.dump(result, f, indent=4)
    logging.info("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
