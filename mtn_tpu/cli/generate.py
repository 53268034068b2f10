"""Generation entry point (reference generate.py:88-162; run.sh stage 3).

Differences by design: the reference decodes turn-by-turn at batch size 1
with no KV cache (generate.py:146, SURVEY.md §3.2); here turns are
grouped into length-sorted device batches and beam-decoded by the
jit-compiled cached decoder — the output JSON format is identical.
"""

from __future__ import annotations

import argparse
import copy
import json
import logging
import time


def build_parser() -> argparse.ArgumentParser:
    from mtn_tpu.cli.common import add_logging_args, add_tpu_args
    parser = argparse.ArgumentParser(description="Generate responses")
    parser.add_argument("--gpu", "-g", default=0, type=int,
                        help="accepted for run.sh parity; unused under JAX")
    parser.add_argument("--test-path", default="", type=str)
    parser.add_argument("--test-set", default="", type=str)
    parser.add_argument("--model-conf", default="", type=str,
                        help="accepted for parity; config is read from "
                             "<model prefix>.conf.json")
    parser.add_argument("--model", "-m", default="", type=str,
                        help="model prefix, optionally with _<epoch|best> "
                             "suffix (run.sh:161 style)")
    parser.add_argument("--maxlen", default=30, type=int)
    parser.add_argument("--beam", default=3, type=int)
    parser.add_argument("--penalty", default=2.0, type=float)
    parser.add_argument("--nbest", default=5, type=int)
    parser.add_argument("--output", "-o", default="", type=str)
    parser.add_argument("--decode-style", default="greedy", type=str,
                        choices=["greedy", "beam_search", "sample"])
    parser.add_argument("--temperature", default=1.0, type=float,
                        help="sampling temperature (decode-style sample; "
                             "0 degenerates to greedy)")
    parser.add_argument("--top-k", default=0, type=int,
                        help="sample from the top-k tokens only (0: off)")
    parser.add_argument("--top-p", default=0.0, type=float,
                        help="nucleus sampling mass (0: off)")
    parser.add_argument("--sample-seed", default=1, type=int)
    parser.add_argument("--undisclosed-only", default=0, type=int)
    parser.add_argument("--labeled-test", default=None, type=str)
    parser.add_argument("--turn-batch", default=16, type=int,
                        help="dialogue turns decoded per device batch")
    parser.add_argument("--uniform-shapes", default=1, type=int,
                        help="pad all decode batches to global maxima "
                             "(one compiled program for the whole run)")
    parser.add_argument("--early-stop", default=1, type=int,
                        help="stop the beam loop as soon as no active "
                             "hypothesis can still enter any n-best "
                             "(output-identical to the full maxlen run; "
                             "measured 1.32x decode on a trained model — "
                             "0 runs the fixed-maxlen scan)")
    parser.add_argument("--weights-quant", default="", type=str,
                        choices=["", "int8", "int8-fp-head"],
                        help="'int8': decode with weight-only-quantized "
                             "kernels (per-channel scales, dequant fused "
                             "into the matmul reads — "
                             "mtn_tpu/utils/quantize.py); 'int8-fp-head' "
                             "keeps the vocab head full precision (the "
                             "measured fidelity point); default full "
                             "precision")
    parser.add_argument("--multihost", default="", type=str,
                        help="join a multi-host run: 'auto' (TPU pod) or "
                             "'host:port,nprocs,procid' — turn batches "
                             "shard across hosts; results are allgathered "
                             "and process 0 writes the output "
                             "(parallel/multihost.py)")
    add_tpu_args(parser)
    add_logging_args(parser)
    return parser


def _split_model_arg(model: str):
    """'exps/x/mtn_best' -> ('exps/x/mtn', 'best'); '..._7' -> (.., 7)."""
    if "_" in model:
        prefix, suffix = model.rsplit("_", 1)
        if suffix == "best" or suffix == "latest":
            return prefix, suffix
        if suffix.isdigit():
            return prefix, int(suffix)
    return model, "best"


def generate_responses(params, model_cfg, dataset, decode_cfg, data_cfg,
                       vocab, ref_data=None, log=True, mesh=None,
                       shardings=None):
    """Decode every turn; returns the reference-format result dict
    (generate.py:39-41,68 semantics: deep-copied dialogs with the 1-best
    hypothesis string in place of each answer). With ``mesh``/``shardings``
    the beam program compiles under the mesh and each turn batch is
    sharded over the ``data`` axis (GSPMD data-parallel decode)."""
    from mtn_tpu.data import make_batch_indices
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.data.vocab import vocab_list
    from mtn_tpu.decode.beam import BeamDecoder, detokenize
    from mtn_tpu.train.batch import to_device_fn

    vlist = vocab_list(vocab)
    decoder = BeamDecoder(model_cfg, decode_cfg, mesh=mesh)
    transfer = decode_cfg.feature_transfer or model_cfg.dtype
    to_device = to_device_fn(transfer, shardings)
    # length-sorted plans pack similar turns together (padding efficiency);
    # qa_ids map results back to dialogue order
    plans, n = make_batch_indices(dataset, batchsize=decode_cfg.turn_batch,
                                  max_length=10 ** 9,
                                  separate_caption=data_cfg.separate_caption)
    if decode_cfg.uniform_shapes and plans:
        from mtn_tpu.data.batching import uniform_plans
        plans = uniform_plans(plans)
    answers = {}
    scores = {}
    nbest = {}
    t0 = time.time()
    if decode_cfg.decode_style == "beam_search":
        # fully pipelined: a producer thread loads features, pads, and
        # device_puts the next batches while the device decodes and the
        # main thread drains finished results in order
        import queue as _queue
        import threading as _threading
        q: "_queue.Queue" = _queue.Queue(maxsize=3)
        err = []

        def produce():
            try:
                for plan in plans:
                    hb = make_batch(
                        dataset, plan,
                        separate_caption=data_cfg.separate_caption,
                        skip=data_cfg.skip,
                        length_bucket=data_cfg.length_bucket,
                        feature_bucket=data_cfg.feature_bucket,
                        pad_rows_to=decode_cfg.turn_batch)
                    q.put((plan, to_device(hb)))
            except BaseException as e:
                err.append(e)
            finally:
                q.put(None)

        _threading.Thread(target=produce, daemon=True).start()
        in_flight = []
        MAX_IN_FLIGHT = 8
        t_first = [None]  # time of first finished batch (compile incl.)

        def drain_one():
            plan, raw, valid = in_flight.pop(0)
            results = decoder.beam_results(raw, valid)  # blocks on device
            if t_first[0] is None:
                t_first[0] = time.time()
            for qa_id, res in zip(plan.qa_ids, results):
                if log:  # full n-best strings only needed for the log
                    nbest[qa_id] = res.texts(vlist, vocab["<eos>"])
                    answers[qa_id], scores[qa_id] = nbest[qa_id][0]
                else:
                    answers[qa_id] = detokenize(res.tokens[0], vlist,
                                                vocab["<eos>"])
                    scores[qa_id] = res.scores[0]

        while True:
            item = q.get()
            if item is None:
                break
            plan, db = item
            in_flight.append((plan, decoder.beam_batch_raw(params, db),
                              db.valid))
            if len(in_flight) >= MAX_IN_FLIGHT:
                drain_one()
        while in_flight:
            drain_one()
        if err:
            raise err[0]
        if t_first[0] is not None:
            steady = time.time() - t_first[0]
            logging.info(
                "first batch (incl. compile) after %.1fs; steady-state "
                "%.2f responses/sec", t_first[0] - t0,
                max(n - decode_cfg.turn_batch, 0) / max(steady, 1e-9))
    else:
        for bi, plan in enumerate(plans):
            hb = make_batch(dataset, plan,
                            separate_caption=data_cfg.separate_caption,
                            skip=data_cfg.skip,
                            length_bucket=data_cfg.length_bucket,
                            feature_bucket=data_cfg.feature_bucket,
                            pad_rows_to=decode_cfg.turn_batch)
            db = to_device(hb)
            toks = (decoder.sample_batch(params, db, fold=bi)
                    if decode_cfg.decode_style == "sample"
                    else decoder.greedy_batch(params, db))
            for qa_id, row in zip(plan.qa_ids, toks):
                answers[qa_id] = " ".join(vlist[t] for t in row)
                scores[qa_id] = 0.0
    wall = time.time() - t0

    result_dialogs = []
    qa_id = 0
    undisclosed = decode_cfg.undisclosed_only
    for idx, dialog in enumerate(dataset.original["dialogs"]):
        vid = dialog["image_id"]
        out_dialog = dialog["dialog"][-1:] if undisclosed \
            else dialog["dialog"]
        if undisclosed and ref_data is not None:
            # parity: generate.py:35 asserts hypothesis/reference alignment
            assert ref_data["dialogs"][idx]["image_id"] == vid
        pred = {"image_id": vid, "dialog": copy.deepcopy(out_dialog)}
        result_dialogs.append(pred)
        for t, qa in enumerate(out_dialog):
            if undisclosed:
                assert qa["answer"] == "__UNDISCLOSED__"  # generate.py:43-44
            if log:
                logging.info("%d %s_%d", qa_id, vid, t)
                logging.info("QS: %s", qa["question"])
                if undisclosed and ref_data is not None:
                    ref_turn = ref_data["dialogs"][idx]["dialog"][-1:][t]
                    logging.info("REF: %s", ref_turn["answer"])
                else:
                    logging.info("REF: %s", qa["answer"])
                if decode_cfg.decode_style == "beam_search":
                    # n-best log lines (generate.py:57-66 format)
                    for ni, (hyp, sc) in enumerate(
                            nbest.get(qa_id, [(answers[qa_id],
                                               scores[qa_id])])):
                        logging.info("HYP[%d]: %s  ( %f )", ni + 1, hyp, sc)
                else:
                    logging.info("HYP: %s", answers[qa_id])  # generate.py:79
            pred["dialog"][t]["answer"] = answers[qa_id]
            qa_id += 1
    logging.info("decoded %d turns in %.2fs (%.2f responses/sec)", n, wall,
                 n / max(wall, 1e-9))
    return {"dialogs": result_dialogs}, wall, n


def main(argv=None):
    args = build_parser().parse_args(argv)
    from mtn_tpu.cli.common import print_args, setup_logging
    setup_logging(args.verbose)
    print_args(args)
    if args.multihost:
        from mtn_tpu.parallel.multihost import initialize_from_flag
        initialize_from_flag(args.multihost)
    import jax
    from mtn_tpu.config import DecodeConfig, config_from_dict
    from mtn_tpu.data import load
    from mtn_tpu.data.batching import make_batch
    from mtn_tpu.train.trainer import Trainer
    from mtn_tpu.config import TrainConfig
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
    logging.info("#vocab = %d", len(vocab))

    logging.info("Loading test data from %s", args.test_set)
    fea_type = data_cfg.fea_type if data_cfg.fea_type and \
        data_cfg.fea_type[0] != "none" else None
    test_data = load(fea_type, args.test_path, args.test_set, vocab,
                     include_caption=data_cfg.include_caption,
                     separate_caption=data_cfg.separate_caption,
                     max_history_length=data_cfg.max_history_length,
                     merge_source=data_cfg.merge_source,
                     undisclosed_only=bool(args.undisclosed_only))
    logging.info("#test sample = %d", len(test_data))

    # init abstract state to restore params into
    from mtn_tpu.data import make_batch_indices
    from mtn_tpu.train.batch import device_batch
    trainer = Trainer(model_cfg, TrainConfig())
    plans, _ = make_batch_indices(test_data, 1,
                                  separate_caption=data_cfg.separate_caption)
    sample = device_batch(make_batch(
        test_data, plans[0], separate_caption=data_cfg.separate_caption))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    params, used_epoch = ckpt.restore_params(state, epoch)
    logging.info("Restored checkpoint epoch %s", used_epoch)

    decode_cfg = DecodeConfig(
        maxlen=args.maxlen, beam=args.beam, penalty=args.penalty,
        nbest=args.nbest, decode_style=args.decode_style,
        undisclosed_only=bool(args.undisclosed_only),
        labeled_test=args.labeled_test, turn_batch=args.turn_batch,
        uniform_shapes=bool(args.uniform_shapes),
        feature_transfer=args.feature_transfer,
        early_stop=bool(args.early_stop),
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        sample_seed=args.sample_seed)
    ref_data = None
    if args.undisclosed_only and args.labeled_test:
        with open(args.labeled_test) as f:
            ref_data = json.load(f)
    from mtn_tpu.cli.common import make_mesh_from_args
    mesh, shardings = make_mesh_from_args(args, batch_size=args.turn_batch)
    if args.weights_quant:
        # quantize FIRST (host-side numpy over the single-device tree),
        # then lay the int8 tree out over the mesh with the same specs
        # as f32 (kernel_scale rules in parallel/sharding.py)
        from mtn_tpu.utils.quantize import quantize_params
        logging.info("quantizing decode weights: %s", args.weights_quant)
        params = quantize_params(
            params, skip_generator=(args.weights_quant == "int8-fp-head"))
    if mesh is not None:
        logging.info("decoding under mesh %s", dict(mesh.shape))
        # params were restored onto one device; lay them out over the mesh
        # (replicated under pure dp, tp-sharded when --mesh-model > 1)
        params = shardings.shard_state(params)
    logging.info("--------------------generate--------------------")
    t0 = time.time()
    result, wall, n = generate_responses(
        params, model_cfg, test_data, decode_cfg, data_cfg, vocab,
        ref_data=ref_data, log=args.verbose >= 1, mesh=mesh,
        shardings=shardings)
    logging.info("wall time = %f", time.time() - t0)
    # every process holds the full (allgathered) result set; process 0
    # writes it (hosts share a filesystem on a pod)
    if args.output and jax.process_index() == 0:
        logging.info("writing results to %s", args.output)
        with open(args.output, "w") as f:
            json.dump(result, f, indent=4)
    logging.info("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
