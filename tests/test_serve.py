"""Serving session: checkpoint -> interactive responses.

The trained-checkpoint fixture ``served`` lives in conftest.py (shared
with test_serve_http.py)."""

import numpy as np
import pytest

# end-to-end tier: deselect with -m 'not slow' (pyproject markers)
pytestmark = pytest.mark.slow


def test_serving_session_from_trained_checkpoint(served):
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2))
    ans = session.respond(
        question="are there any people in the video ?",
        history=[("what is he doing ?", "he sits on the couch")],
        caption="a man sits on a couch reading a book",
        features=feats)
    assert isinstance(ans, str)
    # batched requests with shared compiled shapes
    reqs = [Request(question="what is the person doing ?",
                    caption="a dog walks", features=feats)
            for _ in range(3)]
    outs = session.respond_batch(reqs)
    assert len(outs) == 3
    assert all(isinstance(a, str) and isinstance(s, float)
               for a, s in outs)
    # identical requests give identical answers (deterministic decode)
    assert outs[0][0] == outs[1][0]
    # works without features (zero-filled streams)
    ans2 = session.respond(question="is it raining ?")
    assert isinstance(ans2, str)


def test_serving_feature_transfer_int8(served):
    """feature_transfer='int8' (the generate CLI's transfer knob, now on
    the serving surface): zero-feature requests quantize exactly, so the
    int8 session must decode bit-identically to the default session;
    real-feature requests decode through the quantized wire format."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import Request, ServingSession
    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2)
    base = ServingSession.from_checkpoint(prefix + "_best", dcfg)
    q8 = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                        feature_transfer="int8")
    req = Request(question="is there any sound ?")  # zero-filled streams
    a, b = base.respond_batch([req])[0], q8.respond_batch([req])[0]
    assert a[0] == b[0] and a[1] == b[1]
    # real features: <=1/254 per-frame rounding; answers stay well-formed
    out = q8.respond_batch([Request(question="what is he doing ?",
                                    features=feats)])[0]
    assert isinstance(out[0], str) and isinstance(out[1], float)


def test_serving_sample_style(served):
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession

    def mk():
        return ServingSession.from_checkpoint(
            prefix + "_best", DecodeConfig(maxlen=6, decode_style="sample",
                                           temperature=0.7, top_k=5))

    s1, s2 = mk(), mk()
    a = s1.respond(question="is there any sound ?", features=feats)
    assert isinstance(a, str)
    # deterministic per (seed, call index): a fresh session replays the
    # same stream — but within a session each call folds its counter so
    # sampling noise is NOT reused across calls (repeat questions can
    # legitimately draw different answers)
    assert s2.respond(question="is there any sound ?",
                      features=feats) == a
    b1 = s1.respond(question="is there any sound ?", features=feats)
    b2 = s2.respond(question="is there any sound ?", features=feats)
    assert b1 == b2  # second-call streams also agree across sessions


def test_async_server_continuous_batching(served):
    """AsyncServer packs concurrent submissions into turn_batch-padded
    launches and resolves every future with the answer the synchronous
    path gives for the same request (same session, same programs)."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    questions = ["is there any sound ?", "what is he doing ?",
                 "does the man speak ?", "is it a long video ?",
                 "are there people ?", "is there music playing ?",
                 "what happens at the end ?", "is the room bright ?",
                 "does he sit down ?", "is a dog visible ?"]
    reqs = [Request(question=qx, caption="a man reads a book",
                    features=feats) for qx in questions]
    sync = [session.respond_batch([r])[0] for r in reqs]

    srv = AsyncServer(session, max_in_flight=2, max_wait_ms=300)
    futs = [srv.submit(r) for r in reqs]
    got = [f.result(timeout=300) for f in futs]
    srv.stop()
    for (sa, ss), (ga, gs) in zip(sync, got):
        assert ga == sa
        assert gs == pytest.approx(ss, abs=1e-5)
    # continuous batching actually batched: 10 requests, cap 4 → far
    # fewer launches than requests (exact count is timing-dependent)
    assert srv.launches <= 5, srv.launches


def test_async_server_surfaces_errors(served):
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    srv = AsyncServer(session, max_wait_ms=1.0)
    bad = Request(question="hello")
    bad.features = {"i3d_rgb": "not-an-array"}  # encode will raise
    fut = srv.submit(bad)
    with pytest.raises(Exception):
        fut.result(timeout=120)
    # the scheduler thread survives and keeps serving
    ok = srv.respond(Request(question="is there any sound ?",
                             features=feats), timeout=120)
    srv.stop()
    assert isinstance(ok[0], str)


def test_async_server_survives_cancelled_future(served):
    """A caller cancelling its future while it waits in the queue must
    not kill the scheduler (set_result on a cancelled future raises
    InvalidStateError) nor disturb the other requests in its batch."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    srv = AsyncServer(session, max_wait_ms=200)
    reqs = [Request(question=qx, features=feats)
            for qx in ("is there any sound ?", "what is he doing ?",
                       "are there people ?", "is a dog visible ?")]
    futs = [srv.submit(r) for r in reqs]
    cancelled = futs[2].cancel()  # may lose the race with the scheduler
    for i, f in enumerate(futs):
        if i == 2 and cancelled:
            assert f.cancelled()
            continue
        assert isinstance(f.result(timeout=300)[0], str)
    # the scheduler thread survives and keeps serving
    ok = srv.respond(Request(question="is it raining ?",
                             features=feats), timeout=300)
    srv.stop()
    assert isinstance(ok[0], str)


def test_async_server_stop_submit_race_never_hangs(served):
    """A submit racing stop() must resolve the future either with an
    answer or a 'server stopped' error — never leave it pending (the
    post-loop queue drain closes the final-emptiness-check race)."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    srv = AsyncServer(session, max_wait_ms=1.0)
    srv._stop.set()  # simulate stop() winning the race
    fut = srv.submit(Request(question="is there any sound ?",
                             features=feats))
    srv._thread.join(timeout=300)
    assert not srv._thread.is_alive()
    assert fut.done()
    try:
        ans = fut.result(timeout=0)
        assert isinstance(ans[0], str)  # scheduler picked it up in time
    except RuntimeError as e:
        assert "stopped" in str(e)      # drained at shutdown


def test_encode_requests_honors_merge_and_history_laws():
    import numpy as np
    from mtn_tpu.config import DataConfig, ModelConfig
    from mtn_tpu.serve import Request, encode_requests
    vocab = {"<unk>": 0, "<blank>": 1, "<sos>": 2, "<eos>": 3,
             "a": 4, "b": 5, "c": 6}
    mc = ModelConfig(vocab_size=7, ft_sizes=[])
    r = Request(question="a", history=[("a b", "c"), ("b", "a a")],
                caption="c c")
    base = encode_requests([r], mc, DataConfig(
        include_caption="caption", separate_caption=True), vocab)
    # history: blank head + both QA pairs (each word + sos/eos wrappers)
    qa1 = 4 + 3  # 'a b' (2+2) + 'c' (1+2)
    qa2 = 3 + 4
    assert base.his.shape[1] == 1 + qa1 + qa2
    assert base.query.shape[1] == 3  # sos a eos
    # max_history_length=1 keeps only the last turn
    trunc = encode_requests([r], mc, DataConfig(
        include_caption="caption", separate_caption=True,
        max_history_length=1), vocab)
    assert trunc.his.shape[1] == 1 + qa2
    # merge_source concatenates caption + history + question
    merged = encode_requests([r], mc, DataConfig(
        include_caption="caption", separate_caption=True,
        merge_source=True), vocab)
    assert merged.query.shape[1] == 4 + (1 + qa1 + qa2) + 3  # cap+his+q


def test_hot_reload_swaps_params(served, tmp_path):
    """ServingSession.reload hot-swaps weights from a checkpoint: params
    change in place (same compiled programs), epochs round-trip, and an
    architecture mismatch is rejected."""
    import os
    import shutil

    import jax
    import jax.numpy as jnp
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.train.schedule import make_optimizer
    from mtn_tpu.train.trainer import TrainState
    from mtn_tpu.utils.checkpoint import CheckpointManager

    prefix, feats = served
    # work on a copy so the shared fixture's checkpoint dir stays pristine
    exp2 = tmp_path / "exp2"
    shutil.copytree(os.path.dirname(prefix), exp2)
    prefix2 = str(exp2 / os.path.basename(prefix))

    session = ServingSession.from_checkpoint(
        prefix2 + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2))
    a0 = session.respond(question="is there any sound ?", features=feats)

    bumped = jax.tree.map(lambda p: p + 0.05, session.params)
    opt = make_optimizer(session.model_cfg.d_model, 10)
    state = TrainState(params=bumped, opt_state=opt.init(bumped),
                      step=jnp.zeros((), jnp.int32))
    CheckpointManager(prefix2).save(2, state, val_loss=1e9)

    ep = session.reload(prefix2 + "_2")
    assert ep == 2
    for a, b in zip(jax.tree.leaves(session.params),
                    jax.tree.leaves(bumped)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert isinstance(
        session.respond(question="is there any sound ?", features=feats),
        str)

    # back to epoch 1 reproduces the original answer exactly
    assert session.reload(prefix2 + "_1") == 1
    assert session.respond(question="is there any sound ?",
                           features=feats) == a0

    # architecture mismatch is rejected (train a different-width ckpt? a
    # missing path suffices for the error contract here)
    with pytest.raises(Exception):
        session.reload(str(tmp_path / "nope" / "mtn_best"))


def test_async_server_backpressure(served, monkeypatch):
    """With max_queue set, submit sheds load with ServerOverloaded once
    that many requests wait; freeing a slot re-admits. The scheduler
    loop is stubbed out so the queue provably never drains."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import (AsyncServer, Request, ServerOverloaded,
                               ServingSession)
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    monkeypatch.setattr(AsyncServer, "_loop", lambda self: None)
    srv = AsyncServer(session, max_queue=2)
    r = Request(question="is there any sound ?", features=feats)
    f1 = srv.submit(r)
    srv.submit(r)
    assert srv.queue_depth() == 2
    with pytest.raises(ServerOverloaded):
        srv.submit(r)
    srv._q.get_nowait()  # a launch frees a slot
    assert type(srv.submit(r)) is type(f1)
    assert srv.queue_depth() == 2


def test_warmup_compiles_decode_programs(served):
    """warmup() builds the configured decode program (and the stream
    pair when asked) so the first real request hits warm caches."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=2))
    assert session.decoder._beam_fn is None
    sec = session.warmup(stream=True)
    assert sec >= 0.0
    assert session.decoder._beam_fn is not None        # beam compiled
    assert getattr(session.decoder, "_stream_greedy")  # stream pair too
    ans = session.respond(question="is there any sound ?", features=feats)
    assert isinstance(ans, str)
    # the epoch served is tracked (watcher contract)
    assert session.epoch == 1


def test_respond_carries_full_nbest(served):
    """Results unpack as (answer, score) AND carry the ranked n-best
    (DecodeResult), equal to the decoder's own BeamResult texts — on
    both the synchronous and the continuous-batching paths."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=3, nbest=3,
                                       turn_batch=2))
    req = Request(question="is there any sound ?", features=feats)
    res = session.respond_batch([req])[0]
    answer, score = res
    assert res.nbest[0] == (answer, score)
    assert 1 <= len(res.nbest) <= 3
    scores = [s for _, s in res.nbest]
    assert scores == sorted(scores, reverse=True)
    # the async path resolves futures with the same rich result
    srv = AsyncServer(session, max_wait_ms=1.0)
    ares = srv.respond(req, timeout=300)
    srv.stop()
    assert ares == (answer, score)
    assert ares.nbest == res.nbest
    # greedy sessions: a single hypothesis
    g = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, decode_style="greedy",
                                       turn_batch=2))
    gres = g.respond_batch([req])[0]
    assert gres.nbest == [tuple(gres)]


def test_rank_candidates_discriminative_mode(served):
    """VisDial-style mode (reference readme.md:81-86): candidates scored
    by generative log-likelihood, ranks consistent with scores and the
    evalmetrics.retrieval tie law; deterministic across calls."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.evalmetrics.retrieval import rank_of
    from mtn_tpu.serve import Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2))
    req = Request(question="what is he doing ?",
                  history=[("is anyone there ?", "yes one person")],
                  caption="a man sits on a couch reading a book",
                  features=feats)
    cands = ["he sits on the couch", "a dog walks", "yes",
             "no people at all"]
    ranked = session.rank(req, cands)
    assert [c for c, _, _ in ranked] == cands       # input order kept
    scores = [s for _, s, _ in ranked]
    assert all(isinstance(s, float) and np.isfinite(s) for s in scores)
    assert [r for _, _, r in ranked] == [rank_of(scores, i)
                                         for i in range(len(cands))]
    assert sorted(r for _, _, r in ranked) == [1, 2, 3, 4]  # no ties here
    # deterministic
    again = session.rank(req, cands)
    assert [s for _, s, _ in again] == pytest.approx(scores)
    # include_eos=False drops exactly the <eos> term: scores change but
    # stay finite and ranking machinery still holds
    bare = session.rank(req, cands, include_eos=False)
    assert all(np.isfinite(s) for _, s, _ in bare)
    assert any(b != pytest.approx(s)
               for (_, b, _), s in zip(bare, scores))
    with pytest.raises(ValueError):
        session.rank(req, [])


def test_rank_scores_answer_event_without_sos(served):
    """Regression: the scored event is the answer tokens (+<eos>), NOT the
    <sos>/<eos>-wrapped words2ids sequence — rank() must strip the wrappers
    before handing candidates to rank_batch (which supplies its own <sos>
    input prefix and <eos> target, mirroring answer_in/answer_out:
    dataset.py docstring, reference data_handler.py:76-86)."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.data.vocab import words2ids
    from mtn_tpu.serve import (Request, ServingSession, device_batch,
                               encode_requests)
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2))
    req = Request(question="what is he doing ?",
                  caption="a man sits on a couch", features=feats)
    cands = ["he sits", "a dog walks"]
    got = [s for _, s, _ in session.rank(req, cands)]
    hb = encode_requests([req], session.model_cfg, session.data_cfg,
                         session.vocab, session._lb, session._fb)
    db = device_batch(hb, session.model_cfg.dtype)
    bare = [words2ids(c, session.vocab)[1:-1].tolist() for c in cands]
    want = session.decoder.rank_batch(session.params, db, [bare])[0]
    assert got == pytest.approx(want)
    # and the wrapped form scores differently (the old bug is detectable)
    wrapped = [words2ids(c, session.vocab).tolist() for c in cands]
    buggy = session.decoder.rank_batch(session.params, db, [wrapped])[0]
    assert any(b != pytest.approx(w) for b, w in zip(buggy, want))


def test_model_overrides_hook(served):
    """from_checkpoint(model_overrides=...) sets serving-time ModelConfig
    knobs on top of the sidecar (no param-tree effect) and rejects
    unknown fields; a fused-QKV session answers identically to the
    default session on a trained checkpoint (docs/BENCH.md 'Decode QKV
    fusion')."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import Request, ServingSession
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2)
    base = ServingSession.from_checkpoint(prefix + "_best", dcfg)
    fused = ServingSession.from_checkpoint(
        prefix + "_best", dcfg, model_overrides={"fused_decode_qkv": True})
    assert fused.model_cfg.fused_decode_qkv is True
    req = dict(question="what is the person doing ?",
               caption="a dog walks", features=feats)
    assert fused.respond(**req) == base.respond(**req)
    ranked_f = fused.rank(Request(req["question"], caption=req["caption"],
                                  features=feats), ["he sits", "a dog"])
    ranked_b = base.rank(Request(req["question"], caption=req["caption"],
                                 features=feats), ["he sits", "a dog"])
    assert [r[2] for r in ranked_f] == [r[2] for r in ranked_b]
    with pytest.raises(ValueError, match="unknown ModelConfig field"):
        ServingSession.from_checkpoint(prefix + "_best",
                                       model_overrides={"nope": 1})


def test_async_server_rank_batching(served):
    """submit_rank packs concurrent rank requests into candidate-tiled
    launches (grouped apart from beam traffic) and resolves each future
    with exactly the synchronous ServingSession.rank structure; mixed
    respond+rank traffic on one AsyncServer works."""
    prefix, feats = served
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import AsyncServer, Request, ServingSession
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    cands = ["he sits on the couch", "a dog walks", "no", "i am not sure"]
    reqs = [Request(question=q, caption="a man reads a book",
                    features=feats)
            for q in ["is there any sound ?", "what is he doing ?",
                      "does the man speak ?", "is it a long video ?",
                      "are there people ?", "is there music playing ?"]]
    sync = [session.rank(r, cands) for r in reqs]
    sync_noeos = session.rank(reqs[0], cands, include_eos=False)
    sync_ans = session.respond_batch([reqs[0]])[0]

    srv = AsyncServer(session, max_in_flight=2, max_wait_ms=300)
    futs = [srv.submit_rank(r, cands) for r in reqs]
    # mixed traffic: a beam request and a different include_eos group
    fut_beam = srv.submit(reqs[0])
    fut_noeos = srv.submit_rank(reqs[0], cands, include_eos=False)
    got = [f.result(timeout=300) for f in futs]
    srv.stop()
    for s, g in zip(sync, got):
        assert [c for c, _, _ in g] == cands
        assert [r for _, _, r in g] == [r for _, _, r in s]
        for (_, gs, _), (_, ss, _) in zip(g, s):
            assert gs == pytest.approx(ss, abs=1e-5)
    # 6 rank requests, cap 4 → at most 2 rank launches (+1 beam, +1
    # no-eos group); timing-dependent upper bound
    assert srv.launches <= 5, srv.launches
    assert fut_beam.result(timeout=300)[0] == sync_ans[0]
    g = fut_noeos.result(timeout=300)
    assert [r for _, _, r in g] == [r for _, _, r in sync_noeos]
    with pytest.raises(ValueError):
        srv.submit_rank(reqs[0], [])


def test_async_server_deadline_shedding(served):
    """A request whose deadline passes before launch is shed with
    DeadlineExceeded at the last host-side moment (no device work);
    live-deadline requests keep serving and the scheduler survives."""
    import time

    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import (AsyncServer, DeadlineExceeded, Request,
                               ServingSession)
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    srv = AsyncServer(session, max_wait_ms=1.0)
    fut = srv.submit(Request(question="hello",
                             deadline=time.monotonic() - 0.001))
    with pytest.raises(DeadlineExceeded):
        fut.result(timeout=120)
    assert srv.n_expired == 1
    ok = srv.respond(Request(question="is there any sound ?",
                             deadline=time.monotonic() + 600.0),
                     timeout=120)
    srv.stop()
    assert isinstance(ok[0], str)


def test_async_server_rank_deadline_shedding(served):
    """Deadline shedding applies to rank launches too (the check lives
    in AsyncServer._launch, shared by both kinds)."""
    import time

    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import (AsyncServer, DeadlineExceeded, Request,
                               ServingSession)
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    srv = AsyncServer(session, max_wait_ms=1.0)
    cands = ["yes", "no", "a man sits"]
    fut = srv.submit_rank(Request(question="is there any sound ?",
                                  deadline=time.monotonic() - 0.001),
                          cands)
    with pytest.raises(DeadlineExceeded):
        fut.result(timeout=120)
    got = srv.submit_rank(Request(question="is there any sound ?"),
                          cands).result(timeout=300)
    srv.stop()
    assert srv.n_expired >= 1
    assert [c for c, _, _ in got] == cands
