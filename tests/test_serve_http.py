"""HTTP serving front-end: network surface over ServingSession.

(The reference has no serving/API layer — SURVEY.md §1; this is a
framework addition, tested end-to-end over real sockets.)"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

# end-to-end tier: deselect with -m 'not slow' (pyproject markers)
pytestmark = pytest.mark.slow


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def http_server(served):
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.serve_http import start_server
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=4))
    srv = start_server(session, port=0, max_wait_ms=150.0)
    base = "http://%s:%d" % srv.server_address
    yield srv, base, feats
    srv.close()


def test_healthz_and_stats(http_server):
    srv, base, _ = http_server
    assert _get(base + "/healthz") == (200, {"ok": True})
    code, stats = _get(base + "/stats")
    assert code == 200
    assert stats["decode_style"] == "beam_search"
    assert stats["turn_batch"] == 4
    assert stats["uptime_s"] >= 0
    # live-weights identity (reload/watcher swaps surface here);
    # basename only — the unauthenticated endpoint must not leak the
    # server's directory layout
    assert "model" in stats and "epoch" in stats
    if stats["model"]:
        assert "/" not in stats["model"]


def test_respond_over_http(http_server):
    srv, base, feats = http_server
    payload = {
        "question": "is there any sound ?",
        "history": [["what is he doing ?", "he sits on the couch"]],
        "caption": "a man sits on a couch reading a book",
        "features": {k: v.tolist() for k, v in feats.items()},
    }
    code, out = _post(base + "/v1/respond", payload)
    assert code == 200
    assert isinstance(out["answer"], str)
    assert isinstance(out["score"], float)
    # the HTTP surface is a faithful proxy: same answer as calling the
    # session directly is implied by determinism — same request twice
    # over the wire must agree
    assert _post(base + "/v1/respond", payload)[1] == out


def test_respond_npy_b64_features(http_server):
    """Compact feature form: base64 of np.save bytes — must decode the
    same answer as the nested-list form."""
    srv, base, feats = http_server

    def b64(a):
        buf = io.BytesIO()
        np.save(buf, a)
        return {"npy_b64": base64.b64encode(buf.getvalue()).decode()}

    q = {"question": "are there people in the video ?"}
    lists = dict(q, features={k: v.tolist() for k, v in feats.items()})
    packed = dict(q, features={k: b64(v) for k, v in feats.items()})
    assert (_post(base + "/v1/respond", lists)[1]
            == _post(base + "/v1/respond", packed)[1])


def test_concurrent_requests_batch_together(http_server):
    """Concurrent HTTP callers ride the continuous batcher: identical
    requests resolve identically, and the server packs them into fewer
    beam launches than requests (the batching window is 150 ms)."""
    srv, base, feats = http_server
    payload = {"question": "what is the person doing ?",
               "features": {k: v.tolist() for k, v in feats.items()}}
    launches_before = srv.async_server.launches
    results = [None] * 4
    errs = []

    def call(i):
        try:
            results[i] = _post(base + "/v1/respond", payload)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    ts = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errs
    assert all(r is not None and r[0] == 200 for r in results)
    answers = {r[1]["answer"] for r in results}
    assert len(answers) == 1  # identical request → identical answer
    # 4 requests in << 150 ms: strictly fewer launches than requests
    assert srv.async_server.launches - launches_before < 4


def test_respond_batch_endpoint(http_server):
    srv, base, feats = http_server
    reqs = [{"question": "is it raining ?"},
            {"question": "is there any sound ?",
             "features": {k: v.tolist() for k, v in feats.items()}}]
    code, out = _post(base + "/v1/respond_batch", {"requests": reqs})
    assert code == 200
    assert len(out["results"]) == 2
    assert all(isinstance(r["answer"], str) for r in out["results"])


def test_http_error_codes(http_server):
    srv, base, _ = http_server
    # bad JSON -> 400
    req = urllib.request.Request(base + "/v1/respond", data=b"{nope",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    # missing question -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/respond", {"caption": "a man"})
    assert ei.value.code == 400
    # bad feature rank -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/respond",
              {"question": "hm ?", "features": {"i3d_rgb": [1.0, 2.0]}})
    assert ei.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/oops", {"question": "hm ?"})
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base + "/nope")
    assert ei.value.code == 404
    # empty batch -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/respond_batch", {"requests": []})
    assert ei.value.code == 400
    # request-processing errors are counted (the four 400s above; 404s
    # are routing misses, not request failures) and don't kill the
    # server
    assert _get(base + "/healthz")[0] == 200
    assert _get(base + "/stats")[1]["errors"] >= 4


def test_keep_alive_connection_reuse(http_server):
    """HTTP/1.1 persistent connection: a 404'd POST (whose body the
    server must drain) followed by a real request on the SAME socket —
    the stream must stay parseable."""
    import http.client
    srv, base, _ = http_server
    host, port = srv.server_address
    conn = http.client.HTTPConnection(host, port, timeout=300)
    try:
        body = json.dumps({"question": "hm ?"})
        conn.request("POST", "/v1/oops", body=body,
                     headers={"Content-Type": "application/json"})
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        conn.request("POST", "/v1/respond", body=body,
                     headers={"Content-Type": "application/json"})
        r2 = conn.getresponse()
        assert r2.status == 200
        assert isinstance(json.loads(r2.read())["answer"], str)
    finally:
        conn.close()


def test_greedy_session_lock_path(served):
    """Non-beam sessions serve through the lock (no AsyncServer)."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.serve_http import start_server
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, decode_style="greedy",
                                       turn_batch=4))
    srv = start_server(session, port=0)
    try:
        base = "http://%s:%d" % srv.server_address
        assert srv.async_server is None
        payload = {"question": "is there any sound ?",
                   "features": {k: v.tolist() for k, v in feats.items()}}
        code, out = _post(base + "/v1/respond", payload)
        assert code == 200 and isinstance(out["answer"], str)
        assert _get(base + "/stats")[1]["launches"] is None
    finally:
        srv.close()


def test_parse_request_validation():
    from mtn_tpu.serve_http import BadRequest, parse_request
    with pytest.raises(BadRequest):
        parse_request([])
    with pytest.raises(BadRequest):
        parse_request({"question": ""})
    with pytest.raises(BadRequest):
        parse_request({"question": "q", "history": [["only-q"]]})
    with pytest.raises(BadRequest):
        parse_request({"question": "q", "caption": 3})
    with pytest.raises(BadRequest):
        parse_request({"question": "q", "features": {"x": {"b": 1}}})
    r = parse_request({"question": "q", "history": [["a", "b"]],
                       "features": {"x": [[1, 2], [3, 4]],
                                    "y": [[[1], [2]], [[3], [4]]]}})
    assert r.features["x"].shape == (2, 2)
    assert r.features["y"].shape == (2, 2, 1)  # 3-D spatial accepted


def test_admin_reload_endpoint(http_server):
    srv, base, feats = http_server
    status, out = _post(base + "/admin/reload", {})
    assert status == 200 and out["ok"] is True
    # the server keeps answering after the swap
    status, out = _post(base + "/v1/respond",
                        {"question": "is there any sound ?"})
    assert status == 200 and isinstance(out["answer"], str)
    # unknown checkpoint -> client error, server stays up
    try:
        _post(base + "/admin/reload", {"model": "/no/such/prefix_best"})
        assert False, "expected HTTP error"
    except urllib.error.HTTPError as e:
        assert e.code in (400, 500)
    status, _ = _get(base + "/healthz")
    assert status == 200


def test_metrics_endpoint_and_latency_stats(http_server):
    """GET /metrics speaks the Prometheus text format with counters
    consistent with /stats, and /stats carries a latency summary fed by
    the decode routes."""
    srv, base, feats = http_server
    # ensure at least one timed decode has happened in this fixture
    _post(base + "/v1/respond", {"question": "is there any sound ?"})
    code, stats = _get(base + "/stats")
    assert code == 200
    lat = stats["latency"]
    assert lat["count"] >= 1
    assert lat["mean_ms"] > 0 and lat["p50_ms"] > 0
    assert lat["p90_ms"] >= lat["p50_ms"]

    req = urllib.request.Request(base + "/metrics")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    lines = text.splitlines()
    metrics = {l.split(" ")[0]: l.split(" ")[1] for l in lines
               if l and not l.startswith("#") and "{" not in l.split(" ")[0]}
    assert int(metrics["mtn_requests_total"]) == stats["requests"]
    assert int(metrics["mtn_errors_total"]) == stats["errors"]
    assert int(metrics["mtn_launches_total"]) >= 1
    assert float(metrics["mtn_uptime_seconds"]) > 0
    assert int(metrics["mtn_request_latency_seconds_count"]) == lat["count"]
    assert float(metrics["mtn_request_latency_seconds_sum"]) > 0
    # histogram buckets are cumulative and end with +Inf == count
    buckets = [l for l in lines
               if l.startswith("mtn_request_latency_seconds_bucket")]
    counts = [int(l.rsplit(" ", 1)[1]) for l in buckets]
    assert counts == sorted(counts)
    assert 'le="+Inf"' in buckets[-1]
    assert counts[-1] == lat["count"]


def test_stream_endpoint_sse(http_server):
    """POST /v1/stream emits Server-Sent Events: one token per decoded
    word, then a done event whose answer equals the joined tokens (and,
    for this beam session streaming greedily, a real decode)."""
    srv, base, feats = http_server
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
    assert events, "no SSE events received"
    assert events[-1].get("done") is True
    tokens = [e["token"] for e in events[:-1]]
    assert all(isinstance(t, str) for t in tokens)
    assert events[-1]["answer"] == " ".join(tokens)
    # greedy semantics: the same request streamed twice is identical
    with urllib.request.urlopen(urllib.request.Request(
            base + "/v1/stream", data=req.data,
            headers={"Content-Type": "application/json"},
            method="POST"), timeout=300) as r:
        again = [json.loads(l.decode().strip()[len("data: "):])
                 for l in r if l.decode().strip().startswith("data: ")]
    assert again == events


def test_stream_endpoint_rejects_bad_style(http_server):
    srv, base, _ = http_server
    try:
        _post(base + "/v1/stream", {"question": "x", "style": "beam"})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_admin_token_gate(served):
    """With --admin-token set, /admin/* requires the bearer token (even
    from loopback); /v1/* stays open."""
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.serve_http import start_server
    prefix, feats = served
    session = ServingSession.from_checkpoint(
        prefix + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                       turn_batch=2))
    srv = start_server(session, port=0, admin_token="sekrit")
    base = "http://%s:%d" % srv.server_address
    try:
        try:
            _post(base + "/admin/reload", {})
            assert False, "expected 400 without token"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        req = urllib.request.Request(
            base + "/admin/reload", data=b"{}",
            headers={"Authorization": "Bearer sekrit"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            assert json.loads(r.read())["ok"] is True
        status, out = _post(base + "/v1/respond",
                            {"question": "is there any sound ?"})
        assert status == 200
    finally:
        srv.close()


def test_drain_and_resume(http_server):
    """POST /admin/drain: /v1/* and /healthz go 503 (in-flight requests
    finish; stats/metrics/admin stay up) until {"resume": true}."""
    srv, base, _ = http_server
    try:
        status, out = _post(base + "/admin/drain", {})
        assert (status, out["draining"]) == (200, True)
        for url, post_body in ((base + "/healthz", None),
                               (base + "/v1/respond", {"question": "x"}),
                               (base + "/v1/stream", {"question": "x"})):
            try:
                if post_body is None:
                    _get(url)
                else:
                    _post(url, post_body)
                assert False, f"expected 503 for {url}"
            except urllib.error.HTTPError as e:
                assert e.code == 503
        # observability stays up while draining
        code, stats = _get(base + "/stats")
        assert code == 200 and stats["draining"] is True
        assert stats["rejected"] >= 2
        assert "mtn_draining 1" in _get_text(base + "/metrics")
    finally:
        status, out = _post(base + "/admin/drain", {"resume": True})
    assert (status, out["draining"]) == (200, False)
    assert _get(base + "/healthz") == (200, {"ok": True})
    code, out = _post(base + "/v1/respond",
                      {"question": "is there any sound ?"})
    assert code == 200 and isinstance(out["answer"], str)


def _get_text(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read().decode()


def test_overload_maps_to_503_with_retry_after(http_server):
    """A ServerOverloaded from the serving layer becomes 503 +
    Retry-After and counts as rejected, not as an error."""
    from mtn_tpu.serve import ServerOverloaded
    srv, base, _ = http_server

    def overloaded(req):
        raise ServerOverloaded("decode queue full (1 requests waiting)")

    srv.respond_one = overloaded  # shadow the bound method
    try:
        before = srv.stats()
        try:
            _post(base + "/v1/respond", {"question": "x"})
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"] == "1"
            assert "queue full" in json.loads(e.read())["error"]
        after = srv.stats()
        assert after["rejected"] == before["rejected"] + 1
        assert after["errors"] == before["errors"]
    finally:
        del srv.respond_one  # restore the class method
    code, out = _post(base + "/v1/respond",
                      {"question": "is there any sound ?"})
    assert code == 200


def test_checkpoint_watcher_hot_reloads(served, tmp_path):
    """start_watcher polls the model arg's resolution and hot-reloads
    when a new best epoch lands — the serve-a-live-training-run loop."""
    import os
    import shutil
    import time

    import jax
    import jax.numpy as jnp
    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import ServingSession
    from mtn_tpu.serve_http import start_server, start_watcher
    from mtn_tpu.train.schedule import make_optimizer
    from mtn_tpu.train.trainer import TrainState
    from mtn_tpu.utils.checkpoint import CheckpointManager

    prefix, feats = served
    exp2 = tmp_path / "exp_watch"
    shutil.copytree(os.path.dirname(prefix), exp2)
    prefix2 = str(exp2 / os.path.basename(prefix))

    session = ServingSession.from_checkpoint(
        prefix2 + "_best", DecodeConfig(maxlen=6, beam=2, nbest=2,
                                        turn_batch=2))
    srv = start_server(session, port=0)
    try:
        assert session.epoch == 1
        stop = start_watcher(srv, interval_s=0.1)
        # a better-val-loss epoch 2 appears (as a training run would save)
        bumped = jax.tree.map(lambda p: p + 0.01, session.params)
        opt = make_optimizer(session.model_cfg.d_model, 10)
        state = TrainState(params=bumped, opt_state=opt.init(bumped),
                           step=jnp.zeros((), jnp.int32))
        CheckpointManager(prefix2).save(2, state, val_loss=-1e9)
        deadline = time.time() + 120
        while session.epoch != 2 and time.time() < deadline:
            time.sleep(0.1)
        assert session.epoch == 2, "watcher did not pick up epoch 2"
        for a, b in zip(jax.tree.leaves(session.params),
                        jax.tree.leaves(bumped)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert srv.stats()  # server still healthy
        stop.set()
    finally:
        srv.close()


def test_respond_nbest_over_http(http_server):
    """'nbest': k returns the ranked hypotheses; invalid k is a 400."""
    srv, base, _ = http_server
    code, out = _post(base + "/v1/respond",
                      {"question": "is there any sound ?", "nbest": 2})
    assert code == 200
    assert out["nbest"][0] == {"answer": out["answer"],
                               "score": out["score"]}
    assert 1 <= len(out["nbest"]) <= 2
    # without nbest (or nbest=1) the field is absent — wire-compatible
    code, plain = _post(base + "/v1/respond",
                        {"question": "is there any sound ?"})
    assert "nbest" not in plain
    # batch form takes a top-level nbest
    code, bout = _post(base + "/v1/respond_batch",
                       {"requests": [{"question": "is it raining ?"}],
                        "nbest": 2})
    assert code == 200 and "nbest" in bout["results"][0]
    try:
        _post(base + "/v1/respond", {"question": "x", "nbest": 0})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_http_cli_main_end_to_end(served):
    """python -m mtn_tpu.serve_http boots from a checkpoint with
    --warmup, announces its address, serves, and exits 0 on SIGINT —
    the deployment surface as a real process."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time

    prefix, feats = served
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "mtn_tpu.serve_http",
         "--model", prefix + "_best", "--host", "127.0.0.1", "--port", "0",
         "--beam", "2", "--nbest", "2", "--maxlen", "6",
         "--turn-batch", "2", "--warmup", "--max-queue", "64"],
        cwd=root, stderr=subprocess.PIPE, text=True)
    base = None
    try:
        deadline = time.time() + 600
        warmed = False
        for line in proc.stderr:
            warmed |= "warmup" in line
            m = re.search(r"serving .* on (http://[0-9.]+:[0-9]+)", line)
            if m:
                base = m.group(1)
                break
            assert time.time() < deadline, "server never announced"
        assert base, "server exited before announcing its address"
        assert warmed, "--warmup did not run before the socket opened"
        code, out = _post(base + "/v1/respond",
                          {"question": "is there any sound ?", "nbest": 2})
        assert code == 200 and isinstance(out["answer"], str)
        assert len(out["nbest"]) >= 1
        assert _get(base + "/healthz") == (200, {"ok": True})
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            rc = proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
    assert rc == 0


def test_setup_logging_wins_over_import_side_effects():
    """Importing orbax (via the serve_http -> serve -> beam -> quantize
    -> mtn_tpu.utils chain) installs a root StreamHandler at import
    time; a plain basicConfig after that is a silent no-op, which once
    made the serve_http CLI boot without EVER logging (root stuck at
    WARNING — no restore lines, no announce line; the e2e test above
    deadlocked waiting for it). setup_logging(force=True) must win
    regardless of import order."""
    import logging

    import mtn_tpu.serve_http  # noqa: F401  (the import chain at issue)
    from mtn_tpu.cli.common import setup_logging
    setup_logging(0)
    root = logging.getLogger()
    assert root.getEffectiveLevel() <= logging.INFO
    assert len(root.handlers) == 1


def test_deadline_ms_over_http(http_server):
    """'deadline_ms' in the request body: an already-hopeless budget is
    shed with 504 before device work; a generous one serves normally;
    bad values are 400; sheds land on the 'expired' stat, not errors."""
    srv, base, feats = http_server
    _, stats0 = _get(base + "/stats")
    try:
        _post(base + "/v1/respond", {"question": "is there any sound ?",
                                     "deadline_ms": 0.01})
        assert False, "expected 504"
    except urllib.error.HTTPError as e:
        assert e.code == 504
    code, out = _post(base + "/v1/respond",
                      {"question": "is there any sound ?",
                       "deadline_ms": 600000})
    assert code == 200 and isinstance(out["answer"], str)
    try:
        _post(base + "/v1/respond", {"question": "x ?", "deadline_ms": -5})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    _, stats1 = _get(base + "/stats")
    assert stats1["expired"] >= stats0["expired"] + 1
    assert stats1["errors"] == stats0["errors"] + 1  # only the 400
    assert "mtn_expired_total" in _get_text(base + "/metrics")


def test_respond_batch_mixed_deadlines_per_row(http_server):
    """ADVICE r4: a mixed batch must shed ONLY the expired rows — the
    live row gets its answer (200), the expired row comes back as a
    per-row {"error", "code": 504} entry, and an all-expired batch is a
    whole-call 504 (matching /v1/respond)."""
    srv, base, feats = http_server
    _, stats0 = _get(base + "/stats")
    code, out = _post(base + "/v1/respond_batch", {"requests": [
        {"question": "is there any sound ?", "deadline_ms": 600000},
        {"question": "what is he doing ?", "deadline_ms": 0.01},
    ]})
    assert code == 200
    rows = out["results"]
    assert isinstance(rows[0]["answer"], str) and "error" not in rows[0]
    assert rows[1]["code"] == 504 and "answer" not in rows[1]
    try:
        _post(base + "/v1/respond_batch", {"requests": [
            {"question": "x ?", "deadline_ms": 0.01},
            {"question": "y ?", "deadline_ms": 0.01}]})
        assert False, "expected 504"
    except urllib.error.HTTPError as e:
        assert e.code == 504
    _, stats1 = _get(base + "/stats")
    assert stats1["expired"] >= stats0["expired"] + 3
    assert stats1["errors"] == stats0["errors"]

    # lock path (no AsyncServer): same per-row law via respond_many
    import time as _time
    from mtn_tpu.serve import DeadlineExceeded, Request
    saved = srv.async_server
    srv.async_server = None
    try:
        live = Request(question="is there any sound ?")
        dead = Request(question="x ?", deadline=_time.monotonic() - 1)
        got = srv.respond_many([dead, live])
        assert isinstance(got[0], DeadlineExceeded)
        assert isinstance(got[1][0], str)
        with pytest.raises(DeadlineExceeded):
            srv.respond_many([dead, dead])
    finally:
        srv.async_server = saved


def test_rank_endpoint(http_server):
    """POST /v1/rank: the VisDial-style discriminative mode over HTTP."""
    srv, base, feats = http_server
    body = {"question": "what is he doing ?",
            "caption": "a man sits on a couch",
            "candidates": ["he sits on the couch", "a dog walks", "yes"]}
    code, out = _post(base + "/v1/rank", body)
    assert code == 200
    got = out["candidates"]
    assert [g["answer"] for g in got] == body["candidates"]
    scores = [g["logp"] for g in got]
    assert all(isinstance(s, float) for s in scores)
    # ranks consistent with scores (1-indexed, strictly-higher outranks)
    for i, g in enumerate(got):
        assert g["rank"] == 1 + sum(1 for j, s in enumerate(scores)
                                    if j != i and s > scores[i])
    # matches the session API exactly
    from mtn_tpu.serve import Request
    direct = srv.session.rank(
        Request(question=body["question"], caption=body["caption"]),
        body["candidates"])
    assert scores == pytest.approx([s for _, s, _ in direct])
    # validation: missing/empty candidates and bad include_eos -> 400
    for bad in ({"question": "hi ?"},
                {"question": "hi ?", "candidates": []},
                {"question": "hi ?", "candidates": ["ok"],
                 "include_eos": "yes"}):
        try:
            code, _ = _post(base + "/v1/rank", bad)
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400, bad
