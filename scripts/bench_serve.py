"""Serving-latency benchmark on a trained checkpoint (real TPU).

Usage: python scripts/bench_serve.py <model_prefix[_best]> [n_iters]
           [--http] [--stream] [--int8]

Measures ServingSession end-to-end latency (host encode + upload + beam
+ download) for single interactive turns and a turn_batch-sized burst,
with the default DecodeConfig (early termination on) and with the fixed
30-step scan for comparison. With --http, additionally drives the
stdlib HTTP front-end (serve_http) over real sockets — single-turn p50
and 64 concurrent clients — to price the network layer vs the direct
AsyncServer path. With --stream, measures the token-streaming path:
time-to-first-token and per-token inter-arrival (each streamed step is
one device round-trip — the interactive-latency trade the batch
decoders don't pay). With --int8, re-runs the single-turn and async-64
measurements on a session built with feature_transfer="int8" (the
serving wire-format knob) for a same-process A/B against the default
f32 upload. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 20


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_http = "--http" in sys.argv[1:]
    do_stream = "--stream" in sys.argv[1:]
    do_int8 = "--int8" in sys.argv[1:]
    model_arg = args[0]
    iters = int(args[1]) if len(args) > 1 else N_ITERS

    from mtn_tpu.config import DecodeConfig
    from mtn_tpu.serve import Request, ServingSession

    rng = np.random.default_rng(0)

    def make_request(i):
        return Request(
            question=f"is there any sound in clip {i} ?",
            history=[("are there people ?", "yes there is a man"),
                     ("what is he doing ?", "he is reading a book")],
            caption="a man sits on a couch reading a book",
            features={"i3d_rgb": rng.standard_normal((64, 2048),
                                                     np.float32),
                      "vggish": rng.standard_normal((32, 128), np.float32)})

    out = {}
    for name, dcfg in [
            ("early", DecodeConfig(maxlen=30, beam=5, nbest=5)),
            ("fixed", DecodeConfig(maxlen=30, beam=5, nbest=5,
                                   early_stop=False))]:
        session = ServingSession.from_checkpoint(model_arg, decode_cfg=dcfg)
        # warm up with the measured request shape (a different history/
        # feature bucket would leave a compile inside the timed window)
        session.respond_batch([make_request(998)])
        lat = []
        for i in range(iters):
            t0 = time.time()
            _ = session.respond_batch([make_request(i)])
            lat.append(time.time() - t0)
        burst = [make_request(100 + j) for j in range(dcfg.turn_batch)]
        t0 = time.time()
        _ = session.respond_batch(burst)
        burst_sec = time.time() - t0
        out[f"p50_ms_{name}"] = round(1e3 * float(np.percentile(lat, 50)), 1)
        out[f"p90_ms_{name}"] = round(1e3 * float(np.percentile(lat, 90)), 1)
        out[f"burst{dcfg.turn_batch}_rps_{name}"] = round(
            dcfg.turn_batch / burst_sec, 1)

    # continuous batching under open load: 64 concurrent submissions
    # through AsyncServer (default early-stop config, turn_batch 16,
    # pipelined launches) vs the sequential single-turn p50 above
    from mtn_tpu.serve import AsyncServer
    session = ServingSession.from_checkpoint(
        model_arg, DecodeConfig(maxlen=30, beam=5, nbest=5))
    session.respond_batch([make_request(999)])             # compile
    srv = AsyncServer(session, max_in_flight=3, max_wait_ms=5)
    reqs = [make_request(200 + i) for i in range(64)]
    t0 = time.time()
    futs = [srv.submit(r) for r in reqs]
    _ = [f.result(timeout=600) for f in futs]
    sec = time.time() - t0
    srv.stop()
    out["async64_rps"] = round(64 / sec, 1)
    out["async64_launches"] = srv.launches

    if do_int8:
        # A/B the int8 feature wire format (~1/4 the upload bytes) on
        # the same paths: sequential single turns + async-64.
        s8 = ServingSession.from_checkpoint(
            model_arg, DecodeConfig(maxlen=30, beam=5, nbest=5),
            feature_transfer="int8")
        s8.respond_batch([make_request(998)])               # compile
        lat = []
        for i in range(iters):
            t0 = time.time()
            _ = s8.respond_batch([make_request(i)])
            lat.append(time.time() - t0)
        out["p50_ms_int8"] = round(1e3 * float(np.percentile(lat, 50)), 1)
        srv8 = AsyncServer(s8, max_in_flight=3, max_wait_ms=5)
        t0 = time.time()
        futs = [srv8.submit(r) for r in reqs]
        _ = [f.result(timeout=600) for f in futs]
        sec = time.time() - t0
        srv8.stop()
        out["async64_rps_int8"] = round(64 / sec, 1)
        out["async64_launches_int8"] = srv8.launches

    if do_stream:
        # token streaming: TTFT (prefix program + first step + fetch)
        # and steady per-token cost (one compiled step + one device
        # round-trip each). Beam sessions stream greedily.
        s2 = ServingSession.from_checkpoint(
            model_arg, DecodeConfig(maxlen=30, beam=5, nbest=5))
        for _ in s2.stream(make_request(996)):   # compile prefix+step
            pass
        ttft, total, ntok = [], [], 0
        for i in range(iters):
            t0 = time.time()
            first = None
            for _ in s2.stream(make_request(500 + i)):
                if first is None:
                    first = time.time() - t0
                ntok += 1
            total.append(time.time() - t0)
            ttft.append(first if first is not None else total[-1])
        out["stream_ttft_p50_ms"] = round(
            1e3 * float(np.percentile(ttft, 50)), 1)
        steps = max(1, ntok - len(ttft))  # exclude each turn's first token
        out["stream_ms_per_token"] = round(
            1e3 * (float(np.sum(total)) - float(np.sum(ttft))) / steps, 1)
        out["stream_total_p50_ms"] = round(
            1e3 * float(np.percentile(total, 50)), 1)

    if do_http:
        # price the HTTP layer: same checkpoint/session class behind the
        # stdlib server; features ship as base64 .npy (the compact form)
        import base64
        import io
        import threading
        import urllib.request

        from mtn_tpu.serve_http import start_server

        def to_json(req):
            def b64(a):
                buf = io.BytesIO()
                np.save(buf, a)
                return {"npy_b64": base64.b64encode(buf.getvalue()).decode()}
            return json.dumps({
                "question": req.question,
                "history": [list(t) for t in req.history],
                "caption": req.caption,
                "features": {k: b64(v) for k, v in req.features.items()},
            }).encode()

        def post(base, body):
            r = urllib.request.Request(
                base + "/v1/respond", data=body,
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(r, timeout=600) as resp:
                return json.loads(resp.read())

        http_session = ServingSession.from_checkpoint(
            model_arg, DecodeConfig(maxlen=30, beam=5, nbest=5))
        http_session.respond_batch([make_request(997)])    # compile
        # wider batching window than the direct path: HTTP request
        # parsing (JSON + base64 feature decode) serializes on the host
        # CPU, so co-riders arrive over tens of ms, not microseconds
        hsrv = start_server(http_session, port=0,
                            max_in_flight=3, max_wait_ms=40)
        base = "http://%s:%d" % hsrv.server_address
        lat = []
        for i in range(iters):
            body = to_json(make_request(300 + i))
            t0 = time.time()
            post(base, body)
            lat.append(time.time() - t0)
        out["http_p50_ms"] = round(1e3 * float(np.percentile(lat, 50)), 1)
        bodies = [to_json(make_request(400 + i)) for i in range(64)]
        errs = []

        def call(b):
            try:
                post(base, b)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        t0 = time.time()
        ts = [threading.Thread(target=call, args=(b,)) for b in bodies]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        sec = time.time() - t0
        hsrv.close()
        assert not errs, errs[:1]
        out["http64_rps"] = round(64 / sec, 1)
        out["http64_launches"] = hsrv.async_server.launches

    print(json.dumps(out))


if __name__ == "__main__":
    main()
