"""Capture profiler evidence for the MFU narrative (VERDICT r3 next #4).

Traces ONE train step and ONE fixed-scan beam-decode dispatch at the
flagship bench shapes with jax.profiler, parses the captured xplane
directly (jax.profiler.ProfileData — tensorboard not required), and
emits per-kernel tables: top kernels by total device time, device busy
vs wall time, and the inter-kernel gap fraction. Round 3's BENCH.md
claimed the decode headroom was "inter-kernel gaps, not slow kernels";
this capture REFUTED that — both programs run >99.6% device-busy, the
profile is a long tail of small fully-packed kernels (BENCH.md
"Profiler capture" has the tables and the corrected narrative).

Usage: python scripts/profile_step.py [outdir] [--keep-trace]
Prints a markdown table to stdout plus one JSON summary line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURN_BATCH, BEAM, MAXLEN, NBEST = 32, 5, 30, 5
SHAPES = dict(Lq=32, Lh=128, Lc=64, La=24, T=(64, 32))
TOP_K = 18


def _device_plane_lines(pd):
    """Yield (plane_name, line_name, events) for device-side planes."""
    for plane in pd.planes:
        name = plane.name
        if not ("TPU" in name or "GPU" in name or "device" in name.lower()):
            continue
        for line in plane.lines:
            yield name, line.name, list(line.events)


def _fallback_cpu_lines(pd):
    """CPU runs have no device plane; use the XLA client thread lines."""
    for plane in pd.planes:
        if ":CPU" in plane.name:
            for line in plane.lines:
                if "XLA" in line.name or "Cpu" in line.name:
                    yield plane.name, line.name, list(line.events)


def analyze(trace_dir: str, label: str):
    import jax

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise RuntimeError(f"no xplane capture under {trace_dir}")
    pd = jax.profiler.ProfileData.from_file(files[0])
    picked = list(_device_plane_lines(pd)) or list(_fallback_cpu_lines(pd))
    if not picked:
        raise RuntimeError(
            "no device or XLA plane in the capture; planes: "
            + ", ".join(p.name for p in pd.planes))

    def union_ns(events):
        """Busy time as the UNION of event intervals. Async ops (e.g.
        copy-start prefetches) overlap each other and the compute
        stream, so summing durations double-counts — a duration-sum
        'busy' can exceed the span several-fold."""
        ivs = sorted((e.start_ns, e.start_ns + e.duration_ns)
                     for e in events)
        total = 0
        cur_s, cur_e = None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            total += cur_e - cur_s
        return total

    # the per-op compute stream is the "XLA Ops" line; "Async XLA Ops"
    # holds overlapping prefetch copies, and "Steps"/"XLA Modules" are
    # envelope lines with one event spanning the whole dispatch
    ops = [t for t in picked if t[1] == "XLA Ops"] \
        or [t for t in picked
            if "module" not in t[1].lower() and t[1] != "Steps"]
    plane_name, line_name, events = max(ops or picked,
                                        key=lambda t: union_ns(t[2]))
    events = sorted(events, key=lambda e: e.start_ns)
    # while/conditional envelopes span their children; counting them
    # would report 0% gap for any scan-shaped program by construction
    kernels = [e for e in events
               if not e.name.lstrip("%").startswith(("while", "condition"))]
    total_busy = union_ns(kernels)
    wall = (events[-1].start_ns + events[-1].duration_ns
            - events[0].start_ns) if events else 0
    per_op = {}
    for e in kernels:
        d = per_op.setdefault(e.name.split(" = ")[0].lstrip("%"), [0, 0])
        d[0] += e.duration_ns
        d[1] += 1
    top = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:TOP_K]
    print(f"\n### {label} — plane `{plane_name}`, line `{line_name}`")
    print(f"\n| kernel | calls | total µs | % of busy |")
    print("|---|---|---|---|")
    for name, (ns, cnt) in top:
        print(f"| `{name[:60]}` | {cnt} | {ns / 1e3:.0f} | "
              f"{100 * ns / max(total_busy, 1):.1f} |")
    gap = 1.0 - total_busy / wall if wall else 0.0
    print(f"\nbusy {total_busy / 1e6:.2f} ms of {wall / 1e6:.2f} ms span "
          f"-> **gap fraction {100 * gap:.1f}%** "
          f"({len(kernels)} kernel launches)")
    return {"label": label, "busy_ms": round(total_busy / 1e6, 3),
            "span_ms": round(wall / 1e6, 3),
            "gap_frac": round(gap, 4), "launches": len(kernels),
            "top_kernel": top[0][0][:60] if top else None}


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("-") else tempfile.mkdtemp(prefix="mtnprof_")
    keep = "--keep-trace" in sys.argv

    import jax
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from mtn_tpu.config import DecodeConfig, TrainConfig
    from mtn_tpu.decode.beam import BeamDecoder
    from mtn_tpu.train.trainer import Trainer

    cfg = _flagship_cfg()
    rng = np.random.default_rng(0)
    db = _synthetic_batch(rng, B=TURN_BATCH, Lq=SHAPES["Lq"],
                          Lh=SHAPES["Lh"], Lc=SHAPES["Lc"],
                          La=SHAPES["La"], ft_sizes=cfg.ft_sizes,
                          T=SHAPES["T"])
    import jax.numpy as jnp
    trainer = Trainer(cfg, TrainConfig(batch_size=TURN_BATCH))
    state = trainer.init_state(jax.random.PRNGKey(0), db)
    rngk = jax.random.PRNGKey(1)
    # on-device params COPY for the beam: train_step donates its state
    # argument, so state.params buffers die at the warmup call below
    params = jax.tree.map(jnp.copy, state.params)
    # warmup (compile outside the trace); rebind state over the donation
    state, metrics = trainer.train_step(state, db, rngk)
    _ = np.asarray(metrics["loss"])

    dec = BeamDecoder(cfg, DecodeConfig(maxlen=MAXLEN, beam=BEAM,
                                        nbest=NBEST, early_stop=False))
    beam_c = dec._build_beam().lower(params, db).compile()
    _ = [np.asarray(x) for x in beam_c(params, db)]

    summaries = []
    for label, run in (
        ("train step (batch 32, flagship shapes)",
         lambda: np.asarray(trainer.train_step(state, db, rngk)[1]["loss"])),
        ("beam decode, fixed 30-step scan (turn_batch 32, beam 5)",
         lambda: [np.asarray(x) for x in beam_c(params, db)]),
    ):
        sub = os.path.join(outdir, label.split()[0])
        os.makedirs(sub, exist_ok=True)
        with jax.profiler.trace(sub):
            t0 = time.time()
            run()
            host_s = time.time() - t0
        s = analyze(sub, label)
        s["host_wall_ms"] = round(host_s * 1e3, 1)
        summaries.append(s)
    if not keep:
        shutil.rmtree(outdir, ignore_errors=True)
    else:
        print(f"\ntrace kept under {outdir}")
    print(json.dumps({"profiles": summaries}))


if __name__ == "__main__":
    main()
