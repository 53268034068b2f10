"""Multi-host (DCN-style) execution: two OS processes, one global mesh.

The reference cannot do this at all (single GPU, no distributed
runtime). Validates the parallel/multihost.py contract: the unchanged
GSPMD dp train step runs over a mesh that spans process boundaries
(collectives over the CPU backend's Gloo transport standing in for
DCN), per-host input sharding transfers only local rows, and the
losses match the single-process mesh run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# end-to-end tier: deselect with -m 'not slow' (pyproject markers)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers_and_single(tmp_path, mesh_spec):
    """Two worker processes on mesh_spec + the same run single-process;
    returns (worker_losses_p0, worker_losses_p1, single_losses)."""
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"out_{mesh_spec}_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out,
             mesh_spec],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log
    results = [json.load(open(o)) for o in outs]

    from mtn_tpu.config import TrainConfig
    from mtn_tpu.parallel import Shardings, make_mesh
    from mtn_tpu.train.trainer import Trainer
    from tests.fixtures import tiny_model_cfg
    from tests.test_model import _random_batch
    import jax
    d, m = (int(v) for v in mesh_spec.split("x"))
    rng = np.random.default_rng(0)
    db = _random_batch(rng, B=8, ft_dims=(16, 8), vocab=32)
    mesh = make_mesh(data=d, model=m)
    sh = Shardings(mesh)
    cfg = tiny_model_cfg(32, (16, 8), dropout=0.0, d_model=8, d_ff=16)
    tr = Trainer(cfg, TrainConfig(warmup_steps=10), mesh=mesh, shardings=sh)
    gb = sh.put_batch(db)
    st = tr.init_state(jax.random.PRNGKey(0), gb)
    base = jax.random.PRNGKey(1)
    single = []
    for _ in range(3):
        st, mt = tr.train_step(st, gb, base)
        single.append(float(mt["loss"]))
    return results[0]["losses"], results[1]["losses"], single


def test_two_process_dp_matches_single_process(tmp_path):
    l0, l1, single = _run_workers_and_single(tmp_path, "8x1")
    # both hosts observe the identical (globally-reduced) loss sequence
    assert l0 == l1
    # and it matches the same training run on a single-process mesh
    np.testing.assert_allclose(l0, single, rtol=1e-5)


def test_two_process_dp_tp_matches_single_process(tmp_path):
    """dp across hosts × tp within host — the recommended pod layout
    (parallel/multihost.py): model-sharded params assemble per-process
    and the tp reduces stay intra-host while the gradient psum crosses
    the process boundary."""
    l0, l1, single = _run_workers_and_single(tmp_path, "4x2")
    assert l0 == l1
    np.testing.assert_allclose(l0, single, rtol=1e-5)


def test_cli_generate_two_processes(tiny_corpus, tmp_path):
    """Multi-host decode: turn batches shard across 2 processes, n-best
    results are allgathered, and the output JSON is byte-identical to
    the single-process run."""
    from mtn_tpu.cli.train import main as train_main
    prefix = str(tmp_path / "mtn")
    rc = train_main([
        "--fea-type", "none",
        "--train-set", tiny_corpus.train_set,
        "--valid-set", tiny_corpus.valid_set,
        "--include-caption", "caption,summary", "--separate-caption", "1",
        "--num-epochs", "1", "--batch-size", "8", "--max-length", "64",
        "--model", prefix, "--nb-blocks", "1", "--d-model", "16",
        "--d-ff", "32", "--att-h", "2", "--warmup-steps", "20",
        "--vocab-cutoff", "0", "--dtype", "float32",
        "--length-bucket", "8",
    ])
    assert rc == 0
    gen_args = [
        "--test-set", tiny_corpus.test_set,
        "--model", prefix + "_best",
        "--maxlen", "4", "--beam", "2", "--nbest", "2",
        "--decode-style", "beam_search",
        "--undisclosed-only", "1",
        "--turn-batch", "8", "--dtype", "float32",
    ]
    single_out = str(tmp_path / "single.json")
    from mtn_tpu.cli.generate import main as gen_main
    assert gen_main(gen_args + ["--output", single_out]) == 0

    port = _free_port()
    multi_out = str(tmp_path / "multi.json")
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "generate.py")] + gen_args
        + ["--output", multi_out, "--mesh-data", "8",
           "--multihost", f"localhost:{port},2,{pid}"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    assert json.load(open(multi_out)) == json.load(open(single_out))


def test_cli_train_two_processes(tiny_corpus, tmp_path):
    """The full train CLI under --multihost: both processes train the
    same trajectory (shared-filesystem layout), orbax checkpointing is
    collective, and only process 0 writes logs/sidecars."""
    port = _free_port()
    prefix = str(tmp_path / "mtn")
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--fea-type", "none",
             "--train-set", tiny_corpus.train_set,
             "--valid-set", tiny_corpus.valid_set,
             "--include-caption", "caption,summary",
             "--separate-caption", "1",
             "--num-epochs", "1", "--batch-size", "8",
             "--max-length", "64", "--model", prefix,
             "--nb-blocks", "1", "--d-model", "16", "--d-ff", "32",
             "--att-h", "2", "--warmup-steps", "20",
             "--vocab-cutoff", "0", "--dtype", "float32",
             "--length-bucket", "8", "--uniform-shapes", "1",
             "--prefetch", "0", "--report-interval", "2",
             "--multihost", f"localhost:{port},2,{pid}"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    # both processes report the identical globally-reduced epoch loss
    def epoch_loss(log):
        lines = [l for l in log.splitlines() if "train loss:" in l]
        assert lines, log[-4000:]
        return lines[-1].rsplit(":", 1)[1].strip()
    assert epoch_loss(logs[0]) == epoch_loss(logs[1])
    # primary-only artifacts exist and parse
    assert os.path.exists(prefix + ".conf.json")
    meta = json.load(open(os.path.join(prefix + "_ckpt", "meta.json")))
    assert meta["epochs"] == [1]
    assert len(open(prefix + "_train.csv").read().splitlines()) > 1


def test_cli_rank_two_processes(tiny_corpus, tmp_path):
    """Multi-host discriminative ranking: turn batches shard across 2
    processes, scores are allgathered, process 0 writes the output.
    Margin-aware comparison vs the single-process run (ranks/metrics
    identical; raw log-likelihoods drift ~1e-5 across device layouts —
    per-device shapes compile different fusions)."""
    from mtn_tpu.cli.train import main as train_main
    prefix = str(tmp_path / "mtn")
    rc = train_main([
        "--fea-type", "none",
        "--train-set", tiny_corpus.train_set,
        "--valid-set", tiny_corpus.valid_set,
        "--include-caption", "caption,summary", "--separate-caption", "1",
        "--num-epochs", "1", "--batch-size", "8", "--max-length", "64",
        "--model", prefix, "--nb-blocks", "1", "--d-model", "16",
        "--d-ff", "32", "--att-h", "2", "--warmup-steps", "20",
        "--vocab-cutoff", "0", "--dtype", "float32",
        "--length-bucket", "8",
    ])
    assert rc == 0
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_rank_candidates",
        os.path.join(REPO, "scripts", "make_rank_candidates.py"))
    mk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mk)
    cand_path = str(tmp_path / "cands.json")
    assert mk.main([tiny_corpus.lbl_test_set, cand_path, "--last",
                    "--num-options", "4", "--seed", "7"]) == 0
    rank_args = [
        "--test-set", tiny_corpus.test_set,
        "--model", prefix + "_best",
        "--candidates", cand_path,
        "--undisclosed-only", "1",
        "--turn-batch", "8", "--dtype", "float32",
    ]
    single_out = str(tmp_path / "single.json")
    from mtn_tpu.cli.rank import main as rank_main
    assert rank_main(rank_args + ["--output", single_out]) == 0

    port = _free_port()
    multi_out = str(tmp_path / "multi.json")
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [subprocess.Popen(
        [sys.executable, "-m", "mtn_tpu.cli.rank"] + rank_args
        + ["--output", multi_out, "--mesh-data", "8",
           "--multihost", f"localhost:{port},2,{pid}"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    single, multi = (json.load(open(f)) for f in (single_out, multi_out))
    assert single["metrics"] == multi["metrics"]
    for da, db in zip(single["dialogs"], multi["dialogs"]):
        for ta, tb in zip(da["dialog"], db["dialog"]):
            assert ta["gt_rank"] == tb["gt_rank"]
            assert np.allclose(ta["scores"], tb["scores"], atol=1e-4)
