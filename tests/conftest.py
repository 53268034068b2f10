"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: fake-mesh
CPU testing so the pjit/sharding paths are exercised without TPU hardware).
"""

import os
import sys

# The axon TPU plugin (injected via PYTHONPATH sitecustomize) routes ALL
# XLA compilation — including CPU — through a remote-compile tunnel with
# ~minutes of latency per compile. Tests are CPU-only by design, so if the
# plugin was registered at interpreter start, re-exec pytest with a clean
# environment (no sitecustomize, pure CPU backend).
if os.environ.get("_AXON_REGISTERED") and \
        not os.environ.get("MTN_TPU_TESTS_REEXEC"):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["MTN_TPU_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# float32 matmuls default to a bf16-like MXU path; tests check numerics
# against float64/torch oracles, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Synthetic DSTC7-format dataset + .npy features on disk."""
    from tests.fixtures import write_tiny_corpus
    root = tmp_path_factory.mktemp("corpus")
    return write_tiny_corpus(root)
