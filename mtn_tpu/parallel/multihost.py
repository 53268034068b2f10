"""Multi-host (DCN) execution support.

The reference is strictly single-GPU (SURVEY.md §2.4). Here the exact
GSPMD train/decode programs of :mod:`mtn_tpu.parallel` run unchanged
across hosts: the mesh enumerates the *global* device set, the same
sharding rules apply, and the gradient psum GSPMD already inserts simply
crosses host boundaries — over DCN on a TPU pod, or over the CPU
backend's Gloo/TCP transport in the simulation tests.

Recommended layout (the TPU systems model): tensor parallelism inside a
host (ICI), data parallelism across hosts (DCN). ``make_mesh`` keeps the
``model`` axis fastest-varying, i.e. within-host, whenever ``mesh_model``
divides the per-host device count, so `--mesh-model 4 --mesh-data -1` on
a pod gives exactly that layout.

Per-host input sharding: ``Shardings.put_batch`` detects
``jax.process_count() > 1`` and assembles each global batch array from
process-local rows (``jax.make_array_from_process_local_data``), so each
host transfers only ``1/num_hosts`` of every batch.

Validated end-to-end by ``tests/test_multihost.py``: two OS processes
× 4 virtual CPU devices train over a global 8-device mesh with
cross-process gradient reduction and match the single-process run.
"""

from __future__ import annotations


def initialize(coordinator: str = "auto", num_processes: int = -1,
               process_id: int = -1):
    """Join a multi-process JAX runtime.

    ``coordinator="auto"`` self-detects on TPU pods (each host launched
    by the same job). Otherwise pass ``host:port`` of process 0 plus the
    process count and this process's id.
    """
    import jax
    if coordinator == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def initialize_from_flag(spec: str):
    """Parse the CLI ``--multihost`` flag: ``auto`` or
    ``coordinator_host:port,num_processes,process_id``."""
    if spec == "auto":
        initialize()
        return
    try:
        coord, nprocs, pid = spec.rsplit(",", 2)
        initialize(coord, int(nprocs), int(pid))
    except ValueError as e:
        raise ValueError(
            f"--multihost expects 'auto' or 'host:port,nprocs,procid', "
            f"got {spec!r}") from e
