"""Device-mesh construction.

The reference is single-GPU (SURVEY.md §2.4: no DP/TP/PP/NCCL anywhere);
here parallelism is a first-class component: a ``jax.sharding.Mesh`` with
``data`` (batch) and ``model`` (tensor) axes laid out over ICI. GSPMD
inserts all collectives (gradient psum over ``data``; activation
all-gathers / reduce-scatters over ``model``) from the sharding
annotations in :mod:`mtn_tpu.parallel.sharding` — no hand-written
NCCL-style communication.

PP/SP/EP are intentionally absent: the model (~d_model 512) fits one
chip many times over and sequence lengths are dialogue-scale, so neither
pipeline, sequence/context, nor expert parallelism has any work to do
(SURVEY.md §2.4); dp×tp covers the reference's entire capability surface
and beyond.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
