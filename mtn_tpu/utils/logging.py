"""Training logs with reference CSV schema parity (SURVEY.md §5).

- ``<model>_train.csv``: ``epoch,step,loss,tokens_per_sec``
  (train.py:185-187,47-48)
- ``<model>_trace.csv``: ``epoch,split,avg_loss`` (train.py:182-184,211-213)
- ``<model>_params.txt``: flag dump (train.py:169-172)

plus a structured JSONL metrics stream (``<model>_metrics.jsonl``) the
reference lacks.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Optional


import os


class CSVLogger:
    def __init__(self, path: str, header: str, resume: bool = False):
        self.path = path
        if not (resume and os.path.exists(path)):
            with open(path, "w") as f:
                f.write(header + "\n")

    def append(self, *fields):
        with open(self.path, "a") as f:
            f.write(",".join(str(x) for x in fields) + "\n")


class TraceLogger:
    """Per-model log bundle (train CSV, trace CSV, JSONL metrics).

    ``resume=True`` appends to existing logs instead of truncating them
    (the reference always restarts logs; we resume mid-training).
    """

    def __init__(self, model_prefix: str, resume: bool = False,
                 primary: bool = True):
        # primary=False (non-0 process of a multi-host run): no file IO —
        # the hosts share a filesystem on a pod and would clobber logs
        self.primary = primary
        if not primary:
            self.train_csv = CSVLogger(os.devnull,
                                       "epoch,step,loss,tokens_per_sec",
                                       resume=True)
            return
        self.train_csv = CSVLogger(model_prefix + "_train.csv",
                                   "epoch,step,loss,tokens_per_sec", resume)
        self.trace_csv = CSVLogger(model_prefix + "_trace.csv",
                                   "epoch,split,avg_loss", resume)
        self.jsonl_path = model_prefix + "_metrics.jsonl"
        if not (resume and os.path.exists(self.jsonl_path)):
            open(self.jsonl_path, "w").close()

    def train_step(self, epoch: int, step: int, loss: float,
                   tokens_per_sec: float):
        if not self.primary:
            return
        # reference writes loss in scientific notation (train.py:48)
        self.train_csv.append(epoch, step, "%e" % loss, tokens_per_sec)
        self.metric({"kind": "train_step", "epoch": epoch, "step": step,
                     "loss": loss, "tokens_per_sec": tokens_per_sec})

    def epoch(self, epoch: int, split: str, avg_loss: float):
        if not self.primary:
            return
        self.trace_csv.append(epoch, split, "%e" % avg_loss)
        self.metric({"kind": "epoch", "epoch": epoch, "split": split,
                     "avg_loss": avg_loss})

    def metric(self, record: dict):
        if not self.primary:
            return
        record = dict(record, time=time.time())
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")


def dump_params_txt(path: str, *cfgs: Any):
    """Flag dump, one ``name=value`` per line (train.py:169-172)."""
    with open(path, "w") as f:
        for cfg in cfgs:
            d = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) \
                else dict(cfg)
            for k, v in d.items():
                f.write(f"{k}={v}\n")
