#!/usr/bin/env python
"""Repo-root training entry (run.sh stage 2 calls ``python train.py``,
matching the reference driver, run.sh:109)."""

from mtn_tpu.cli.train import main

if __name__ == "__main__":
    raise SystemExit(main())
