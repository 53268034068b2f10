#!/usr/bin/env python
"""Repo-root generation entry (run.sh stage 3 calls ``python generate.py``,
matching the reference driver, run.sh:156)."""

from mtn_tpu.cli.generate import main

if __name__ == "__main__":
    raise SystemExit(main())
