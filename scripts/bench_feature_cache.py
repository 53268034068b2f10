#!/usr/bin/env python
"""A/B the write-once feature-block disk cache (VERDICT r4 #6).

Measures the HOST-side cost the cache targets: full-epoch batch
materialization (feature .npy reads + padding + transfer-dtype
conversion) over the DSTC7-scale synthetic train split, for each
transfer dtype, uncached vs cached (epoch 1 = fill, epoch 2 = mmap
hit). This is a transport-independent host truth — no device, no
relay — exactly the work that runs concurrently with device compute in
stage 2 (the prefetch thread in data/pipeline.py). The reference
re-reads every video's features from disk every epoch with no cache at
all (data_handler.py:233).

Usage:  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/bench_feature_cache.py
        (expects data/ from scripts/make_synth_dstc7.py)

Prints a markdown table for docs/BENCH.md plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mtn_tpu.config import DataConfig  # noqa: E402
from mtn_tpu.data.batching import make_batch_indices  # noqa: E402
from mtn_tpu.data.dataset import load  # noqa: E402
from mtn_tpu.data.feature_cache import FeatureCache, QuantFeature  # noqa: E402
from mtn_tpu.data.pipeline import BatchIterator  # noqa: E402
from mtn_tpu.data.vocab import get_vocabulary  # noqa: E402


def epoch_time(data, plans, cfg, cache) -> float:
    """Wall seconds to materialize every batch once (no prefetch thread:
    we want the raw producer cost, not its overlap)."""
    it = BatchIterator(data, plans, cfg, train=True,
                       rng=np.random.default_rng(0), prefetch=0,
                       seed_key=(1, 0), feature_cache=cache)
    t0 = time.perf_counter()
    n = 0
    for hb in it:
        # touch the feature bytes like device upload would (mmap blocks
        # are lazy; an untouched mmap would undercount the cached cost)
        for ft in hb.fts:
            if isinstance(ft, QuantFeature):
                n += int(ft.q[..., -1].sum(dtype=np.int64))
                n += int(ft.scale[..., -1].sum())
            else:
                n += int(np.asarray(ft[..., -1]).sum(dtype=np.float64))
    return time.perf_counter() - t0


def dir_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--fea-type", nargs="+", default=["i3d_rgb", "vggish"])
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--transfers", nargs="+",
                    default=["float32", "int8"])
    args = ap.parse_args()

    root = args.data_root
    train_set = os.path.join(root, "train_set4DSTC7-AVSD.json")
    vocab = get_vocabulary(train_set, cutoff=5,
                           include_caption="caption,summary")
    fea_path = os.path.join(root, "<FeaType>/<ImageID>.npy")
    data = load(args.fea_type, fea_path, train_set, vocab,
                include_caption="caption,summary", separate_caption=True)
    plans, n = make_batch_indices(data, args.batch_size,
                                  max_length=args.max_length,
                                  separate_caption=True)
    print(f"# {n} samples, {len(plans)} batches, streams {args.fea_type}",
          file=sys.stderr)

    rows, blob = [], {}
    for transfer in args.transfers:
        cfg = DataConfig(
            fea_type=list(args.fea_type), train_path=fea_path,
            train_set=train_set, valid_path=fea_path, valid_set=train_set,
            include_caption="caption,summary", separate_caption=True,
            batch_size=args.batch_size, max_length=args.max_length,
            cut_a=True, feature_dtype=transfer)
        uncached = epoch_time(data, plans, cfg, None)
        cdir = tempfile.mkdtemp(prefix=f"ftcache_{transfer}_")
        try:
            cache = FeatureCache(cdir, transfer=transfer)
            fill = epoch_time(data, plans, cfg, cache)
            hit = epoch_time(data, plans, cfg, cache)
            size = dir_mb(cdir)
            assert cache.misses and cache.hits, cache.stats()
        finally:
            shutil.rmtree(cdir, ignore_errors=True)
        rows.append((transfer, uncached, fill, hit, size))
        blob[transfer] = {"uncached_s": round(uncached, 2),
                          "fill_s": round(fill, 2),
                          "hit_s": round(hit, 2),
                          "cache_mb": round(size, 1),
                          "speedup_hit": round(uncached / hit, 2)}
        print(f"# {transfer}: uncached {uncached:.1f}s fill {fill:.1f}s "
              f"hit {hit:.1f}s cache {size:.0f} MB", file=sys.stderr)

    print("| transfer | uncached epoch | fill epoch | cached epoch | "
          "cache size | speedup (cached) |")
    print("|---|---|---|---|---|---|")
    for tr, unc, fill, hit, size in rows:
        print(f"| {tr} | {unc:.1f} s | {fill:.1f} s | {hit:.1f} s | "
              f"{size:.0f} MB | {unc / hit:.2f}x |")
    print(json.dumps({"bench": "feature_cache", "batches": len(plans),
                      "modes": blob}))


if __name__ == "__main__":
    main()
