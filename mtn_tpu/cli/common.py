"""Shared CLI plumbing (flag surface parity with the reference CLIs)."""

from __future__ import annotations

import argparse
import logging


def add_logging_args(parser: argparse.ArgumentParser):
    parser.add_argument("--verbose", "-v", default=0, type=int,
                        help="verbose level")


def setup_logging(verbose: int):
    # force=True: importing orbax (e.g. via the decode/serving import
    # chain) installs a root StreamHandler at import time, which would
    # make a plain basicConfig a silent no-op — the root logger stays
    # at WARNING and every INFO line (checkpoint restore, the serving
    # announce line tests and operators wait for) vanishes. Observed as
    # a serve_http CLI that boots but never logs; force=True replaces
    # whatever import side effects installed.
    if verbose >= 1:
        logging.basicConfig(
            level=logging.DEBUG,
            format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: "
                   "%(message)s", force=True)
    else:
        logging.basicConfig(level=logging.INFO,
                            format="%(asctime)s %(levelname)s: %(message)s",
                            force=True)


def print_args(args: argparse.Namespace):
    for arg in vars(args):
        print(f"{arg}={getattr(args, arg)}")


def add_tpu_args(parser: argparse.ArgumentParser):
    """TPU-native knobs with no reference equivalent."""
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="compute dtype (params stay float32)")
    parser.add_argument("--mesh-data", default=-1, type=int,
                        help="data-parallel mesh axis size (-1: all devices)")
    parser.add_argument("--mesh-model", default=1, type=int,
                        help="tensor-parallel mesh axis size")
    parser.add_argument("--feature-transfer", default="",
                        choices=["", "bfloat16", "int8"],
                        help="host->device feature transfer precision "
                             "(default: the compute dtype; int8 ships "
                             "quantized features + f32 row scales and "
                             "dequantizes on device — for transfer-bound "
                             "hosts)")
    parser.add_argument("--length-bucket", default=32, type=int,
                        help="round text lengths up to this multiple")
    parser.add_argument("--feature-bucket", default=32, type=int,
                        help="round video frame counts up to this multiple")
    parser.add_argument("--prefetch", default=2, type=int,
                        help="host-side batch prefetch depth")
    parser.add_argument("--use-pallas-attention", default=0, type=int,
                        help="use the fused Pallas attention kernel on TPU "
                             "(opt-in: measured slower at flagship shapes, "
                             "wins only at long sequences — docs/BENCH.md)")
    parser.add_argument("--use-pallas-ffn", default=0, type=int,
                        help="use the fused Pallas FFN kernel on TPU "
                             "(opt-in: e2e-neutral at flagship shapes — "
                             "docs/BENCH.md)")
    parser.add_argument("--fused-decode-qkv", default=0, type=int,
                        help="fuse decode-time self-attention q/k/v into "
                             "one (D, 3D) GEMM (opt-in: same dot products "
                             "but not bitwise — docs/BENCH.md 'Decode QKV "
                             "fusion')")
    parser.add_argument("--profile-dir", default=None, type=str,
                        help="jax.profiler trace output directory")
    parser.add_argument("--nan-checks", default=0, type=int,
                        help="enable NaN debugging (slow)")


def make_mesh_from_args(args, batch_size: int = 0):
    import math

    import jax
    from mtn_tpu.parallel import Shardings, make_mesh
    n = len(jax.devices())
    if args.mesh_model <= 1 and (args.mesh_data in (-1, 1) or n == 1):
        if n == 1 or args.mesh_data == 1:
            return None, None  # single device: skip mesh machinery
    data = args.mesh_data
    if data == -1:
        data = n // max(args.mesh_model, 1)
    if batch_size > 0 and data > 1:
        # the batch axis must divide evenly over the data axis
        fit = math.gcd(batch_size, data)
        if fit != data and args.mesh_data != -1:
            logging.warning(
                "--mesh-data %d does not divide the batch size %d; "
                "using %d data-parallel devices", data, batch_size, fit)
        data = fit
    mesh = make_mesh(data=data, model=args.mesh_model)
    return mesh, Shardings(mesh)
