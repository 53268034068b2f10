"""Sharding rules: parameter partition specs + batch constraints.

Tensor-parallel layout (Megatron-style column→row pairing so each
attention/FFN block needs exactly one reduce over ``model``):

- attention q/k/v projections: output (head) dim sharded — heads split
  across ``model``; the output projection ``w_o`` is row-sharded so its
  matmul reduces the partial sums;
- FFN ``w_1`` column-sharded, ``w_2`` row-sharded;
- embeddings vocab-sharded; the generator projection vocab-sharded on the
  output (the log-softmax reduction is handled by GSPMD);
- everything else (norms, biases of row-sharded layers) replicated.

Data parallelism: the batch leading axis is sharded over ``data``; since
parameters are replicated over ``data``, GSPMD emits the gradient psum
over ICI automatically.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_rules() -> List[Tuple[str, P]]:
    return [
        (r"lut/embedding$", P("model", None)),
        (r"generator.*proj/kernel$", P(None, "model")),
        (r"generator.*proj/bias$", P("model")),
        (r"(w_q|w_k|w_v)/kernel$", P(None, "model")),
        (r"(w_q|w_k|w_v)/bias$", P("model")),
        (r"w_o/kernel$", P("model", None)),
        (r"w_1/kernel$", P(None, "model")),
        (r"w_1/bias$", P("model")),
        (r"w_2/kernel$", P("model", None)),
        (r"vid_encoder.*proj/kernel$", P(None, "model")),
        (r"vid_encoder.*proj/bias$", P("model")),
        # weight-only int8 trees (utils/quantize.py): the int8 kernels
        # match the kernel rules above unchanged; their per-output-
        # channel scales follow the kernel's OUTPUT axis — sharded over
        # `model` for column-parallel kernels, replicated (default) for
        # the row-parallel w_o/w_2 whose output axis is unsharded.
        (r"generator.*proj/kernel_scale$", P("model")),
        (r"(w_q|w_k|w_v)/kernel_scale$", P("model")),
        (r"w_1/kernel_scale$", P("model")),
        (r"vid_encoder.*proj/kernel_scale$", P("model")),
    ]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


class Shardings:
    """Maps parameter/optimizer/batch pytrees to NamedShardings."""

    def __init__(self, mesh: Mesh, rules: List[Tuple[str, P]] = None):
        self.mesh = mesh
        self.rules = rules if rules is not None else default_rules()
        self._compiled = [(re.compile(pat), spec) for pat, spec in self.rules]
        self.model_size = mesh.shape.get("model", 1)

    def spec_for(self, path_str: str, leaf) -> P:
        ndim = getattr(leaf, "ndim", 0)
        if self.model_size > 1:
            for pat, spec in self._compiled:
                if not pat.search(path_str) or len(spec) > ndim:
                    continue
                # apply only when every sharded dim divides evenly
                if all(name is None or leaf.shape[axis] % self.model_size == 0
                       for axis, name in enumerate(spec)):
                    return spec
        return P()

    def tree_specs(self, tree) -> Any:
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: self.spec_for(_path_str(path), leaf), tree)

    def tree_shardings(self, tree) -> Any:
        return jax.tree.map(lambda spec: NamedSharding(self.mesh, spec),
                            self.tree_specs(tree))

    def shard_state(self, state):
        """device_put a TrainState according to the rules.

        Multi-process: plain device_put would require cross-host device
        transfers; instead every process contributes its local slab of
        each (replicated or within-host-sharded) array."""
        if jax.process_count() > 1:
            return jax.tree.map(self._make_global, state,
                                self.tree_shardings(state))
        return jax.device_put(state, self.tree_shardings(state))

    @staticmethod
    def _make_global(x, sharding):
        """Assemble a global jax.Array from this process's slab of ``x``
        (the full host value). Assumes each dim's addressable shards are
        contiguous — true for make_mesh layouts (processes contiguous
        along ``data``; ``model`` groups within-host)."""
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(sharding, x,
                                                          x.shape)
        spans = list(
            sharding.addressable_devices_indices_map(x.shape).values())
        slices = []
        for d in range(x.ndim):
            lo = min((idx[d].start or 0) for idx in spans)
            hi = max(x.shape[d] if idx[d].stop is None else idx[d].stop
                     for idx in spans)
            slices.append(slice(lo, hi))
        return jax.make_array_from_process_local_data(
            sharding, x[tuple(slices)], x.shape)

    def batch_spec(self, leaf) -> P:
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return P()
        return P(*(("data",) + (None,) * (ndim - 1)))

    def constrain_batch(self, batch):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, self.batch_spec(x))), batch)

    def put_batch(self, batch):
        """Host→device transfer with the data-parallel layout.

        Single process: plain sharded ``device_put``. Multi-process
        (multihost.py): each host transfers only the rows its local
        devices own — per-host input sharding — and the global array is
        assembled with ``jax.make_array_from_process_local_data``.
        """
        if jax.process_count() > 1:
            return jax.tree.map(self._put_process_local, batch)
        return jax.device_put(
            batch, jax.tree.map(
                lambda x: NamedSharding(self.mesh, self.batch_spec(x)),
                batch))

    def _put_process_local(self, x):
        # batch_spec reads .ndim without materializing device arrays
        return self._make_global(
            x, NamedSharding(self.mesh, self.batch_spec(x)))

    def put_host_batch(self, hb, feature_dtype: str = "float32"):
        """Multi-process HostBatch → global DeviceBatch, host-side.

        Each process slices ITS data-parallel rows on the host (numpy)
        and uploads only that slab — true per-host input sharding with a
        single wire crossing per batch (multihost.py contract). The
        int8 feature transfer composes: quantization happens on host, so
        the bytes that cross the wire are the int8 slab; dequantization
        runs on the assembled global array."""
        from mtn_tpu.train.batch import (DeviceBatch, _dequant_int8,
                                         host_quant_int8)
        import jax.numpy as jnp

        def put(x):
            x = np.asarray(x)
            return self._make_global(
                x, NamedSharding(self.mesh, self.batch_spec(x)))

        cap = hb.cap
        if cap is None:  # device_batch's all-<blank> caption law
            cap = np.ones((hb.query.shape[0], 1), dtype=np.int32)
        if feature_dtype == "int8":
            from mtn_tpu.data.feature_cache import QuantFeature

            def wire(f):
                # a cached QuantFeature is already the int8 wire form
                return (f.q, f.scale) if isinstance(f, QuantFeature) \
                    else host_quant_int8(np.asarray(f))
            fts = tuple(_dequant_int8(put(q), put(s))
                        for q, s in map(wire, hb.fts))
        elif feature_dtype != "float32":
            fdt = jnp.dtype(feature_dtype)  # ml_dtypes numpy dtype
            fts = tuple(put(np.asarray(f).astype(fdt)) for f in hb.fts)
        else:
            fts = tuple(put(f) for f in hb.fts)
        return DeviceBatch(
            query=put(hb.query), his=put(hb.his), cap=put(cap),
            answer_in=put(hb.answer_in), answer_out=put(hb.answer_out),
            fts=fts, fts_len=tuple(put(l) for l in hb.fts_len),
            valid=put(hb.valid))
