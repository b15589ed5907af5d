"""Inference stream runner — the host-application layer (L2 analog).

Covers the reference's "workload-flexible" capability: one enqueue processes
a stream of graphs where the active weight set can change at any graph
boundary (the ``reload_weights`` flag walks a packed array of weight sets —
GIN/src/GIN_compute.cc:49-63, GIN/src/host.cc:133 sets it for g==1). The TPU
analog: graphs are packed into static buckets that never span a weight-set
boundary, and the jit'd forward (compiled once — all param sets share
shapes) is fed the bucket's param pytree. Weight "reload" is free: params
live in HBM and XLA streams them per op; there is no BRAM preload to
amortize.

Predictions come back in submission order, one float per task per graph
(the HLS_output.txt contract, GIN/src/host.cc:213-222).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np

from ..core.graphs import Graph, pack_graphs_aligned
from ..core.numerics import FLOAT32, Precision
from ..models import registry
from ..models.base import (
    as_batch, choose_geometry, prepare_params,
)


class InferenceStream:
    """Streaming runner for one model over (graph, weight_set_id) pairs.

    Buckets pack window-aligned and run the SAME graph-local Pallas
    layouts (ELL / dest-major slots, per-model tuned geometry) as bench.py
    and the CLI — the whole-model megakernels engage whenever nothing
    spills, so the reload_weights analog streams at production speed. The
    jit is compiled once per bucket SHAPE; every weight set shares it.
    """

    def __init__(
        self,
        model: str,
        param_sets: Sequence[dict],
        prec: Precision = FLOAT32,
        node_capacity: int = 4096,
        edge_capacity: int = 12288,
        graph_capacity: int = 256,
    ):
        import jax

        self.spec = registry.get(model)
        self.prec = prec
        self.caps = (node_capacity, edge_capacity, graph_capacity)
        self.params = [prepare_params(p, prec) for p in param_sets]
        self._blocked = (
            "local_slots" if model in ("pna", "gat", "dgn") else "local_ell"
        )
        self._fwd = jax.jit(lambda p, b: self.spec.forward(p, b, prec))

    def _make_batch(self, bucket: list[Graph]) -> tuple[dict, int]:
        """Window-aligned pack + production kernel layout for one bucket."""
        window, block = choose_geometry(
            self.spec.name, max(g.num_nodes for g in bucket)
        )
        packed = pack_graphs_aligned(
            bucket,
            window=window,
            node_capacity=self.caps[0],
            edge_capacity=self.caps[1],
            graph_capacity=self.caps[2],
            with_eigen=self.spec.needs_eigen,
        )
        return (
            as_batch(
                packed, blocked=self._blocked, window=window, block=block,
            ),
            len(bucket),
        )

    def _flush(self, bucket: list[Graph], set_id: int) -> np.ndarray:
        batch, n = self._make_batch(bucket)
        out = self._fwd(self.params[set_id], batch)
        return np.asarray(out)[:n, 0]

    def run(
        self, items: Iterable[tuple[Graph, int]]
    ) -> Iterator[np.ndarray]:
        """Yield per-graph predictions in submission order.

        A bucket is flushed when full or when the weight-set id changes —
        the bucket-granularity version of the per-graph reload flag.
        """
        node_cap, edge_cap, graph_cap = self.caps
        bucket: list[Graph] = []
        cur_set = None
        nodes = edges = 0
        for g, set_id in items:
            g = registry.apply_transforms(self.spec, [g])[0]
            if set_id >= len(self.params) or set_id < 0:
                raise ValueError(f"unknown weight set {set_id}")
            boundary = (
                cur_set is not None and set_id != cur_set
            ) or (
                nodes + g.num_nodes > node_cap
                or edges + g.num_edges > edge_cap
                or len(bucket) >= graph_cap
            )
            if boundary and bucket:
                yield from self._flush(bucket, cur_set)
                bucket, nodes, edges = [], 0, 0
            bucket.append(g)
            cur_set = set_id
            nodes += g.num_nodes
            edges += g.num_edges
        if bucket:
            yield from self._flush(bucket, cur_set)
