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
        self._pins: dict[int, dict] = {}  # per-window static layout pins
        self.last_dispatches = 0  # relay calls issued by the last run
        self._fwd = jax.jit(lambda p, b: self.spec.forward(p, b, prec))
        # Chained dispatch: several same-signature buckets per relay call
        # (one tuple arg) — divides the per-dispatch RTT floor by the
        # chain length. Retraces once per chain length.
        self._fwd_chain = jax.jit(
            lambda p, bs: tuple(self.spec.forward(p, b, prec) for b in bs)
        )

    def _make_batch(self, bucket: list[Graph]) -> tuple[dict, int]:
        """Window-aligned pack + production kernel layout for one bucket.

        Slot layouts pin their content-derived statics (slot depth,
        prefix caps) to the FIRST bucket's values so every bucket of a
        stream reuses one compiled program; a later bucket that exceeds a
        pin re-derives it (one extra compile, rare on homogeneous
        streams)."""
        window, block = choose_geometry(
            self.spec.name, max(g.num_nodes for g in bucket)
        )
        packed = None
        if not self.spec.needs_eigen and all(
            g.node_vn is None for g in bucket
        ):
            # Native C++ aligned packer (byte-identical; eigen/VN payloads
            # fall back to the NumPy path).
            from .native import load_library, pack_bucket_native

            if load_library() is not None:
                packed, consumed = pack_bucket_native(
                    bucket, self.caps[0], self.caps[1], self.caps[2],
                    window=window,
                )
                if consumed < len(bucket):  # shouldn't happen: bucketize
                    packed = None           # pre-sizes against capacity
        if packed is None:
            packed = pack_graphs_aligned(
                bucket,
                window=window,
                node_capacity=self.caps[0],
                edge_capacity=self.caps[1],
                graph_capacity=self.caps[2],
                with_eigen=self.spec.needs_eigen,
            )
        # Bench-policy mirror (round 5): the edge-featured models also
        # take the slot layout when the bucket fits the window (no
        # scatter matmul — measured faster); window-exceeding buckets
        # keep ELL + spill tail.
        blocked = self._blocked
        if blocked == "local_ell" and max(
            g.num_nodes for g in bucket
        ) <= window:
            blocked = "local_slots"
        kw = dict(self._pins.get(window, {})) if blocked == "local_slots" \
            else {}
        try:
            batch = as_batch(
                packed, blocked=blocked, window=window, block=block, **kw,
            )
            if kw and batch["slot_spill_mask"].any():
                # Under-pinned slot depth routed this bucket's deeper
                # in-degrees to the spill tail — re-derive instead
                # (keeps the megakernels engaged; one extra compile).
                raise ValueError("pinned slots overflowed")
        except ValueError:  # pins below this bucket's requirements
            kw = {}
            batch = as_batch(
                packed, blocked=blocked, window=window, block=block,
            )
        if blocked == "local_slots" and not kw:
            # (Re-)derive pins, merged monotonically with any previous
            # values so successive re-derivations only grow (stable
            # signatures on homogeneous streams).
            old = self._pins.get(window, {})
            pins: dict = {
                "slots": max(int(batch["slot_geom"].shape[-1]),
                             old.get("slots", 0)),
            }
            if "slot_pcap_0" in batch:
                import itertools

                caps = tuple(
                    int(batch[f"slot_pcap_{k}"].shape[-2])
                    for k in range(int(batch["slot_geom"].shape[-1]))
                )
                pins["prefix_caps"] = tuple(
                    max(c) for c in itertools.zip_longest(
                        caps, old.get("prefix_caps", ()), fillvalue=64,
                    )
                )
            self._pins[window] = pins
        # Transfer diet: the relay uploads every used jit-argument leaf
        # per call; the categorical feature arrays are small-vocab ints
        # (atom features ≤ 118, bond ≤ 12) — int8 quarters their upload.
        # Models promote against the int32 offset tables unchanged.
        batch["node_feat"] = batch["node_feat"].astype(np.int8)
        batch["edge_attr"] = np.asarray(batch["edge_attr"]).astype(np.int8)
        return batch, len(bucket)

    def _flush(self, bucket: list[Graph], set_id: int) -> np.ndarray:
        batch, n = self._make_batch(bucket)
        out = self._fwd(self.params[set_id], batch)
        return np.asarray(out)[:n, 0]

    def _bucketize(
        self, items: Iterable[tuple[Graph, int]]
    ) -> Iterator[tuple[list[Graph], int]]:
        """Group the item stream into capacity/weight-set buckets — a
        bucket closes when full or when the weight-set id changes (the
        bucket-granularity version of the per-graph reload flag,
        GIN/src/GIN_compute.cc:49-63)."""
        node_cap, edge_cap, graph_cap = self.caps

        def align_step(off: int, n: int, window: int) -> int:
            # Mirrors pack_graphs_aligned's first pass: a window-fitting
            # graph that would straddle a boundary advances to the next
            # window first.
            if n <= window:
                room = window - (off % window)
                if n > room:
                    off += room
            return off + n

        bucket: list[Graph] = []
        cur_set = None
        edges = 0
        aligned = 0  # aligned node rows consumed by the current bucket
        max_nodes = 0
        for g, set_id in items:
            g = registry.apply_transforms(self.spec, [g])[0]
            if set_id >= len(self.params) or set_id < 0:
                raise ValueError(f"unknown weight set {set_id}")
            new_max = max(max_nodes, g.num_nodes)
            window, _ = choose_geometry(self.spec.name, max(new_max, 1))
            if new_max > max_nodes and bucket:
                # Window may have bumped — recompute alignment from scratch.
                aligned = 0
                for gg in bucket:
                    aligned = align_step(aligned, gg.num_nodes, window)
            new_aligned = align_step(aligned, g.num_nodes, window)
            boundary = (
                cur_set is not None and set_id != cur_set
            ) or (
                new_aligned > node_cap
                or edges + g.num_edges > edge_cap
                or len(bucket) >= graph_cap
            )
            if boundary and bucket:
                yield bucket, cur_set
                bucket, edges, aligned, max_nodes = [], 0, 0, 0
                window, _ = choose_geometry(self.spec.name, g.num_nodes)
                new_aligned = align_step(0, g.num_nodes, window)
            bucket.append(g)
            cur_set = set_id
            aligned = new_aligned
            max_nodes = max(max_nodes, g.num_nodes)
            edges += g.num_edges
        if bucket:
            yield bucket, cur_set

    def run(
        self, items: Iterable[tuple[Graph, int]]
    ) -> Iterator[np.ndarray]:
        """Yield per-graph predictions in submission order (sequential:
        pack bucket i, run bucket i, read back, repeat)."""
        for bucket, set_id in self._bucketize(items):
            yield from self._flush(bucket, set_id)

    def run_pipelined(
        self,
        items: Iterable[tuple[Graph, int]],
        depth: int = 2,
        chain: int = 4,
        workers: int = 3,
    ) -> Iterator[np.ndarray]:
        """Sustained pipeline: ``workers`` threads pack buckets ahead
        while the device runs, up to ``chain`` consecutive same-signature
        same-weight-set buckets ride ONE relay dispatch (dividing the
        per-dispatch RTT floor by the chain length), and ``depth``
        dispatches stay in flight before the oldest is forced
        (VERDICT r4 #4).

        This is the TPU analog of the reference's in-kernel graph loading
        (GIN/src/load_inputs.cc:87-172 runs inside every timed enqueue,
        overlapped with compute by the dataflow) — host packing rides the
        device/relay shadow instead of serializing with it. Predictions
        still come back in submission order."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        from ..models.base import batch_signature

        it = self._bucketize(items)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            pack_q: collections.deque = collections.deque()

            def refill():
                # Keep enough packs queued that the workers are never
                # idle while the main thread waits on the device.
                while len(pack_q) < max(chain, workers + 1):
                    try:
                        bucket, sid = next(it)
                    except StopIteration:
                        return
                    pack_q.append(
                        (ex.submit(self._make_batch, bucket), sid)
                    )

            refill()
            self.last_dispatches = 0
            pend: collections.deque = collections.deque()

            def drain(limit):
                while len(pend) > limit:
                    outs, ns = pend.popleft()
                    for o, k in zip(outs, ns):
                        yield from np.asarray(o)[:k, 0]

            while pack_q:
                group: list = []
                ns: list = []
                gsid = gsig = None
                while pack_q and len(group) < chain:
                    fut, sid = pack_q[0]
                    if group and not fut.done():
                        # Adaptive chaining: never WAIT to grow a chain —
                        # dispatch what is ready (chains form when packing
                        # runs ahead of the device; a pack-bound stream
                        # degenerates to single dispatches instead of
                        # serializing behind chain assembly).
                        break
                    batch, n = fut.result()
                    sig = batch_signature(batch)
                    if group and (sid != gsid or sig != gsig):
                        break  # chain boundary (weight flip / new shape)
                    pack_q.popleft()
                    refill()
                    group.append(batch)
                    ns.append(n)
                    gsid, gsig = sid, sig
                outs = self._fwd_chain(
                    self.params[gsid], tuple(group)
                )  # async dispatch, one relay call for the whole chain
                self.last_dispatches += 1
                pend.append((outs, ns))
                yield from drain(depth)
            yield from drain(0)
