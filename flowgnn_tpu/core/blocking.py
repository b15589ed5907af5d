"""Segment-sorted edge blocking — host-side layout for the Pallas SpMM path.

The reference builds a destination-partitioned CSR on the fly so its scatter
PEs accumulate conflict-free (2-pass degree count + prefix sum + scatter,
GIN/src/load_inputs.cc:87-172). The TPU equivalent prepared here:

  * edges stably sorted by receiver,
  * receivers partitioned into node *windows* of ``window`` rows,
  * each window's edge list padded to a multiple of ``block`` edges
    (pad lanes carry the in-window sentinel ``window``), at least one block
    per window,
  * a per-block window id array drives the kernel's output revisiting.

With this layout the scatter becomes a sequence of [block, window] one-hot
matmuls on the MXU (ops/pallas/spmm.py) — dense, conflict-free, and with the
same "private partition per compute unit" character as the reference's
``dest % EDGE_PARALLEL`` trick, only blocked for a systolic array instead of
striped for 4 FIFO PEs.

Capacity: every window wastes at most ``block-1`` lanes, so
``num_blocks = ceil(edge_capacity / block) + num_windows`` always suffices
and is static per (capacity, window, block) — jit sees one shape.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class EdgeBlocks:
    """Static-shape blocked edge layout (arrays sized num_blocks·block)."""

    perm: np.ndarray  # [P] int32 — index into the original edge axis
    valid: np.ndarray  # [P] bool — False for pad lanes
    v_local: np.ndarray  # [P] int32 — receiver − window_base; ``window`` for pads
    block_window: np.ndarray  # [num_blocks] int32 — window id per block
    window: int
    block: int

    @property
    def num_blocks(self) -> int:
        return int(self.block_window.shape[0])


def blocks_capacity(edge_capacity: int, num_nodes: int, window: int, block: int) -> int:
    num_windows = -(-num_nodes // window)
    return -(-edge_capacity // block) + num_windows


def build_edge_blocks(
    receivers: np.ndarray,
    num_nodes: int,
    edge_capacity: int,
    window: int = 128,
    block: int = 128,
) -> EdgeBlocks:
    """Build the blocked layout for one packed bucket.

    ``receivers`` is the full padded edge array; ``num_nodes`` counts the
    rows INCLUDING the trailing pad node, and edges targeting the pad node
    (row num_nodes-1) are dropped — its message is never read.
    """
    receivers = np.asarray(receivers)
    num_windows = -(-num_nodes // window)
    nblocks = blocks_capacity(edge_capacity, num_nodes, window, block)
    p = nblocks * block

    perm = np.zeros(p, np.int32)
    valid = np.zeros(p, np.bool_)
    v_local = np.full(p, window, np.int32)
    block_window = np.full(nblocks, num_windows - 1, np.int32)

    real = np.nonzero(receivers < num_nodes - 1)[0]
    order = real[np.argsort(receivers[real], kind="stable")]
    wids = receivers[order] // window

    out_lane = 0
    out_block = 0
    i = 0
    for w in range(num_windows):
        j = i
        while j < len(order) and wids[j] == w:
            j += 1
        cnt = j - i
        blocks_w = max(1, -(-cnt // block))
        for bi in range(blocks_w):
            block_window[out_block] = w
            lo = i + bi * block
            hi = min(i + (bi + 1) * block, j)
            k = hi - lo
            if k > 0:
                perm[out_lane : out_lane + k] = order[lo:hi]
                valid[out_lane : out_lane + k] = True
                v_local[out_lane : out_lane + k] = (
                    receivers[order[lo:hi]] - w * window
                )
            out_lane += block
            out_block += 1
        i = j
    # Remaining blocks are pure padding; park them on the last window so the
    # block_window array stays non-decreasing (keeps the first/last-block
    # logic in the kernel trivial).
    return EdgeBlocks(perm, valid, v_local, block_window, window, block)


def apply_blocking(
    blocks: EdgeBlocks,
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_attr: np.ndarray,
    pad_node: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialise the blocked edge order at pack time: edge arrays permuted
    into block layout, pad lanes pointing at the pad node. Models then run
    directly on the blocked order (it is just a reordering of the edge axis)
    and the scatter kernel needs no runtime permutation or masking — pad
    lanes carry the in-window sentinel, whose one-hot row is zero."""
    s = np.full(blocks.perm.shape[0], pad_node, np.int32)
    r = np.full(blocks.perm.shape[0], pad_node, np.int32)
    a = np.zeros((blocks.perm.shape[0], edge_attr.shape[1]), np.int32)
    val = blocks.valid
    s[val] = senders[blocks.perm[val]]
    r[val] = receivers[blocks.perm[val]]
    a[val] = edge_attr[blocks.perm[val]]
    return s, r, a


def segment_sum_blocked_reference(
    edge_values: np.ndarray, blocks: EdgeBlocks, num_nodes: int
) -> np.ndarray:
    """NumPy oracle of the blocked windowed segment-sum (for kernel tests)."""
    w, b = blocks.window, blocks.block
    num_windows = -(-num_nodes // w)
    out = np.zeros((num_windows * w,) + edge_values.shape[1:], np.float32)
    vals = edge_values[blocks.perm] * blocks.valid[:, None]
    for blk in range(blocks.num_blocks):
        base = int(blocks.block_window[blk]) * w
        for lane in range(b):
            p = blk * b + lane
            if blocks.valid[p]:
                out[base + blocks.v_local[p]] += vals[p]
    return out[:num_nodes]


@dataclasses.dataclass
class LocalBlocks:
    """Blocked layout for the graph-local fused kernel: edges whose endpoints
    share a node window (guaranteed for whole graphs under window-aligned
    packing) carry BOTH in-window endpoint indices, so gather and scatter run
    as one-hot matmuls against the window's VMEM-resident features. Edges
    crossing a window boundary (only graphs larger than the window) spill to
    a small COO tail handled by the plain XLA path."""

    u_local: np.ndarray  # [P] int32 (sentinel ``window`` on pad lanes)
    v_local: np.ndarray  # [P] int32
    block_window: np.ndarray  # [num_blocks] int32 non-decreasing
    edge_perm: np.ndarray  # [P] int32 into the original edge axis (pads → 0)
    valid: np.ndarray  # [P] bool
    spill: np.ndarray  # [S] int32 original-edge indices of spill edges
    window: int
    block: int

    @property
    def num_blocks(self) -> int:
        return int(self.block_window.shape[0])


def _auto_spill_capacity(size: int) -> int:
    """Auto-sized spill tail: ZERO lanes when nothing spills (lets models
    skip the per-layer spill stage entirely), else rounded up to 1024 so
    buckets of one stream share a compiled program."""
    return 0 if size == 0 else -(-int(size) // 1024) * 1024


def build_local_blocks(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    edge_capacity: int,
    window: int = 128,
    block: int = 128,
    spill_capacity: int = 8192,
) -> LocalBlocks:
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    real = receivers < num_nodes - 1  # row num_nodes-1 is the pad node
    local_mask = real & (senders // window == receivers // window)
    spill_idx = np.nonzero(real & ~local_mask)[0].astype(np.int32)
    if spill_idx.size > spill_capacity:
        raise ValueError(
            f"spill capacity {spill_capacity} < {spill_idx.size} crossing edges"
        )
    spill = np.zeros(spill_capacity, np.int32)
    spill[: spill_idx.size] = spill_idx
    spill_valid_count = spill_idx.size

    num_windows = -(-num_nodes // window)
    nblocks = blocks_capacity(edge_capacity, num_nodes, window, block)
    p = nblocks * block
    u_local = np.full(p, window, np.int32)
    v_local = np.full(p, window, np.int32)
    edge_perm = np.zeros(p, np.int32)
    valid = np.zeros(p, np.bool_)
    block_window = np.full(nblocks, num_windows - 1, np.int32)

    loc = np.nonzero(local_mask)[0]
    order = loc[np.argsort(receivers[loc], kind="stable")]
    wids = receivers[order] // window

    out_lane = out_block = i = 0
    for w in range(num_windows):
        j = i
        while j < len(order) and wids[j] == w:
            j += 1
        cnt = j - i
        for bi in range(max(1, -(-cnt // block))):
            block_window[out_block] = w
            lo, hi = i + bi * block, min(i + (bi + 1) * block, j)
            k = hi - lo
            if k > 0:
                idx = order[lo:hi]
                u_local[out_lane : out_lane + k] = senders[idx] - w * window
                v_local[out_lane : out_lane + k] = receivers[idx] - w * window
                edge_perm[out_lane : out_lane + k] = idx
                valid[out_lane : out_lane + k] = True
            out_lane += block
            out_block += 1
        i = j
    lb = LocalBlocks(
        u_local, v_local, block_window, edge_perm, valid, spill, window, block
    )
    lb.spill_count = spill_valid_count  # informational
    return lb


def build_local_blocks_ell(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    window: int = 128,
    block: int = 128,
    k_blocks: int | None = None,
    spill_capacity: int | None = None,
) -> LocalBlocks:
    """ELL variant of the graph-local layout: every window owns exactly
    ``k_blocks`` edge blocks, so the kernel grid is (num_windows, k_blocks)
    with *static* index maps — measured ~3× lower per-block overhead than the
    scalar-prefetch dynamic mapping (BENCH.md). Edges beyond a window's ELL
    capacity overflow to the spill tail together with window-crossing edges.

    ``spill_capacity=None`` (default) auto-sizes the tail to the actual
    spill count rounded up to a multiple of 1024 — and to ZERO lanes when
    nothing spills (the common case for window-aligned molecule packing),
    which lets the models skip the per-layer XLA spill reduction entirely.
    Buckets of one stream share a compiled program as long as their rounded
    spill sizes agree."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)

    # C++ fast path (runtime/packer.cc:fg_build_local_ell): identical output
    # (asserted by test_runtime.py), ~5× faster on 32k-node buckets (3.1 vs
    # 16.7 ms) than the per-window NumPy loop below, which stays as the
    # oracle and the no-toolchain fallback.
    import os as _os

    if _os.environ.get("FLOWGNN_NO_NATIVE", "0") != "1":
        try:
            from ..runtime.native import build_local_ell_native

            res = build_local_ell_native(
                senders, receivers, num_nodes, window, block, k_blocks
            )
        except Exception:
            res = None
        if res is not None:
            u_local, v_local, edge_perm, valid, spill_idx, k_native = res
            if spill_capacity is None:
                spill_capacity = _auto_spill_capacity(spill_idx.size)
            if spill_idx.size > spill_capacity:
                raise ValueError(
                    f"spill capacity {spill_capacity} < {spill_idx.size}"
                )
            spill = np.zeros(spill_capacity, np.int32)
            spill[: spill_idx.size] = spill_idx
            nw = -(-num_nodes // window)
            block_window = (
                np.arange(nw * k_native) // k_native
            ).astype(np.int32)
            lb = LocalBlocks(
                u_local, v_local, block_window, edge_perm, valid, spill,
                window, block,
            )
            lb.spill_count = int(spill_idx.size)
            lb.k_blocks = k_native
            return lb

    real = receivers < num_nodes - 1  # row num_nodes-1 is the pad node
    local_mask = real & (senders // window == receivers // window)

    num_windows = -(-num_nodes // window)
    if k_blocks is None:
        # Auto-size K from the 95th percentile of per-window local-edge
        # counts (denser tails overflow into the spill path); bounded so a
        # single dense window can't inflate every window's padding.
        counts = np.bincount(
            receivers[local_mask] // window, minlength=num_windows
        )
        p95 = float(np.percentile(counts, 95)) if counts.size else 0.0
        k_blocks = int(min(4, max(1, -(-p95 // block))))
    cap = k_blocks * block
    p = num_windows * cap
    u_local = np.full(p, window, np.int32)
    v_local = np.full(p, window, np.int32)
    edge_perm = np.zeros(p, np.int32)
    valid = np.zeros(p, np.bool_)

    loc = np.nonzero(local_mask)[0]
    order = loc[np.argsort(receivers[loc], kind="stable")]
    wids = receivers[order] // window

    spill_parts = [np.nonzero(real & ~local_mask)[0].astype(np.int32)]
    i = 0
    for w in range(num_windows):
        j = i
        while j < len(order) and wids[j] == w:
            j += 1
        take = min(j - i, cap)
        idx = order[i : i + take]
        base = w * cap
        u_local[base : base + take] = senders[idx] - w * window
        v_local[base : base + take] = receivers[idx] - w * window
        edge_perm[base : base + take] = idx
        valid[base : base + take] = True
        if j - i > take:  # overflow → spill
            spill_parts.append(order[i + take : j].astype(np.int32))
        i = j

    spill_idx = np.concatenate(spill_parts) if spill_parts else np.zeros(0, np.int32)
    if spill_capacity is None:
        spill_capacity = _auto_spill_capacity(spill_idx.size)
    if spill_idx.size > spill_capacity:
        raise ValueError(
            f"spill capacity {spill_capacity} < {spill_idx.size}"
        )
    spill = np.zeros(spill_capacity, np.int32)
    spill[: spill_idx.size] = spill_idx
    # block_window is the static mapping w = b // k_blocks (kept for
    # compatibility/debugging).
    block_window = (np.arange(num_windows * k_blocks) // k_blocks).astype(np.int32)
    lb = LocalBlocks(
        u_local, v_local, block_window, edge_perm, valid, spill, window, block
    )
    lb.spill_count = int(spill_idx.size)
    lb.k_blocks = k_blocks
    return lb


def build_local_slots(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    window: int = 512,
    slots: int = 8,
    spill_capacity: int | None = None,
):
    # Note: the spill tail feeds XLA segment-min/max, whose TPU lowering
    # compiles pathologically slowly with size — keep the tail small
    # (molecular graphs rarely overflow 8 in-edge slots).
    """Dest-major slot layout for multi-aggregator local kernels (PNA).

    Within each node window, every destination row owns up to ``slots``
    in-edge slots holding the *in-window source index* (sentinel ``window``
    when empty). Per slot the kernel builds one [W, W] one-hot gather, so
    min/max/sum/sum² all reduce DENSELY over the slot axis — the layout that
    makes PNA's running min/max (PNA/src/message_passing.cc:121-147) a TPU
    elementwise op instead of a scatter. In-degree overflow and
    window-crossing edges go to the spill tail.

    Returns (slot_src [NW·W, S] int32 — row v_padded's s-th in-edge source
    local index, sentinel ``window`` when empty —, spill [spill_capacity]
    int32, spill_count int, slot_edge [NW·W, S] int32 — the ORIGINAL edge
    index each slot holds, −1 when empty, so edge-featured models can lay
    their bond attrs slot-aligned at pack time). The per-dest-row
    orientation lets the kernels ride the table as extra lanes of the
    feature tile (exact small integers in the tile's dtype), so it costs
    NO extra DMA — a [R, 1]-shaped index input would be padded to full
    (8,128) tiles by the DMA engine, a measured ~128x inflation that
    dominated the slot kernels' runtime.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    real = receivers < num_nodes - 1
    local_mask = real & (senders // window == receivers // window)
    num_windows = -(-num_nodes // window)

    slot_src = np.full((num_windows * window, slots), window, np.int32)
    slot_edge = np.full((num_windows * window, slots), -1, np.int32)
    # Vectorized slot assignment (the per-edge Python loop dominated
    # bucket pack time — 75 µs/graph — once the host application
    # pipelined, round 5): each local edge's slot is its RANK among its
    # receiver's local in-edges in edge order. A stable sort by receiver
    # keeps ascending edge order within each group, so rank = position −
    # first-occurrence index; identical output to the original loop.
    loc = np.nonzero(local_mask)[0]
    order = loc[np.argsort(receivers[loc], kind="stable")]
    rv = receivers[order]
    rank = np.arange(rv.size) - np.searchsorted(rv, rv, side="left")
    ok = rank < slots
    slot_src[rv[ok], rank[ok]] = (
        senders[order[ok]] - (rv[ok] // window) * window
    )
    slot_edge[rv[ok], rank[ok]] = order[ok]
    overflow = np.sort(order[~ok])  # loop order = ascending edge index

    spill_idx = np.concatenate(
        [np.nonzero(real & ~local_mask)[0].astype(np.int32),
         np.asarray(overflow, np.int32)]
    ) if (overflow.size or (real & ~local_mask).any()) else np.zeros(
        0, np.int32
    )
    if spill_capacity is None:  # auto-size like build_local_blocks_ell
        spill_capacity = _auto_spill_capacity(spill_idx.size)
    if spill_idx.size > spill_capacity:
        raise ValueError(f"spill capacity {spill_capacity} < {spill_idx.size}")
    spill = np.zeros(spill_capacity, np.int32)
    spill[: spill_idx.size] = spill_idx
    return slot_src, spill, int(spill_idx.size), slot_edge
