"""ctypes bindings for the native host runtime (runtime/packer.cc).

The shared library is built on first use with g++ -O3 and cached next to the
source; if the toolchain is unavailable the callers fall back to the NumPy
packer in core/graphs.py (same layout, same results — test_runtime.py checks
byte equality).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..core.features import NUM_ATOM_FEATURES, NUM_BOND_FEATURES
from ..core.graphs import Graph, PackedGraphs

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cc")
_LIB = os.path.join(_HERE, "libfgpacker.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_i32p = ctypes.POINTER(ctypes.c_int32)


def _as_i32p(arr: Optional[np.ndarray]):
    if arr is None:
        return None
    assert arr.dtype == np.int32 and arr.flags["C_CONTIGUOUS"]
    return arr.ctypes.data_as(_i32p)


def load_library(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native packer; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None and not rebuild:
            return _lib
        if rebuild or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", _LIB],
                    check=True,
                    capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                return None
        lib = ctypes.CDLL(_LIB)
        lib.fg_pack_bucket.restype = ctypes.c_int32
        lib.fg_pack_bucket_aligned.restype = ctypes.c_int32
        lib.fg_read_graph.restype = ctypes.c_int32
        lib.fg_build_local_ell.restype = ctypes.c_int32
        lib.fg_build_local_ell.argtypes = [
            _i32p, _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
        ]
        _lib = lib
        return _lib


def pack_bucket_native(
    graphs: list[Graph],
    node_capacity: int,
    edge_capacity: int,
    graph_capacity: int,
    window: int = 0,
) -> tuple[PackedGraphs, int]:
    """Pack as many of ``graphs`` as fit; returns (bucket, graphs_consumed).

    ``window`` > 0 packs window-ALIGNED (fg_pack_bucket_aligned — byte-
    identical to core/graphs.pack_graphs_aligned for graphs without
    eigen/VN payloads; test_runtime.py asserts it)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native packer unavailable")

    node_feat = np.concatenate([g.node_feat for g in graphs]).astype(np.int32)
    edge_index = np.concatenate([g.edge_index for g in graphs]).astype(np.int32)
    has_attr = graphs[0].edge_attr is not None
    edge_attr = (
        np.concatenate([g.edge_attr for g in graphs]).astype(np.int32)
        if has_attr
        else None
    )
    n_nodes = np.array([g.num_nodes for g in graphs], np.int32)
    n_edges = np.array([g.num_edges for g in graphs], np.int32)

    out_node_feat = np.empty((node_capacity + 1, NUM_ATOM_FEATURES), np.int32)
    out_node_graph = np.empty(node_capacity + 1, np.int32)
    out_senders = np.empty(edge_capacity, np.int32)
    out_receivers = np.empty(edge_capacity, np.int32)
    out_edge_attr = np.empty((edge_capacity, NUM_BOND_FEATURES), np.int32)
    out_n_node = np.empty(graph_capacity + 1, np.int32)
    out_n_edge = np.empty(graph_capacity + 1, np.int32)

    if window > 0:
        consumed = lib.fg_pack_bucket_aligned(
            _as_i32p(node_feat), _as_i32p(edge_index), _as_i32p(edge_attr),
            _as_i32p(n_nodes), _as_i32p(n_edges), len(graphs),
            node_capacity, edge_capacity, graph_capacity, window,
            _as_i32p(out_node_feat), _as_i32p(out_node_graph),
            _as_i32p(out_senders), _as_i32p(out_receivers),
            _as_i32p(out_edge_attr), _as_i32p(out_n_node),
            _as_i32p(out_n_edge),
        )
    else:
        consumed = lib.fg_pack_bucket(
            _as_i32p(node_feat), _as_i32p(edge_index), _as_i32p(edge_attr),
            _as_i32p(n_nodes), _as_i32p(n_edges), len(graphs),
            node_capacity, edge_capacity, graph_capacity,
            _as_i32p(out_node_feat), _as_i32p(out_node_graph),
            _as_i32p(out_senders), _as_i32p(out_receivers),
            _as_i32p(out_edge_attr), _as_i32p(out_n_node),
            _as_i32p(out_n_edge),
        )
    if consumed < 0:
        raise ValueError("first graph exceeds bucket capacity")
    packed = PackedGraphs(
        out_node_feat, out_node_graph, out_senders, out_receivers,
        out_edge_attr, out_n_node, out_n_edge, None,
    )
    return packed, int(consumed)


def read_graph_native(dataset_dir: str, index: int, with_attr: bool = True) -> Graph:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native reader unavailable")
    counts = np.zeros(2, np.int32)
    rc = lib.fg_read_graph(
        dataset_dir.encode(), index, _as_i32p(counts), None, None, None
    )
    if rc != 0:
        raise FileNotFoundError(f"graph {index} in {dataset_dir}: rc={rc}")
    n, e = int(counts[0]), int(counts[1])
    node_feat = np.empty((n, NUM_ATOM_FEATURES), np.int32)
    edge_index = np.empty((e, 2), np.int32)
    edge_attr = np.empty((e, NUM_BOND_FEATURES), np.int32) if with_attr else None
    rc = lib.fg_read_graph(
        dataset_dir.encode(), index, _as_i32p(counts),
        _as_i32p(node_feat), _as_i32p(edge_index), _as_i32p(edge_attr),
    )
    if rc != 0:
        raise IOError(f"graph {index} read failed: rc={rc}")
    return Graph(node_feat, edge_index, edge_attr)


def build_local_ell_native(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    window: int,
    block: int,
    k_blocks: Optional[int] = None,
):
    """Native graph-local ELL layout (fg_build_local_ell) — identical output
    to core/blocking.build_local_blocks_ell's NumPy path (test_runtime.py).

    Returns (u_local, v_local, edge_perm, valid, spill_idx, k_blocks) or
    None when the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    s = np.ascontiguousarray(senders, np.int32)
    r = np.ascontiguousarray(receivers, np.int32)
    e = s.shape[0]
    k_io = ctypes.c_int32(-1 if k_blocks is None else k_blocks)
    if k_blocks is None:  # probe: auto-size k from the window counts
        lib.fg_build_local_ell(
            _as_i32p(s), _as_i32p(r), e, num_nodes, window, block,
            ctypes.byref(k_io), None, None, None, None, None,
        )
    num_windows = -(-num_nodes // window)
    p = num_windows * k_io.value * block
    u_local = np.empty(p, np.int32)
    v_local = np.empty(p, np.int32)
    edge_perm = np.empty(p, np.int32)
    valid = np.empty(p, np.int32)
    spill = np.empty(max(e, 1), np.int32)
    n_spill = lib.fg_build_local_ell(
        _as_i32p(s), _as_i32p(r), e, num_nodes, window, block,
        ctypes.byref(k_io), _as_i32p(u_local), _as_i32p(v_local),
        _as_i32p(edge_perm), _as_i32p(valid), _as_i32p(spill),
    )
    return (
        u_local, v_local, edge_perm, valid.astype(bool),
        spill[:n_spill].copy(), int(k_io.value),
    )


def pack_dataset_native(
    graphs: list[Graph],
    node_capacity: int,
    edge_capacity: int,
    graph_capacity: int,
):
    """Greedy streaming packer over the native bucket packer."""
    i = 0
    while i < len(graphs):
        bucket, consumed = pack_bucket_native(
            graphs[i:], node_capacity, edge_capacity, graph_capacity
        )
        yield bucket
        i += consumed
