"""OGB raw-CSV → reference on-disk format converter (dependency-free).

The reference's dataset zips (graphs/molhiv.zip etc. — missing LFS blobs)
were produced from OGB's graph-property-prediction datasets; the original
models are scored with ROC-AUC (ogbg-molhiv) / AP (ogbg-molpcba). The bench
host has no network and no ``ogb`` package, so this module reads OGB's raw
CSV layout directly (the format inside each dataset's ``raw/`` directory
after ``ogb`` downloads it anywhere else):

    num-node-list.csv[.gz]   one int per graph
    num-edge-list.csv[.gz]   one int per graph
    node-feat.csv[.gz]       9 comma-separated ints per node row
    edge.csv[.gz]            "u,v" per edge row (graph-local indices)
    edge-feat.csv[.gz]       3 ints per edge row (absent for featureless sets)
    graph-label.csv[.gz]     one label row per graph (may contain blanks)

``convert_ogb`` writes the reference layout (core/io.py) plus a
``labels.csv`` sidecar, giving a one-command path from a real OGB download
to an accuracy run:

    python -m flowgnn_tpu.cli convert --raw <ogb>/raw --out graphs/molhiv
    python -m flowgnn_tpu.cli accuracy --model gin --dataset graphs/molhiv
"""

from __future__ import annotations

import gzip
import os
from typing import Optional

import numpy as np

from .graphs import Graph, laplacian_eigenvectors
from . import io as gio


def _open(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rt")
    return open(path)


def _read_csv_ints(path: str) -> np.ndarray:
    with _open(path) as f:
        rows = [
            [int(float(x)) for x in line.strip().split(",")]
            for line in f
            if line.strip()
        ]
    return np.asarray(rows, np.int32)


def load_ogb_raw(
    raw_dir: str, with_eigen: bool = False, limit: Optional[int] = None
) -> tuple[list[Graph], np.ndarray]:
    """Read an OGB raw/ directory into Graphs + per-graph label array."""
    n_nodes = _read_csv_ints(os.path.join(raw_dir, "num-node-list.csv")).ravel()
    n_edges = _read_csv_ints(os.path.join(raw_dir, "num-edge-list.csv")).ravel()
    node_feat = _read_csv_ints(os.path.join(raw_dir, "node-feat.csv"))
    edges = _read_csv_ints(os.path.join(raw_dir, "edge.csv"))
    ef_path = os.path.join(raw_dir, "edge-feat.csv")
    edge_feat = (
        _read_csv_ints(ef_path)
        if os.path.exists(ef_path) or os.path.exists(ef_path + ".gz")
        else None
    )
    with _open(os.path.join(raw_dir, "graph-label.csv")) as f:
        labels = np.asarray(
            [
                [float(x) if x.strip() else np.nan for x in line.split(",")]
                for line in f
                if line.strip("\n")
            ],
            np.float64,
        )

    graphs = []
    node_off = edge_off = 0
    count = len(n_nodes) if limit is None else min(limit, len(n_nodes))
    for i in range(count):
        n, e = int(n_nodes[i]), int(n_edges[i])
        g = Graph(
            node_feat[node_off : node_off + n],
            edges[edge_off : edge_off + e],
            edge_feat[edge_off : edge_off + e] if edge_feat is not None
            else np.zeros((e, 3), np.int32),
        )
        if with_eigen:
            g = laplacian_eigenvectors(g)
        graphs.append(g)
        node_off += n
        edge_off += e
    return graphs, labels[:count]


def convert_ogb(
    raw_dir: str,
    out_dir: str,
    with_eigen: bool = False,
    limit: Optional[int] = None,
) -> int:
    """OGB raw CSVs → reference dataset layout + labels.csv. Returns count."""
    graphs, labels = load_ogb_raw(raw_dir, with_eigen=with_eigen, limit=limit)
    gio.write_dataset(out_dir, graphs)
    np.savetxt(os.path.join(out_dir, "labels.csv"), labels, delimiter=",")
    return len(graphs)


def load_labels(dataset_dir: str) -> Optional[np.ndarray]:
    path = os.path.join(dataset_dir, "labels.csv")
    if not os.path.exists(path):
        return None
    return np.loadtxt(path, delimiter=",", ndmin=2)
