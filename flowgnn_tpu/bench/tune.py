"""ELL geometry autotuner (`python -m flowgnn_tpu.cli tune`).

Sweeps the graph-local kernel grid geometry — window W (node rows held in
VMEM per grid step) and block B (edge lanes per step) — for one model on
the current backend, using the same device-resident timing protocol as
bench.py, and prints a ranked table plus the winning pair in
ELL_GEOMETRY_DEFAULTS form (models/base.py). The measured optima shipped as
defaults came from exactly this sweep on a v5e chip (BENCH.md).

B candidates are derived from the packed stream itself: the minimal lane
count that keeps every window's edges in one block (k = 1 — a k > 1 grid
doubles every window's lanes, the round-1 GIN-VN regression), plus one
slack step of 128/256 lanes for density-robustness. PNA's dest-major slot
layout has no B axis; its sweep covers W (slot count stays at
models.base.PALLAS_SLOTS; slot-overflow edges ride the spill tail).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _window_densities(packed, window: int) -> np.ndarray:
    """Edges per node-window (local edges only — both endpoints in-window)."""
    n = packed.node_capacity + 1
    s, r = packed.senders, packed.receivers
    real = r < n - 1
    local = real & (s // window == r // window)
    num_windows = -(-n // window)
    return np.bincount(r[local] // window, minlength=num_windows)


def block_candidates(packed, window: int) -> list[int]:
    dens = int(_window_densities(packed, window).max())
    b_min = max(128, -(-dens // 128) * 128)
    slack = 256 if window >= 256 else 128
    return [b_min, b_min + slack]


def sweep(
    model: str,
    dataset: str = "molhiv",
    num_graphs: int = 1028,
    windows: tuple[int, ...] = (128, 256, 512),
    reps: int = 50,
    trials: int = 3,
    f32: bool = False,
    reference: str = "/root/reference",
) -> dict:
    from ..core.graphs import pack_dataset
    from ..core.numerics import BF16, FLOAT32
    from ..core.synthetic import synthetic_dataset
    from ..models import registry
    from ..models.base import as_batch, prepare_params
    from .protocol import time_stream

    prec = FLOAT32 if f32 else BF16
    spec = registry.get(model)
    params = spec.loader(os.path.join(reference, spec.reference_dir))
    jparams = prepare_params(params, prec)
    graphs = registry.apply_transforms(
        spec,
        synthetic_dataset(dataset, seed=0, with_eigen=spec.needs_eigen,
                          num_graphs=num_graphs),
    )
    # Same model → layout mapping as bench.py: slot models sweep the
    # window only (the slot axis auto-sizes); ELL models sweep window ×
    # derived block candidates.
    layout = (
        "local_slots" if model in ("pna", "gat", "dgn") else "local_ell"
    )

    from ..core.graphs import auto_edge_capacity

    results = []
    for w in windows:
        buckets = list(
            pack_dataset(
                graphs, node_capacity=32768,
                edge_capacity=auto_edge_capacity(graphs, 32768),
                graph_capacity=2048, with_eigen=spec.needs_eigen,
                align_window=w,
            )
        )
        blocks = (
            [None] if layout == "local_slots"
            else block_candidates(buckets[0], w)
        )
        for b in blocks:
            batches = [
                as_batch(bk, blocked=layout, window=w, block=b)
                for bk in buckets
            ]
            total = sum(bk.num_graphs for bk in buckets)
            try:
                best, avg = time_stream(
                    spec, jparams, batches, prec, reps, trials
                )
            except Exception as e:  # geometry can exceed VMEM/compile budget
                print(f"# W{w}/B{b}: failed ({type(e).__name__}: {e})",
                      file=sys.stderr)
                continue
            us = best / total * 1e6
            results.append({"window": w, "block": b, "us_per_graph": us,
                            "us_per_graph_avg": avg / total * 1e6})
            print(f"# W{w}/B{b}: {us:.2f} us/graph "
                  f"(avg {avg / total * 1e6:.2f})", file=sys.stderr)

    results.sort(key=lambda r: r["us_per_graph"])
    if results:
        best = results[0]
        print(
            f"# best: \"{model}\": ({best['window']}, {best['block']})  "
            f"# {best['us_per_graph']:.2f} us/graph — paste into "
            "ELL_GEOMETRY_DEFAULTS (models/base.py)",
            file=sys.stderr,
        )
    return {"model": model, "dataset": dataset, "results": results}
