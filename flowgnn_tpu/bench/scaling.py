"""Multi-device scaling benchmark: edges/s at 1..K devices.

The reference is single-device; BASELINE.md's scaling target for the TPU
build is ≥80% edges/s efficiency from 1 chip to N. On real multi-chip slices
this measures ICI-backed scaling; on the 8-way host-platform CPU mesh it
exercises the identical sharded program (the fake-backend tier).
"""

from __future__ import annotations

import time

import numpy as np


def run_scaling(
    model: str = "gin",
    graphs_per_device: int = 128,
    device_counts=(1, 2, 4, 8),
    trials: int = 3,
    reference_root: str = "/root/reference",
    caps=(4096, 12288, 256),
) -> list[dict]:
    import jax

    from ..core.graphs import pack_graphs
    from ..core.numerics import FLOAT32
    from ..core.synthetic import synthetic_molhiv
    from ..models import registry
    from ..models.base import prepare_params
    from ..parallel.inference import sharded_forward, stack_buckets
    from ..parallel.mesh import make_mesh

    spec = registry.get(model)
    import os

    params = spec.loader(os.path.join(reference_root, spec.reference_dir))
    jp = prepare_params(params, FLOAT32)
    total = graphs_per_device * max(device_counts)
    graphs = registry.apply_transforms(
        spec, synthetic_molhiv(total, seed=0, with_eigen=spec.needs_eigen)
    )

    results = []
    for k in device_counts:
        if k > len(jax.devices()):
            continue
        # Weak scaling: every device always gets graphs_per_device graphs.
        per = graphs_per_device
        buckets = [
            pack_graphs(
                graphs[i * per : (i + 1) * per],
                node_capacity=caps[0], edge_capacity=caps[1],
                graph_capacity=caps[2], with_eigen=spec.needs_eigen,
            )
            for i in range(k)
        ]
        total_edges = sum(int(b.n_edge[:-1].sum()) for b in buckets)
        stacked = stack_buckets(buckets)
        mesh = make_mesh(data=k, edge=1)
        fwd = sharded_forward(spec.forward, mesh, FLOAT32)
        np.asarray(fwd(jp, stacked))  # compile + completion via readback
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(fwd(jp, stacked))
            best = min(best, time.perf_counter() - t0)
        results.append(
            {
                "devices": k,
                "edges_per_s": total_edges / best,
                "time_s": best,
            }
        )
    if results:
        base = results[0]["edges_per_s"] / results[0]["devices"]
        for r in results:
            r["efficiency"] = r["edges_per_s"] / (r["devices"] * base)
    return results
