"""Multi-device scaling benchmark: edges/s at 1..K devices.

The reference is single-device; BASELINE.md's scaling target for the TPU
build is ≥80% edges/s efficiency from 1 chip to N. On real multi-chip slices
this measures ICI-backed scaling; on the 8-way host-platform CPU mesh it
exercises the identical sharded program (the fake-backend tier).

Two axes, swept independently:

  * ``axis="data"`` — whole buckets per chip (no communication);
  * ``axis="edge"`` — ONE batch edge-partitioned across chips. Strategy
    ``"halo"`` (default) uses the node-shard + boundary-row-all_to_all
    layout (parallel/halo.py); ``"psum"`` the round-1 replicated-node
    full-array-psum path, kept for comparison. The report includes the
    per-layer ICI bytes each strategy moves.
"""

from __future__ import annotations

import time

import numpy as np


def _measure(fn, args, trials):
    np.asarray(fn(*args))  # compile + completion via readback
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_scaling(
    model: str = "gin",
    graphs_per_device: int = 128,
    device_counts=(1, 2, 4, 8),
    trials: int = 3,
    reference_root: str = "/root/reference",
    caps=(4096, 12288, 256),
    axis: str = "data",
    strategy: str = "halo",
    blocked: str | None = None,
    scaling: str = "strong",
) -> list[dict]:
    """``scaling`` (edge axis only): "strong" shards ONE fixed batch across
    k chips (per-chip work shrinks with k — under-utilizes large k by
    construction); "weak" grows the batch with k (graphs_per_device·k
    graphs, capacities ∝ k) so every chip always holds the same shard size
    — the sweep that separates fixed-batch under-utilization from genuine
    halo overhead growth.

    ``blocked`` (halo strategy only): "local_ell" / "local_slots" packs
    window-aligned and attaches the per-shard graph-local layouts, so the
    sharded program runs the whole-model megakernels + in-kernel finalize
    per shard (one pallas_call; pool partials complete with one
    all_gather). On the fake CPU backend the kernels run in interpret mode
    — absolute times are interpreter-bound; use the rows for layout/
    collective accounting, not kernel speed."""
    import jax

    from ..core.graphs import pack_graphs
    from ..core.numerics import FLOAT32
    from ..core.synthetic import synthetic_molhiv
    from ..models import registry
    from ..models.base import prepare_params
    from ..parallel.halo import (
        build_halo_batch, halo_bytes_per_layer, halo_shape,
        psum_bytes_per_layer,
    )
    from ..parallel.inference import (
        halo_forward, sharded_forward, stack_buckets, stack_halo_buckets,
    )
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
        if axis == "data":
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
            best = _measure(fwd, (jp, stacked), trials)
            row = {"devices": k, "axis": "data"}
        elif axis == "edge":
            # "strong": one fixed batch sharded across the edge axis;
            # "weak": batch grows ∝ k so per-chip shard size is constant.
            scale = k if scaling == "weak" else max(device_counts)
            pack_kw = dict(
                node_capacity=caps[0] * scale // 2,
                edge_capacity=caps[1] * scale // 2,
                graph_capacity=caps[2] * scale,
                with_eigen=spec.needs_eigen,
            )
            if blocked and strategy == "halo":
                from ..core.graphs import pack_graphs_aligned
                from ..models.base import PALLAS_ELL_WINDOW

                packed = pack_graphs_aligned(
                    graphs[: graphs_per_device * scale],
                    window=PALLAS_ELL_WINDOW, **pack_kw,
                )
            else:
                packed = pack_graphs(
                    graphs[: graphs_per_device * scale],
                    **pack_kw,
                )
            total_edges = int(packed.n_edge[:-1].sum())
            mesh = make_mesh(data=1, edge=k)
            dim = 100 if model != "pna" else 80
            if strategy == "halo":
                stacked = stack_halo_buckets(
                    [build_halo_batch(
                        packed, k=k, edge_slack=2.0 * k, blocked=blocked,
                    )]
                )
                fwd = halo_forward(spec.forward, mesh, FLOAT32)
                shape = halo_shape(
                    packed.node_capacity, packed.edge_capacity, k
                )
                ici = halo_bytes_per_layer(shape, dim)
            else:  # replicated-node psum path (round-1 fallback)
                stacked = stack_buckets([packed])
                fwd = sharded_forward(spec.forward, mesh, FLOAT32)
                ici = psum_bytes_per_layer(packed.node_capacity, dim)
            best = _measure(fwd, (jp, stacked), trials)
            row = {
                "devices": k, "axis": "edge", "strategy": strategy,
                "scaling": scaling,
                "ici_bytes_per_layer": 0 if k == 1 else ici,
            }
        else:
            raise ValueError(f"unknown axis {axis!r}")
        row.update({"edges_per_s": total_edges / best, "time_s": best})
        results.append(row)
    if results:
        base = results[0]["edges_per_s"] / results[0]["devices"]
        cores = os.cpu_count() or 1
        fake = jax.default_backend() == "cpu"
        for r in results:
            r["efficiency"] = r["edges_per_s"] / (r["devices"] * base)
            # Fake-backend confound, COMPUTED (VERDICT r4 #8): k virtual
            # devices share the host's physical cores, so total work
            # growing ∝k (weak) or parallelism beyond the cores (strong)
            # caps raw efficiency at cores/k. The core-adjusted column
            # divides out that ceiling (= efficiency · k/cores for
            # k > cores); on real multi-chip hardware it equals the raw
            # column.
            r["efficiency_core_adjusted"] = r["efficiency"] * (
                max(1.0, r["devices"] / cores) if fake else 1.0
            )
    return results
