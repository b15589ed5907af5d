"""Benchmark driver — the run_experiments.sh analog (one JSON line output).

Headline metric (matches the reference's definition, run_experiments.sh:44-46):
average end-to-end device time per graph, whole dataset streamed per
measurement. Baseline: FlowGNN GIN on molhiv = 49.5 µs/graph on an Alveo U50
(BASELINE.md). ``vs_baseline`` = baseline_us / our_us (>1 ⇒ faster than the
FPGA).

The molhiv dataset zips are missing LFS blobs, so the stream is the
synthetic molhiv-shaped dataset (core/synthetic.py): same graph count (4113),
same node/edge distribution, real reference weights.

Default numerics: bf16 compute with f32 accumulation — the TPU-native analog
of the reference's 16-bit fixed point (GIN/src/dcl.h:58-59). --f32 for full
float32.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gin", help="gin|gin-vn|gcn|gat|pna|dgn|all")
    ap.add_argument("--graphs", type=int, default=4113)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--node-cap", type=int, default=8192)
    ap.add_argument("--edge-cap", type=int, default=24576)
    ap.add_argument("--graph-cap", type=int, default=512)
    args = ap.parse_args()

    import jax

    from flowgnn_tpu.core.graphs import pack_dataset
    from flowgnn_tpu.core.numerics import BF16, FLOAT32
    from flowgnn_tpu.core.synthetic import synthetic_molhiv
    from flowgnn_tpu.models import registry
    from flowgnn_tpu.models.base import as_batch, prepare_params

    prec = FLOAT32 if args.f32 else BF16
    baselines_us = {  # BASELINE.md derived per-graph latency on the U50
        "gin": 49.5, "gin-vn": 56.2, "gcn": 41.9, "gat": 17.6,
        "pna": 57.4, "dgn": 32.9,
    }

    names = list(baselines_us) if args.model == "all" else [args.model]
    results = {}
    for name in names:
        spec = registry.get(name)
        import os

        params = spec.loader(os.path.join("/root/reference", spec.reference_dir))
        jparams = prepare_params(params, prec)
        graphs = registry.apply_transforms(
            spec,
            synthetic_molhiv(args.graphs, seed=0, with_eigen=spec.needs_eigen),
        )
        buckets = list(
            pack_dataset(
                graphs,
                node_capacity=args.node_cap,
                edge_capacity=args.edge_cap,
                graph_capacity=args.graph_cap,
                with_eigen=spec.needs_eigen,
            )
        )
        batches = [
            jax.tree_util.tree_map(jax.device_put, as_batch(b)) for b in buckets
        ]
        total_graphs = sum(b.num_graphs for b in buckets)
        total_edges = sum(int(b.n_edge[:-1].sum()) for b in buckets)

        fwd = jax.jit(lambda p, b: spec.forward(p, b, prec))
        # Warmup / compile (one shape fits all buckets).
        fwd(jparams, batches[0]).block_until_ready()

        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            outs = [fwd(jparams, b) for b in batches]
            outs[-1].block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        us_per_graph = best / total_graphs * 1e6
        results[name] = {
            "us_per_graph": us_per_graph,
            "graphs_per_s": total_graphs / best,
            "edges_per_s": total_edges / best,
            "vs_baseline": baselines_us[name] / us_per_graph,
            "buckets": len(buckets),
        }
        print(
            f"# {name}: {us_per_graph:.2f} us/graph "
            f"({results[name]['graphs_per_s']:.0f} graphs/s, "
            f"{results[name]['edges_per_s'] / 1e6:.2f}M edges/s, "
            f"{results[name]['vs_baseline']:.2f}x U50)",
            file=sys.stderr,
        )

    head = results[names[0]]
    print(
        json.dumps(
            {
                "metric": f"{names[0]}_molhiv_synth_us_per_graph",
                "value": round(head["us_per_graph"], 3),
                "unit": "us/graph",
                "vs_baseline": round(head["vs_baseline"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
