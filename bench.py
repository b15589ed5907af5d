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

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    # Default "all": the no-arg driver run records the WHOLE headline table
    # (one JSON line per model + an aggregate line), matching the
    # reference's all-models discipline (run_experiments.sh:52-60).
    ap.add_argument("--model", default="all", help="gin|gin-vn|gcn|gat|pna|dgn|all")
    ap.add_argument("--dataset", default="molhiv", help="molhiv|molpcba|hep10k (synthetic profile)")
    ap.add_argument("--graphs", type=int, default=None, help="override graph count")
    ap.add_argument("--trials", type=int, default=5)  # relay-variance guard: report best-of
    ap.add_argument("--reps", type=int, default=400,
                    help="stream passes per trial, run inside the program — "
                         "preserves (and exceeds) the reference's 100-enqueue "
                         "averaging (run_experiments.sh:44-46) while "
                         "amortizing the relay tunnel RTT, an environment "
                         "artifact the U50 baseline's device-side XRT "
                         "'Kernel Execution' metric never contained; the "
                         "floor's residual share is reported per run")
    ap.add_argument("--ell-window", type=int, default=None,
                    help="override the graph-local kernel window")
    ap.add_argument("--ell-block", type=int, default=None,
                    help="override the graph-local kernel block (ELL lane "
                         "capacity per grid step)")
    ap.add_argument("--ell-wps", type=int, default=None,
                    help="windows per ELL grid step (k=1 layouts; sets "
                         "FLOWGNN_ELL_WPS)")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--layout", default=None,
                    choices=["plain", "blocked", "local", "local-ell",
                             "local-slots"],
                    help="edge layout: plain XLA scatter, Pallas windowed "
                         "scatter, or the graph-local fused kernels "
                         "(default for all six models; local-ell / "
                         "local-slots force one local flavor for A/B runs)")
    ap.add_argument("--node-cap", type=int, default=32768)
    ap.add_argument("--edge-cap", type=int, default=None,
                    help="bucket edge capacity (default: auto from the "
                         "stream's edge/node density so buckets fill the "
                         "node axis — a too-small cap silently halves "
                         "bucket occupancy and doubles per-graph time)")
    ap.add_argument("--graph-cap", type=int, default=2048)
    args = ap.parse_args()
    if args.ell_wps:
        import os

        os.environ["FLOWGNN_ELL_WPS"] = str(args.ell_wps)

    import jax

    # Persistent compilation cache: repeat benches skip the (minutes-long)
    # remote compile of scatter-heavy programs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from flowgnn_tpu.bench.roofline import report as roofline_report
    from flowgnn_tpu.core.graphs import pack_dataset
    from flowgnn_tpu.core.numerics import BF16, FLOAT32
    from flowgnn_tpu.core.synthetic import synthetic_dataset
    from flowgnn_tpu.models import registry
    from flowgnn_tpu.models.base import prepare_params

    prec = FLOAT32 if args.f32 else BF16
    # U50 per-graph latency baselines (BASELINE.md): molhiv counts are from
    # the repo (4113, GIN/src/dcl.h:39); molpcba uses the official OGB graph
    # count (43793) and hep10k its eponymous 10000 to derive per-graph time
    # from the committed total kernel ms.
    baselines_us_all = {
        "molhiv": {"gin": 49.5, "gin-vn": 56.2, "gcn": 41.9, "gat": 17.6,
                   "pna": 57.4, "dgn": 32.9},
        "molpcba": {"gin": 51.4, "gin-vn": 58.6, "gcn": 44.0, "gat": 18.2,
                    "pna": 59.9, "dgn": 34.5},
        "hep10k": {"gin": 179.9, "gin-vn": 207.6, "gcn": 163.9, "gat": 54.4,
                   "pna": 157.8, "dgn": 138.2},
    }
    baselines_us = baselines_us_all[args.dataset]

    names = list(baselines_us) if args.model == "all" else [args.model]
    results = {}
    for name in names:
        spec = registry.get(name)
        import os

        params = spec.loader(os.path.join("/root/reference", spec.reference_dir))
        jparams = prepare_params(params, prec)
        # Default stream lengths. The reference enqueues the whole dataset
        # per measurement (run_experiments.sh:44-46, GIN_compute.cc:44),
        # so its U50 per-graph baseline amortizes per-enqueue overhead
        # over the full dataset; ours must too (the relay dispatch floor
        # is the analog). Buckets stay at the 32k-node per-dispatch sweet
        # spot; same-signature buckets are scan-stacked so compile time
        # does not grow with stream length (bench/protocol.py).
        # Only molhiv's default is its official count (4113, 4 buckets
        # unrolled); molpcba/hep10k default to a ≤6-bucket SAMPLE of the
        # same synthetic distribution, NOT the official 43793/10000
        # (per-graph normalization makes the metric stream-length
        # independent; ≤6 buckets keeps the unrolled protocol — the
        # scan-stacked long-stream path measured +7.8%/pass, BENCH.md —
        # while the floor share still lands ≈1-2% at the default reps).
        # Pass --graphs 43793 / 10000 for a full-count scan-stacked run.
        default_stream_graphs = {
            "molhiv": 4113, "molpcba": 6144, "hep10k": 2048,
        }
        num_graphs = (
            args.graphs if args.graphs is not None
            else default_stream_graphs[args.dataset]
        )
        graphs = registry.apply_transforms(
            spec,
            synthetic_dataset(args.dataset, seed=0, with_eigen=spec.needs_eigen,
                              num_graphs=num_graphs),
        )
        # Round-2: the graph-local kernels win for ALL six models (GIN-VN's
        # round-1 "windowed scatter wins" was an artifact of the fixed 1536
        # block — its VN star pushed k to 2; at W512/B2048 local is 2.2×
        # faster). PNA uses the dest-major slot layout.
        layout = args.layout or "local"
        from flowgnn_tpu.models.base import choose_geometry

        auto_w, auto_b = choose_geometry(
            name, max(g.num_nodes for g in graphs)
        )
        ell_w = args.ell_window or auto_w
        if args.ell_window and not args.ell_block:
            # Re-derive the block from the USER's window (choose_geometry's
            # ceil(gb·w/gw) scaling) — pairing an overridden window with
            # auto_b (scaled for auto_w) can silently push the ELL grid to
            # k=2 and double every step.
            from flowgnn_tpu.models.base import ELL_GEOMETRY_DEFAULTS

            gw, gb = ELL_GEOMETRY_DEFAULTS.get(name, (512, 1536))
            ell_b = auto_b if ell_w == auto_w else -(
                -(gb * ell_w) // (gw * 128)
            ) * 128
        else:
            ell_b = args.ell_block or auto_b
        # Auto edge capacity (see core/graphs.auto_edge_capacity: a fixed
        # too-small cap silently halves bucket occupancy).
        from flowgnn_tpu.core.graphs import auto_edge_capacity

        edge_cap = args.edge_cap or auto_edge_capacity(graphs, args.node_cap)
        buckets = list(
            pack_dataset(
                graphs,
                node_capacity=args.node_cap,
                edge_capacity=edge_cap,
                graph_capacity=args.graph_cap,
                with_eigen=spec.needs_eigen,
                align_window=(
                    ell_w
                    if layout in ("local", "local-ell", "local-slots")
                    else None
                ),
            )
        )
        # Layout policy: slot models always; the edge-featured ELL models
        # (gin/gcn/gin-vn) ALSO take the dest-major slot layout when the
        # stream fits their window (round 5 — no scatter matmul, Σc
        # compacted lanes; measured faster on molhiv/molpcba, BENCH.md).
        # Streams with window-exceeding graphs (hep10k) keep ELL + spill
        # tail, which measured faster there; a slot stream that still
        # spills (in-degree overflow) falls back to ELL below.
        slot_fits = max(g.num_nodes for g in graphs) <= ell_w
        blocked = {
            "plain": False, "blocked": True,
            "local-ell": "local_ell", "local-slots": "local_slots",
            "local": "local_slots"
            if (name in ("pna", "gat", "dgn") or slot_fits)
            else "local_ell",
        }[layout]
        from flowgnn_tpu.models.base import as_batches_uniform

        batches = as_batches_uniform(
            buckets, blocked=blocked, window=ell_w, block=ell_b
        )
        if (
            layout == "local"
            and blocked == "local_slots"
            and name in ("gin", "gcn", "gin-vn")
            and any(b["slot_spill"].shape[-1] > 0 for b in batches)
        ):
            blocked = "local_ell"
            batches = as_batches_uniform(
                buckets, blocked=blocked, window=ell_w, block=ell_b
            )
        total_graphs = sum(b.num_graphs for b in buckets)
        total_edges = sum(int(b.n_edge[:-1].sum()) for b in buckets)

        # Timing protocol for the tunneled chip: see
        # flowgnn_tpu/bench/protocol.py (device-resident constants, chained
        # scalar carry, reps inside the program, one closing readback).
        from flowgnn_tpu.bench.protocol import (
            dispatch_floor as measure_floor, time_stream,
        )

        best, avg = time_stream(
            spec, jparams, batches, prec, args.reps, args.trials
        )
        total_nodes = sum(int(b.n_node[:-1].sum()) for b in buckets)
        roof = roofline_report(
            name, total_nodes, total_edges, best, bf16=not args.f32
        )
        us_per_graph = best / total_graphs * 1e6

        # Stage breakdown (VERDICT r1 #6): report three numbers separately —
        # (a) the SpMM stage alone vs ITS roofline (the BASELINE.md >=70%
        # target), (b) whole model vs light speed (roof above), (c) the
        # relay dispatch floor (amortized 1/reps into each pass by the
        # reps-in-program protocol).
        dispatch_floor = measure_floor(prec)

        spmm = {}
        if "loc_ulocal" in batches[0]:
            from flowgnn_tpu.bench.spmm_stage import measure_spmm_stage

            spmm = measure_spmm_stage(
                batches, prec, reps=args.reps, trials=args.trials,
                bf16=not args.f32,
            )
        elif "slot_src" in batches[0]:
            from flowgnn_tpu.bench.spmm_stage import measure_slot_stage

            spmm = measure_slot_stage(
                batches, prec, reps=args.reps, trials=args.trials,
                bf16=not args.f32,
            )

        # Defended roofline ratio (VERDICT r4 #6): stage MXU utilization ÷
        # the measured shape-achievable ceiling for this model's stage
        # shape (roofline.SHAPE_CEILINGS, from bench/matmul_shapes runs).
        # BASELINE.md's target is ≥ 0.40 on THIS number.
        if spmm:
            from flowgnn_tpu.bench.roofline import (
                ELL_STAGE_CEILINGS, SLOT_STAGE_CEILINGS,
            )

            ceiling = (
                SLOT_STAGE_CEILINGS.get(ell_w)
                if "slot_src" in batches[0]
                else ELL_STAGE_CEILINGS.get(name, {}).get(ell_w)
            )
            if ceiling:
                spmm["pct_of_shape_ceiling"] = spmm["mxu_util"] / ceiling

        results[name] = {
            "us_per_graph": us_per_graph,
            "us_per_graph_avg": avg / total_graphs * 1e6,
            "graphs_per_s": total_graphs / best,
            "edges_per_s": total_edges / best,
            "vs_baseline": baselines_us[name] / us_per_graph,
            "vs_baseline_avg": baselines_us[name] / (avg / total_graphs * 1e6),
            "buckets": len(buckets),
            "roofline_frac": roof["roofline_frac"],
            "achieved_tflops": roof["achieved_tflops"],
            "dispatch_floor_ms": dispatch_floor * 1e3,
            "dispatch_share": dispatch_floor / args.reps / best,
            **{f"spmm_{k}": v for k, v in spmm.items()},
        }
        spmm_txt = (
            f", spmm {spmm['mxu_util'] * 100:.0f}% MXU / "
            f"{spmm['roofline_frac'] * 100:.0f}% of its roofline"
            if spmm else ""
        )
        if spmm and "pct_of_shape_ceiling" in spmm:
            spmm_txt += (
                f" / {spmm['pct_of_shape_ceiling'] * 100:.0f}% of shape "
                "ceiling"
            )
        print(
            f"# {name}: {us_per_graph:.2f} us/graph best "
            f"(avg {results[name]['us_per_graph_avg']:.2f}, "
            f"{results[name]['graphs_per_s']:.0f} graphs/s, "
            f"{results[name]['edges_per_s'] / 1e6:.2f}M edges/s, "
            f"{results[name]['vs_baseline']:.2f}x U50 best / "
            f"{results[name]['vs_baseline_avg']:.2f}x avg, "
            f"model {roof['roofline_frac'] * 100:.0f}% of light speed, "
            f"{roof['achieved_tflops']:.1f} TF/s, "
            f"dispatch floor {dispatch_floor * 1e3:.2f} ms = "
            f"{results[name]['dispatch_share'] * 100:.1f}%/pass"
            f"{spmm_txt})",
            file=sys.stderr,
        )

    for name in names:
        r = results[name]
        rec = {
            "metric": f"{name}_{args.dataset}_synth_us_per_graph",
            "value": round(r["us_per_graph"], 3),
            "unit": "us/graph",
            "vs_baseline": round(r["vs_baseline"], 3),
        }
        if "spmm_pct_of_shape_ceiling" in r:
            # The defended BASELINE.md ratio (≥0.40 target): stage MXU ÷
            # measured shape-achievable ceiling (VERDICT r4 #6).
            rec["spmm_pct_of_shape_ceiling"] = round(
                r["spmm_pct_of_shape_ceiling"], 3
            )
        print(json.dumps(rec))
    if len(names) > 1:
        # Aggregate LAST line (the driver parses the final JSON line): the
        # geometric-mean speedup over the U50 across all models, with the
        # per-model table embedded so one captured line holds the record.
        import math

        gm = math.exp(
            sum(math.log(results[m]["vs_baseline"]) for m in names)
            / len(names)
        )
        print(
            json.dumps(
                {
                    "metric": f"all_{args.dataset}_synth_geomean_speedup",
                    "value": round(gm, 3),
                    "unit": "x_vs_u50",
                    "vs_baseline": round(gm, 3),
                    "models": {
                        m: {
                            "us_per_graph": round(results[m]["us_per_graph"], 3),
                            "vs_baseline": round(results[m]["vs_baseline"], 3),
                        }
                        for m in names
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
