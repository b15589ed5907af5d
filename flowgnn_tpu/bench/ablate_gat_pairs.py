"""Time attribution inside the GAT pairs megakernel (VERDICT r4 #2).

Round 4 attributed the OLD slot kernel's 913 µs pass (gather 404 µs at a
1.66× in-situ factor, glue 111, expands 73, ~300 floor) and asked round 5
to explain or fix the in-situ factor. The pairs kernel restructured all
three terms; this harness re-derives the attribution for the production
pairs kernel by stubbing one stage at a time (the ``_ablate`` knob on
``gat_local_model_pairs`` — NOT bit-exact, time-only) and reporting
noop-subtracted per-stage times, plus the gather's in-situ factor vs its
pure-chain shape time (bench/matmul_shapes' "gat pairs two-hot" row,
scaled to the measured stream's actual Σc rows and window count).

Run: ``python -m flowgnn_tpu.bench.ablate_gat_pairs [--reps 200]``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=1028)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--variants", default=(
        "full,nogather,noscore,noglue,noacc,noonehot,nogather:noscore:noglue"
    ))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ..core.graphs import auto_edge_capacity, pack_dataset
    from ..core.numerics import BF16
    from ..core.synthetic import synthetic_dataset
    from ..models import registry
    from ..models.base import (
        POOL_GMAX, as_batches_uniform, choose_geometry, prepare_params,
        slot_prefix_caps,
    )
    from ..models.gat import megakernel_operands
    from ..ops.pallas.local_layer import gat_local_model_pairs
    from .protocol import dispatch_floor

    spec = registry.get("gat")
    params = prepare_params(spec.loader("/root/reference/GAT"), BF16)
    graphs = registry.apply_transforms(
        spec, synthetic_dataset("molhiv", seed=0, num_graphs=args.graphs)
    )
    w, _b = choose_geometry("gat", max(g.num_nodes for g in graphs))
    buckets = list(pack_dataset(
        graphs, node_capacity=32768,
        edge_capacity=auto_edge_capacity(graphs, 32768),
        graph_capacity=2048, align_window=w,
    ))
    batches = as_batches_uniform(buckets, blocked="local_slots", window=w)
    b0 = batches[0]
    window, n_slots = (int(x) for x in b0["slot_geom"].shape[-2:])
    prefix = slot_prefix_caps(b0, n_slots)
    n = b0["node_feat"].shape[0]
    H = 4
    L = 5
    hd = 64
    ops = megakernel_operands(params, BF16)
    floor = dispatch_floor(BF16)
    print(f"# window {window} slots {n_slots} prefix {prefix} "
          f"buckets {len(batches)} floor {floor * 1e3:.1f} ms",
          file=sys.stderr)

    def run_variant(ablate):
        def one_pass(c):
            for b in batches:
                h0 = jnp.zeros((n, hd), jnp.bfloat16) + c
                skip0 = jnp.zeros((n, hd), jnp.bfloat16)
                pool = gat_local_model_pairs(
                    jnp.asarray(b["slot_pstack"]), h0, skip0,
                    ops["glue2_w"], ops["ab_w"],
                    jnp.asarray(b["pool_gl"]), ops["pred2_w"],
                    window, n_slots, H, L, POOL_GMAX,
                    prefix_caps=prefix, _ablate=ablate,
                )
                c = c + pool[0, 0].astype(jnp.bfloat16) * 0
            return c

        trial = jax.jit(
            lambda c: jax.lax.fori_loop(
                0, args.reps, lambda i, cc: one_pass(cc), c
            )
        )
        carry = jnp.zeros((), jnp.bfloat16)
        np.asarray(trial(carry))
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(trial(carry))
            best = min(best, (time.perf_counter() - t0) / args.reps)
        return best - floor / args.reps

    results = {}
    for v in args.variants.split(","):
        ablate = None if v == "full" else v.replace(":", ",")
        results[v] = run_variant(ablate)
        print(f"# {v}: {results[v] * 1e6:.1f} us/pass", file=sys.stderr)

    full = results.get("full")
    rec = {"metric": "gat_pairs_ablation_us_per_pass",
           "value": round(full * 1e6, 1) if full else None,
           "unit": "us/pass",
           "variants_us": {k: round(v * 1e6, 1) for k, v in results.items()}}
    if full is not None:
        for k, v in results.items():
            if k != "full":
                rec[f"attrib_{k}_us"] = round((full - v) * 1e6, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
