"""Time attribution inside the GIN slot megakernel (round-5 layout).

Same method as bench/ablate_gat_pairs: stage stubs (``_ablate`` on
``gin_local_model_slots`` — NOT bit-exact, time-only), noop-subtracted
per-stage marginal times on a molhiv-default bucket. Guides the next
lever for the three edge-featured slot models the way the pairs
attribution did for GAT.

Run: ``python -m flowgnn_tpu.bench.ablate_gin_slots [--reps 200]``.
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
        "full,nogather,nobond,noacc,nomlp,nogather:nobond:noacc:nomlp"
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
    from ..ops.pallas.local_layer import gin_local_model_slots
    from .protocol import dispatch_floor

    spec = registry.get("gin")
    params = prepare_params(spec.loader("/root/reference/GIN"), BF16)
    graphs = registry.apply_transforms(
        spec, synthetic_dataset("molhiv", seed=0, num_graphs=args.graphs)
    )
    w, _b = choose_geometry("gin", max(g.num_nodes for g in graphs))
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
    L, D = 5, 100
    hid = params["mlp1_w"].shape[1]
    floor = dispatch_floor(BF16)
    print(f"# window {window} slots {n_slots} prefix {prefix} "
          f"buckets {len(batches)} floor {floor * 1e3:.1f} ms",
          file=sys.stderr)

    dt = jnp.bfloat16
    ee_tables = params["edge_embedding"].reshape(-1, D).astype(dt)
    w1 = params["mlp1_w"].reshape(L * hid, D)
    w2 = params["mlp2_w"].reshape(L * D, hid)
    eps1 = jnp.ones((L, 1), jnp.float32)
    predw = params["pred_w"].T.astype(dt)

    def run_variant(ablate):
        def one_pass(c):
            for b in batches:
                h0 = jnp.zeros((n, D), dt) + c
                pool = gin_local_model_slots(
                    jnp.asarray(b["slot_meta"]), h0,
                    jnp.asarray(b["pool_gl"]), ee_tables,
                    w1, params["mlp1_b"], w2, params["mlp2_b"],
                    eps1, predw, window, n_slots, L, POOL_GMAX,
                    prefix_caps=prefix, _ablate=ablate,
                )
                c = c + pool[0, 0].astype(dt) * 0
            return c

        trial = jax.jit(
            lambda c: jax.lax.fori_loop(
                0, args.reps, lambda i, cc: one_pass(cc), c
            )
        )
        carry = jnp.zeros((), dt)
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
    rec = {"metric": "gin_slots_ablation_us_per_pass",
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
