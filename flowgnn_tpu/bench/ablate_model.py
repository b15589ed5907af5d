"""Megakernel-era per-stage ablation on the real chip (GIN canonical).

Times each stage of the whole-model pass in isolation (same
reps-in-program + chained-carry protocol as bench.py) over the standard
32k molhiv bucket:

  noop    — empty chained program: the relay dispatch floor per trial
  full    — the complete forward pass (embed + megakernel + readout)
  mega    — the whole-model pallas call alone (chained on itself)
  embed   — atom-embedding multi-hot matmul alone
  pool    — mean_pool + prediction head alone

Iterations CHAIN (pass i+1 consumes pass i's output) so XLA cannot CSE
them; subtract the noop row to get device time per stage.

Run: ``python -m flowgnn_tpu.bench.ablate_model [--model gin]
[--reps 100] [--trials 3]``.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gin", choices=["gin", "gin-vn"])
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--graphs", type=int, default=1028)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ..core.features import BOND_FEATURE_OFFSETS
    from ..core.graphs import auto_edge_capacity, pack_dataset
    from ..core.numerics import BF16
    from ..core.synthetic import synthetic_dataset
    from ..models import registry
    from ..models.base import (
        ELL_GEOMETRY_DEFAULTS, as_batch, atom_embed, ell_geometry, linear,
        mean_pool, prepare_params,
    )
    from ..ops.pallas.local_layer import gin_local_model

    prec = BF16
    spec = registry.get(args.model)
    params = prepare_params(spec.loader(f"/root/reference/{spec.reference_dir}"), prec)
    graphs = registry.apply_transforms(
        spec, synthetic_dataset("molhiv", seed=0, num_graphs=args.graphs)
    )
    gw, gb = ELL_GEOMETRY_DEFAULTS.get(args.model, (384, 896))
    buckets = list(
        pack_dataset(graphs, node_capacity=32768,
                     edge_capacity=auto_edge_capacity(graphs, 32768),
                     graph_capacity=2048, align_window=gw)
    )
    batch = as_batch(buckets[0], blocked="local_ell", window=gw, block=gb)
    n = batch["node_feat"].shape[0]
    window, k_blocks = ell_geometry(batch)
    P = batch["loc_ulocal"].shape[0]
    spill = int(batch["senders"].shape[0]) - P
    print(f"geometry: window={window} k_blocks={k_blocks} lanes={P} "
          f"spill_lanes={spill}")
    assert k_blocks == 1 and spill == 0, "megakernel path requires k=1 no-spill"

    L = params["mlp1_w"].shape[0]
    d = params["mlp2_w"].shape[1]
    hid = params["mlp1_w"].shape[1]
    attr_off = jnp.asarray(batch["edge_attr"][:P]) + jnp.asarray(
        BOND_FEATURE_OFFSETS
    )[None, :]
    uloc = jnp.asarray(batch["loc_ulocal"])
    vloc = jnp.asarray(batch["loc_vlocal"])
    tabs = params["edge_embedding"].reshape(-1, d).astype(prec.compute_dtype)
    w1 = params["mlp1_w"].reshape(L * hid, d)
    w2 = params["mlp2_w"].reshape(L * d, hid)
    eps = jnp.ones((L, 1), jnp.float32)

    def time_fn(fn, label):
        jfn = jax.jit(fn)
        carry = jnp.zeros((), prec.compute_dtype)
        np.asarray(jfn(carry))
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(jfn(carry))
            times.append((time.perf_counter() - t0) / args.reps)
        print(f"{label:28s} {min(times) * 1e3:8.3f} ms/pass "
              f"(avg {sum(times) / len(times) * 1e3:.3f})")
        return min(times)

    def reps(body):
        def outer(c):
            return jax.lax.fori_loop(0, args.reps, lambda i, cc: body(cc), c)
        return outer

    time_fn(reps(lambda c: c + 1), "noop (dispatch floor)")

    def full(c):
        p = dict(params)
        p["pred_b"] = p["pred_b"] + c
        return c + spec.forward(p, batch, prec)[0, 0] * 0

    time_fn(reps(full), "full model")

    h0 = atom_embed(params["node_embedding"], batch["node_feat"], prec)

    from ..models.base import POOL_GMAX

    pool_gl = jnp.asarray(batch["pool_gl"])
    predw = params["pred_w"].T.astype(prec.compute_dtype)

    def mega(c):
        h = gin_local_model(
            attr_off, uloc, vloc, h0 + c, pool_gl, tabs, w1,
            params["mlp1_b"], w2, params["mlp2_b"], eps, predw,
            window, L, POOL_GMAX,
        )
        return c + h[0, 0] * 0

    time_fn(reps(mega), "megakernel (all layers)")

    def embed(c):
        p = params["node_embedding"] + c
        return c + atom_embed(p, batch["node_feat"], prec)[0, 0] * 0

    time_fn(reps(embed), "embed (atom multi-hot)")

    def pool(c):
        hg = mean_pool(h0 + c, batch, prec)
        return c + linear(hg, params["pred_w"], params["pred_b"], prec)[0, 0] * 0

    time_fn(reps(pool), "pool + pred head")


if __name__ == "__main__":
    main()
