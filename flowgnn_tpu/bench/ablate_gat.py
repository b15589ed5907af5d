"""GAT per-stage ablation on the real chip — where does the pass time go?

Times each stage of the GAT layer in isolation (same reps-in-program +
chained-carry protocol as bench.py) over the standard 32k molhiv bucket:

  noop    — empty chained program: the relay dispatch floor per trial
  kernel  — 5× gat_local_message_ell (attention numerator+denominator)
  spill   — 5× the window-crossing spill tail (XLA segment_sum) — only
            present when the layout actually spilled lanes
  glue    — 5× softmax divide + skip-proj + ELU + next proj + scores
  embed   — input projection + initial scores

Every stage CHAINS its iterations (layer l+1 consumes layer l's output),
so XLA cannot CSE the five copies into one — subtract the noop row to get
the stage's device time.

Run: ``python -m flowgnn_tpu.bench.ablate_gat [--reps 100] [--trials 3]
[--ell-window W] [--ell-block B]``.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--graphs", type=int, default=1028)
    ap.add_argument("--ell-window", type=int, default=None)
    ap.add_argument("--ell-block", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ..core.graphs import pack_dataset
    from ..core.numerics import BF16
    from ..core.synthetic import synthetic_dataset
    from ..models import registry
    from ..models.base import (
        ELL_GEOMETRY_DEFAULTS, as_batch, ell_geometry, prepare_params,
    )
    from ..models.gat import LEAKY_SLOPE, _project, _scores
    from ..ops.pallas.local_layer import gat_local_message_ell
    from ..ops.segment import segment_sum

    prec = BF16
    spec = registry.get("gat")
    params = prepare_params(spec.loader("/root/reference/GAT"), prec)
    graphs = registry.apply_transforms(
        spec, synthetic_dataset("molhiv", seed=0, num_graphs=args.graphs)
    )
    gw, gb = ELL_GEOMETRY_DEFAULTS.get("gat", (None, None))
    ell_w = args.ell_window or gw or 512
    ell_b = args.ell_block or gb or 1536
    buckets = list(
        pack_dataset(graphs, node_capacity=32768, edge_capacity=98304,
                     graph_capacity=2048, align_window=ell_w)
    )
    batch = as_batch(buckets[0], blocked="local_ell", window=ell_w, block=ell_b)

    n = batch["node_feat"].shape[0]
    L, H, D = params["proj_w"].shape[:3]
    u, v = jnp.asarray(batch["senders"]), jnp.asarray(batch["receivers"])
    P = batch["loc_ulocal"].shape[0]
    window, k_blocks = ell_geometry(batch)
    spill_lanes = int(u.shape[0]) - P
    print(f"geometry: window={window} k_blocks={k_blocks} "
          f"lanes={P} spill_lanes={spill_lanes}")

    h0 = jnp.zeros((n, H, D), prec.compute_dtype)
    h0 = h0.at[:, 0, :9].set(batch["node_feat"].astype(prec.compute_dtype))
    h0 = _project(params["proj_w"][0], h0, prec)
    s0 = _scores(h0, params["a_src"][0], prec)
    uloc = jnp.asarray(batch["loc_ulocal"])
    vloc = jnp.asarray(batch["loc_vlocal"])

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

    # --- full model ---
    def full(c):
        p = dict(params)
        p["proj_w"] = p["proj_w"] + c
        return c + spec.forward(p, batch, prec)[0, 0] * 0

    time_fn(reps(full), "full model")

    # --- attention kernel alone, 5 chained layers (no CSE possible) ---
    def kern(c):
        hf = h0.reshape(n, H * D) + c
        s = s0
        for _ in range(L):
            both = gat_local_message_ell(
                uloc, vloc, hf, s, s, window, k_blocks, H,
            )
            hf = both[:, : H * D]
            s = both[:, H * D :]
        return c + hf[0, 0] * 0

    time_fn(reps(kern), "kernel x5 (chained)")

    # --- spill tail alone, 5 chained layers ---
    if spill_lanes:
        def spill(c):
            hf = h0.reshape(n, H * D) + c
            s = s0
            for _ in range(L):
                raw_sp = jnp.take(s, v[P:], axis=0) + jnp.take(s, u[P:], axis=0)
                sc_sp = jnp.exp(
                    jnp.where(raw_sp < 0, raw_sp * LEAKY_SLOPE, raw_sp)
                )
                sc_sp = sc_sp * (v[P:] < n - 1)[:, None].astype(sc_sp.dtype)
                h_sp = jnp.take(hf, u[P:], axis=0)
                sp_both = segment_sum(
                    jnp.concatenate(
                        [jnp.repeat(sc_sp, D, axis=1) * h_sp, sc_sp], axis=1
                    ),
                    v[P:], n,
                )
                hf = sp_both[:, : H * D]
                s = sp_both[:, H * D :]
            return c + hf[0, 0] * 0

        time_fn(reps(spill), f"spill tail x5 ({spill_lanes} lanes)")
    else:
        print("spill tail x5                   (no spill lanes — skipped)")

    # --- glue alone (divide + skip + ELU + next proj + scores), 5 layers ---
    fake_both = jnp.ones((n, H * D + H), prec.compute_dtype)

    def glue(c):
        prev = h0 + c
        acc = c
        for l in range(L):
            msg = fake_both[:, : H * D].reshape(n, H, D) + prev * 0.001
            denom = fake_both[:, H * D :]
            msg = prec.q(msg / jnp.where(denom == 0, 1, denom)[:, :, None])
            skip = _project(params["skip_w"][l], prev, prec)
            if l != L - 1:
                feat = msg + skip
                feat = prec.q(jnp.where(feat <= 0, jnp.exp(feat) - 1, feat))
                h = _project(params["proj_w"][l], feat, prec)
                prev = h
                s_src = _scores(h, params["a_src"][l], prec)
                acc = acc + s_src[0, 0] * 0
            else:
                acc = acc + (msg + skip).sum(axis=1)[0, 0] * 0
        return acc

    time_fn(reps(glue), "glue x5 (chained)")

    # --- input embed + scores ---
    def embed(c):
        prev = jnp.zeros((n, H, D), prec.compute_dtype)
        prev = prev.at[:, 0, :9].set(
            batch["node_feat"].astype(prec.compute_dtype) + c
        )
        h = _project(params["proj_w"][0], prev, prec)
        s_src = _scores(h, params["a_src"][0], prec)
        s_tgt = _scores(h, params["a_tgt"][0], prec)
        return c + s_src[0, 0] * 0 + s_tgt[0, 0] * 0 + h[0, 0, 0] * 0

    time_fn(reps(embed), "embed (proj0 + scores)")


if __name__ == "__main__":
    main()
