"""Per-stage ablation for the dest-major SLOT paths (GAT / DGN) on the
real chip — where does the pass time go at the current default layout?

Same discipline as ablate_gat.py (which covers the older ELL path): each
stage CHAINS its L copies so XLA cannot CSE them, the whole stage runs
``reps`` passes inside the program behind a scalar carry, and one host
readback closes the trial. Subtract the noop row (relay dispatch floor)
to get device time per stage.

Run: ``python -m flowgnn_tpu.bench.ablate_slots --model gat|dgn
[--reps 100] [--trials 3] [--window W]``.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gat", choices=["gat", "dgn"])
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--graphs", type=int, default=1028)
    ap.add_argument("--window", type=int, default=None)
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
        ELL_GEOMETRY_DEFAULTS, as_batch, out_degree, prepare_params,
    )

    prec = BF16
    spec = registry.get(args.model)
    params = prepare_params(
        spec.loader(f"/root/reference/{spec.reference_dir}"), prec
    )
    graphs = registry.apply_transforms(
        spec,
        synthetic_dataset(
            "molhiv", seed=0, num_graphs=args.graphs,
            with_eigen=spec.needs_eigen,
        ),
    )
    w = args.window or ELL_GEOMETRY_DEFAULTS[args.model][0]
    bucket = next(
        iter(
            pack_dataset(
                graphs, node_capacity=32768, edge_capacity=98304,
                graph_capacity=2048, align_window=w,
                with_eigen=spec.needs_eigen,
            )
        )
    )
    batch = as_batch(bucket, blocked="local_slots", window=w)
    n = batch["node_feat"].shape[0]
    window, n_slots = (int(x) for x in batch["slot_geom"].shape[-2:])
    n_spill = int(batch["slot_spill"].shape[-1])
    print(f"geometry: window={window} slots={n_slots} spill={n_spill} "
          f"nodes={n} graphs={args.graphs}")
    num_graphs = args.graphs

    def time_fn(fn, label):
        jfn = jax.jit(fn)
        carry = jnp.zeros((), prec.compute_dtype)
        np.asarray(jfn(carry))
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(jfn(carry))
            times.append((time.perf_counter() - t0) / args.reps)
        best = min(times)
        print(f"{label:30s} {best * 1e3:8.3f} ms/pass "
              f"({best / num_graphs * 1e6:6.3f} us/graph)")
        return best

    def reps(body):
        def outer(c):
            return jax.lax.fori_loop(
                0, args.reps, lambda i, cc: body(cc), c
            )
        return outer

    time_fn(reps(lambda c: c + 1), "noop (dispatch floor)")

    def full(c):
        p = dict(params)
        key = "proj_w" if args.model == "gat" else "posttrans_w"
        p[key] = p[key] + c * 0
        return c + spec.forward(p, batch, prec)[0, 0] * 0 + c * 0

    time_fn(reps(full), "full model")

    if args.model == "gat":
        from ..models.gat import _project, _scores
        from ..ops.pallas.local_layer import gat_local_message_slots

        L, H, D = params["proj_w"].shape[:3]
        h0 = jnp.zeros((n, H, D), prec.compute_dtype)
        h0 = h0.at[:, 0, :9].set(batch["node_feat"].astype(prec.compute_dtype))
        h0 = _project(params["proj_w"][0], h0, prec)
        s0 = _scores(h0, params["a_src"][0], prec)
        uslot = jnp.asarray(batch["slot_stack"])

        def kern(c):
            hf = h0.reshape(n, H * D) + c
            s = s0
            for _ in range(L):
                msg = gat_local_message_slots(
                    uslot, hf, s, s, window, n_slots, H, divide=True,
                )
                hf = msg
                s = s + msg[:, :H] * 0
            return c + hf[0, 0] * 0

        time_fn(reps(kern), f"slot kernel x{L} (chained)")

        def glue(c):
            prev = h0 + c
            acc = c
            for l in range(L):
                msg = prev * 0.001
                skip = _project(params["skip_w"][l], prev, prec)
                if l != L - 1:
                    feat = msg + skip
                    feat = prec.q(
                        jnp.where(feat <= 0, jnp.exp(feat) - 1, feat)
                    )
                    h = _project(params["proj_w"][l], feat, prec)
                    prev = h
                    s_src = _scores(h, params["a_src"][l], prec)
                    acc = acc + s_src[0, 0] * 0
                else:
                    acc = acc + (msg + skip).sum(axis=1)[0, 0] * 0
            return acc

        time_fn(reps(glue), f"glue x{L} (skip+ELU+proj+scores)")

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
    else:  # dgn
        from ..models.dgn import EIG_EPS, _atom_embed_dgn
        from ..ops.pallas.local_layer import dgn_local_layer_slots
        from ..ops.segment import segment_sum

        L = params["posttrans_w"].shape[0]
        dt = prec.compute_dtype
        u, v = batch["senders"], batch["receivers"]
        eig = batch["node_eigen"][:, 1].astype(dt)
        eig_w = prec.q(jnp.take(eig, u) - jnp.take(eig, v))
        eig_abssum = segment_sum(jnp.abs(eig_w), v, n)
        eigw_sum = prec.q(segment_sum(eig_w, v, n))
        eig_abssum = prec.q(
            jnp.where(eig_abssum == 0, EIG_EPS, eig_abssum)
        )
        deg = jnp.maximum(out_degree(batch, None), 1).astype(dt)
        h0 = _atom_embed_dgn(params["atom_tables"], batch["node_feat"], prec)
        uslot = jnp.asarray(batch["slot_src"])

        def kern(c):
            h = h0 + c
            for l in range(L):
                w_post = params["posttrans_w"][l].reshape(
                    params["posttrans_w"].shape[1], -1
                ).T
                h = prec.q(
                    dgn_local_layer_slots(
                        uslot, h, eig, 1.0 / deg, eigw_sum,
                        1.0 / eig_abssum,
                        w_post, params["posttrans_b"][l][None, :],
                        window, n_slots,
                    )
                )
            return c + h[0, 0] * 0

        time_fn(reps(kern), f"slot layer x{L} (chained)")

        def aux(c):
            ew = prec.q(jnp.take(eig, u) - jnp.take(eig, v) + c * 0)
            ea = segment_sum(jnp.abs(ew), v, n)
            es = prec.q(segment_sum(ew, v, n))
            ea = prec.q(jnp.where(ea == 0, EIG_EPS, ea))
            d = jnp.maximum(out_degree(batch, None), 1).astype(dt)
            return c + ea[0] * 0 + es[0] * 0 + d[0] * 0

        time_fn(reps(aux), "aux (eig sums + degree)")

        def embed(c):
            from ..models.base import linear, mean_pool, relu

            h = _atom_embed_dgn(
                params["atom_tables"], batch["node_feat"], prec
            )
            h = h + c
            hg = mean_pool(h, batch, prec)
            z = relu(linear(hg, params["mlp1_w"], params["mlp1_b"], prec))
            z = relu(linear(z, params["mlp2_w"], params["mlp2_b"], prec))
            out = linear(z, params["mlp3_w"], params["mlp3_b"], prec)
            return c + out[0, 0] * 0

        time_fn(reps(embed), "embed + readout")


if __name__ == "__main__":
    main()
