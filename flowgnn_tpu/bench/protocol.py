"""Device-resident stream timing protocol (shared by bench.py and `cli tune`).

Mirrors the reference's measurement discipline (GIN/src/host.cc:203-210 +
run_experiments.sh:44-46): weights and the whole packed graph stream are
closed over as executable constants (device-resident — the axon relay
re-uploads plain jit arguments every call), every pass is chained through a
scalar carry feeding the embedding table (strict serialization, no constant
folding), ``reps`` passes run INSIDE one program via fori_loop (one dispatch
per trial), and a single host readback closes each trial (the relay's
block_until_ready can return early — np.asarray is the only reliable fence).
"""

from __future__ import annotations

import time

import numpy as np


def embedding_key(jparams: dict) -> str:
    return (
        "node_embedding" if "node_embedding" in jparams
        else "atom_tables" if "atom_tables" in jparams
        else "proj_w"
    )


import os

# Scan-stack same-signature buckets beyond this count (env override for
# testing / forcing either path).
STACK_THRESHOLD = int(os.environ.get("FLOWGNN_STACK_THRESHOLD", "6"))


def time_stream(spec, jparams, batches, prec, reps: int, trials: int):
    """Time ``reps`` chained passes over ``batches``; returns (best, avg)
    seconds per pass (whole stream, all buckets).

    Long streams: buckets sharing one program signature (see
    base.as_batches_uniform) are STACKED and driven by a lax.scan when
    the group exceeds STACK_THRESHOLD, so program size and compile time
    stay independent of stream length — a 43k-graph molpcba stream (43
    buckets) compiles one bucket body, exactly as the reference compiles
    one kernel for its whole-dataset enqueue. Small groups stay unrolled
    (a scan's per-step dynamic-slice of the stacked device constants
    costs a little; unrolled constants cost nothing)."""
    import jax
    import jax.numpy as jnp

    from ..models.base import batch_signature

    emb_key = embedding_key(jparams)

    groups: dict = {}
    for batch in batches:
        groups.setdefault(batch_signature(batch), []).append(batch)
    progs = []
    for bs in groups.values():
        # Spill-carrying layouts read VALUES of their static metadata at
        # trace time (spill_segment_sum's T = spill_blk_window.max();
        # spill_gather's window count) — under a scan the stacked leaves
        # become tracers AND those statics are per-bucket, so stacking
        # them is both a crash and semantically wrong (ADVICE r4). Keep
        # spill buckets unrolled; no-spill uniform buckets (the molpcba
        # full-dataset protocol) stack.
        spilly = any(
            k in bs[0] for k in ("spill_blk_window", "spill_gblk_src")
        )
        if len(bs) > STACK_THRESHOLD and not spilly:
            progs.append(
                ("scan", {k: np.stack([b[k] for b in bs]) for k in bs[0]})
            )
        else:
            progs.extend(("single", b) for b in bs)

    def bucket_step(c, batch):
        p = dict(jparams)
        p[emb_key] = p[emb_key] + c
        out = spec.forward(p, batch, prec)
        return c + out[0, 0] * 0

    def one_pass(carry):
        c = carry
        for kind, b in progs:
            if kind == "single":
                c = bucket_step(c, b)
            else:
                c, _ = jax.lax.scan(
                    lambda cc, bb: (bucket_step(cc, bb), None), c, b
                )
        return c

    def trial_fn(carry):
        return jax.lax.fori_loop(0, reps, lambda i, c: one_pass(c), carry)

    trial = jax.jit(trial_fn)
    carry = jnp.zeros((), prec.compute_dtype)
    np.asarray(trial(carry))  # compile + warm

    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        c = trial(carry)
        np.asarray(c)
        times.append((time.perf_counter() - t0) / reps)
    return min(times), sum(times) / len(times)


def dispatch_floor(prec, trials: int = 3) -> float:
    """Best-case relay round-trip of a trivial program — the per-call floor
    that ``reps`` amortizes into each pass (reported separately per run)."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda c: c + 1.0)
    carry = jnp.zeros((), prec.compute_dtype)
    np.asarray(fn(carry))
    floors = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(fn(carry))
        floors.append(time.perf_counter() - t0)
    return min(floors)
