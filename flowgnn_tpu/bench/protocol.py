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


def time_stream(spec, jparams, batches, prec, reps: int, trials: int):
    """Time ``reps`` chained passes over ``batches``; returns (best, avg)
    seconds per pass (whole stream, all buckets)."""
    import jax
    import jax.numpy as jnp

    emb_key = embedding_key(jparams)

    def one_pass(carry):
        c = carry
        for batch in batches:
            p = dict(jparams)
            p[emb_key] = p[emb_key] + c
            out = spec.forward(p, batch, prec)
            c = c + out[0, 0] * 0
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
