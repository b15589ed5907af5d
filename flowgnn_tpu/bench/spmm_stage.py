"""SpMM-stage micro-benchmark — the isolated message-reduction kernel.

BASELINE.md's ">=70% of roofline" target names the SpMM (scatter) STAGE,
not the whole model; round 1 reported only whole-model-vs-light-speed
(with the relay dispatch floor folded in), which understates the kernel.
This module times the graph-local ELL scatter kernel alone (pass-through
epilogue: gather + message + scatter, no MLP) over the same batches the
model bench ran, and reports two honest numbers:

  * ``mxu_util`` — the kernel's own one-hot-matmul FLOPs vs MXU peak:
    how well the kernel as written drives the hardware;
  * ``roofline_frac`` — the USEFUL SpMM work (2·E·D flops, its HBM bytes)
    vs its light-speed time: algorithmic efficiency including the W×
    one-hot inflation the formulation pays to ride the MXU.
"""

from __future__ import annotations

import time

import numpy as np

from .roofline import V5E, Cost


def _spread(n: int, k: int = 4) -> list[int]:
    """Indices of up to ``k`` buckets spread across the stream (first,
    interior, LAST) instead of the first k in pack order — the trailing
    partially-filled bucket was systematically excluded before (ADVICE
    r4), biasing utilization ratios upward. The sampled indices ride the
    result record (``sampled_buckets``)."""
    if n <= k:
        return list(range(n))
    return sorted({round(i * (n - 1) / (k - 1)) for i in range(k)})


def measure_spmm_stage(
    batches: list[dict],
    prec,
    reps: int = 20,
    trials: int = 3,
    bf16: bool = True,
    layers: int = 5,
    dim: int = 100,
) -> dict:
    import jax
    import jax.numpy as jnp

    from ..models.base import ell_geometry
    from ..ops.pallas.local_layer import local_scatter_apply_ell

    w, _ = ell_geometry(batches[0])
    dt = prec.compute_dtype

    # The reported numbers are RATIOS (utilization, roofline fraction) —
    # stream-size independent — so long streams are measured on a
    # representative bucket subset instead of unrolling 30+ bodies.
    sampled = _spread(len(batches))
    batches = [batches[i] for i in sampled]
    datas = []
    lanes = real_edges = rows = 0
    for b in batches:
        n = b["node_feat"].shape[0]
        p = b["loc_ulocal"].shape[0]
        w, k_blocks = ell_geometry(b)
        nw = -(-n // w)
        datas.append(
            (jnp.asarray(b["loc_ulocal"]), jnp.asarray(b["loc_vlocal"]),
             nw, k_blocks)
        )
        lanes += p
        real_edges += int((np.asarray(b["loc_vlocal"]) < w).sum())
        rows += nw * w

    def epilogue(acc, h_win, spill_win):
        return acc + spill_win.astype(jnp.float32)

    def one_pass(c):
        for ul, vl, nw, kb in datas:
            h = jnp.zeros((nw * w, dim), dt) + c
            ee = jnp.zeros((ul.shape[0], dim), dt)
            spill = jnp.zeros((nw * w, dim), dt)
            for _ in range(layers):
                h = local_scatter_apply_ell(
                    ee, ul, vl, h, spill, (), epilogue, w, kb, dim
                )
            c = c + h[0, 0] * 0
        return c

    trial = jax.jit(
        lambda c: jax.lax.fori_loop(0, reps, lambda i, cc: one_pass(cc), c)
    )
    carry = jnp.zeros((), dt)
    np.asarray(trial(carry))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(trial(carry))
        best = min(best, (time.perf_counter() - t0) / reps)

    b_el = 2 if bf16 else 4
    # Kernel-as-written arithmetic: gather + scatter one-hot matmuls.
    onehot_flops = layers * 4.0 * lanes * w * dim
    out = _finish(onehot_flops, real_edges, lanes, rows, best, bf16,
                  layers, dim, b_el)
    out["sampled_buckets"] = sampled
    return out


def measure_slot_stage(
    batches: list[dict],
    prec,
    reps: int = 20,
    trials: int = 3,
    bf16: bool = True,
    layers: int = 4,
    dim: int = 100,
) -> dict:
    """Slot-layout analog of measure_spmm_stage: times the dest-major
    four-aggregate gather kernel alone (pna_local_stats_ell) over the
    batches' slot tables."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.local_layer import pna_local_stats_ell

    dt = prec.compute_dtype
    sampled = _spread(len(batches))  # see measure_spmm_stage
    batches = [batches[i] for i in sampled]
    datas = []
    lanes = real_edges = rows = 0
    for b in batches:
        n = b["node_feat"].shape[0]
        # Per-bucket geometry: the slot axis auto-sizes per bucket, so two
        # buckets of one stream may carry different S.
        w, s = (int(x) for x in b["slot_geom"].shape[-2:])
        us = b["slot_src"]
        datas.append((jnp.asarray(us), n, w, s))
        lanes += us.size
        real_edges += int((np.asarray(us) < w).sum())
        rows += -(-n // w) * w

    def one_pass(c):
        for us, n, w, s in datas:
            h = jnp.zeros((n, dim), dt) + c
            for _ in range(layers):
                st = pna_local_stats_ell(us, h, w, s, 0.0, 0.0)
                h = st[:, :dim]
            c = c + h[0, 0] * 0
        return c

    trial = jax.jit(
        lambda c: jax.lax.fori_loop(0, reps, lambda i, cc: one_pass(cc), c)
    )
    carry = jnp.zeros((), dt)
    np.asarray(trial(carry))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(trial(carry))
        best = min(best, (time.perf_counter() - t0) / reps)

    b_el = 2 if bf16 else 4
    onehot_flops = layers * 2.0 * lanes * w * dim  # one stacked gather
    out = _finish(onehot_flops, real_edges, lanes, rows, best, bf16,
                  layers, dim, b_el)
    out["sampled_buckets"] = sampled
    return out


def _finish(onehot_flops, real_edges, lanes, rows, best, bf16, layers, dim,
            b_el):
    # Useful SpMM work: one multiply-add per edge per dim for gather-sum and
    # for scatter-sum, plus the stage's unavoidable HBM traffic.
    useful = Cost(
        layers * 4.0 * real_edges * dim,
        layers * b_el * (3 * rows * dim + lanes * (dim + 8)),
    )
    peak = V5E.peak_bf16_flops if bf16 else V5E.peak_f32_flops
    return {
        "time_us": best * 1e6,
        "mxu_util": onehot_flops / best / peak,
        "roofline_frac": useful.light_speed_s(V5E, bf16) / best,
        "achieved_tflops": onehot_flops / best / 1e12,
    }
