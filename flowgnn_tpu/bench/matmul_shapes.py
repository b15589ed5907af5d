"""Shape-achievable MXU throughput on v5e — the roofline re-derivation.

BASELINE.md's original ">=70% of per-chip roofline" target implicitly
assumed the SpMM stage's matmuls can approach the chip's NOMINAL peak.
They cannot: the stage's one-hot matmuls have one 128-lane output tile
(N = D <= 128) and a K of one window, and on v5e such shapes are bound by
MXU weight-reload serialization + M-row streaming, not by the multiplier
array. This tool measures PURE chained matmuls (no gather semantics, no
masks, no kernel glue) at exactly the kernels' shapes — the achievable
ceiling for any kernel built from those shapes — plus an int8 variant
(one-hot operands are exact in int8) and a fat near-ideal shape as the
sanity anchor.

Run: ``python -m flowgnn_tpu.bench.matmul_shapes [--reps 100]``.
Each row: shape, achieved TFLOP/s, % of nominal bf16 peak — the
"shape-achievable" column BENCH.md cites when stating the stage's
utilization relative to what its shapes allow.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

# (label, M, K, N, layers-per-step, grid, dtype)
SHAPES = [
    ("gin gather/scatter [896,384]@[384,128]", 896, 384, 128, 10, 85, "bf16"),
    ("gat slot gather [1536,256]@[256,128]", 1536, 256, 128, 5, 128, "bf16"),
    ("gat slot gather int8", 1536, 256, 128, 5, 128, "int8"),
    ("pna slot gather [512,512]@[512,128]", 512, 512, 128, 5, 64, "bf16"),
    ("glue [256,64]@[64,136]", 256, 64, 136, 5, 128, "bf16"),
    ("fat anchor [1024,1024]@[1024,256]", 1024, 1024, 256, 5, 48, "bf16"),
    ("fat anchor int8", 1024, 1024, 256, 5, 48, "int8"),
    # Round-5 stage shapes (SHAPE_CEILINGS in roofline.py): the ELL
    # gather/scatter at GIN-VN's W256/B640, the slot stage's per-slot
    # [W, W] @ [W, 128] at the W256 (gat/pna) and W384 (dgn) defaults,
    # and the paired-GAT shapes (two-hot K=2W gather; K=128 glue).
    ("gin-vn gather/scatter [640,256]@[256,128]", 640, 256, 128, 10, 128, "bf16"),
    ("slot-stage W256 [256,256]@[256,128]", 256, 256, 128, 10, 128, "bf16"),
    ("slot-stage W384 [384,384]@[384,128]", 384, 384, 128, 10, 96, "bf16"),
    ("gat pairs two-hot [896,512]@[512,128]", 896, 512, 128, 5, 64, "bf16"),
    ("gat pairs glue [256,128]@[128,256]", 256, 128, 256, 5, 128, "bf16"),
]


def measure(m, k, n, layers, grid, dtype, reps, trials=3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    int8 = dtype == "int8"
    dt = jnp.int8 if int8 else jnp.bfloat16

    def kernel(c_ref, a_ref, b_ref, o_ref):
        acc = jnp.zeros((m, n), jnp.float32) + c_ref[0, 0] * 0
        a = a_ref[:]
        for _ in range(layers):
            prod = jax.lax.dot_general(
                a, b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if int8 else jnp.float32,
            )
            acc += prod.astype(jnp.float32)
            # NONLINEAR inter-layer dependence: an affine chain lets the
            # compiler factor Σ aₗ@b = (Σ aₗ)@b into ONE matmul (observed:
            # >100% "efficiency" before the relu was added).
            a = (
                jnp.maximum(a.astype(jnp.float32), 0)
                + prod[:, :1].astype(jnp.float32) * 1e-9
            ).astype(dt)
        o_ref[:] = acc

    a = jnp.ones((grid * m, k), dt)
    b = jnp.ones((k, n), dt)

    def run(c):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            in_specs=[
                pl.BlockSpec((1, 1), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((m, k), lambda g: (g, 0)),
                pl.BlockSpec((k, n), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, n), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((grid * m, n), jnp.float32),
            interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
        )(c.reshape(1, 1), a, b)
        return c + out[0, 0] * 0

    trial = jax.jit(
        lambda c: jax.lax.fori_loop(0, reps, lambda i, cc: run(cc), c)
    )
    c0 = jnp.zeros((), jnp.float32)
    np.asarray(trial(c0))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(trial(c0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from .protocol import dispatch_floor
    from .roofline import V5E

    class _P:  # dispatch_floor wants a precision-like object
        compute_dtype = jnp.float32

    floor = dispatch_floor(_P())
    print(f"# relay floor {floor * 1e3:.2f} ms "
          f"({floor / args.reps * 1e6:.1f} us/rep amortized)")
    for label, m, k, n, layers, grid, dtype in SHAPES:
        t = measure(m, k, n, layers, grid, dtype, args.reps, args.trials)
        dev = t - floor / args.reps
        flops = 2.0 * m * k * n * layers * grid
        tf = flops / dev / 1e12
        peak = V5E.peak_bf16_flops / 1e12
        eff = tf / peak
        print(f"{label:45s} {dev * 1e6:9.1f} us  {tf:7.1f} TF/s "
              f"{eff * 100:5.1f}% of nominal bf16 peak")


if __name__ == "__main__":
    main()
