"""Fused GNN layer kernel: windowed scatter + update epilogue in VMEM.

This is the full TPU translation of the reference's dataflow layer engine
(GIN/src/conv_layer.cc:37-58): where the FPGA overlaps the scatter PEs and
the apply-unit MLP through FIFO streams, here one Pallas kernel accumulates a
window's messages in VMEM f32 scratch and — on the window's last edge block —
immediately runs the node-update epilogue (e.g. GIN's dim→2dim→dim MLP,
GIN/src/node_embedding.cc:117-192) on the MXU while the accumulator is still
on-chip. The [N, D] message tensor never exists in HBM.

The epilogue is a trace-time Python callback, so each model family composes
its own update math over the same scatter skeleton.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def windowed_scatter_apply(
    vals: jnp.ndarray,  # [P, D] blocked-order edge values (sentinel pads)
    v_local: jnp.ndarray,  # [P] int32 in-window receiver (== window on pads)
    block_window: jnp.ndarray,  # [num_blocks] int32 non-decreasing
    h: jnp.ndarray,  # [num_windows·window, D] node features (window-padded)
    extras: Sequence[jnp.ndarray],  # whole-array VMEM operands (weights, ...)
    epilogue: Callable,  # (acc_f32[W,D], h_win[W,D], *extra_refs) -> [W, out_dim]
    window: int,
    out_dim: int,
) -> jnp.ndarray:
    """Returns [num_windows·window, out_dim] updated node features."""
    p, d = vals.shape
    num_blocks = block_window.shape[0]
    block = p // num_blocks
    num_windows = h.shape[0] // window

    def kernel(bw_ref, vloc_ref, vals_ref, h_ref, *rest):
        out_ref, acc_ref = rest[-2], rest[-1]
        extra_refs = rest[:-2]
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        w = bw_ref[b]
        prev_w = bw_ref[jnp.maximum(b - 1, 0)]
        next_w = bw_ref[jnp.minimum(b + 1, nb - 1)]
        is_first = jnp.logical_or(b == 0, prev_w != w)
        is_last = jnp.logical_or(b == nb - 1, next_w != w)

        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
        onehot = (vloc_ref[:, 0][:, None] == lanes).astype(vals_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot,
            vals_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(is_last)
        def _():
            out_ref[:] = epilogue(acc_ref[:], h_ref[:], *extra_refs).astype(
                out_ref.dtype
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda b, bw: (b, 0)),
            pl.BlockSpec((block, d), lambda b, bw: (b, 0)),
            pl.BlockSpec((window, d), lambda b, bw: (bw[b], 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras],
        ],
        out_specs=pl.BlockSpec((window, out_dim), lambda b, bw: (bw[b], 0)),
        scratch_shapes=[pltpu.VMEM((window, d), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * window, out_dim), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * window * d,
            bytes_accessed=(p + 2 * num_windows * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(block_window, v_local[:, None], vals, h, *extras)


def gin_layer_fused(
    vals: jnp.ndarray,
    v_local: jnp.ndarray,
    block_window: jnp.ndarray,
    h: jnp.ndarray,  # [n, D] (will be window-padded internally)
    w1: jnp.ndarray,  # [2D, D]
    b1: jnp.ndarray,  # [2D]
    w2: jnp.ndarray,  # [D, 2D]
    b2: jnp.ndarray,  # [D]
    eps1: jnp.ndarray,  # [1, 1] f32 = 1 + ε_l
    window: int,
    final_relu: bool,
) -> jnp.ndarray:
    """One whole GIN layer: h' = MLP((1+ε)h + Σ relu(h_u + ee)) fused."""
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h

    def epilogue(acc, h_win, w1_ref, b1_ref, w2_ref, b2_ref, eps_ref):
        act = (acc + eps_ref[0, 0] * h_win.astype(jnp.float32)).astype(h.dtype)
        z = jax.lax.dot_general(
            act, w1_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        z = jnp.maximum(z, 0).astype(h.dtype)
        out = jax.lax.dot_general(
            z, w2_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)
        if final_relu:
            out = jnp.maximum(out, 0)
        return out

    out = windowed_scatter_apply(
        vals, v_local, block_window, hp,
        (w1, b1[None, :], w2, b2[None, :], eps1),
        epilogue, window, d,
    )
    return out[:n]
