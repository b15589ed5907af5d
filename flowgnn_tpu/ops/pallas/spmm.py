"""Pallas TPU kernel: windowed one-hot segment-sum (the fused scatter).

Replaces XLA's scatter-add lowering for the message-passing reduction with
MXU matmuls: edges arrive segment-sorted and blocked (core/blocking.py), and
each [block]-edge chunk scatters into its [window]-node output slice as

    out[window, D] += onehot[block, window]ᵀ @ values[block, D]

a dense 128×128-shaped matmul per block — the systolic-array translation of
the reference's per-PE conflict-free scatter loop
(GIN/src/message_passing.cc:77-150). The output block is *revisited* for
consecutive blocks of the same window (standard TPU accumulation pattern);
accumulation runs in a f32 VMEM scratch and is flushed on each window's last
block.

Grid is data-independent: pad blocks carry sentinel lanes (v_local ==
window) whose one-hot row is all-zero, so they contribute nothing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(block_window_ref, vloc_ref, vals_ref, out_ref, acc_ref):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    w = block_window_ref[b]
    prev_w = block_window_ref[jnp.maximum(b - 1, 0)]
    next_w = block_window_ref[jnp.minimum(b + 1, nb - 1)]
    is_first = jnp.logical_or(b == 0, prev_w != w)
    is_last = jnp.logical_or(b == nb - 1, next_w != w)

    window = out_ref.shape[0]
    block = vals_ref.shape[0]

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
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "num_windows"))
def windowed_segment_sum(
    values: jnp.ndarray,  # [P, D] edge values in blocked order (pads zeroed or sentinel'd)
    v_local: jnp.ndarray,  # [P, 1] int32 in-window receiver (== window for pads)
    block_window: jnp.ndarray,  # [num_blocks] int32, non-decreasing
    window: int,
    num_windows: int,
) -> jnp.ndarray:
    """Returns [num_windows·window, D] summed messages (slice to N rows)."""
    p, d = values.shape
    num_blocks = block_window.shape[0]
    block = p // num_blocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda b, bw: (b, 0)),
            pl.BlockSpec((block, d), lambda b, bw: (b, 0)),
        ],
        out_specs=pl.BlockSpec((window, d), lambda b, bw: (bw[b], 0)),
        scratch_shapes=[pltpu.VMEM((window, d), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * window, d), values.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * window * d, bytes_accessed=(p + num_windows * window) * d * 4,
            transcendentals=0,
        ),
        # CPU tests run the kernel interpreted (no Mosaic backend there).
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(block_window, v_local, values)


def segment_sum_blocked(
    vals: jnp.ndarray,  # [P, D] edge values ALREADY in blocked order
    v_local: jnp.ndarray,  # [P] int32 (sentinel ``window`` on pad lanes)
    block_window: jnp.ndarray,  # [num_blocks]
    num_nodes: int,
    window: int,
) -> jnp.ndarray:
    """Kernel entry for batches packed in blocked edge order (no runtime
    permutation or masking — pad lanes self-mask via the sentinel).

    (Measured on v5e: zero-padding the feature dim to a lane multiple costs
    more in extra copies than the alignment buys — D=100 runs fine.)
    """
    num_windows = -(-num_nodes // window)
    out = windowed_segment_sum(
        vals, v_local[:, None], block_window, window, num_windows
    )
    return out[:num_nodes]


def segment_sum_via_blocks(
    edge_values: jnp.ndarray,  # [E, D] values in ORIGINAL edge order
    perm: jnp.ndarray,  # [P] int32 blocked gather indices
    valid: jnp.ndarray,  # [P] bool
    v_local: jnp.ndarray,  # [P] int32
    block_window: jnp.ndarray,  # [num_blocks]
    num_nodes: int,
    window: int,
) -> jnp.ndarray:
    """Convenience wrapper: permute + mask + kernel + slice to [num_nodes, D].

    The permute/mask is a single XLA gather that fuses with whatever produced
    ``edge_values``; only the reduction runs in the kernel.
    """
    num_windows = -(-num_nodes // window)
    vals = jnp.take(edge_values, perm, axis=0) * valid[:, None].astype(
        edge_values.dtype
    )
    out = windowed_segment_sum(
        vals, v_local[:, None], block_window, window, num_windows
    )
    return out[:num_nodes]
