"""Graph-local fused layer kernel: gather + message + scatter + update, one pass.

The decisive TPU-first design point (measured in BENCH.md: the per-edge
gather and scatter are each ~6× the MLP cost because they are HBM
random-access): window-aligned packing (core/graphs.pack_graphs_aligned)
guarantees whole graphs live inside one 128-node window, so for a window's
edge block BOTH endpoints are in-window indices and

    h_u   = onehot_u  @ h_window        (gather — MXU)
    msg   = relu(h_u + ee)              (VPU)
    acc  += onehot_vᵀ @ msg             (scatter — MXU)

run entirely against VMEM-resident state, with the node-update MLP as the
epilogue on each window's last block. No [E, D] tensor ever exists in HBM.
This is the closest TPU analog of the reference keeping a graph's entire
state in BRAM while scatter PEs and the apply unit stream over it
(GIN/src/conv_layer.cc:37-58, GIN/src/globals.cc).

Window-crossing edges (graphs larger than the window) arrive pre-reduced as
a spill-message tensor added in the epilogue.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ELL grids: the window dimension writes disjoint output rows (parallel);
# the inner dimension accumulates into VMEM scratch and must stay in order.
_ELL_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary")
)


def local_scatter_apply(
    ee: jnp.ndarray,  # [P, D] per-lane edge embeddings (blocked local order)
    u_local: jnp.ndarray,  # [P] int32 in-window source (sentinel on pads)
    v_local: jnp.ndarray,  # [P] int32 in-window dest (sentinel on pads)
    block_window: jnp.ndarray,  # [num_blocks] int32 non-decreasing
    h: jnp.ndarray,  # [num_windows·window, D]
    m_spill: jnp.ndarray,  # [num_windows·window, D] pre-reduced crossing msgs
    extras: Sequence[jnp.ndarray],
    epilogue: Callable,  # (acc_f32, h_win, spill_win, *extra_refs) -> [W, out]
    window: int,
    out_dim: int,
) -> jnp.ndarray:
    p, d = ee.shape
    num_blocks = block_window.shape[0]
    block = p // num_blocks
    num_windows = h.shape[0] // window

    def kernel(bw_ref, uloc_ref, vloc_ref, ee_ref, h_ref, spill_ref, *rest):
        out_ref, acc_ref = rest[-2], rest[-1]
        extra_refs = rest[:-2]
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        w = bw_ref[b]
        is_first = jnp.logical_or(b == 0, bw_ref[jnp.maximum(b - 1, 0)] != w)
        is_last = jnp.logical_or(
            b == nb - 1, bw_ref[jnp.minimum(b + 1, nb - 1)] != w
        )

        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
        onehot_u = (uloc_ref[:, 0][:, None] == lanes).astype(h_ref.dtype)
        h_u = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        msg = jnp.maximum(h_u + ee_ref[:].astype(jnp.float32), 0).astype(
            h_ref.dtype
        )
        onehot_v = (vloc_ref[:, 0][:, None] == lanes).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(is_last)
        def _():
            out_ref[:] = epilogue(
                acc_ref[:], h_ref[:], spill_ref[:], *extra_refs
            ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda b, bw: (b, 0)),
            pl.BlockSpec((block, 1), lambda b, bw: (b, 0)),
            pl.BlockSpec((block, d), lambda b, bw: (b, 0)),
            pl.BlockSpec((window, d), lambda b, bw: (bw[b], 0)),
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
            flops=4 * p * window * d,
            bytes_accessed=(p + 3 * num_windows * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(block_window, u_local[:, None], v_local[:, None], ee, h, m_spill, *extras)


def gin_local_layer(
    ee: jnp.ndarray,
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    block_window: jnp.ndarray,
    h: jnp.ndarray,  # [n, D]
    m_spill: jnp.ndarray,  # [n, D]
    w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
    eps1: jnp.ndarray,  # [1, 1] f32 = 1 + ε
    window: int,
    final_relu: bool,
) -> jnp.ndarray:
    """One whole GIN layer against window-local state."""
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        m_spill = jnp.pad(m_spill, ((0, pad), (0, 0)))

    def epilogue(acc, h_win, spill_win, w1_ref, b1_ref, w2_ref, b2_ref, eps_ref):
        act = (
            acc
            + spill_win.astype(jnp.float32)
            + eps_ref[0, 0] * h_win.astype(jnp.float32)
        ).astype(h.dtype)
        z = jax.lax.dot_general(
            act, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        z = jnp.maximum(z, 0).astype(h.dtype)
        out = jax.lax.dot_general(
            z, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)
        if final_relu:
            out = jnp.maximum(out, 0)
        return out

    out = local_scatter_apply(
        ee, u_local, v_local, block_window, h, m_spill,
        (w1, b1[None, :], w2, b2[None, :], eps1),
        epilogue, window, d,
    )
    return out[:n]


def _local_scatter_apply_ell_wps(
    ee,  # [NW·B, D] or None (then edge_attr+ee_table)
    edge_attr,  # [NW·B, 3] int32 or None
    ee_table,  # [V, D] or None
    u_local, v_local, h, m_spill, extras, epilogue,
    window: int, wps: int, out_dim: int,
) -> jnp.ndarray:
    """Multi-window grid step (k_blocks == 1 layouts only): each Pallas step
    owns ``wps`` consecutive windows. The per-window gather/message/scatter
    runs as an unrolled inner loop over static slices of the step's block,
    and the epilogue is applied ONCE over the stacked [wps·W, D] accumulator
    — wps× fewer grid steps paying dispatch overhead, and wps×-taller
    epilogue matmuls for the MXU. Trailing pad windows (to a wps multiple)
    carry sentinel lanes, so their one-hot rows are zero."""
    p = (ee if ee is not None else edge_attr).shape[0]
    d = h.shape[1]
    num_windows = h.shape[0] // window
    block = p // num_windows
    nw_pad = (-num_windows) % wps
    if nw_pad:
        h = jnp.pad(h, ((0, nw_pad * window), (0, 0)))
        m_spill = jnp.pad(m_spill, ((0, nw_pad * window), (0, 0)))
        lane_pad = jnp.full((nw_pad * block,), window, u_local.dtype)
        u_local = jnp.concatenate([u_local, lane_pad])
        v_local = jnp.concatenate([v_local, lane_pad])
        if ee is not None:
            ee = jnp.pad(ee, ((0, nw_pad * block), (0, 0)))
        if edge_attr is not None:
            edge_attr = jnp.pad(edge_attr, ((0, nw_pad * block), (0, 0)))
    nw_total = num_windows + nw_pad
    groups = nw_total // wps
    in_kernel_ee = edge_attr is not None
    vocab = ee_table.shape[0] if in_kernel_ee else 0

    def kernel(*refs):
        if in_kernel_ee:
            attr_ref, uloc_ref, vloc_ref, tab_ref, h_ref, spill_ref = refs[:6]
            extra_refs = refs[6:-1]
        else:
            uloc_ref, vloc_ref, ee_ref, h_ref, spill_ref = refs[:5]
            extra_refs = refs[5:-1]
        out_ref = refs[-1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
        uloc = uloc_ref[:, 0]
        vloc = vloc_ref[:, 0]
        hh = h_ref[:]
        accs = []
        for i in range(wps):
            ls = slice(i * block, (i + 1) * block)
            hw = hh[i * window : (i + 1) * window]
            if in_kernel_ee:
                attr = attr_ref[ls]
                vlanes = jax.lax.broadcasted_iota(jnp.int32, (block, vocab), 1)
                multihot = (
                    (attr[:, 0][:, None] == vlanes).astype(hh.dtype)
                    + (attr[:, 1][:, None] == vlanes).astype(hh.dtype)
                    + (attr[:, 2][:, None] == vlanes).astype(hh.dtype)
                )
                ee_i = jnp.dot(
                    multihot, tab_ref[:], preferred_element_type=jnp.float32
                )
            else:
                ee_i = ee_ref[ls].astype(jnp.float32)
            onehot_u = (uloc[ls][:, None] == lanes).astype(hh.dtype)
            h_u = jnp.dot(onehot_u, hw, preferred_element_type=jnp.float32)
            msg = jnp.maximum(h_u + ee_i, 0).astype(hh.dtype)
            onehot_v = (vloc[ls][:, None] == lanes).astype(hh.dtype)
            accs.append(jax.lax.dot_general(
                onehot_v, msg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        acc = jnp.concatenate(accs, axis=0)
        out_ref[:] = epilogue(acc, hh, spill_ref[:], *extra_refs).astype(
            out_ref.dtype
        )

    lane_specs = [
        pl.BlockSpec((wps * block, 1), lambda g: (g, 0)),
        pl.BlockSpec((wps * block, 1), lambda g: (g, 0)),
    ]
    if in_kernel_ee:
        in_specs = [
            pl.BlockSpec((wps * block, 3), lambda g: (g, 0)),
            *lane_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        ins = (edge_attr, u_local[:, None], v_local[:, None], ee_table)
    else:
        in_specs = [
            *lane_specs,
            pl.BlockSpec((wps * block, d), lambda g: (g, 0)),
        ]
        ins = (u_local[:, None], v_local[:, None], ee)
    in_specs += [
        pl.BlockSpec((wps * window, d), lambda g: (g, 0)),
        pl.BlockSpec((wps * window, d), lambda g: (g, 0)),
        *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras],
    ]
    out = pl.pallas_call(
        kernel,
        grid=(groups,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wps * window, out_dim), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((nw_total * window, out_dim), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(6 if in_kernel_ee else 4) * p * window * d,
            bytes_accessed=(p + 3 * nw_total * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(*ins, h, m_spill, *extras)
    return out[: num_windows * window]


def _ell_meta(u_local, v_local, edge_attr, window: int, dtype):
    """Pack the per-lane edge metadata into ONE small-float array
    [P, 2 or 5]: (uloc−half, vloc−half, attr…). A [P, 1]-blocked int32
    index input is DMA-padded to full (8,128) tiles — a measured ~128x
    traffic inflation; one packed bf16 array costs the same tiles as a
    single column at HALF the int32 tile size, cutting the kernels'
    dominant input traffic ~6x (GIN geometry). Indices are recentered by
    window//2 so bf16 stays exact through W=512 (|int| ≤ 256); wider
    windows fall back to f32 (still 3 arrays → 1). The pack is
    loop-invariant — XLA hoists it out of the pass loop."""
    half = window // 2 if window <= 512 else 0
    mdt = jnp.bfloat16 if window <= 512 else jnp.float32
    cols = [u_local[:, None] - half, v_local[:, None] - half]
    if edge_attr is not None:
        cols.append(edge_attr)
    return (
        jnp.concatenate(cols, axis=1).astype(mdt),
        half,
        mdt == jnp.float32,
    )


def local_scatter_apply_ell(
    ee: jnp.ndarray,  # [NW·K·B, D]
    u_local: jnp.ndarray,  # [NW·K·B]
    v_local: jnp.ndarray,  # [NW·K·B]
    h: jnp.ndarray,  # [NW·W, D]
    m_spill: jnp.ndarray,  # [NW·W, D]
    extras: Sequence[jnp.ndarray],
    epilogue: Callable,
    window: int,
    k_blocks: int,
    out_dim: int,
    wps: int = 1,
) -> jnp.ndarray:
    """ELL-grid variant: (num_windows, k_blocks) grid with static index maps
    — no scalar prefetch, ~3× lower per-block overhead (BENCH.md)."""
    if wps > 1 and k_blocks == 1:
        return _local_scatter_apply_ell_wps(
            ee, None, None, u_local, v_local, h, m_spill, extras, epilogue,
            window, wps, out_dim,
        )
    p, d = ee.shape
    num_windows = h.shape[0] // window
    block = p // (num_windows * k_blocks)

    meta, half, _ = _ell_meta(u_local, v_local, None, window, h.dtype)

    def kernel(meta_ref, ee_ref, h_ref, spill_ref, *rest):
        out_ref, acc_ref = rest[-2], rest[-1]
        extra_refs = rest[:-2]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        mf = meta_ref[:].astype(jnp.float32)
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        h_u = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        msg = jnp.maximum(h_u + ee_ref[:].astype(jnp.float32), 0).astype(
            h_ref.dtype
        )
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            out_ref[:] = epilogue(
                acc_ref[:], h_ref[:], spill_ref[:], *extra_refs
            ).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 2), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec((block, d), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec((window, d), lambda w, k: (w, 0)),
            pl.BlockSpec((window, d), lambda w, k: (w, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras],
        ],
        out_specs=pl.BlockSpec((window, out_dim), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, out_dim), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * p * window * d,
            bytes_accessed=(p + 3 * num_windows * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, ee, h, m_spill, *extras)


def local_scatter_apply_ell_attr(
    edge_attr: jnp.ndarray,  # [NW·K·B, 3] int32 bond features (+offsets applied)
    ee_table: jnp.ndarray,  # [13, D] this layer's bond-embedding table
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,
    m_spill: jnp.ndarray,
    extras: Sequence[jnp.ndarray],
    epilogue: Callable,
    window: int,
    k_blocks: int,
    out_dim: int,
    wps: int = 1,
) -> jnp.ndarray:
    """ELL local kernel with IN-KERNEL edge embedding: per block a multi-hot
    [B, 13] (three ones per lane — the 3 bond features against the
    concatenated table, GIN/src/message_passing.cc:136-146) matmuls the
    [13, D] table on the MXU, so the [E, D] edge-embedding tensor never
    exists (profiled at ~220 µs/layer of pure HBM traffic in the XLA form)."""
    if wps > 1 and k_blocks == 1:
        return _local_scatter_apply_ell_wps(
            None, edge_attr, ee_table, u_local, v_local, h, m_spill,
            extras, epilogue, window, wps, out_dim,
        )
    p, _ = edge_attr.shape
    d = h.shape[1]
    num_windows = h.shape[0] // window
    block = p // (num_windows * k_blocks)
    vocab = ee_table.shape[0]
    meta, half, mf32 = _ell_meta(u_local, v_local, edge_attr, window, h.dtype)

    def kernel(meta_ref, ee_tab_ref, h_ref, spill_ref, *rest):
        out_ref, acc_ref = rest[-2], rest[-1]
        extra_refs = rest[:-2]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        vlanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, vocab), 1
        ).astype(jnp.float32)
        mf = meta_ref[:].astype(jnp.float32)
        multihot = (
            (mf[:, 2:3] == vlanes).astype(h_ref.dtype)
            + (mf[:, 3:4] == vlanes).astype(h_ref.dtype)
            + (mf[:, 4:5] == vlanes).astype(h_ref.dtype)
        )
        ee = jnp.dot(
            multihot, ee_tab_ref[:], preferred_element_type=jnp.float32
        )
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        h_u = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        msg = jnp.maximum(h_u + ee, 0).astype(h_ref.dtype)
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            out_ref[:] = epilogue(
                acc_ref[:], h_ref[:], spill_ref[:], *extra_refs
            ).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 5), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((window, d), lambda w, k: (w, 0)),
            pl.BlockSpec((window, d), lambda w, k: (w, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras],
        ],
        out_specs=pl.BlockSpec((window, out_dim), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, out_dim), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * p * window * d,
            bytes_accessed=(p + 3 * num_windows * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, ee_table, h, m_spill, *extras)


def gin_local_message_ell(
    edge_attr, ee_table, u_local, v_local, h, window, k_blocks, wps=1,
):
    """Message-only GIN ELL kernel: m[v] = Σ relu(h_u + ee), edge embedding
    in-kernel — and NO spill/halo operand, so on the halo-sharded path the
    boundary-row all_to_all has no data edge into this kernel and XLA's
    latency-hiding scheduler overlaps the collective with the window-local
    aggregation (SURVEY §5's mapping of the reference's FIFO overlap,
    GIN/src/conv_layer.cc:48-57). The caller folds the halo-sourced spill
    term and runs the MLP after the merge (models/gin.py)."""
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
    zeros = jnp.zeros_like(h)

    def epilogue(acc, h_win, spill_win, *_):
        return (acc + spill_win.astype(jnp.float32)).astype(h.dtype)

    out = local_scatter_apply_ell_attr(
        edge_attr, ee_table, u_local, v_local, h, zeros,
        (), epilogue, window, k_blocks, d, wps=wps,
    )
    return out[:n]


def gin_local_layer_ell(
    ee, u_local, v_local, h, m_spill,
    w1, b1, w2, b2, eps1, window, k_blocks, final_relu,
    edge_attr=None, ee_table=None, wps=1,
):
    """GIN layer over the ELL local layout (static grid). If ``edge_attr``
    and ``ee_table`` are given, the edge embedding is computed in-kernel and
    ``ee`` is ignored."""
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        m_spill = jnp.pad(m_spill, ((0, pad), (0, 0)))

    def epilogue(acc, h_win, spill_win, w1_ref, b1_ref, w2_ref, b2_ref, eps_ref):
        act = (
            acc + spill_win.astype(jnp.float32)
            + eps_ref[0, 0] * h_win.astype(jnp.float32)
        ).astype(h.dtype)
        z = jax.lax.dot_general(
            act, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        z = jnp.maximum(z, 0).astype(h.dtype)
        out = jax.lax.dot_general(
            z, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)
        if final_relu:
            out = jnp.maximum(out, 0)
        return out

    extras = (w1, b1[None, :], w2, b2[None, :], eps1)
    if edge_attr is not None:
        out = local_scatter_apply_ell_attr(
            edge_attr, ee_table, u_local, v_local, h, m_spill,
            extras, epilogue, window, k_blocks, d, wps=wps,
        )
    else:
        out = local_scatter_apply_ell(
            ee, u_local, v_local, h, m_spill,
            extras, epilogue, window, k_blocks, d, wps=wps,
        )
    return out[:n]


def _pool_epilogue(h, x_ref, gl_col: int, predw_ref, window: int, gmax: int):
    """In-kernel finalize: per-node head matvec (commutes with
    mean-pooling) + per-window pooling via one [W, GMAX] one-hot matmul
    (the graph-local-id column rides the feature tile —
    base._attach_pool_layout). Returns [GMAX, T] f32 per-graph prediction
    SUMS; the caller's base.pool_finish divides by node counts and adds
    the bias. Replaces the XLA segment-sum scatter whose per-ROW cost was
    the whole readout (~0.15 ms/pass at [33k, 100] on v5e)."""
    p = jnp.dot(
        h.astype(x_ref.dtype), predw_ref[:],
        preferred_element_type=jnp.float32,
    )
    gl = x_ref[:, gl_col : gl_col + 1].astype(jnp.float32)
    giota = jax.lax.broadcasted_iota(
        jnp.int32, (window, gmax), 1
    ).astype(jnp.float32)
    ohg = (gl == giota).astype(jnp.float32)
    return jax.lax.dot_general(
        ohg, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def gin_local_model(
    edge_attr: jnp.ndarray,  # [P, 3] int32 bond features (offsets applied)
    u_local: jnp.ndarray,  # [P]
    v_local: jnp.ndarray,  # [P]
    h0: jnp.ndarray,  # [n, D] embedded input features
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    ee_tables: jnp.ndarray,  # [L·13, D] stacked bond-embedding tables
    w1_all: jnp.ndarray,  # [L·H, D] stacked MLP-1 weights
    b1_all: jnp.ndarray,  # [L, H]
    w2_all: jnp.ndarray,  # [L·D, H] stacked MLP-2 weights
    b2_all: jnp.ndarray,  # [L, D]
    eps_all: jnp.ndarray,  # [L, 1] f32 (1+ε per layer)
    pred_w: jnp.ndarray,  # [D, T] prediction head (right-mul)
    window: int,
    num_layers: int,
    gmax: int,
    vn_col: jnp.ndarray | None = None,  # [n] analytic-VN flag (GIN-VN)
) -> jnp.ndarray:
    """The ENTIRE GIN model (all L conv layers + finalize) in ONE pallas
    call.

    Megakernel over the k=1 ELL local layout: one grid step runs all L
    layers for its window — the edge multi-hot ([B, 13] bond features ≙
    GIN/src/message_passing.cc:136-146) and gather/scatter one-hots are
    built once (topology is layer-invariant), h stays in VMEM across
    layers, and the [B, 5] packed edge metadata is DMA'd once instead of
    L×. Per-layer math ≡ gin_local_layer_ell (message relu(h_u+ee) summed
    at dest; MLP update with (1+ε)·h ≙ GIN/src/node_embedding.cc:117-192,
    ReLU after except the last layer). The epilogue runs the finalize
    stage in-kernel like the reference's dataflow finalize
    (GIN/src/finalize.cc:14-115): the prediction matvec is applied
    per-node (it commutes with mean-pooling) and pooled per window with a
    [W, GMAX] one-hot matmul — no XLA segment-sum scatter remains in the
    model. Returns per-(window, graph-slot) prediction SUMS
    [NW·GMAX, T] (f32) for base.pool_finish to divide + bias. No-spill
    k=1 only (caller falls back per layer otherwise).

    ``vn_col`` (GIN-VN, core.graphs.add_virtual_node_analytic): the VN
    star's 2N edges are computed algebraically per layer — every star
    edge shares the constant edge embedding e0 (bond attr (0,0,0)), so
    m[vn] = Σ_real relu(h_v+e0) is a per-graph pool and m[real v] +=
    relu(h_vn+e0) a per-graph broadcast, both via the SAME [W, GMAX]
    pool one-hot the finalize uses (GIN-VN/src/host_load.cc:137-153 ≙
    two [W, GMAX] matmuls per layer instead of 2N scatter lanes — the VN
    hub in-degree was the one edge load that grew with graph size).
    """
    n, d = h0.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h0, ((0, pad), (0, 0))) if pad else h0
    cols = [hp, pool_gl[:, None].astype(hp.dtype)]
    has_vn = vn_col is not None
    if has_vn:
        vnp = vn_col.astype(hp.dtype)[:, None]
        if pad:
            vnp = jnp.pad(vnp, ((0, pad), (0, 0)))
        cols.append(vnp)
    hcat = jnp.concatenate(cols, axis=1)
    p = edge_attr.shape[0]
    block = p // num_windows
    vocab = ee_tables.shape[0] // num_layers
    hid = w1_all.shape[0] // num_layers
    t_out = pred_w.shape[1]
    cdt = h0.dtype
    meta, half, _ = _ell_meta(u_local, v_local, edge_attr, window, cdt)

    def kernel(meta_ref, h_ref, tab_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               eps_ref, predw_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        vlanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, vocab), 1
        ).astype(jnp.float32)
        mf = meta_ref[:].astype(jnp.float32)
        multihot = (
            (mf[:, 2:3] == vlanes).astype(cdt)
            + (mf[:, 3:4] == vlanes).astype(cdt)
            + (mf[:, 4:5] == vlanes).astype(cdt)
        )
        onehot_u = (mf[:, 0:1] == lanes).astype(cdt)
        onehot_v = (mf[:, 1:2] == lanes).astype(cdt)
        h = h_ref[:, :d]
        if has_vn:
            # Pool one-hot shared by all layers' VN stages (pad/gap rows
            # carry the GMAX sentinel → all-zero rows: they neither
            # contribute to nor receive VN messages).
            gl = h_ref[:, d : d + 1].astype(jnp.float32)
            vnc = h_ref[:, d + 1 : d + 2].astype(jnp.float32)
            giota = jax.lax.broadcasted_iota(
                jnp.int32, (window, gmax), 1
            ).astype(jnp.float32)
            ohg = (gl == giota).astype(cdt)
        for l in range(num_layers):
            ee = jnp.dot(
                multihot,
                tab_ref[l * vocab : (l + 1) * vocab, :],
                preferred_element_type=jnp.float32,
            )
            h_u = jnp.dot(onehot_u, h, preferred_element_type=jnp.float32)
            msg = jnp.maximum(h_u + ee, 0).astype(cdt)
            acc = jax.lax.dot_general(
                onehot_v, msg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_vn:
                # Analytic VN star (see docstring): r = relu(h + e0) with
                # e0 the (0,0,0)-attr bond embedding ({0,5,11} rows);
                # pool Σ_real r per graph and the graph's r[vn], broadcast
                # back crosswise. Quantized like the edge messages (cdt).
                e0 = (
                    tab_ref[l * vocab : l * vocab + 1, :].astype(jnp.float32)
                    + tab_ref[l * vocab + 5 : l * vocab + 6, :].astype(
                        jnp.float32
                    )
                    + tab_ref[l * vocab + 11 : l * vocab + 12, :].astype(
                        jnp.float32
                    )
                )
                r = jnp.maximum(h.astype(jnp.float32) + e0, 0).astype(cdt)
                rcat = jnp.concatenate(
                    [
                        (r.astype(jnp.float32) * (1.0 - vnc)).astype(cdt),
                        (r.astype(jnp.float32) * vnc).astype(cdt),
                    ],
                    axis=1,
                )
                pooled = jax.lax.dot_general(
                    ohg, rcat,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [GMAX, 2D]: [Σ_real r ‖ r[vn]] per graph
                # pooled stays f32 for the broadcast (ohg is 0/1 so the dot
                # is exact) — rounding to cdt here would add one quantize
                # step the materialized-star path does not have.
                back = jnp.dot(
                    ohg.astype(jnp.float32), pooled,
                    preferred_element_type=jnp.float32,
                )
                acc = acc + back[:, d:] * (1.0 - vnc) + back[:, :d] * vnc
            act = (acc + eps_ref[l, 0] * h.astype(jnp.float32)).astype(cdt)
            z = jax.lax.dot_general(
                act, w1_ref[l * hid : (l + 1) * hid, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[l : l + 1, :].astype(jnp.float32)
            z = jnp.maximum(z, 0).astype(cdt)
            out = jax.lax.dot_general(
                z, w2_ref[l * d : (l + 1) * d, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[l : l + 1, :].astype(jnp.float32)
            if l != num_layers - 1:
                out = jnp.maximum(out, 0)
            h = out.astype(cdt)
        out_ref[:] = _pool_epilogue(h, h_ref, d, predw_ref, window, gmax)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((block, 5), lambda w: (w, 0)),
            pl.BlockSpec((window, d + 1 + int(has_vn)), lambda w: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=num_layers
            * (6 * p * window * d + 4 * num_windows * window * hid * d
               + (8 * num_windows * window * gmax * d if has_vn else 0)),
            bytes_accessed=(
                p * 5 + 2 * num_windows * window * (d + 1 + int(has_vn))
            ) * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, hcat, ee_tables, w1_all, b1_all, w2_all, b2_all, eps_all, pred_w)
    return out


def gcn_local_model(
    edge_attr: jnp.ndarray,  # [P, 3] int32 (offsets applied)
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h0: jnp.ndarray,  # [n, D] conv-0 output
    dis: jnp.ndarray,  # [n] 1/sqrt(deg+1)
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    ee_tables: jnp.ndarray,  # [L·13, D]
    roots: jnp.ndarray,  # [L, D]
    alphas: jnp.ndarray,  # [L, D] folded-BN scale
    betas: jnp.ndarray,  # [L, D] folded-BN shift
    wn_all: jnp.ndarray,  # [(L-1)·D, D] next-conv weights (right-mul rows)
    bn_all: jnp.ndarray,  # [L-1, D]
    pred_w: jnp.ndarray,  # [D, T] prediction head (right-mul)
    window: int,
    num_layers: int,
    gmax: int,
) -> jnp.ndarray:
    """The ENTIRE GCN post-conv-0 model (all L fused layers + finalize) in
    ONE pallas call. Megakernel over the k=1 ELL local layout — per-layer
    math ≡ gcn_local_layer_ell (norm-scaled messages ≙
    GCN/src/message_passing.cc:148-167; root-emb tail + folded BatchNorm
    + ReLU + next conv ≙ GCN/src/node_embedding.cc:122-146; the final
    layer's no-ReLU tail feeds pooling ≙ GCN/src/finalize.cc:39-113,
    which here runs in-kernel via _pool_epilogue). The edge multi-hot,
    gather/scatter one-hots and per-edge source norms dis_u are
    built/gathered once (all layer-invariant). Returns per-(window,
    graph-slot) prediction SUMS [NW·GMAX, T] f32 for base.pool_finish.
    No-spill k=1 only.
    """
    n, d = h0.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h0, ((0, pad), (0, 0))) if pad else h0
    dis2 = jnp.pad(dis[:, None], ((0, pad), (0, 0))) if pad else dis[:, None]
    hcat = jnp.concatenate(
        [hp, dis2.astype(hp.dtype), pool_gl[:, None].astype(hp.dtype)], axis=1
    )
    p = edge_attr.shape[0]
    block = p // num_windows
    vocab = ee_tables.shape[0] // num_layers
    t_out = pred_w.shape[1]
    cdt = h0.dtype
    meta, half, _ = _ell_meta(u_local, v_local, edge_attr, window, cdt)

    def kernel(meta_ref, x_ref, tab_ref, root_ref, alpha_ref, beta_ref,
               wn_ref, bn_ref, predw_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        vlanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, vocab), 1
        ).astype(jnp.float32)
        mf = meta_ref[:].astype(jnp.float32)
        multihot = (
            (mf[:, 2:3] == vlanes).astype(cdt)
            + (mf[:, 3:4] == vlanes).astype(cdt)
            + (mf[:, 4:5] == vlanes).astype(cdt)
        )
        onehot_u = (mf[:, 0:1] == lanes).astype(cdt)
        onehot_v = (mf[:, 1:2] == lanes).astype(cdt)
        dis_u = jnp.dot(
            onehot_u, x_ref[:, d : d + 1], preferred_element_type=jnp.float32
        )  # layer-invariant per-edge source norm
        dis_win = x_ref[:, d : d + 1].astype(jnp.float32)
        h = x_ref[:, :d]
        for l in range(num_layers):
            ee = jnp.dot(
                multihot,
                tab_ref[l * vocab : (l + 1) * vocab, :],
                preferred_element_type=jnp.float32,
            )
            h_u = jnp.dot(onehot_u, h, preferred_element_type=jnp.float32)
            msg = (dis_u * jnp.maximum(h_u + ee, 0)).astype(cdt)
            acc = jax.lax.dot_general(
                onehot_v, msg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h_win = h.astype(jnp.float32)
            m = acc * dis_win
            a = m + jnp.maximum(
                h_win + root_ref[l : l + 1, :].astype(jnp.float32), 0.0
            ) * (dis_win * dis_win)
            x = (
                alpha_ref[l : l + 1, :].astype(jnp.float32) * a
                + beta_ref[l : l + 1, :].astype(jnp.float32)
            )
            if l != num_layers - 1:
                a2 = jnp.maximum(x, 0.0).astype(cdt)
                h = (
                    jnp.dot(
                        a2, wn_ref[l * d : (l + 1) * d, :],
                        preferred_element_type=jnp.float32,
                    )
                    + bn_ref[l : l + 1, :].astype(jnp.float32)
                ).astype(cdt)
            else:
                out_ref[:] = _pool_epilogue(
                    x, x_ref, d + 1, predw_ref, window, gmax
                )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((block, 5), lambda w: (w, 0)),
            pl.BlockSpec((window, d + 2), lambda w: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=num_layers
            * (6 * p * window * d + 2 * num_windows * window * d * d),
            bytes_accessed=(p * 5 + 2 * num_windows * window * d) * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, hcat, ee_tables, roots, alphas, betas, wn_all, bn_all, pred_w)
    return out


def _slot_prefix_geom(prefix_caps, window: int, slots: int):
    """(caps, offsets, total rows) of the degree-sorted prefix layout."""
    if prefix_caps is not None:
        caps = tuple(int(c) for c in prefix_caps)
    else:
        caps = tuple(window for _ in range(slots))
    offs = tuple(int(sum(caps[:k])) for k in range(len(caps)))
    return caps, offs, int(sum(caps))


def _slot_accumulate(msg, caps, offs, window):
    """Dense prefix-slice accumulation of per-lane messages into the
    [W, D] window accumulator — the slot layout's replacement for the ELL
    scatter matmul (dest rank r IS window row r under the degree sort)."""
    acc = jnp.zeros((window, msg.shape[1]), jnp.float32)
    for k, c in enumerate(caps):
        part = msg[offs[k] : offs[k] + c]
        if c < window:
            part = jnp.pad(part, ((0, window - c), (0, 0)))
        acc += part
    return acc



def _pad_slot_operands(meta, hcat, window, sw, half, num_windows, wps):
    """Pad phantom windows so the grid divides by wps: meta rows carry the
    src sentinel (gathers nothing) and attr −1; hcat rows are zeros with
    the pool sentinel riding whatever column the caller placed it in —
    phantom pool rows are sliced off by the caller's output trim."""
    nw2 = -(-num_windows // wps) * wps
    if nw2 == num_windows:
        return meta, hcat, num_windows
    extra = nw2 - num_windows
    mpad = jnp.concatenate(
        [jnp.full((extra * sw, 1), float(window - half), meta.dtype),
         jnp.full((extra * sw, 3), -1.0, meta.dtype)], axis=1
    )
    meta = jnp.concatenate([meta, mpad], axis=0)
    hcat = jnp.concatenate(
        [hcat, jnp.zeros((extra * window, hcat.shape[1]), hcat.dtype)],
        axis=0,
    )
    return meta, hcat, nw2


def gin_local_model_slots(
    slot_meta: jnp.ndarray,  # [NW·Σc, 4] (src − W/2 ‖ attrs+offsets)
    h0: jnp.ndarray,  # [n, D] embedded input features
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids
    ee_tables: jnp.ndarray,  # [L·13, D] stacked bond-embedding tables
    w1_all: jnp.ndarray,  # [L·H, D]
    b1_all: jnp.ndarray,  # [L, H]
    w2_all: jnp.ndarray,  # [L·D, H]
    b2_all: jnp.ndarray,  # [L, D]
    eps_all: jnp.ndarray,  # [L, 1] f32 (1+ε per layer)
    pred_w: jnp.ndarray,  # [D, T]
    window: int,
    slots: int,
    num_layers: int,
    gmax: int,
    prefix_caps: tuple | None = None,
    vn_col: jnp.ndarray | None = None,  # [n] analytic-VN flag (GIN-VN)
    wps: int = 1,  # windows per grid step: the update MLP batches over
    #   the step's wps windows as ONE [wps·W, D] matmul (halving weight-
    #   load amortization loss — the MLP is the kernel's largest marginal
    #   stage per the slot attribution) and the grid halves its steps.
    _ablate: str | None = None,  # bench-only (bench/ablate_gin_slots):
    #   comma-set of "nogather"/"nobond"/"noacc"/"nomlp" stage stubs —
    #   NOT bit-exact, used only for noop-subtracted time attribution.
) -> jnp.ndarray:
    """GIN whole-model megakernel over the DEST-MAJOR SLOT layout.

    Round-5 structural lever (VERDICT r4 #3): the ELL formulation pays a
    gather matmul AND a transposed scatter matmul per layer over
    block-padded lanes; the degree-sorted slot layout needs only the
    gather — destination rank r IS window row r, so the reduction is a
    dense prefix-slice accumulation (no scatter matmul at all) and the
    lane count is the compacted Σc instead of the padded ELL block
    (~2.5× fewer stage MXU FLOPs at molhiv geometry). Bond embeddings
    ride slot-aligned lanes (``slot_meta``, base.as_batch) so the message
    relu(h_u + ee) keeps its per-edge form
    (GIN/src/message_passing.cc:136-146). Layer/update/finalize math is
    identical to gin_local_model (including the analytic-VN pool stage).
    No-spill prefix buckets only.
    """
    n, d = h0.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h0, ((0, pad), (0, 0))) if pad else h0
    cols = [hp, pool_gl[:, None].astype(hp.dtype)]
    has_vn = vn_col is not None
    if has_vn:
        vnp = vn_col.astype(hp.dtype)[:, None]
        if pad:
            vnp = jnp.pad(vnp, ((0, pad), (0, 0)))
        cols.append(vnp)
    hcat = jnp.concatenate(cols, axis=1)
    caps, offs, sw = _slot_prefix_geom(prefix_caps, window, slots)
    vocab = ee_tables.shape[0] // num_layers
    hid = w1_all.shape[0] // num_layers
    t_out = pred_w.shape[1]
    cdt = h0.dtype
    half = window // 2 if window <= 512 else 0
    _abl = set((_ablate or "").split(",")) - {""}
    orig_windows = num_windows
    slot_meta, hcat, num_windows = _pad_slot_operands(
        jnp.asarray(slot_meta), hcat, window, sw, half, num_windows, wps,
    )

    def kernel(meta_ref, h_ref, tab_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               eps_ref, predw_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sw, window), 1).astype(
            jnp.float32
        ) - float(half)
        vlanes = jax.lax.broadcasted_iota(jnp.int32, (sw, vocab), 1).astype(
            jnp.float32
        )
        subs = []
        for i in range(wps):
            mf = meta_ref[i * sw : (i + 1) * sw].astype(jnp.float32)
            s = dict(
                onehot=(mf[:, 0:1] == lanes).astype(cdt),
                valid=(mf[:, 0:1] < float(window - half)).astype(
                    jnp.float32
                ),
                multihot=(
                    (mf[:, 1:2] == vlanes).astype(cdt)
                    + (mf[:, 2:3] == vlanes).astype(cdt)
                    + (mf[:, 3:4] == vlanes).astype(cdt)
                ),
                x=h_ref[i * window : (i + 1) * window, :],
            )
            s["h"] = s["x"][:, :d]
            if has_vn:
                gl = s["x"][:, d : d + 1].astype(jnp.float32)
                s["vnc"] = s["x"][:, d + 1 : d + 2].astype(jnp.float32)
                giota = jax.lax.broadcasted_iota(
                    jnp.int32, (window, gmax), 1
                ).astype(jnp.float32)
                s["ohg"] = (gl == giota).astype(cdt)
            subs.append(s)
        for l in range(num_layers):
            acts = []
            for s in subs:
                h = s["h"]
                if "nobond" in _abl:
                    ee = jnp.dot(
                        s["multihot"][:, :1],
                        tab_ref[l * vocab : l * vocab + 1, :],
                        preferred_element_type=jnp.float32,
                    )  # tiny-K stand-in (see ablate_gat_pairs note)
                else:
                    ee = jnp.dot(
                        s["multihot"],
                        tab_ref[l * vocab : (l + 1) * vocab, :],
                        preferred_element_type=jnp.float32,
                    )
                if "nogather" in _abl:
                    h_u = jnp.dot(
                        s["onehot"][:, :8], h[:8, :],
                        preferred_element_type=jnp.float32,
                    )  # tiny-K stand-in
                else:
                    h_u = jnp.dot(
                        s["onehot"], h, preferred_element_type=jnp.float32
                    )
                msg = jnp.maximum(h_u + ee, 0).astype(cdt) * s["valid"]
                if "noacc" in _abl:
                    acc = msg[:window].astype(jnp.float32)
                else:
                    acc = _slot_accumulate(msg, caps, offs, window)
                if has_vn:
                    e0 = (
                        tab_ref[l * vocab : l * vocab + 1, :].astype(
                            jnp.float32
                        )
                        + tab_ref[l * vocab + 5 : l * vocab + 6, :].astype(
                            jnp.float32
                        )
                        + tab_ref[
                            l * vocab + 11 : l * vocab + 12, :
                        ].astype(jnp.float32)
                    )
                    vnc = s["vnc"]
                    r = jnp.maximum(
                        h.astype(jnp.float32) + e0, 0
                    ).astype(cdt)
                    rcat = jnp.concatenate(
                        [
                            (r.astype(jnp.float32) * (1.0 - vnc)).astype(
                                cdt
                            ),
                            (r.astype(jnp.float32) * vnc).astype(cdt),
                        ],
                        axis=1,
                    )
                    pooled = jax.lax.dot_general(
                        s["ohg"], rcat,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    back = jnp.dot(
                        s["ohg"].astype(jnp.float32), pooled,
                        preferred_element_type=jnp.float32,
                    )
                    acc = (
                        acc + back[:, d:] * (1.0 - vnc) + back[:, :d] * vnc
                    )
                acts.append(
                    (acc + eps_ref[l, 0] * h.astype(jnp.float32)).astype(
                        cdt
                    )
                )
            # The update MLP batches over the step's wps windows — one
            # [wps·W, D] matmul pair amortizes the MXU weight load.
            act = jnp.concatenate(acts, axis=0) if wps > 1 else acts[0]
            if "nomlp" in _abl:
                for i, s in enumerate(subs):
                    s["h"] = act[i * window : (i + 1) * window]
                continue
            z = jax.lax.dot_general(
                act, w1_ref[l * hid : (l + 1) * hid, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[l : l + 1, :].astype(jnp.float32)
            z = jnp.maximum(z, 0).astype(cdt)
            out = jax.lax.dot_general(
                z, w2_ref[l * d : (l + 1) * d, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[l : l + 1, :].astype(jnp.float32)
            if l != num_layers - 1:
                out = jnp.maximum(out, 0)
            outc = out.astype(cdt)
            for i, s in enumerate(subs):
                s["h"] = outc[i * window : (i + 1) * window]
        for i, s in enumerate(subs):
            out_ref[i * gmax : (i + 1) * gmax] = _pool_epilogue(
                s["h"], s["x"], d, predw_ref, window, gmax
            )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows // wps,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((wps * sw, 4), lambda w: (w, 0)),
            pl.BlockSpec(
                (wps * window, d + 1 + int(has_vn)), lambda w: (w, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wps * gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=num_layers
            * (2 * num_windows * sw * window * d
               + 4 * num_windows * window * hid * d
               + (8 * num_windows * window * gmax * d if has_vn else 0)),
            bytes_accessed=(
                num_windows * sw * 4
                + 2 * num_windows * window * (d + 1 + int(has_vn))
            ) * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(slot_meta, hcat, ee_tables, w1_all, b1_all, w2_all, b2_all, eps_all,
      pred_w)
    return out[: orig_windows * gmax]


def gcn_local_model_slots(
    slot_meta: jnp.ndarray,  # [NW·Σc, 4] (src − W/2 ‖ attrs+offsets)
    h0: jnp.ndarray,  # [n, D] conv-0 output
    dis: jnp.ndarray,  # [n] 1/sqrt(deg+1)
    pool_gl: jnp.ndarray,  # [NW·W]
    ee_tables: jnp.ndarray,  # [L·13, D]
    roots: jnp.ndarray,  # [L, D]
    alphas: jnp.ndarray,  # [L, D] folded-BN scale
    betas: jnp.ndarray,  # [L, D] folded-BN shift
    wn_all: jnp.ndarray,  # [(L-1)·D, D]
    bn_all: jnp.ndarray,  # [L-1, D]
    pred_w: jnp.ndarray,  # [D, T]
    window: int,
    slots: int,
    num_layers: int,
    gmax: int,
    prefix_caps: tuple | None = None,
    wps: int = 1,  # windows per grid step (see gin_local_model_slots)
) -> jnp.ndarray:
    """GCN whole-model megakernel over the dest-major slot layout (see
    gin_local_model_slots — same structural lever). The per-edge source
    norm dis_u rides the gather payload as one extra column, so one
    one-hot matmul fetches h_u and dis_u together; dis_v distributes out
    of the edge sum and scales the window accumulator once (the round-2
    algebraic elimination). Per-layer math ≡ gcn_local_model.
    No-spill prefix buckets only.
    """
    n, d = h0.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h0, ((0, pad), (0, 0))) if pad else h0
    dis2 = jnp.pad(dis[:, None], ((0, pad), (0, 0))) if pad else dis[:, None]
    hcat = jnp.concatenate(
        [hp, dis2.astype(hp.dtype), pool_gl[:, None].astype(hp.dtype)], axis=1
    )
    caps, offs, sw = _slot_prefix_geom(prefix_caps, window, slots)
    vocab = ee_tables.shape[0] // num_layers
    t_out = pred_w.shape[1]
    cdt = h0.dtype
    half = window // 2 if window <= 512 else 0
    orig_windows = num_windows
    slot_meta, hcat, num_windows = _pad_slot_operands(
        jnp.asarray(slot_meta), hcat, window, sw, half, num_windows, wps,
    )

    def kernel(meta_ref, x_ref, tab_ref, root_ref, alpha_ref, beta_ref,
               wn_ref, bn_ref, predw_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sw, window), 1).astype(
            jnp.float32
        ) - float(half)
        vlanes = jax.lax.broadcasted_iota(jnp.int32, (sw, vocab), 1).astype(
            jnp.float32
        )
        subs = []
        for i in range(wps):
            mf = meta_ref[i * sw : (i + 1) * sw].astype(jnp.float32)
            x_i = x_ref[i * window : (i + 1) * window, :]
            s = dict(
                onehot=(mf[:, 0:1] == lanes).astype(cdt),
                valid=(mf[:, 0:1] < float(window - half)).astype(
                    jnp.float32
                ),
                multihot=(
                    (mf[:, 1:2] == vlanes).astype(cdt)
                    + (mf[:, 2:3] == vlanes).astype(cdt)
                    + (mf[:, 3:4] == vlanes).astype(cdt)
                ),
                x=x_i,
                dis_win=x_i[:, d : d + 1].astype(jnp.float32),
                h=x_i[:, :d],
            )
            s["dis_u"] = jnp.dot(
                s["onehot"], x_i[:, d : d + 1],
                preferred_element_type=jnp.float32,
            )  # layer-invariant per-edge source norm
            subs.append(s)
        for l in range(num_layers):
            xs = []
            for s in subs:
                ee = jnp.dot(
                    s["multihot"],
                    tab_ref[l * vocab : (l + 1) * vocab, :],
                    preferred_element_type=jnp.float32,
                )
                h_u = jnp.dot(
                    s["onehot"], s["h"], preferred_element_type=jnp.float32
                )
                msg = (
                    s["dis_u"] * jnp.maximum(h_u + ee, 0)
                ).astype(cdt) * s["valid"]
                acc = _slot_accumulate(msg, caps, offs, window)
                h_win = s["h"].astype(jnp.float32)
                dis_win = s["dis_win"]
                m = acc * dis_win
                a = m + jnp.maximum(
                    h_win + root_ref[l : l + 1, :].astype(jnp.float32), 0.0
                ) * (dis_win * dis_win)
                xs.append(
                    alpha_ref[l : l + 1, :].astype(jnp.float32) * a
                    + beta_ref[l : l + 1, :].astype(jnp.float32)
                )
            if l != num_layers - 1:
                # Next conv batches over the step's wps windows (one
                # [wps·W, D] matmul — see gin_local_model_slots).
                x = jnp.concatenate(xs, axis=0) if wps > 1 else xs[0]
                a2 = jnp.maximum(x, 0.0).astype(cdt)
                hn = (
                    jnp.dot(
                        a2, wn_ref[l * d : (l + 1) * d, :],
                        preferred_element_type=jnp.float32,
                    )
                    + bn_ref[l : l + 1, :].astype(jnp.float32)
                ).astype(cdt)
                for i, s in enumerate(subs):
                    s["h"] = hn[i * window : (i + 1) * window]
            else:
                for i, s in enumerate(subs):
                    out_ref[i * gmax : (i + 1) * gmax] = _pool_epilogue(
                        xs[i], s["x"], d + 1, predw_ref, window, gmax
                    )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows // wps,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((wps * sw, 4), lambda w: (w, 0)),
            pl.BlockSpec((wps * window, d + 2), lambda w: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wps * gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=num_layers
            * (2 * num_windows * sw * window * d
               + 2 * num_windows * window * d * d),
            bytes_accessed=(
                num_windows * sw * 4 + 2 * num_windows * window * d
            ) * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(slot_meta, hcat, ee_tables, roots, alphas, betas, wn_all, bn_all,
      pred_w)
    return out[: orig_windows * gmax]


def gcn_local_message_ell(
    edge_attr: jnp.ndarray,  # [P, 3] int32 (offsets applied)
    ee_table: jnp.ndarray,  # [13, D]
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,  # [n, D]
    dis: jnp.ndarray,  # [n] per-node 1/sqrt(deg+1)
    window: int,
    k_blocks: int,
) -> jnp.ndarray:
    """GCN message reduction m[v] = Σ dis_u·dis_v·relu(h_u + ee) against
    window-local state (GCN/src/message_passing.cc:148-167 + the norm from
    GCN/src/load_inputs.cc:121-163).

    Two algebraic matmul eliminations vs the naive form: dis_u rides the
    feature gather as an extra column ([W, D+1] fits the same 128-lane
    tile at D=100), and dis_v FACTORS OUT of the per-dest sum — it scales
    the accumulated window rows once on the last block instead of being
    gathered per edge. 4 one-hot matmuls/block → 2. Returns [n, D]."""
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    dis2 = jnp.pad(dis[:, None], ((0, pad), (0, 0))) if pad else dis[:, None]
    hcat = jnp.concatenate([hp, dis2.astype(hp.dtype)], axis=1)  # [NW·W, D+1]
    p = edge_attr.shape[0]
    block = p // (num_windows * k_blocks)
    vocab = ee_table.shape[0]

    meta, half, _ = _ell_meta(u_local, v_local, edge_attr, window, h.dtype)

    def kernel(meta_ref, tab_ref, h_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        vlanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, vocab), 1
        ).astype(jnp.float32)
        mf = meta_ref[:].astype(jnp.float32)
        multihot = (
            (mf[:, 2:3] == vlanes).astype(h_ref.dtype)
            + (mf[:, 3:4] == vlanes).astype(h_ref.dtype)
            + (mf[:, 4:5] == vlanes).astype(h_ref.dtype)
        )
        ee = jnp.dot(multihot, tab_ref[:], preferred_element_type=jnp.float32)
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        h_u, dis_u = hu_all[:, :d], hu_all[:, d:]
        msg = (dis_u * jnp.maximum(h_u + ee, 0)).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            dis_win = h_ref[:, d:].astype(jnp.float32)
            out_ref[:] = (acc_ref[:] * dis_win).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 5), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((window, d + 1), lambda w, k: (w, 0)),
        ],
        out_specs=pl.BlockSpec((window, d), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, d), h.dtype),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, ee_table, hcat)
    return out[:n]


def gcn_local_layer_ell(
    edge_attr: jnp.ndarray,  # [P, 3] int32 (offsets applied)
    ee_table: jnp.ndarray,  # [13, D] layer-l bond-embedding table
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,  # [n, D] layer-l post-conv features
    dis: jnp.ndarray,  # [n] 1/sqrt(deg+1)
    root: jnp.ndarray,  # [1, D] root_emb[l]
    alpha: jnp.ndarray,  # [1, D] bn_weight/sqrt(var+BN_EPS)
    beta: jnp.ndarray,  # [1, D] bn_bias − bn_mean·alpha
    w_next,  # [D, D] NEXT conv weight transposed for a @ W, or None (final)
    b_next,  # [1, D] or None
    window: int,
    k_blocks: int,
) -> jnp.ndarray:
    """One whole GCN layer in a single VMEM pass (no-spill fast path).

    Message phase = gcn_local_message_ell's factored norm gather; the
    epilogue then fuses the reference's pre-matmul tail
    (GCN/src/node_embedding.cc:122-146): root-emb residual (the 1/(deg+1)
    divisor is dis², already per-window), folded BatchNorm (α·a + β), ReLU,
    and the NEXT layer's [D → D] conv matmul — the [n, D] message tensor
    never exists in HBM. The final layer (w_next=None) returns the tail
    without ReLU (GCN/src/finalize.cc:88-96) for pooling.
    Returns next-h (or the final tail) [n, D].
    """
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    dis2 = jnp.pad(dis[:, None], ((0, pad), (0, 0))) if pad else dis[:, None]
    hcat = jnp.concatenate([hp, dis2.astype(hp.dtype)], axis=1)  # [NW·W, D+1]
    p = edge_attr.shape[0]
    block = p // (num_windows * k_blocks)
    vocab = ee_table.shape[0]
    final = w_next is None
    extras = (root, alpha, beta) if final else (root, alpha, beta, w_next, b_next)

    meta, half, _ = _ell_meta(u_local, v_local, edge_attr, window, h.dtype)

    def kernel(meta_ref, tab_ref, h_ref, *rest):
        out_ref, acc_ref = rest[-2], rest[-1]
        if final:
            root_ref, alpha_ref, beta_ref = rest[:3]
        else:
            root_ref, alpha_ref, beta_ref, wnext_ref, bnext_ref = rest[:5]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        vlanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, vocab), 1
        ).astype(jnp.float32)
        mf = meta_ref[:].astype(jnp.float32)
        multihot = (
            (mf[:, 2:3] == vlanes).astype(h_ref.dtype)
            + (mf[:, 3:4] == vlanes).astype(h_ref.dtype)
            + (mf[:, 4:5] == vlanes).astype(h_ref.dtype)
        )
        ee = jnp.dot(multihot, tab_ref[:], preferred_element_type=jnp.float32)
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        h_u, dis_u = hu_all[:, :d], hu_all[:, d:]
        msg = (dis_u * jnp.maximum(h_u + ee, 0)).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            h_win = h_ref[:, :d].astype(jnp.float32)
            dis_win = h_ref[:, d:].astype(jnp.float32)
            m = acc_ref[:] * dis_win
            a = m + jnp.maximum(
                h_win + root_ref[:].astype(jnp.float32), 0.0
            ) * (dis_win * dis_win)
            x = alpha_ref[:].astype(jnp.float32) * a + beta_ref[:].astype(
                jnp.float32
            )
            if final:
                out_ref[:] = x.astype(out_ref.dtype)
            else:
                a2 = jnp.maximum(x, 0.0).astype(h_ref.dtype)
                out_ref[:] = (
                    jnp.dot(
                        a2, wnext_ref[:], preferred_element_type=jnp.float32
                    )
                    + bnext_ref[:].astype(jnp.float32)
                ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 5), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((window, d + 1), lambda w, k: (w, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extras],
        ],
        out_specs=pl.BlockSpec((window, d), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * p * window * d
            + (0 if final else 2 * num_windows * window * d * d),
            bytes_accessed=(p + 3 * num_windows * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, ee_table, hcat, *extras)
    return out[:n]


def dgn_local_message_ell(
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,  # [n, D]
    eig: jnp.ndarray,  # [n] eigenvector component 1
    window: int,
    k_blocks: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DGN two-channel messages m1[v] = Σ h_u, m2[v] = Σ (eig_u − eig_v)·h_u
    (DGN/src/message_passing.cc:120-153) against window-local state.

    Algebraic matmul eliminations: eig_u rides the feature gather as an
    extra column, and the eig_v term distributes over the sum —
    m2 = Σ eig_u·h_u − eig_v·(Σ h_u) = acc₂ − eig_v ⊙ m1 — so it is
    applied once per window row on the last block instead of being
    gathered per edge. 4 one-hot matmuls/block → 2.
    Returns ([n, D], [n, D])."""
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    eig2 = jnp.pad(eig[:, None], ((0, pad), (0, 0))) if pad else eig[:, None]
    hcat = jnp.concatenate([hp, eig2.astype(hp.dtype)], axis=1)  # [NW·W, D+1]
    p = u_local.shape[0]
    block = p // (num_windows * k_blocks)

    meta, half, _ = _ell_meta(u_local, v_local, None, window, h.dtype)

    def kernel(meta_ref, h_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        mf = meta_ref[:].astype(jnp.float32)
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        h_u, eig_u = hu_all[:, :d], hu_all[:, d:]
        both = jnp.concatenate([h_u, eig_u * h_u], axis=1).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, both,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            m1 = acc_ref[:, :d]
            eig_win = h_ref[:, d:].astype(jnp.float32)
            m2 = acc_ref[:, d:] - eig_win * m1
            out_ref[:] = jnp.concatenate([m1, m2], axis=1).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 2), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec((window, d + 1), lambda w, k: (w, 0)),
        ],
        out_specs=pl.BlockSpec((window, 2 * d), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, 2 * d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, 2 * d), h.dtype),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, hcat)
    return out[:n, :d], out[:n, d:]


def gat_local_message_ell(
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,  # [n, H·D] projected features, head-major flat
    s_src: jnp.ndarray,  # [n, H] attention source scores (indexed by DEST v)
    s_tgt: jnp.ndarray,  # [n, H]
    window: int,
    k_blocks: int,
    num_heads: int,
    raw: jnp.ndarray | None = None,  # [P, H] precomputed s_src[v]+s_tgt[u]
) -> jnp.ndarray:
    """GAT edge-softmax numerator+denominator against window-local state.

    Per edge (u→v): score = exp(leakyrelu_0.2(s_src[v] + s_tgt[u])) per head
    (GAT/src/message_passing.cc:122-148 — raw exp, reference-faithful);
    accumulates [Σ score⊗h_u ‖ Σ score] per dest. All gathers are in-window
    one-hot matmuls, and s_tgt rides the feature gather as trailing columns
    ([W, H·D + H] = 68 lanes at the reference config shares h's 128-lane
    tile) — one gather matmul fewer per block; the [E, H·D] scored tensor
    never exists in HBM. With ``raw`` (per-lane logits precomputed by XLA
    takes — FLOWGNN_GAT_RAWSCORES=1), BOTH score gathers leave the kernel:
    trades the [B, W]×[W, 128-padded] s_src matmul per block for a [P, H]
    lane input. Returns [n, H·D + H] (caller divides by the trailing score
    sums).
    """
    n, hd = h.shape
    d = hd // num_heads
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        s_src = jnp.pad(s_src, ((0, pad), (0, 0)))
        s_tgt = jnp.pad(s_tgt, ((0, pad), (0, 0)))
    use_raw = raw is not None
    if use_raw:
        hcat = h
    else:
        hcat = jnp.concatenate([h, s_tgt.astype(h.dtype)], axis=1)
    p = u_local.shape[0]
    block = p // (num_windows * k_blocks)
    out_dim = hd + num_heads

    meta, half, _ = _ell_meta(u_local, v_local, None, window, h.dtype)

    def kernel(*refs):
        if use_raw:
            meta_ref, raw_ref, h_ref = refs[:3]
        else:
            meta_ref, h_ref, ssrc_ref = refs[:3]
        out_ref, acc_ref = refs[-2], refs[-1]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        mf = meta_ref[:].astype(jnp.float32)
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        if use_raw:
            h_u = hu_all
            raw_k = raw_ref[:].astype(jnp.float32)
        else:
            h_u, s2 = hu_all[:, :hd], hu_all[:, hd:]
            s1 = jnp.dot(
                onehot_v, ssrc_ref[:], preferred_element_type=jnp.float32
            )
            raw_k = s1 + s2
        score = jnp.exp(jnp.where(raw_k < 0, raw_k * 0.2, raw_k))
        # Sentinel lanes have all-zero one-hots → raw = 0 → score = 1; mask
        # them out so they don't pollute the denominators.
        valid = (mf[:, 1:2] < float(window) - half).astype(jnp.float32)
        score = score * valid
        # Per-head broadcast score [B, H] → [B, H·D] via a constant 0/1
        # expansion matrix on the MXU (element-repeat reshapes are awkward
        # in-kernel; this is two iotas and a tiny matmul).
        cols = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 1) // d
        rows = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 0)
        expand = (cols == rows).astype(jnp.float32)
        scorex = jnp.dot(score, expand, preferred_element_type=jnp.float32)
        both = jnp.concatenate([scorex * h_u, score], axis=1).astype(
            h_ref.dtype
        )
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, both,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    lane = lambda w, k: (w * k_blocks + k, 0)  # noqa: E731
    if use_raw:
        in_specs = [
            pl.BlockSpec((block, 2), lane),
            pl.BlockSpec((block, num_heads), lane),
            pl.BlockSpec((window, hd), lambda w, k: (w, 0)),
        ]
        ins = (meta, raw, hcat)
    else:
        in_specs = [
            pl.BlockSpec((block, 2), lane),
            pl.BlockSpec((window, hd + num_heads), lambda w, k: (w, 0)),
            pl.BlockSpec((window, num_heads), lambda w, k: (w, 0)),
        ]
        ins = (meta, hcat, s_src)
    out = pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((window, out_dim), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, out_dim), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, out_dim), h.dtype),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(*ins)
    return out[:n]


def dgn_local_layer_ell(
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,  # [n, D]
    eig: jnp.ndarray,  # [n] eigenvector component 1
    inv_deg: jnp.ndarray,  # [n] 1/max(out_degree, 1)
    eigw_sum: jnp.ndarray,  # [n] Σ_in (eig_u − eig_v)
    inv_abssum: jnp.ndarray,  # [n] 1/eig_abssum (eps-guarded)
    w_post: jnp.ndarray,  # [2·D, D] posttrans, transposed for x @ W
    b_post: jnp.ndarray,  # [1, D]
    window: int,
    k_blocks: int,
) -> jnp.ndarray:
    """One whole DGN layer in a single VMEM pass (no-spill fast path).

    Message phase = dgn_local_message_ell's factored two-channel gather;
    the epilogue then fuses the apply unit (DGN/src/node_embedding.cc:
    107-160): a1 = m1/deg, a2 = |m2 − eigw_sum·h|/eig_abssum, the
    [2D → D] posttrans matmul and the residual h + relu(acc) — the
    [n, 2·D] message channels never exist in HBM. Returns next-h [n, D].
    """
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    aux = jnp.stack([eig, inv_deg, eigw_sum, inv_abssum], axis=1).astype(
        hp.dtype
    )
    aux = jnp.pad(aux, ((0, pad), (0, 0))) if pad else aux
    hcat = jnp.concatenate([hp, aux], axis=1)  # [NW·W, D+4]
    p = u_local.shape[0]
    block = p // (num_windows * k_blocks)

    meta, half, _ = _ell_meta(u_local, v_local, None, window, h.dtype)

    def kernel(meta_ref, h_ref, wpost_ref, b_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (block, window), 1
        ).astype(jnp.float32) - float(half)
        mf = meta_ref[:].astype(jnp.float32)
        onehot_u = (mf[:, 0:1] == lanes).astype(h_ref.dtype)
        onehot_v = (mf[:, 1:2] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(
            onehot_u, h_ref[:, : d + 1], preferred_element_type=jnp.float32
        )
        h_u, eig_u = hu_all[:, :d], hu_all[:, d:]
        both = jnp.concatenate([h_u, eig_u * h_u], axis=1).astype(h_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, both,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            h_win = h_ref[:, :d].astype(jnp.float32)
            eig_win = h_ref[:, d : d + 1].astype(jnp.float32)
            invd = h_ref[:, d + 1 : d + 2].astype(jnp.float32)
            ews = h_ref[:, d + 2 : d + 3].astype(jnp.float32)
            inva = h_ref[:, d + 3 : d + 4].astype(jnp.float32)
            m1 = acc_ref[:, :d]
            m2 = acc_ref[:, d:] - eig_win * m1
            a1 = m1 * invd
            a2 = jnp.abs(m2 - ews * h_win) * inva
            a = jnp.concatenate([a1, a2], axis=1).astype(h_ref.dtype)
            acc = jnp.dot(
                a, wpost_ref[:], preferred_element_type=jnp.float32
            ) + b_ref[:].astype(jnp.float32)
            out_ref[:] = (h_win + jnp.maximum(acc, 0.0)).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 2), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec((window, d + 4), lambda w, k: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((window, d), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, 2 * d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * p * window * d
            + 4 * num_windows * window * d * d,
            bytes_accessed=(p + 3 * num_windows * window) * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(meta, hcat, w_post, b_post)
    return out[:n]


def _slot_ncols(window: int, slots: int) -> int:
    """Tile columns the slot table occupies (2 hi/lo halves per slot when
    the window exceeds bf16's exact-integer range of 256)."""
    return slots if window <= 256 else 2 * slots


def _slot_cols(slot_src: jnp.ndarray, window: int, dtype) -> jnp.ndarray:
    """Encode slot_src [R, S] (values 0..window, sentinel=window) as exact
    small-integer columns of ``dtype``. Appended to the feature tile, the
    slot table rides the tile's (already DMA-padded) spare lanes — a
    separate [R, 1]-blocked int32 input is padded to full (8,128) tiles by
    the DMA engine, a measured ~128x traffic inflation that dominated
    these kernels' runtime in the first cut. bf16 holds integers ≤ 256
    exactly; wider windows split each slot into (lo, hi) = (p % 256,
    p // 256) halves."""
    if window <= 256:
        cols = slot_src
    else:
        cols = jnp.concatenate([slot_src % 256, slot_src // 256], axis=1)
    return cols.astype(dtype)


def _slot_onehot(h_ref, lanes_f, base: int, s: int, slots: int, window: int,
                 rows: int | None = None):
    """One [rows, W] one-hot gather matrix + [rows, 1] valid mask for slot
    ``s`` from the encoded columns at ``base`` of the feature tile block.
    ``rows`` < window slices the PREFIX of the window — with degree-sorted
    windows (base._window_degree_perm) slot s's occupied lanes are exactly
    rows [0, c_s), so the gather matmul's M shrinks to the static per-slot
    cap.

    Measured note (v5e): S separate per-slot [W, W] gather matmuls beat
    both one stacked [S·W, W] matmul over a separately-DMA'd index column
    (the DMA inflation above) and in-kernel index restacking (VPU select
    chains) — but per-slot transcendentals/tiny matmuls in the CONSUMER
    lose; batch those across slots on the gather outputs instead (see
    gat_local_message_slots)."""
    if window <= 256:
        p = h_ref[:, base + s : base + s + 1].astype(jnp.float32)
        onehot = (p == lanes_f).astype(h_ref.dtype)
        valid = (p < float(window)).astype(jnp.float32)
    else:
        lo = h_ref[:, base + s : base + s + 1].astype(jnp.float32)
        hi = h_ref[:, base + slots + s : base + slots + s + 1].astype(
            jnp.float32
        )
        onehot = (
            (lo == lanes_f % 256.0) & (hi == lanes_f // 256.0)
        ).astype(h_ref.dtype)
        valid = (lo + 256.0 * hi < float(window)).astype(jnp.float32)
    if rows is not None and rows < window:
        # Slice the FULL [W, W] one-hot (sublane-slicing the [W, 1] index
        # column itself crashes Mosaic's layout pass); the valid mask is
        # the sliced one-hot's row-sum — a sentinel row is all-zero.
        onehot = onehot[:rows]
        valid = jnp.sum(
            onehot.astype(jnp.float32), axis=1, keepdims=True
        )
    return onehot, valid


def pna_local_stats_ell(
    slot_src: jnp.ndarray,  # [NW·W, S] per-dest in-edge sources (sentinel=window)
    h: jnp.ndarray,  # [n, D]
    window: int,
    slots: int,
    min_init: float,
    max_init: float,
) -> jnp.ndarray:
    """PNA's four running aggregates (sum, sum², min, max —
    PNA/src/message_passing.cc:121-147) against window-local state.

    Grid (num_windows,): ONE step per window. The slot table rides the
    feature tile's spare lanes (_slot_cols — zero extra DMA); per slot one
    [W, W] one-hot matmul gathers that slot's sources and the four
    statistics update as a DENSE unrolled loop — the layout transposition
    that removes scatter-min/max entirely (XLA's lowering of those was
    both slow and minutes-long to compile). Returns [n, 4·D] channels
    (sum ‖ sum² ‖ min ‖ max), seeded at the reference's ap_fixed extremes.
    """
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    hcat = jnp.concatenate(
        [hp, _slot_cols(slot_src, window, hp.dtype)], axis=1
    )
    ncols = d + _slot_ncols(window, slots)

    def kernel(h_ref, out_ref):
        lanes_f = jax.lax.broadcasted_iota(
            jnp.int32, (window, window), 1
        ).astype(jnp.float32)
        acc_s = jnp.zeros((window, d), jnp.float32)
        acc_q = jnp.zeros((window, d), jnp.float32)
        acc_mn = jnp.full((window, d), min_init, jnp.float32)
        acc_mx = jnp.full((window, d), max_init, jnp.float32)
        for s in range(slots):
            onehot, valid = _slot_onehot(h_ref, lanes_f, d, s, slots, window)
            h_u = jnp.dot(
                onehot, h_ref[:, :d], preferred_element_type=jnp.float32
            )
            acc_s += h_u
            acc_q += h_u * h_u
            acc_mn = jnp.minimum(acc_mn, jnp.where(valid > 0, h_u, min_init))
            acc_mx = jnp.maximum(acc_mx, jnp.where(valid > 0, h_u, max_init))
        out_ref[:] = jnp.concatenate(
            [acc_s, acc_q, acc_mn, acc_mx], axis=1
        ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((window, ncols), lambda w: (w, 0)),
        ],
        out_specs=pl.BlockSpec((window, 4 * d), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * window, 4 * d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_windows * slots * window * window * d,
            bytes_accessed=5 * num_windows * window * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(hcat)
    return out[:n]


def pna_local_layer(
    slot_src: jnp.ndarray,  # [NW·W, S] per-dest in-edge sources (sentinel=window)
    h: jnp.ndarray,  # [n, D]
    inv_deg: jnp.ndarray,  # [n] 1/max(in_degree, 1)
    t: jnp.ndarray,  # [n] log(out_deg+1)/avg_deg scaler
    scale: jnp.ndarray,  # [n] avg_deg/log(out_deg+1) scaler
    w_cat: jnp.ndarray,  # [4·D, 3·D] = [w_noneᵀ ‖ w_tᵀ ‖ w_scaleᵀ]
    b: jnp.ndarray,  # [1, D]
    window: int,
    slots: int,
    min_init: float,
    max_init: float,
) -> jnp.ndarray:
    """One whole PNA layer in a single VMEM pass (no-spill fast path).

    Message phase = the per-slot one-hot four-aggregate gather (see
    pna_local_stats_ell); the epilogue then fuses everything the
    reference's apply unit does (PNA/src/node_embedding.cc:123-214):
    degree-normalised mean/std, the 12-block tower as ONE [4D, 3D] matmul
    with the three scalers applied to its thirds (the scalers distribute
    over the linear tower), and the residual h + relu(acc) — so the
    [n, 4·D] stats tensor and the [n, 3·D] tower output never exist in
    HBM. Returns next-h [n, D].
    """
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    aux = jnp.stack([inv_deg, t, scale], axis=1).astype(hp.dtype)  # [n, 3]
    aux = jnp.pad(aux, ((0, pad), (0, 0))) if pad else aux
    hcat = jnp.concatenate(
        [hp, aux, _slot_cols(slot_src, window, hp.dtype)], axis=1
    )
    ncols = d + 3 + _slot_ncols(window, slots)

    def kernel(h_ref, wcat_ref, b_ref, out_ref):
        lanes_f = jax.lax.broadcasted_iota(
            jnp.int32, (window, window), 1
        ).astype(jnp.float32)
        acc_s = jnp.zeros((window, d), jnp.float32)
        acc_q = jnp.zeros((window, d), jnp.float32)
        acc_mn = jnp.full((window, d), min_init, jnp.float32)
        acc_mx = jnp.full((window, d), max_init, jnp.float32)
        for s in range(slots):
            onehot, valid = _slot_onehot(
                h_ref, lanes_f, d + 3, s, slots, window
            )
            h_u = jnp.dot(
                onehot, h_ref[:, :d], preferred_element_type=jnp.float32
            )
            acc_s += h_u
            acc_q += h_u * h_u
            acc_mn = jnp.minimum(acc_mn, jnp.where(valid > 0, h_u, min_init))
            acc_mx = jnp.maximum(acc_mx, jnp.where(valid > 0, h_u, max_init))
        invd = h_ref[:, d : d + 1].astype(jnp.float32)
        t_w = h_ref[:, d + 1 : d + 2].astype(jnp.float32)
        sc_w = h_ref[:, d + 2 : d + 3].astype(jnp.float32)
        mean = acc_s * invd
        std = jnp.sqrt(jnp.maximum(acc_q * invd - mean * mean, 0.0))
        stats = jnp.concatenate(
            [mean, acc_mn, acc_mx, std], axis=1
        ).astype(h_ref.dtype)
        y = jnp.dot(stats, wcat_ref[:], preferred_element_type=jnp.float32)
        acc = (
            y[:, :d] + t_w * y[:, d : 2 * d] + sc_w * y[:, 2 * d :]
            + b_ref[:].astype(jnp.float32)
        )
        h_win = h_ref[:, :d].astype(jnp.float32)
        out_ref[:] = (h_win + jnp.maximum(acc, 0.0)).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((window, ncols), lambda w: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((window, d), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * window, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_windows
            * (slots * window * window * d + window * 4 * d * 3 * d),
            bytes_accessed=2 * num_windows * window * d * 4,
            transcendentals=num_windows * window * d,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(hcat, w_cat, b)
    return out[:n]


def pna_local_model(
    slot_src: jnp.ndarray,  # [NW·W, S] per-dest in-edge sources (sentinel=window)
    h0: jnp.ndarray,  # [n, D] embedded input features
    inv_deg: jnp.ndarray,  # [n] 1/max(in_degree, 1)
    t: jnp.ndarray,  # [n] log(out_deg+1)/avg_deg scaler
    scale: jnp.ndarray,  # [n] avg_deg/log(out_deg+1) scaler
    w_all: jnp.ndarray,  # [L·4D, 3D] per-layer [w_noneᵀ ‖ w_tᵀ ‖ w_scaleᵀ]
    b_all: jnp.ndarray,  # [L, D]
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    mlp1_w: jnp.ndarray,  # [D, D1] readout MLP-1 (right-mul)
    window: int,
    slots: int,
    num_layers: int,
    gmax: int,
    min_init: float,
    max_init: float,
    prefix_caps: tuple | None = None,  # per-slot static caps (degree-sorted)
    wps: int = 1,  # windows per grid step (the tower batches over them)
) -> jnp.ndarray:
    """The ENTIRE PNA conv stack (all L layers + finalize head) in ONE
    pallas call.

    ``prefix_caps`` (degree-sorted windows, base.as_batch): slot s's
    occupied lanes are rows [0, c_s), so each per-slot gather shrinks to
    [c_s, W] @ [W, D] with contributions padded back (zeros for sum/sum²,
    the accumulator seeds for min/max) — math identical, ~40% less M on
    molecular degree distributions.

    Window-aligned packing keeps every edge in-window, so one grid step
    runs all L layers for its window with h resident in VMEM throughout:
    the slot one-hot gather matrices are built once and reused per layer
    (topology is layer-invariant), the feature/aux/slot tile is DMA'd once
    instead of L×, and no inter-layer h touches HBM. Layer math is
    identical to pna_local_layer (4 running aggregates ≙
    PNA/src/message_passing.cc:121-147; mean/std + scaler tower + residual
    ≙ PNA/src/node_embedding.cc:123-214). The epilogue applies the
    readout MLP's FIRST linear per node (it commutes with mean-pooling ≙
    PNA/src/finalize.cc:34-52) and pools per window (_pool_epilogue);
    base.pool_finish divides + biases, then ReLU + MLP-2/3 run on the
    tiny [G, D1] in XLA. Returns [NW·GMAX, D1] f32 partial sums.
    No-spill only (caller falls back per layer otherwise).
    """
    n, d = h0.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h0, ((0, pad), (0, 0))) if pad else h0
    aux = jnp.stack([inv_deg, t, scale], axis=1).astype(hp.dtype)  # [n, 3]
    aux = jnp.pad(aux, ((0, pad), (0, 0))) if pad else aux
    scols = _slot_ncols(window, slots)
    hcat = jnp.concatenate(
        [hp, aux, _slot_cols(slot_src, window, hp.dtype),
         pool_gl[:, None].astype(hp.dtype)], axis=1
    )
    ncols = d + 3 + scols + 1
    t_out = mlp1_w.shape[1]
    cdt = h0.dtype
    orig_windows = num_windows
    if num_windows % wps:
        # Phantom windows complete the last wps group (zero rows; their
        # output rows are trimmed below).
        nw2 = -(-num_windows // wps) * wps
        hcat = jnp.concatenate(
            [hcat,
             jnp.zeros(((nw2 - num_windows) * window, ncols), hcat.dtype)],
            axis=0,
        )
        num_windows = nw2

    caps = (
        tuple(min(int(c), window) for c in prefix_caps)
        if prefix_caps is not None else (window,) * slots
    )

    def kernel(x_ref, w_ref, b_ref, predw_ref, out_ref):
        lanes_f = jax.lax.broadcasted_iota(
            jnp.int32, (window, window), 1
        ).astype(jnp.float32)
        subs = []
        for i in range(wps):
            x_i = x_ref[i * window : (i + 1) * window, :]
            subs.append(dict(
                x=x_i,
                onehots=[
                    _slot_onehot(x_i, lanes_f, d + 3, s, slots, window,
                                 rows=caps[s])
                    for s in range(slots)
                ],  # built once, reused by every layer
                invd=x_i[:, d : d + 1].astype(jnp.float32),
                t_w=x_i[:, d + 1 : d + 2].astype(jnp.float32),
                sc_w=x_i[:, d + 2 : d + 3].astype(jnp.float32),
                h=x_i[:, :d],
            ))
        for l in range(num_layers):
            parts4 = []  # per sub: (mean, min, max, std)
            for sub in subs:
                h = sub["h"]
                acc_s = jnp.zeros((window, d), jnp.float32)
                acc_q = jnp.zeros((window, d), jnp.float32)
                acc_mn = jnp.full((window, d), min_init, jnp.float32)
                acc_mx = jnp.full((window, d), max_init, jnp.float32)
                for s in range(slots):
                    onehot, valid = sub["onehots"][s]
                    h_u = jnp.dot(
                        onehot, h, preferred_element_type=jnp.float32
                    )

                    def _tail(x, fill):
                        # concat (not jnp.pad): Mosaic crashes lowering
                        # pads whose source has far fewer sublane tiles
                        # than the constant region.
                        if caps[s] == window:
                            return x
                        return jnp.concatenate(
                            [x, jnp.full(
                                (window - caps[s], d), fill, jnp.float32
                            )], axis=0,
                        )

                    acc_s += _tail(h_u, 0.0)
                    acc_q += _tail(h_u * h_u, 0.0)
                    acc_mn = jnp.minimum(
                        acc_mn, _tail(jnp.where(valid > 0, h_u, min_init),
                                      min_init)
                    )
                    acc_mx = jnp.maximum(
                        acc_mx, _tail(jnp.where(valid > 0, h_u, max_init),
                                      max_init)
                    )
                mean = acc_s * sub["invd"]
                std = jnp.sqrt(
                    jnp.maximum(acc_q * sub["invd"] - mean * mean, 0.0)
                )
                parts4.append((mean, acc_mn, acc_mx, std))
            # Four split matmuls instead of concat([mean,min,max,std]) @ w
            # — the tower is block-row separable and in-kernel lane
            # concats measured ~0.28 µs/window/layer on v5e. The tower
            # BATCHES over the step's wps windows (the slot-wps lever).
            y = jnp.zeros((wps * window, w_ref.shape[1]), jnp.float32)
            for j in range(4):
                part = (
                    jnp.concatenate([p4[j] for p4 in parts4], axis=0)
                    if wps > 1 else parts4[0][j]
                )
                y += jnp.dot(
                    part.astype(cdt),
                    w_ref[l * 4 * d + j * d : l * 4 * d + (j + 1) * d, :],
                    preferred_element_type=jnp.float32,
                )
            for i, sub in enumerate(subs):
                y_i = y[i * window : (i + 1) * window]
                acc = (
                    y_i[:, :d] + sub["t_w"] * y_i[:, d : 2 * d]
                    + sub["sc_w"] * y_i[:, 2 * d :]
                    + b_ref[l : l + 1, :].astype(jnp.float32)
                )
                sub["h"] = (
                    sub["h"].astype(jnp.float32) + jnp.maximum(acc, 0.0)
                ).astype(cdt)
        for i, sub in enumerate(subs):
            out_ref[i * gmax : (i + 1) * gmax] = _pool_epilogue(
                sub["h"], sub["x"], d + 3 + scols, predw_ref, window, gmax
            )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows // wps,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((wps * window, ncols), lambda w: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wps * gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_windows * num_layers
            * (slots * window * window * d + window * 4 * d * 3 * d),
            bytes_accessed=2 * num_windows * window * d * 4,
            transcendentals=num_layers * num_windows * window * d,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(hcat, w_all, b_all, mlp1_w)
    return out[: orig_windows * gmax]


def gat_local_message_slots(
    slot_stack: jnp.ndarray,  # [NW·S·W] stacked dest-major sources, FLOAT dtype
    h: jnp.ndarray,  # [n, H·D] projected features, head-major flat
    s_src: jnp.ndarray,  # [n, H]
    s_tgt: jnp.ndarray,  # [n, H]
    window: int,
    slots: int,
    num_heads: int,
    divide: bool = True,
) -> jnp.ndarray:
    """GAT edge softmax over the dest-major slot layout — NO scatter matmul.

    One stacked [S·W, W] one-hot matmul gathers every dest row's in-edge
    sources ([h ‖ s_tgt] share the tile); s_src needs no gather at all (it
    is indexed by the dest — the window rows the kernel block already
    holds); scores, the numerator and the denominator then reduce DENSELY
    over the slot axis (GAT/src/message_passing.cc:122-148 math, raw exp).
    With ``divide`` the softmax normalisation happens in-kernel (the
    denominator is complete per window) → returns [n, H·D]; otherwise
    returns [n, H·D + H] raw sums for the caller to merge with spill terms.

    ``slot_stack`` holds the indices as exact small FLOATS (bf16 for
    W ≤ 256, f32 beyond): a [R, 1]-blocked index column is DMA-padded to
    full tiles, so halving the element size halves the dominant input
    traffic. (Unlike DGN/PNA, GAT measured FASTER with this stacked
    single-matmul layout than with per-slot [W, W] gathers from
    tile-resident columns — its scoring consumes gathered s_tgt per slot,
    and every per-slot scoring variant lost more than the stacked gather
    saves; see BENCH.md.)
    """
    n, hd = h.shape
    d = hd // num_heads
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        s_src = jnp.pad(s_src, ((0, pad), (0, 0)))
        s_tgt = jnp.pad(s_tgt, ((0, pad), (0, 0)))
    hcat = jnp.concatenate([h, s_tgt.astype(h.dtype)], axis=1)  # [NW·W, HD+H]
    sw = slots * window
    out_dim = hd if divide else hd + num_heads

    def kernel(uslot_ref, h_ref, ssrc_ref, out_ref):
        uslot = uslot_ref[:, 0].astype(jnp.float32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sw, window), 1).astype(
            jnp.float32
        )
        onehot = (uslot[:, None] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(onehot, h_ref[:], preferred_element_type=jnp.float32)
        valid_all = (uslot < float(window))[:, None].astype(jnp.float32)
        s1 = ssrc_ref[:].astype(jnp.float32)  # [W, H] — dest rows, no gather
        cols = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 1) // d
        rows = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 0)
        expand = (cols == rows).astype(jnp.float32)
        num = jnp.zeros((window, hd), jnp.float32)
        den = jnp.zeros((window, num_heads), jnp.float32)
        for s in range(slots):
            sl = slice(s * window, (s + 1) * window)
            h_u = hu_all[sl, :hd]
            s2 = hu_all[sl, hd:]
            valid = valid_all[sl]
            raw = s1 + s2
            score = jnp.exp(jnp.where(raw < 0, raw * 0.2, raw)) * valid
            num += jnp.dot(
                score, expand, preferred_element_type=jnp.float32
            ) * h_u
            den += score
        if divide:
            den = jnp.where(den == 0, 1.0, den)
            denx = jnp.dot(den, expand, preferred_element_type=jnp.float32)
            out_ref[:] = (num / denx).astype(out_ref.dtype)
        else:
            out_ref[:] = jnp.concatenate([num, den], axis=1).astype(
                out_ref.dtype
            )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((sw, 1), lambda w: (w, 0)),
            pl.BlockSpec((window, hd + num_heads), lambda w: (w, 0)),
            pl.BlockSpec((window, num_heads), lambda w: (w, 0)),
        ],
        out_specs=pl.BlockSpec((window, out_dim), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * window, out_dim), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_windows * sw * window * hd,
            bytes_accessed=(num_windows * sw + 3 * num_windows * window)
            * hd * 4,
            transcendentals=num_windows * sw * num_heads,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(slot_stack[:, None], hcat, s_src)
    return out[:n]


def gat_local_model_slots(
    slot_stack: jnp.ndarray,  # [NW·S·W] stacked dest-major sources, FLOAT dtype
    h0: jnp.ndarray,  # [n, H·D] layer-0 projected features, head-major flat
    skip0: jnp.ndarray,  # [n, H·D] layer-0 skip term (prev0 @ skip_w[0])
    s0: jnp.ndarray,  # [n, 2H] layer-0 (s_src ‖ s_tgt)
    glue_w: jnp.ndarray,  # [(L-1)·HD, 2HD+2H] fused per-layer glue:
    #                       [skip_{l+1} ‖ proj_{l+1} ‖ proj_{l+1}@a_{l+1}]
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    pred_hd: jnp.ndarray,  # [HD, T] head-average ∘ prediction head, combined
    window: int,
    slots: int,
    num_heads: int,
    num_layers: int,
    gmax: int,
    wps: int = 1,  # independent windows interleaved per grid step
    prefix_caps: tuple | None = None,  # per-slot static caps (degree-sorted)
) -> jnp.ndarray:
    """The ENTIRE GAT model (all L layers + glue + finalize) in ONE pallas
    call.

    With ``prefix_caps`` (the degree-sorted PREFIX layout —
    base.as_batch's ``slot_pstack``/``slot_pcaps``), slot k's occupied
    lanes are rows [0, c_k) of each window: ``slot_stack`` is the
    [NW·Σc_k] compacted index column and the gather matmul's M drops from
    S·W to Σc_k (~40% on molhiv — molecular degree distributions leave
    nearly half the fixed slot lanes empty). Per-slot reductions become
    static prefix-slice accumulations; dest rank r IS window row r by the
    sort. Math is identical.

    Window-aligned packing keeps every edge in-window, so a window's whole
    forward pass is independent of every other window: one grid step runs
    all L attention layers for its window with h/scores living in
    VMEM/registers throughout, and the one-hot gather matrix is built ONCE
    and reused by every layer (topology is layer-invariant). Message math
    is identical to gat_local_message_slots (raw-exp softmax, in-kernel
    divide, GAT/src/message_passing.cc:122-148); glue math mirrors
    models/gat.py's per-layer path (skip-proj + ELU ≙
    GAT/src/node_embedding.cc:156-196, next projection + scores ≙
    node_embedding.cc:230-268); the finalize stage (head-average ≙
    finalize.cc:90-110, prediction matvec, per-window mean-pool partials)
    runs in-kernel via _pool_epilogue. Returns per-(window, graph-slot)
    prediction SUMS [NW·GMAX, T] f32 for base.pool_finish.

    Round-3 glue restructure (measured via bench/ablate_gat_mega.py —
    each in-kernel matmul pays ~K cycles of MXU weight load on top of its
    M-row streaming, so invocation count matters as much as tiles):

      * FUSED GLUE: skip_{l+1}, proj_{l+1} and the score map a_{l+1} all
        consume the same operand feat_l, so one [W, HD] @ [HD, 2HD+2H]
        matmul (``glue_w``) replaces three. scat = feat@(proj@a) commutes
        the cdt-cast of h out of the score matmul — identical in f32 up
        to one rounding; under bf16 the next layer's scores see the
        unquantized projection (documented delta, within the bf16 drift
        envelope).
      * Layer-0's skip term is ONE XLA matmul at pack scale (``skip0``
        rides the feature tile in place of the old prev0 — same width).

    A dim-major-lane variant that replaced the per-slot [W, H] → [W, HD]
    score-expand matmuls with ``pltpu.repeat`` measured 4.4× SLOWER
    (Mosaic lowers the 16× lane replication pathologically) — the expand
    matmuls stay (K=4, negligible weight load).

    No-spill only (caller falls back to the per-layer path when the batch
    has window-crossing edges, where per-layer spill terms must merge
    before the softmax divide).
    """
    n, hd = h0.shape
    d = hd // num_heads
    nh = num_heads
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        skip0 = jnp.pad(skip0, ((0, pad), (0, 0)))
        s0 = jnp.pad(s0, ((0, pad), (0, 0)))
    cdt = h0.dtype
    t_out = pred_hd.shape[1]
    pay = max(128, hd + nh)  # gather-payload lanes (see models/gat.py)
    # The persistent gather payload hx = [h ‖ s_tgt ‖ zeros] occupies the
    # FIRST `pay` lanes of both the feature tile and the glue output, so
    # every layer's gather operand is an aligned zero-offset slice — the
    # per-layer in-kernel [h ‖ s_tgt] lane-concat it replaces measured
    # ~0.28 µs/window/layer (bench/ablate_gat_mega.py).
    xcat = jnp.concatenate(
        [h0, s0[:, nh:].astype(cdt),
         jnp.zeros((h0.shape[0], pay - hd - nh), cdt),
         skip0.astype(cdt), s0[:, :nh].astype(cdt),
         pool_gl[:, None].astype(cdt)], axis=1
    )  # [NW·W, PAY+HD+H+1]
    if prefix_caps is not None:
        caps = tuple(int(c) for c in prefix_caps)
        offs = tuple(int(sum(caps[:k])) for k in range(len(caps)))
        sw = int(sum(caps))
    else:
        caps = offs = None
        sw = slots * window
    if num_windows % wps:
        wps = 1
    xw = pay + hd + nh + 1

    def kernel(uslot_ref, x_ref, glue_ref, predw_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sw, window), 1).astype(
            jnp.float32
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 1) // d
        rows = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 0)
        expand = (cols == rows).astype(jnp.float32)

        # wps > 1 interleaves INDEPENDENT windows through the layer loop so
        # Mosaic can fill the MXU pipeline bubbles of one window's serial
        # layer-dependency chain with the other's matmuls (the in-situ
        # gather measured 1.65× its pure-chain time at wps=1).
        st = []
        for i in range(wps):
            us = uslot_ref[i * sw : (i + 1) * sw, 0].astype(jnp.float32)
            x = x_ref[i * window : (i + 1) * window]
            st.append(dict(
                onehot=(us[:, None] == lanes).astype(cdt),
                valid=(us < float(window))[:, None].astype(jnp.float32),
                x=x,
                hx=x[:, :pay],
                skip=x[:, pay : pay + hd].astype(jnp.float32),
                s_src=x[:, pay + hd : pay + hd + nh].astype(jnp.float32),
            ))
        for l in range(num_layers):
            hu = [
                jnp.dot(
                    s["onehot"], s["hx"],
                    preferred_element_type=jnp.float32,
                )
                for s in st
            ]  # wps × [S·W, PAY] — independent, pipeline-fillable
            for i, s in enumerate(st):
                num = jnp.zeros((window, hd), jnp.float32)
                denx = jnp.zeros((window, hd), jnp.float32)
                for k in range(slots):
                    if caps is not None:
                        sl = slice(offs[k], offs[k] + caps[k])
                        rows = slice(0, caps[k])  # dest rank r = row r
                    else:
                        sl = slice(k * window, (k + 1) * window)
                        rows = slice(0, window)
                    h_u = hu[i][sl, :hd]
                    s2 = hu[i][sl, hd : hd + nh]
                    raw = s["s_src"][rows] + s2
                    score = (
                        jnp.exp(jnp.where(raw < 0, raw * 0.2, raw))
                        * s["valid"][sl]
                    )
                    # One expand matmul serves BOTH the numerator weights
                    # and the (expanded) denominator — accumulating denx
                    # head-expanded also keeps every prefix-pad operand a
                    # matmul output (offset-0 layout; Mosaic cannot
                    # concat/pad lane-offset narrow vectors).
                    scorex = jnp.dot(
                        score, expand, preferred_element_type=jnp.float32
                    )
                    if caps is not None and caps[k] < window:
                        tail = ((0, window - caps[k]), (0, 0))
                        num += jnp.pad(scorex * h_u, tail)
                        denx += jnp.pad(scorex, tail)
                    else:
                        num += scorex * h_u
                        denx += scorex
                msg = num / jnp.where(denx == 0, 1.0, denx)
                s["msg"] = msg.astype(cdt).astype(jnp.float32)  # ≙ prec.q
            if l != num_layers - 1:
                for s in st:
                    feat = s["msg"] + s["skip"]
                    feat = jnp.where(
                        feat <= 0, jnp.exp(feat) - 1, feat
                    ).astype(cdt)  # ELU, ≙ prec.q(feat)
                    g = jnp.dot(
                        feat,
                        glue_ref[l * hd : (l + 1) * hd, :],
                        preferred_element_type=jnp.float32,
                    )  # [W, PAY+HD+H] = [hx_{l+1} ‖ skip_{l+1} ‖ s_src_{l+1}]
                    s["hx"] = g[:, :pay].astype(cdt)
                    s["skip"] = g[:, pay : pay + hd]
                    s["s_src"] = (
                        g[:, pay + hd :].astype(cdt).astype(jnp.float32)
                    )
            else:
                for i, s in enumerate(st):
                    out_ref[i * gmax : (i + 1) * gmax] = _pool_epilogue(
                        s["msg"] + s["skip"], s["x"], pay + hd + nh,
                        predw_ref, window, gmax,
                    )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows // wps,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((wps * sw, 1), lambda w: (w, 0)),
            pl.BlockSpec((wps * window, xw), lambda w: (w, 0)),
            pl.BlockSpec(glue_w.shape, lambda w: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wps * gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2
            * num_windows
            * num_layers
            * (sw * window * (hd + nh) + window * hd * (2 * hd + 2 * nh)),
            bytes_accessed=num_windows
            * (sw + window * (2 * hd + 2 * nh) * 4),
            transcendentals=num_layers * num_windows * sw * nh,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(slot_stack[:, None], xcat, glue_w, pred_hd)
    return out


def gat_local_model_pairs(
    slot_stack: jnp.ndarray,  # [NW·SW] stacked dest-major sources, FLOAT dtype
    h0: jnp.ndarray,  # [n, H·D] layer-0 projected features, head-major flat
    skip0: jnp.ndarray,  # [n, H·D] layer-0 skip term (prev0 @ skip_w[0])
    glue2_w: jnp.ndarray,  # [(L-1)·2HD, 4HD] paired block-diag [proj ‖ skip]
    ab_w: jnp.ndarray,  # [L·2HD, 4H] per-layer block-diag [a_tgt ‖ a_src] maps
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    pred2_w: jnp.ndarray,  # [2HD, 2T] block-diag head-average ∘ prediction head
    window: int,
    slots: int,
    num_heads: int,
    num_layers: int,
    gmax: int,
    prefix_caps: tuple | None = None,  # per-slot static caps (degree-sorted)
    _ablate: str | None = None,  # bench-only (bench/ablate_gat_pairs):
    #   "nogather" stubs the two-hot gather matmul, "noscore" the score
    #   recompute + exp chain, "noglue" the inter-layer glue matmul —
    #   NOT bit-exact, used only for noop-subtracted time attribution.
) -> jnp.ndarray:
    """GAT whole-model megakernel with TWO-WINDOW LANE PACKING.

    GAT's H·D = 64 features half-fill every 128-lane vreg and MXU tile —
    the structural diagnosis behind its worst-relative speedup (BENCH.md
    round-4 conclusion). This kernel packs two windows (A, B) per grid
    step so 2·HD = 128 lanes are always fully used:

      * GATHER: one "two-hot" [Σc, 2W] @ [2W, 2HD] matmul against the
        block-diagonal payload [[h_A ‖ 0], [0 ‖ h_B]] replaces two
        [Σc, W] @ [W, 128] half-useful gathers — K doubles to 2W (full
        MXU depth), the invocation count halves, and every output lane
        is payload (row r = [h_A[srcA_r] ‖ h_B[srcB_r]]).
      * SCORES OFF-PAYLOAD: 2·(HD + H) = 136 lanes no longer fit the
        128-lane gather payload, so s_tgt is RECOMPUTED from the gathered
        rows (s2 = hu @ blockdiag(a_tgt, a_tgt), one [Σc, 2HD] @ [2HD, 2H]
        matmul per layer) and s_src from the window rows — same math as
        the reference's per-node score precompute
        (GAT/src/load_inputs.cc:203-227), just evaluated post-gather.
      * GLUE: feat_pair [W, 2HD] @ blockdiag(proj, skip ×2) [2HD, 4HD]
        runs at K=128/N=256 instead of the measured-12.6%-of-peak
        [W, 64]@[64, ·] shape (BASELINE.md matmul table) — 2× the padded
        FLOPs of two singles but full MXU depth.
      * VPU: accumulators, score chain and ELU all run [·, 128]-wide for
        two windows at once; the grid halves its steps.

    Message/glue math is identical to gat_local_model_slots (raw-exp
    softmax ≙ GAT/src/message_passing.cc:122-148, skip + ELU ≙
    node_embedding.cc:156-196, in-kernel finalize ≙ finalize.cc:90-110);
    the score recompute makes each layer's s_src/s_tgt the product of the
    QUANTIZED h_{l+1} (closer to the per-layer reference order than the
    fused-glue scat composition). Returns [NW·gmax, T] f32 prediction
    sums for base.pool_finish — same row layout as the unpaired kernel
    (pair p writes windows 2p, 2p+1's gmax-row groups). No-spill only.
    """
    n, hd = h0.shape
    d = hd // num_heads
    nh = num_heads
    pay2 = 2 * hd  # 128 paired payload lanes
    orig_windows = -(-n // window)
    num_windows = orig_windows
    if num_windows % 2:
        num_windows += 1  # phantom all-pad window completes the last pair
    rows = num_windows * window
    pad = rows - n
    if pad:
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        skip0 = jnp.pad(skip0, ((0, pad), (0, 0)))
    cdt = h0.dtype
    t_out = pred2_w.shape[1] // 2
    if prefix_caps is not None:
        caps = tuple(int(c) for c in prefix_caps)
        offs = tuple(int(sum(caps[:k])) for k in range(len(caps)))
        sw = int(sum(caps))
    else:
        caps = tuple(window for _ in range(slots))
        offs = tuple(k * window for k in range(slots))
        sw = slots * window
    _abl = set((_ablate or "").split(",")) - {""}
    gl = pool_gl.astype(cdt)
    if gl.shape[0] < rows:  # phantom window rows pool to the sentinel
        gl = jnp.concatenate(
            [gl, jnp.full((rows - gl.shape[0],), float(gmax), cdt)]
        )
    stack = slot_stack
    if stack.shape[0] < num_windows * sw:  # phantom window lanes: sentinel
        stack = jnp.concatenate(
            [stack,
             jnp.full((num_windows * sw - stack.shape[0],), float(window),
                      stack.dtype)]
        )

    def pair_cols(a):  # [NW·W, c] → [NW/2·W, 2c]: window 2p ‖ window 2p+1
        c = a.shape[1]
        return jnp.concatenate(
            [a.reshape(num_windows, window, c)[0::2],
             a.reshape(num_windows, window, c)[1::2]], axis=2
        ).reshape(num_windows // 2 * window, 2 * c)

    xcat = jnp.concatenate(
        [pair_cols(h0), pair_cols(skip0.astype(cdt)),
         pair_cols(gl[:, None])], axis=1
    )  # [NW/2·W, 2HD + 2HD + 2]
    pairstack = jnp.concatenate(
        [stack.reshape(num_windows, sw)[0::2],
         stack.reshape(num_windows, sw)[1::2]], axis=1
    ).reshape(-1)[:, None]  # [NW/2 · 2SW, 1] — A's SW rows then B's
    xw = 2 * pay2 + 2

    def kernel(uslot_ref, x_ref, glue_ref, ab_ref, predw_ref, out_ref):
        w2 = 2 * window
        lanes2 = jax.lax.broadcasted_iota(jnp.int32, (sw, w2), 1).astype(
            jnp.float32
        )
        # Two-hot gather matrix: row r is hot at srcA_r (payload rows
        # [0, W) = window A) and at W + srcB_r (rows [W, 2W) = window B).
        # Sentinel lanes (src = window) match nothing on either side: A's
        # sentinel W only meets lanes < W, B's maps to 2W ≥ the iota range.
        usA = uslot_ref[0:sw, 0].astype(jnp.float32)[:, None]
        usB = uslot_ref[sw : 2 * sw, 0].astype(jnp.float32)[:, None]
        if "noonehot" in _abl:
            # Cheap build stand-in: one compare, no select/shift chain.
            onehot = (usA == lanes2).astype(cdt)
        else:
            usel = jnp.where(
                lanes2 < float(window), usA, usB + float(window)
            )
            onehot = (usel == lanes2).astype(cdt)
        # Per-half valid masks, head-replicated to the paired score lanes.
        h8 = jax.lax.broadcasted_iota(jnp.int32, (sw, 2 * nh), 1)
        valid8 = jnp.where(
            h8 < nh, (usA < float(window)).astype(jnp.float32),
            (usB < float(window)).astype(jnp.float32),
        )
        # Block-diag head expand [2H, 2HD]: col // d spans 0..2H-1.
        ecol = jax.lax.broadcasted_iota(jnp.int32, (2 * nh, pay2), 1)
        erow = jax.lax.broadcasted_iota(jnp.int32, (2 * nh, pay2), 0)
        expand2 = (erow == ecol // d).astype(jnp.float32)
        # Payload half masks (A lanes [0, HD), B lanes [HD, 2HD)).
        plane = jax.lax.broadcasted_iota(jnp.int32, (window, pay2), 1)
        mA = (plane < hd).astype(cdt)
        mB = (plane >= hd).astype(cdt)

        hpair = x_ref[:, :pay2]
        skip = x_ref[:, pay2 : 2 * pay2].astype(jnp.float32)
        glA = x_ref[:, 2 * pay2 : 2 * pay2 + 1].astype(jnp.float32)
        glB = x_ref[:, 2 * pay2 + 1 : 2 * pay2 + 2].astype(jnp.float32)
        for l in range(num_layers):
            ab_l = ab_ref[l * pay2 : (l + 1) * pay2, :]
            # Block-diagonal payload: [[h_A ‖ 0], [0 ‖ h_B]].
            payload = jnp.concatenate([hpair * mA, hpair * mB], axis=0)
            if "nogather" in _abl:
                # Tiny-K stand-in gather (~1% of the real matmul's work;
                # zeros-region and scalar-broadcast stubs both abort the
                # Mosaic compiler) — keeps shapes/layouts natural.
                hu = jnp.dot(
                    onehot[:, :8], payload[:8, :],
                    preferred_element_type=jnp.float32,
                )
            else:
                hu = jnp.dot(
                    onehot, payload, preferred_element_type=jnp.float32
                )  # [SW, 2HD] — row r = [h_A[srcA_r] ‖ h_B[srcB_r]]
            if "noscore" not in _abl:
                hu_c = hu.astype(cdt)  # exact: gathered values are cdt
                s2 = jnp.dot(
                    hu_c, ab_l[:, : 2 * nh],
                    preferred_element_type=jnp.float32,
                )  # [SW, 2H] s_tgt of the gathered sources, per half
                s_src = jnp.dot(
                    hpair, ab_l[:, 2 * nh :],
                    preferred_element_type=jnp.float32,
                )  # [W, 2H] per dest row, per half
            num = jnp.zeros((window, pay2), jnp.float32)
            denx = jnp.zeros((window, pay2), jnp.float32)
            for k in range(slots):
                sl = slice(offs[k], offs[k] + caps[k])
                rows_k = slice(0, caps[k])  # dest rank r = window row r
                if "noscore" in _abl:
                    score = valid8[sl]
                else:
                    raw = s_src[rows_k] + s2[sl]
                    score = (
                        jnp.exp(jnp.where(raw < 0, raw * 0.2, raw))
                        * valid8[sl]
                    )
                scorex = jnp.dot(
                    score, expand2, preferred_element_type=jnp.float32
                )
                if "noacc" in _abl:
                    if k == 0:
                        num = scorex[:window] * hu[:window]
                        denx = scorex[:window] + 1.0
                    continue
                if caps[k] < window:
                    tail = ((0, window - caps[k]), (0, 0))
                    num += jnp.pad(scorex * hu[sl], tail)
                    denx += jnp.pad(scorex, tail)
                else:
                    num += scorex * hu[sl]
                    denx += scorex
            msg = num / jnp.where(denx == 0, 1.0, denx)
            msg = msg.astype(cdt).astype(jnp.float32)  # ≙ prec.q
            if l != num_layers - 1:
                feat = msg + skip
                feat = jnp.where(
                    feat <= 0, jnp.exp(feat) - 1, feat
                ).astype(cdt)  # ELU, ≙ prec.q(feat)
                if "noglue" in _abl:
                    hpair = feat
                else:
                    g = jnp.dot(
                        feat,
                        glue_ref[l * pay2 : (l + 1) * pay2, :],
                        preferred_element_type=jnp.float32,
                    )  # [W, 4HD] = [h_{l+1} pair ‖ skip_{l+1} pair]
                    hpair = g[:, :pay2].astype(cdt)
                    skip = g[:, pay2:]
            else:
                outp = (msg + skip).astype(cdt)
                p = jnp.dot(
                    outp, predw_ref[:], preferred_element_type=jnp.float32
                )  # [W, 2T] — per-node predictions, per half
                g2 = jax.lax.broadcasted_iota(
                    jnp.int32, (window, 2 * gmax), 1
                )
                glsel = jnp.where(g2 < gmax, glA, glB)
                ohg = (glsel == (g2 % gmax).astype(jnp.float32)).astype(
                    jnp.float32
                )
                pooled = jax.lax.dot_general(
                    ohg, p, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [2·gmax, 2T]
                out_ref[0:gmax] = pooled[0:gmax, 0:t_out]
                out_ref[gmax : 2 * gmax] = pooled[gmax:, t_out : 2 * t_out]

    out = pl.pallas_call(
        kernel,
        grid=(num_windows // 2,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((2 * sw, 1), lambda w: (w, 0)),
            pl.BlockSpec((window, xw), lambda w: (w, 0)),
            pl.BlockSpec(glue2_w.shape, lambda w: (0, 0)),
            pl.BlockSpec(ab_w.shape, lambda w: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=num_windows
            * num_layers
            * (2 * sw * window * pay2  # two-hot gather (K = 2W)
               + 2 * sw * pay2 * 2 * nh  # s_tgt recompute
               + window * pay2 * (2 * pay2 + 2 * nh)),  # glue + s_src
            bytes_accessed=num_windows // 2
            * (2 * sw + window * xw * 4),
            transcendentals=num_layers * num_windows // 2 * sw * 2 * nh,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(pairstack, xcat, glue2_w, ab_w, pred2_w)
    # Drop the phantom window's rows: the caller's pool-row table (and the
    # halo path's tiled all_gather of per-shard partials) indexes exactly
    # orig_windows·gmax rows per shard.
    return out[: orig_windows * gmax]


def gat_local_model_dense(
    slot_stack: jnp.ndarray,  # [NW·S·W] stacked dest-major sources, FLOAT dtype
    h0: jnp.ndarray,  # [n, H·D] layer-0 projected features, head-major flat
    prev0: jnp.ndarray,  # [n, H·D] raw-feature prev (head-0 slots)
    s0: jnp.ndarray,  # [n, 2H] layer-0 (s_src ‖ s_tgt)
    skip_w: jnp.ndarray,  # [L·HD, HD] right-mul skip weights, layer-major rows
    proj_w: jnp.ndarray,  # [(L-1)·HD, HD] right-mul projections, layers 1..L-1
    a_next: jnp.ndarray,  # [(L-1)·HD, 2H] score maps (a_src ‖ a_tgt), layers 1..L-1
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    pred_hd: jnp.ndarray,  # [HD, T] head-average ∘ prediction head, combined
    window: int,
    slots: int,
    num_heads: int,
    num_layers: int,
    gmax: int,
) -> jnp.ndarray:
    """gat_local_model_slots with DENSE per-head attention (opt-in,
    FLOWGNN_GAT_DENSE=1) — no feature gather at all.

    Key identity: GAT's unnormalised score is a RANK-1 broadcast over the
    window, raw[v,u] = s_src[v] + s_tgt[u] (GAT/src/message_passing.cc:
    122-133 computes it per edge; here the whole [W, W] grid costs one
    VPU broadcast). The slot one-hots collapse into a single [W, W]
    edge-multiplicity mask (built once, reused all L layers), and each
    head's aggregation becomes A_h @ h_h — H small [W, W]@[W, D] matmuls
    — instead of the [S·W, W]@[W, HD+H] stacked gather: fewer MXU tiles
    per layer (H·⌈W/128⌉²·⌈D/128⌉ vs S·⌈W/128⌉²·⌈(HD+H)/128⌉) and the
    [S·W, ·] intermediate never exists. The denominator is each A_h's
    row sum. Everything else (glue, finalize epilogue, input/output
    contract) is identical to gat_local_model_slots.

    One numerics delta vs the slot path: A_h is cast to the compute dtype
    for the MXU matmul, so under bf16 the SCORES are bf16-quantized (the
    slot path keeps them f32 and quantizes only the normalised message).
    Numerator and denominator both consume the SAME cast weights, so the
    normalised attention rows sum to exactly 1 in every mode. Identical
    to the slot path in --f32 mode; within the model's bf16 drift
    envelope otherwise.
    """
    n, hd = h0.shape
    d = hd // num_heads
    nh = num_heads
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        prev0 = jnp.pad(prev0, ((0, pad), (0, 0)))
        s0 = jnp.pad(s0, ((0, pad), (0, 0)))
    cdt = h0.dtype
    t_out = pred_hd.shape[1]
    xcat = jnp.concatenate(
        [h0, prev0, s0.astype(cdt), pool_gl[:, None].astype(cdt)], axis=1
    )  # [NW·W, 2HD+2H+1]
    sw = slots * window

    def kernel(uslot_ref, x_ref, skip_ref, proj_ref, a_ref, predw_ref,
               out_ref):
        uslot = uslot_ref[:, 0].astype(jnp.float32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sw, window), 1).astype(
            jnp.float32
        )
        onehot = (uslot[:, None] == lanes).astype(jnp.float32)
        # [W(dest), W(src)] edge multiplicity: sentinel slots match no lane.
        mask = onehot[:window]
        for s in range(1, slots):
            mask = mask + onehot[s * window : (s + 1) * window]
        cols = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 1) // d
        rows = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 0)
        expand = (cols == rows).astype(jnp.float32)

        h = x_ref[:, :hd]  # [W, HD] compute dtype
        prev = x_ref[:, hd : 2 * hd]
        s_src = x_ref[:, 2 * hd : 2 * hd + nh].astype(jnp.float32)
        s_tgt = x_ref[:, 2 * hd + nh : 2 * hd + 2 * nh]
        for l in range(num_layers):
            nums, dens = [], []
            s_tgt32 = s_tgt.astype(jnp.float32)
            for hh in range(nh):
                raw = s_src[:, hh][:, None] + s_tgt32[:, hh][None, :]
                # Suppress non-edges BEFORE the exp: a masked-out pair whose
                # raw score exceeds ~88 would overflow f32 exp to inf, and
                # mask·inf = 0·inf = NaN (the slot path only exponentiates
                # realized edges; this keeps the dense path's overflow
                # surface identical to it).
                a_h = jnp.where(
                    mask > 0,
                    mask * jnp.exp(jnp.where(raw < 0, raw * 0.2, raw)),
                    0.0,
                )
                # Cast ONCE so numerator matmul and denominator row-sum see
                # the same (compute-dtype-quantized) attention weights —
                # normalised rows then sum to exactly 1 in bf16 mode too.
                a_c = a_h.astype(cdt)
                nums.append(
                    jnp.dot(
                        a_c, h[:, hh * d : (hh + 1) * d],
                        preferred_element_type=jnp.float32,
                    )
                )
                dens.append(
                    jnp.sum(a_c.astype(jnp.float32), axis=1, keepdims=True)
                )
            num = jnp.concatenate(nums, axis=1)  # [W, HD]
            den = jnp.concatenate(dens, axis=1)  # [W, H]
            den = jnp.where(den == 0, 1.0, den)
            msg = num / jnp.dot(den, expand, preferred_element_type=jnp.float32)
            msg = msg.astype(cdt).astype(jnp.float32)  # ≙ prec.q(msg)
            skip = jnp.dot(
                prev,
                skip_ref[l * hd : (l + 1) * hd, :],
                preferred_element_type=jnp.float32,
            )
            if l != num_layers - 1:
                feat = msg + skip
                feat = jnp.where(
                    feat <= 0, jnp.exp(feat) - 1, feat
                ).astype(cdt)  # ELU, ≙ prec.q(feat)
                prev = feat
                h = jnp.dot(
                    feat,
                    proj_ref[l * hd : (l + 1) * hd, :],
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
                scat = jnp.dot(
                    h, a_ref[l * hd : (l + 1) * hd, :],
                    preferred_element_type=jnp.float32,
                )  # [W, 2H]
                s_src = scat[:, :nh].astype(cdt).astype(jnp.float32)
                s_tgt = scat[:, nh:].astype(cdt)
            else:
                out_ref[:] = _pool_epilogue(
                    msg + skip, x_ref, 2 * hd + 2 * nh, predw_ref,
                    window, gmax,
                )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((sw, 1), lambda w: (w, 0)),
            pl.BlockSpec((window, 2 * hd + 2 * nh + 1), lambda w: (w, 0)),
            pl.BlockSpec(skip_w.shape, lambda w: (0, 0)),
            pl.BlockSpec(proj_w.shape, lambda w: (0, 0)),
            pl.BlockSpec(a_next.shape, lambda w: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2
            * num_windows
            * num_layers
            * (nh * window * window * d + 2 * window * hd * hd),
            bytes_accessed=num_windows
            * (sw + window * (2 * hd + 2 * nh) * 4),
            transcendentals=num_layers * num_windows * window * window * nh,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(slot_stack[:, None], xcat, skip_w, proj_w, a_next, pred_hd)
    return out


def dgn_local_layer_slots(
    slot_src: jnp.ndarray,  # [NW·W, S] per-dest in-edge sources (sentinel=window)
    h: jnp.ndarray,  # [n, D]
    eig: jnp.ndarray,  # [n]
    inv_deg: jnp.ndarray,  # [n] 1/max(out_degree, 1)
    eigw_sum: jnp.ndarray,  # [n]
    inv_abssum: jnp.ndarray,  # [n] 1/eig_abssum (eps-guarded)
    w_post: jnp.ndarray,  # [2·D, D]
    b_post: jnp.ndarray,  # [1, D]
    window: int,
    slots: int,
    m_spill: jnp.ndarray | None = None,  # [n, 2·D] pre-reduced crossing msgs
) -> jnp.ndarray:
    """One whole DGN layer over the dest-major slot layout — no scatter
    matmul: the slot table rides the feature tile's spare lanes (zero
    extra DMA, see _slot_cols), per slot one [W, W] one-hot matmul
    gathers [h ‖ eig], channel sums reduce densely over slots (m2
    factored as Σ eig_u·h_u − eig_v·m1; sentinel slots gather zero rows
    so sums need no validity mask), then the same fused epilogue as
    dgn_local_layer_ell. ``m_spill`` carries the pre-reduced
    window-crossing/overflow contributions (its m2 half is already fully
    weighted, so it adds AFTER the local factoring). Returns next-h
    [n, D].
    """
    n, d = h.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    aux = jnp.stack([eig, inv_deg, eigw_sum, inv_abssum], axis=1).astype(
        hp.dtype
    )
    aux = jnp.pad(aux, ((0, pad), (0, 0))) if pad else aux
    hcat = jnp.concatenate(
        [hp, aux, _slot_cols(slot_src, window, hp.dtype)], axis=1
    )  # [NW·W, D+4+scols]
    ncols = d + 4 + _slot_ncols(window, slots)
    has_spill = m_spill is not None
    if has_spill and pad:
        m_spill = jnp.pad(m_spill, ((0, pad), (0, 0)))

    def kernel(h_ref, *rest):
        wpost_ref, b_ref = rest[-3], rest[-2]
        out_ref = rest[-1]
        lanes_f = jax.lax.broadcasted_iota(
            jnp.int32, (window, window), 1
        ).astype(jnp.float32)
        m1 = jnp.zeros((window, d), jnp.float32)
        m2a = jnp.zeros((window, d), jnp.float32)
        for s in range(slots):
            onehot, _ = _slot_onehot(
                h_ref, lanes_f, d + 4, s, slots, window
            )
            hu = jnp.dot(
                onehot, h_ref[:, : d + 1], preferred_element_type=jnp.float32
            )
            m1 += hu[:, :d]
            m2a += hu[:, d:] * hu[:, :d]
        h_win = h_ref[:, :d].astype(jnp.float32)
        eig_win = h_ref[:, d : d + 1].astype(jnp.float32)
        invd = h_ref[:, d + 1 : d + 2].astype(jnp.float32)
        ews = h_ref[:, d + 2 : d + 3].astype(jnp.float32)
        inva = h_ref[:, d + 3 : d + 4].astype(jnp.float32)
        m2 = m2a - eig_win * m1
        if has_spill:
            spill = rest[0][:].astype(jnp.float32)
            m1 = m1 + spill[:, :d]
            m2 = m2 + spill[:, d:]
        a1 = m1 * invd
        a2 = jnp.abs(m2 - ews * h_win) * inva
        a = jnp.concatenate([a1, a2], axis=1).astype(h_ref.dtype)
        acc = jnp.dot(
            a, wpost_ref[:], preferred_element_type=jnp.float32
        ) + b_ref[:].astype(jnp.float32)
        out_ref[:] = (h_win + jnp.maximum(acc, 0.0)).astype(out_ref.dtype)

    spill_specs = (
        [pl.BlockSpec((window, 2 * d), lambda w: (w, 0))] if has_spill else []
    )
    spill_ins = (m_spill,) if has_spill else ()
    out = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((window, ncols), lambda w: (w, 0)),
            *spill_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((window, d), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * window, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_windows
            * (slots * window * window * d + window * 2 * d * d),
            bytes_accessed=2 * num_windows * window * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(hcat, *spill_ins, w_post, b_post)
    return out[:n]


def dgn_local_model(
    slot_src: jnp.ndarray,  # [NW·W, S] per-dest in-edge sources (sentinel=window)
    h0: jnp.ndarray,  # [n, D] embedded input features
    eig: jnp.ndarray,  # [n]
    inv_deg: jnp.ndarray,  # [n] 1/max(out_degree, 1)
    eigw_sum: jnp.ndarray,  # [n]
    inv_abssum: jnp.ndarray,  # [n] 1/eig_abssum (eps-guarded)
    w_all: jnp.ndarray,  # [L·2D, D] per-layer posttrans (right-mul rows)
    b_all: jnp.ndarray,  # [L, D]
    pool_gl: jnp.ndarray,  # [NW·W] graph-local ids (base._attach_pool_layout)
    mlp1_w: jnp.ndarray,  # [D, D1] readout MLP-1 (right-mul)
    window: int,
    slots: int,
    num_layers: int,
    gmax: int,
    prefix_caps: tuple | None = None,  # per-slot static caps (degree-sorted)
    wps: int = 1,  # windows per grid step (posttrans batches over them)
) -> jnp.ndarray:
    """The ENTIRE DGN conv stack (all L layers + finalize head) in ONE
    pallas call.

    ``prefix_caps``: same degree-sorted prefix compaction as
    pna_local_model — per-slot gathers shrink to [c_s, W], contributions
    zero-padded back to the window.

    Same megakernel pattern as pna_local_model: one grid step runs all L
    layers for its window — slot one-hot gathers and the per-slot eig_u
    gathers are built once (topology and eigenvectors are layer-invariant),
    h stays in VMEM across layers, the feature/aux/slot tile is DMA'd once
    instead of L×. Layer math ≡ dgn_local_layer_slots (two-channel sums
    with m2 factored as Σ eig_u·h_u − eig_v·m1 ≙
    DGN/src/message_passing.cc:120-153; mean + directional-derivative
    normalisation, posttrans, residual ≙ DGN/src/node_embedding.cc:107-160).
    The epilogue applies the readout MLP's first linear per node (commutes
    with mean-pooling ≙ DGN/src/finalize.cc:35-52) and pools per window
    (_pool_epilogue). Returns [NW·GMAX, D1] f32 partial sums for
    base.pool_finish. No-spill only.
    """
    n, d = h0.shape
    num_windows = -(-n // window)
    pad = num_windows * window - n
    hp = jnp.pad(h0, ((0, pad), (0, 0))) if pad else h0
    aux = jnp.stack([eig, inv_deg, eigw_sum, inv_abssum], axis=1).astype(
        hp.dtype
    )
    aux = jnp.pad(aux, ((0, pad), (0, 0))) if pad else aux
    scols = _slot_ncols(window, slots)
    hcat = jnp.concatenate(
        [hp, aux, _slot_cols(slot_src, window, hp.dtype),
         pool_gl[:, None].astype(hp.dtype)], axis=1
    )
    ncols = d + 4 + scols + 1
    t_out = mlp1_w.shape[1]
    cdt = h0.dtype
    orig_windows = num_windows
    if num_windows % wps:
        # Phantom windows complete the last wps group (zero rows gather/
        # pool zeros into output rows the trim below discards).
        nw2 = -(-num_windows // wps) * wps
        hcat = jnp.concatenate(
            [hcat,
             jnp.zeros(((nw2 - num_windows) * window, ncols), hcat.dtype)],
            axis=0,
        )
        num_windows = nw2

    caps = (
        tuple(min(int(c), window) for c in prefix_caps)
        if prefix_caps is not None else (window,) * slots
    )

    def kernel(x_ref, w_ref, b_ref, predw_ref, out_ref):
        lanes_f = jax.lax.broadcasted_iota(
            jnp.int32, (window, window), 1
        ).astype(jnp.float32)
        subs = []
        for i in range(wps):
            x_i = x_ref[i * window : (i + 1) * window, :]
            onehots = [
                _slot_onehot(x_i, lanes_f, d + 4, s, slots, window,
                             rows=caps[s])[0]
                for s in range(slots)
            ]
            eig_col = x_i[:, d : d + 1]
            subs.append(dict(
                x=x_i,
                onehots=onehots,
                e_u=[
                    jnp.dot(oh, eig_col, preferred_element_type=jnp.float32)
                    for oh in onehots
                ],  # layer-invariant per-slot eig_u
                eig_win=eig_col.astype(jnp.float32),
                invd=x_i[:, d + 1 : d + 2].astype(jnp.float32),
                ews=x_i[:, d + 2 : d + 3].astype(jnp.float32),
                inva=x_i[:, d + 3 : d + 4].astype(jnp.float32),
                h=x_i[:, :d],
            ))
        for l in range(num_layers):
            a1s, a2s, hwins = [], [], []
            for sub in subs:
                h = sub["h"]
                m1 = jnp.zeros((window, d), jnp.float32)
                m2a = jnp.zeros((window, d), jnp.float32)
                for s in range(slots):
                    hu = jnp.dot(
                        sub["onehots"][s], h,
                        preferred_element_type=jnp.float32,
                    )

                    def _tail(x):
                        if caps[s] == window:
                            return x
                        return jnp.concatenate(
                            [x,
                             jnp.zeros((window - caps[s], d), jnp.float32)],
                            axis=0,
                        )

                    m1 += _tail(hu)
                    m2a += _tail(sub["e_u"][s] * hu)
                h_win = h.astype(jnp.float32)
                m2 = m2a - sub["eig_win"] * m1
                a1s.append(m1 * sub["invd"])
                a2s.append(
                    jnp.abs(m2 - sub["ews"] * h_win) * sub["inva"]
                )
                hwins.append(h_win)
            # Two split matmuls instead of concat([a1, a2]) @ w — the
            # in-kernel lane concat measured ~0.28 µs/window/layer on v5e
            # (same math: the posttrans is block-row separable). The
            # posttrans BATCHES over the step's wps windows (one
            # [wps·W, D] matmul pair — the slot-wps weight-load lever).
            a1 = jnp.concatenate(a1s, axis=0) if wps > 1 else a1s[0]
            a2 = jnp.concatenate(a2s, axis=0) if wps > 1 else a2s[0]
            acc = jnp.dot(
                a1.astype(cdt),
                w_ref[l * 2 * d : l * 2 * d + d, :],
                preferred_element_type=jnp.float32,
            ) + jnp.dot(
                a2.astype(cdt),
                w_ref[l * 2 * d + d : (l + 1) * 2 * d, :],
                preferred_element_type=jnp.float32,
            ) + b_ref[l : l + 1, :].astype(jnp.float32)
            for i, sub in enumerate(subs):
                sub["h"] = (
                    hwins[i]
                    + jnp.maximum(
                        acc[i * window : (i + 1) * window], 0.0
                    )
                ).astype(cdt)
        for i, sub in enumerate(subs):
            out_ref[i * gmax : (i + 1) * gmax] = _pool_epilogue(
                sub["h"], sub["x"], d + 4 + scols, predw_ref, window, gmax
            )

    out = pl.pallas_call(
        kernel,
        grid=(num_windows // wps,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            pl.BlockSpec((wps * window, ncols), lambda w: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wps * gmax, t_out), lambda w: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * gmax, t_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_windows * num_layers
            * (slots * window * window * d + window * 2 * d * d),
            bytes_accessed=2 * num_windows * window * d * 4,
            transcendentals=0,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(hcat, w_all, b_all, mlp1_w)
    return out[: orig_windows * gmax]


def gat_local_layer_ell(
    u_local: jnp.ndarray,
    v_local: jnp.ndarray,
    h: jnp.ndarray,  # [n, H·D] projected features, head-major flat
    s_src: jnp.ndarray,  # [n, H]
    s_tgt: jnp.ndarray,  # [n, H]
    prev: jnp.ndarray,  # [n, H·D] previous layer features (skip input)
    spill_both: jnp.ndarray,  # [n, H·D + H] pre-reduced crossing contributions
    w_skip: jnp.ndarray,  # [H·D, H·D] this layer's skip projection
    w_proj: jnp.ndarray,  # [H·D, H·D] NEXT layer's projection
    a_mat: jnp.ndarray,  # [H·D, 2H] block-diag (a_src ‖ a_tgt) score matrix
    window: int,
    k_blocks: int,
    num_heads: int,
) -> jnp.ndarray:
    """One whole non-final GAT layer in a single VMEM pass.

    Message phase = gat_local_message_ell (edge softmax numerator +
    denominator, GAT/src/message_passing.cc:122-148); the epilogue then
    fuses everything the reference's apply unit pipelines
    (GAT/src/node_embedding.cc:98-271): softmax normalisation
    (conv_layer.cc:170-177), skip projection + ELU, and the NEXT layer's
    projection and attention scores — so none of the per-layer [n, H·D]
    glue tensors ever round-trip to HBM (they were ~70% of GAT's layer
    time in round 1, BENCH.md).

    Returns [n, 2·H·D + 2H] = (h_next ‖ feat ‖ s_src_next ‖ s_tgt_next).
    """
    n, hd = h.shape
    d = hd // num_heads
    num_windows = -(-n // window)
    pad = num_windows * window - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        s_src = jnp.pad(s_src, ((0, pad), (0, 0)))
        s_tgt = jnp.pad(s_tgt, ((0, pad), (0, 0)))
        prev = jnp.pad(prev, ((0, pad), (0, 0)))
        spill_both = jnp.pad(spill_both, ((0, pad), (0, 0)))
    hcat = jnp.concatenate([h, s_tgt.astype(h.dtype)], axis=1)  # [NW·W, H·D+H]
    p = u_local.shape[0]
    block = p // (num_windows * k_blocks)
    out_dim = 2 * hd + 2 * num_heads

    def kernel(uloc_ref, vloc_ref, h_ref, ssrc_ref, prev_ref,
               spill_ref, wskip_ref, wproj_ref, amat_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
        onehot_u = (uloc_ref[:, 0][:, None] == lanes).astype(h_ref.dtype)
        onehot_v = (vloc_ref[:, 0][:, None] == lanes).astype(h_ref.dtype)
        hu_all = jnp.dot(onehot_u, h_ref[:], preferred_element_type=jnp.float32)
        h_u, s2 = hu_all[:, :hd], hu_all[:, hd:]
        s1 = jnp.dot(onehot_v, ssrc_ref[:], preferred_element_type=jnp.float32)
        raw = s1 + s2
        score = jnp.exp(jnp.where(raw < 0, raw * 0.2, raw))
        valid = (vloc_ref[:, 0] < window)[:, None].astype(jnp.float32)
        score = score * valid
        cols = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 1) // d
        rows = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 0)
        expand = (cols == rows).astype(jnp.float32)
        scorex = jnp.dot(score, expand, preferred_element_type=jnp.float32)
        both = jnp.concatenate([scorex * h_u, score], axis=1).astype(
            h_ref.dtype
        )
        acc_ref[:] += jax.lax.dot_general(
            onehot_v, both,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == k_blocks - 1)
        def _():
            tot = acc_ref[:] + spill_ref[:].astype(jnp.float32)
            denom = tot[:, hd:]
            denom = jnp.where(denom == 0, 1.0, denom)
            denomx = jnp.dot(
                denom, expand, preferred_element_type=jnp.float32
            )
            msg = tot[:, :hd] / denomx
            skip = jax.lax.dot_general(
                prev_ref[:].astype(jnp.float32), wskip_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            x = msg + skip
            feat = jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
            h_next = jax.lax.dot_general(
                feat, wproj_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores = jnp.dot(
                h_next, amat_ref[:], preferred_element_type=jnp.float32
            )
            out_ref[:] = jnp.concatenate(
                [h_next, feat, scores], axis=1
            ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_windows, k_blocks),
        compiler_params=_ELL_PARAMS,
        in_specs=[
            pl.BlockSpec((block, 1), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec((block, 1), lambda w, k: (w * k_blocks + k, 0)),
            pl.BlockSpec((window, hd + num_heads), lambda w, k: (w, 0)),
            pl.BlockSpec((window, num_heads), lambda w, k: (w, 0)),
            pl.BlockSpec((window, hd), lambda w, k: (w, 0)),
            pl.BlockSpec((window, hd + num_heads), lambda w, k: (w, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((window, out_dim), lambda w, k: (w, 0)),
        scratch_shapes=[pltpu.VMEM((window, hd + num_heads), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_windows * window, out_dim), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * p * window * hd + 6 * num_windows * window * hd * hd,
            bytes_accessed=(p + 6 * num_windows * window) * hd * 4,
            transcendentals=p * num_heads,
        ),
        interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
    )(u_local[:, None], v_local[:, None], hcat, s_src, prev, spill_both,
      w_skip, w_proj, a_mat)
    return out[:n]
