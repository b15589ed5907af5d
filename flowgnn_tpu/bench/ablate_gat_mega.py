"""GAT whole-model megakernel ablation — in-kernel stage knockouts.

The megakernel runs everything in one pallas call, so stage costs can only
be isolated by compiling VARIANTS of the kernel with one stage disabled
(or replaced) and timing each on the chip with the shared chained-carry
protocol (one process → one relay floor for all rows):

  noop      — empty chained program (the relay floor per rep)
  slots     — the production gat_local_model_slots kernel (round-3:
              fused glue matmul + XLA-hoisted layer-0 skip)
  dense     — the production gat_local_model_dense kernel
  full      — this tool's replica of the ROUND-2 (v1) slot kernel: the
              head-major / expand-matmul / 3-glue-matmul formulation the
              v2 restructure replaced — kept as the measured baseline
  noexp     — score = raw·valid (leaky+exp removed → transcendental cost)
  nogather  — the [S·W, W]@[W, HD+H] one-hot gather replaced by a tile
              (uslot still consumed via the valid mask, so the slot-stack
              DMA is retained)
  noexpand  — the per-slot [W, H]@[H, HD] head-expand matmuls replaced by
              a single-column broadcast
  repeat    — MATH-IDENTICAL candidate: expand matmuls replaced by
              jnp.repeat(score, D, axis=1) lane-replication. NON-VIABLE:
              Mosaic cannot lower the implied (W, H, D)→(W, HD) shape
              cast ("infer-vector-layout: unsupported shape cast"), so
              the head-broadcast must stay a matmul — kept out of the
              default list as a recorded dead end
  noglue    — skip/proj/score matmuls between layers removed
  nopool    — the in-kernel finalize epilogue removed
  nodivide  — softmax denominator divide removed
  nocast    — the msg bf16 quantization round-trip cast removed
  staticcat — per-layer [h ‖ s_tgt] concat replaced by a stale layer-0
              one (same shapes/ops minus the per-layer concat)

Subtract noop, then (full − variant) is the stage's device cost per pass.

Run: ``python -m flowgnn_tpu.bench.ablate_gat_mega [--reps 100]
[--trials 3] [--ell-window W] [--variants full,noexp,...]``.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def _variant_model(variant: str, window: int, slots: int, num_heads: int,
                   num_layers: int, gmax: int):
    """Build a gat_local_model_slots replica with one stage knocked out.

    Mirrors ops/pallas/local_layer.py:gat_local_model_slots — kept in the
    bench tree on purpose: the production kernel stays unpolluted by
    ablation flags, and `full` is timed against it as drift guard.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def model(slot_stack, h0, prev0, s0, skip_w, proj_w, a_next, pool_gl,
              pred_hd):
        from ..ops.pallas.local_layer import _pool_epilogue

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
        )
        sw = slots * window

        def kernel(uslot_ref, x_ref, skip_ref, proj_ref, a_ref, predw_ref,
                   out_ref):
            uslot = uslot_ref[:, 0].astype(jnp.float32)
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, (sw, window), 1
            ).astype(jnp.float32)
            valid_all = (uslot < float(window))[:, None].astype(jnp.float32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 1) // d
            rows = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 0)
            expand = (cols == rows).astype(jnp.float32)

            h = x_ref[:, :hd]
            prev = x_ref[:, hd : 2 * hd]
            s_src = x_ref[:, 2 * hd : 2 * hd + nh].astype(jnp.float32)
            s_tgt = x_ref[:, 2 * hd + nh : 2 * hd + 2 * nh]
            if variant != "nogather":
                onehot = (uslot[:, None] == lanes).astype(cdt)
            hcat0 = jnp.concatenate([h, s_tgt.astype(cdt)], axis=1)
            for l in range(num_layers):
                if variant == "staticcat":
                    # CAVEAT: loop-invariant operand — Mosaic hoists the
                    # gather matmul too, so this over-measures the concat.
                    hcat = hcat0
                elif variant == "addcat":
                    # Concat-free but layer-varying (scalar add keeps the
                    # gather un-hoistable): isolates the concat itself.
                    hcat = hcat0 + jnp.asarray(l * 1e-7, cdt)
                else:
                    hcat = jnp.concatenate([h, s_tgt.astype(cdt)], axis=1)
                if variant == "nogather":
                    hu_all = jnp.concatenate(
                        [hcat.astype(jnp.float32)] * slots, axis=0
                    )
                else:
                    hu_all = jnp.dot(
                        onehot, hcat, preferred_element_type=jnp.float32
                    )
                num = jnp.zeros((window, hd), jnp.float32)
                den = jnp.zeros((window, nh), jnp.float32)
                for s in range(slots):
                    sl = slice(s * window, (s + 1) * window)
                    h_u = hu_all[sl, :hd]
                    s2 = hu_all[sl, hd:]
                    raw = s_src + s2
                    if variant == "noexp":
                        score = raw * valid_all[sl]
                    else:
                        score = (
                            jnp.exp(jnp.where(raw < 0, raw * 0.2, raw))
                            * valid_all[sl]
                        )
                    if variant == "noexpand":
                        num += score[:, :1] * h_u
                    elif variant == "repeat":
                        num += jnp.repeat(score, d, axis=1) * h_u
                    else:
                        num += jnp.dot(
                            score, expand, preferred_element_type=jnp.float32
                        ) * h_u
                    den += score
                den = jnp.where(den == 0, 1.0, den)
                if variant == "nodivide":
                    msg = num
                elif variant == "noexpand":
                    msg = num / den[:, :1]
                elif variant == "repeat":
                    msg = num / jnp.repeat(den, d, axis=1)
                else:
                    msg = num / jnp.dot(
                        den, expand, preferred_element_type=jnp.float32
                    )
                if variant != "nocast":
                    msg = msg.astype(cdt).astype(jnp.float32)
                if variant == "noglue":
                    if l != num_layers - 1:
                        h = msg.astype(cdt)
                        prev = h
                    else:
                        out_ref[:] = _pool_epilogue(
                            msg, x_ref, 2 * hd + 2 * nh, predw_ref,
                            window, gmax,
                        )
                    continue
                skip = jnp.dot(
                    prev,
                    skip_ref[l * hd : (l + 1) * hd, :],
                    preferred_element_type=jnp.float32,
                )
                if l != num_layers - 1:
                    feat = msg + skip
                    feat = jnp.where(
                        feat <= 0, jnp.exp(feat) - 1, feat
                    ).astype(cdt)
                    prev = feat
                    h = jnp.dot(
                        feat,
                        proj_ref[l * hd : (l + 1) * hd, :],
                        preferred_element_type=jnp.float32,
                    ).astype(cdt)
                    scat = jnp.dot(
                        h, a_ref[l * hd : (l + 1) * hd, :],
                        preferred_element_type=jnp.float32,
                    )
                    s_src = scat[:, :nh].astype(cdt).astype(jnp.float32)
                    s_tgt = scat[:, nh:].astype(cdt)
                else:
                    if variant == "nopool":
                        ms = msg + skip
                        out_ref[:] = ms[:gmax, :t_out]
                    else:
                        out_ref[:] = _pool_epilogue(
                            msg + skip, x_ref, 2 * hd + 2 * nh, predw_ref,
                            window, gmax,
                        )

        return pl.pallas_call(
            kernel,
            grid=(num_windows,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            in_specs=[
                pl.BlockSpec((sw, 1), lambda w: (w, 0)),
                pl.BlockSpec(
                    (window, 2 * hd + 2 * nh + 1), lambda w: (w, 0)
                ),
                pl.BlockSpec(skip_w.shape, lambda w: (0, 0)),
                pl.BlockSpec(proj_w.shape, lambda w: (0, 0)),
                pl.BlockSpec(a_next.shape, lambda w: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (num_windows * gmax, t_out), jnp.float32
            ),
            interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
        )(slot_stack[:, None], xcat, skip_w, proj_w, a_next, pred_hd)

    return model


def _variant_model_v3(variant: str, window: int, slots: int, num_heads: int,
                      num_layers: int, gmax: int, prefix_caps):
    """Round-3 PRODUCTION-structure replica (prefix-compacted stacked
    gather, payload layout, fused glue, expanded denominator) with one
    stage knocked out — `v3` is the drift anchor; `v3:<stage>` rows
    attribute the CURRENT kernel's time. Mirrors
    ops/pallas/local_layer.py:gat_local_model_slots at wps=1."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def model(pstack, h0, skip0, s0, glue_w, pool_gl, pred_hd):
        from ..ops.pallas.local_layer import _pool_epilogue

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
        pay = max(128, hd + nh)
        xcat = jnp.concatenate(
            [h0, s0[:, nh:].astype(cdt),
             jnp.zeros((h0.shape[0], pay - hd - nh), cdt),
             skip0.astype(cdt), s0[:, :nh].astype(cdt),
             pool_gl[:, None].astype(cdt)], axis=1
        )
        caps = tuple(int(c) for c in prefix_caps)
        offs = tuple(int(sum(caps[:k])) for k in range(len(caps)))
        sw = int(sum(caps))
        xw = pay + hd + nh + 1

        def kernel(uslot_ref, x_ref, glue_ref, predw_ref, out_ref):
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, (sw, window), 1
            ).astype(jnp.float32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 1) // d
            rows = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 0)
            expand = (cols == rows).astype(jnp.float32)
            us = uslot_ref[:, 0].astype(jnp.float32)
            onehot = (us[:, None] == lanes).astype(cdt)
            valid = (us < float(window))[:, None].astype(jnp.float32)
            hx = x_ref[:, :pay]
            skip = x_ref[:, pay : pay + hd].astype(jnp.float32)
            s_src = x_ref[:, pay + hd : pay + hd + nh].astype(jnp.float32)
            for l in range(num_layers):
                if variant == "nogather":
                    hu = jnp.concatenate(
                        [hx.astype(jnp.float32)]
                        * (-(-sw // window)), axis=0
                    )[:sw]
                elif variant == "bf16hu":
                    # One-hot gathers of a bf16 payload are EXACT in bf16
                    # (each output row is a single selected value), so a
                    # bf16-held hu halves the [Σc_k, 128] VMEM residency +
                    # per-slot re-read traffic of the gather. Mosaic
                    # requires the matmul acc itself to be 32-bit
                    # ("Expected matmul acc to be 32-bit"), so cast after.
                    hu = jnp.dot(
                        onehot, hx, preferred_element_type=jnp.float32
                    ).astype(cdt)
                elif variant != "split":
                    hu = jnp.dot(
                        onehot, hx, preferred_element_type=jnp.float32
                    )
                if variant == "stackexp":
                    # One stacked score chain for ALL slots: the per-head
                    # raw/exp/valid runs on [Σc_k, H] with no sublane
                    # slicing of valid, and ONE [Σc_k, H]@[H, HD] expand
                    # matmul replaces the six per-slot ones.
                    srcs = jnp.concatenate(
                        [s_src[: caps[k]] for k in range(slots)], axis=0
                    )
                    raw_all = srcs + hu[:, hd : hd + nh]
                    score_all = (
                        jnp.exp(
                            jnp.where(raw_all < 0, raw_all * 0.2, raw_all)
                        ) * valid
                    )
                    scorex_all = jnp.dot(
                        score_all, expand, preferred_element_type=jnp.float32
                    )
                num = jnp.zeros((window, hd), jnp.float32)
                denx = jnp.zeros((window, hd), jnp.float32)
                for k in range(slots):
                    sl = slice(offs[k], offs[k] + caps[k])
                    rsl = slice(0, caps[k])
                    if variant == "split":
                        # Per-slot gather matmul: slot k's VPU accumulate
                        # can interleave with slot k+1's MXU gather.
                        hu_k = jnp.dot(
                            onehot[sl], hx,
                            preferred_element_type=jnp.float32,
                        )
                        h_u = hu_k[:, :hd]
                        s2 = hu_k[:, hd : hd + nh]
                    else:
                        h_u = hu[sl, :hd]
                        s2 = hu[sl, hd : hd + nh]
                    if variant == "stackexp":
                        scorex = scorex_all[sl]
                    else:
                        # explicit f32: a mixed-dtype where here trips a
                        # JAX closed_call lowering-cache KeyError when hu
                        # is bf16 (bf16hu)
                        raw = s_src[rsl] + s2.astype(jnp.float32)
                        if variant == "noexp":
                            score = raw * valid[sl]
                        else:
                            # max/min leaky ≡ where(raw<0, 0.2·raw, raw)
                            # bit-exactly; jnp.where here trips a JAX
                            # closed_call lowering-cache KeyError under
                            # bf16 hu
                            score = (
                                jnp.exp(
                                    jnp.maximum(raw, 0.0)
                                    + 0.2 * jnp.minimum(raw, 0.0)
                                )
                                * valid[sl]
                            )
                        if variant == "noexpand":
                            scorex = jnp.broadcast_to(
                                score[:, :1], (caps[k], hd)
                            )
                        else:
                            scorex = jnp.dot(
                                score, expand,
                                preferred_element_type=jnp.float32,
                            )
                    if caps[k] < window:
                        tail = ((0, window - caps[k]), (0, 0))
                        # f32-pure pad operand: a bf16 factor in the pad
                        # chain trips the same JAX closed_call cache bug
                        num += jnp.pad(
                            scorex * h_u.astype(jnp.float32), tail
                        )
                        denx += jnp.pad(scorex, tail)
                    else:
                        num += scorex * h_u
                        denx += scorex
                if variant == "nodivide":
                    msg = num
                else:
                    msg = num / jnp.where(denx == 0, 1.0, denx)
                if variant != "nocast":
                    msg = msg.astype(cdt).astype(jnp.float32)
                if l != num_layers - 1:
                    feat = msg + skip
                    if variant != "noelu":
                        feat = jnp.where(feat <= 0, jnp.exp(feat) - 1, feat)
                    feat = feat.astype(cdt)
                    if variant == "noglue":
                        hx = jnp.concatenate(
                            [feat, jnp.zeros((window, pay - hd), cdt)], 1
                        )
                        skip = feat.astype(jnp.float32)
                    else:
                        g = jnp.dot(
                            feat,
                            glue_ref[l * hd : (l + 1) * hd, :],
                            preferred_element_type=jnp.float32,
                        )
                        hx = g[:, :pay].astype(cdt)
                        skip = g[:, pay : pay + hd]
                        s_src = (
                            g[:, pay + hd :].astype(cdt).astype(jnp.float32)
                        )
                else:
                    if variant == "nopool":
                        out_ref[:] = (msg + skip)[:gmax, :t_out]
                    else:
                        out_ref[:] = _pool_epilogue(
                            msg + skip, x_ref, pay + hd + nh, predw_ref,
                            window, gmax,
                        )

        return pl.pallas_call(
            kernel,
            grid=(num_windows,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            in_specs=[
                pl.BlockSpec((sw, 1), lambda w: (w, 0)),
                pl.BlockSpec((window, xw), lambda w: (w, 0)),
                pl.BlockSpec(glue_w.shape, lambda w: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (num_windows * gmax, t_out), jnp.float32
            ),
            interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
        )(pstack[:, None], xcat, glue_w, pred_hd)

    return model


def _variant_model_v4(variant: str, window: int, slots: int, num_heads: int,
                      num_layers: int, gmax: int, prefix_caps):
    """Round-4 candidate: PREBUILT one-hot gather tiles.

    The [Σc_k, W] slot one-hot is pure topology (layer-invariant), so
    instead of building it in-kernel from the index column (VPU compare +
    cast — part of the measured ~300 µs structural floor) it arrives as a
    bf16 HBM operand built at pack time and DMA'd per grid step, where
    Mosaic's pipeliner double-buffers it against the previous window's
    compute. The valid mask is the one-hot's row-sum (sentinel rows are
    all-zero), computed once per window and reused by every layer.
    Everything else mirrors _variant_model_v3 (= the production kernel).
    `v4:nogather` knocks out the gather matmul on top (isolates the
    matmul from the operand DMA)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def model(onehot_tiles, h0, skip0, s0, glue_w, pool_gl, pred_hd):
        from ..ops.pallas.local_layer import _pool_epilogue

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
        pay = max(128, hd + nh)
        xcat = jnp.concatenate(
            [h0, s0[:, nh:].astype(cdt),
             jnp.zeros((h0.shape[0], pay - hd - nh), cdt),
             skip0.astype(cdt), s0[:, :nh].astype(cdt),
             pool_gl[:, None].astype(cdt)], axis=1
        )
        caps = tuple(int(c) for c in prefix_caps)
        offs = tuple(int(sum(caps[:k])) for k in range(len(caps)))
        sw = int(sum(caps))
        xw = pay + hd + nh + 1

        def kernel(oh_ref, x_ref, glue_ref, predw_ref, out_ref):
            cols = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 1) // d
            rows = jax.lax.broadcasted_iota(jnp.int32, (nh, hd), 0)
            expand = (cols == rows).astype(jnp.float32)
            onehot = oh_ref[:]
            valid = jnp.sum(
                onehot.astype(jnp.float32), axis=1, keepdims=True
            )  # row-sum: sentinel rows are all-zero — once, reused per layer
            hx = x_ref[:, :pay]
            skip = x_ref[:, pay : pay + hd].astype(jnp.float32)
            s_src = x_ref[:, pay + hd : pay + hd + nh].astype(jnp.float32)
            for l in range(num_layers):
                if variant == "nogather":
                    hu = jnp.concatenate(
                        [hx.astype(jnp.float32)]
                        * (-(-sw // window)), axis=0
                    )[:sw]
                else:
                    hu = jnp.dot(
                        onehot, hx, preferred_element_type=jnp.float32
                    )
                num = jnp.zeros((window, hd), jnp.float32)
                denx = jnp.zeros((window, hd), jnp.float32)
                for k in range(slots):
                    sl = slice(offs[k], offs[k] + caps[k])
                    rsl = slice(0, caps[k])
                    h_u = hu[sl, :hd]
                    s2 = hu[sl, hd : hd + nh]
                    raw = s_src[rsl] + s2
                    score = (
                        jnp.exp(jnp.where(raw < 0, raw * 0.2, raw))
                        * valid[sl]
                    )
                    scorex = jnp.dot(
                        score, expand, preferred_element_type=jnp.float32
                    )
                    if caps[k] < window:
                        tail = ((0, window - caps[k]), (0, 0))
                        num += jnp.pad(scorex * h_u, tail)
                        denx += jnp.pad(scorex, tail)
                    else:
                        num += scorex * h_u
                        denx += scorex
                msg = num / jnp.where(denx == 0, 1.0, denx)
                msg = msg.astype(cdt).astype(jnp.float32)
                if l != num_layers - 1:
                    feat = msg + skip
                    feat = jnp.where(feat <= 0, jnp.exp(feat) - 1, feat)
                    feat = feat.astype(cdt)
                    g = jnp.dot(
                        feat,
                        glue_ref[l * hd : (l + 1) * hd, :],
                        preferred_element_type=jnp.float32,
                    )
                    hx = g[:, :pay].astype(cdt)
                    skip = g[:, pay : pay + hd]
                    s_src = g[:, pay + hd :].astype(cdt).astype(jnp.float32)
                else:
                    out_ref[:] = _pool_epilogue(
                        msg + skip, x_ref, pay + hd + nh, predw_ref,
                        window, gmax,
                    )

        return pl.pallas_call(
            kernel,
            grid=(num_windows,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            in_specs=[
                pl.BlockSpec((sw, window), lambda w: (w, 0)),
                pl.BlockSpec((window, xw), lambda w: (w, 0)),
                pl.BlockSpec(glue_w.shape, lambda w: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (num_windows * gmax, t_out), jnp.float32
            ),
            interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
        )(onehot_tiles, xcat, glue_w, pred_hd)

    return model


def _variant_model_v5(variant: str, window: int, slots: int, num_heads: int,
                      num_layers: int, gmax: int, prefix_caps):
    """Round-4 candidate: EXPANDED-SCORE payload — no expand matmuls.

    The production kernel widens per-head scores [c, H] to [c, HD] with a
    K=H one-hot matmul per slot (73 µs/pass, the worst MXU shape in the
    kernel). Observation: the glue matmul's output already pads its N to
    256 lanes, so the per-head score columns can be DUPLICATED D× at pack
    time inside glue_w itself — the payload then carries s_tgt (and skip's
    sibling s_src) PRE-expanded to [*, HD], `raw` is computed directly at
    [c, HD] (same VPU vreg count as [c, H] — lanes are free), and the
    expand matmuls vanish. Payload = h(HD) ‖ s_tgt_exp(HD) = exactly 128
    lanes: the gather matmul's width is now fully useful too.

    variant: "full" = stacked gather (production structure);
    "split" = per-slot gather matmuls (hu_k = onehot_k @ hx inside the
    slot loop) so Mosaic can interleave slot k's VPU accumulate with slot
    k+1's MXU gather; "nogather" knocks the gather out (floor check).
    Math is bit-identical to v3 (column duplication commutes with the
    dot; the exp sees the same f32 values).

    Mosaic caveat: an under-cap slot's `jnp.pad` rejects operands whose
    layout descends from offset-64 lane slices ("result/input offset
    mismatch on non-concat dimension"), so full-cap slots take the direct
    no-pad path while under-cap slots launder the expanded score through
    an exact identity matmul (M=cap≤64 — trivial) before padding, the
    same layout-rebuilding role v3's expand matmul plays."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def model(pstack, h0, skip0, s0x, glue_wx, pool_gl, pred_hd):
        from ..ops.pallas.local_layer import _pool_epilogue

        n, hd = h0.shape
        num_windows = -(-n // window)
        pad = num_windows * window - n
        if pad:
            h0 = jnp.pad(h0, ((0, pad), (0, 0)))
            skip0 = jnp.pad(skip0, ((0, pad), (0, 0)))
            s0x = jnp.pad(s0x, ((0, pad), (0, 0)))
        cdt = h0.dtype
        t_out = pred_hd.shape[1]
        pay = 2 * hd  # h ‖ s_tgt_exp — fully-used 128 lanes
        xcat = jnp.concatenate(
            [h0, s0x[:, hd:].astype(cdt),
             skip0.astype(cdt), s0x[:, :hd].astype(cdt),
             pool_gl[:, None].astype(cdt)], axis=1
        )
        caps = tuple(int(c) for c in prefix_caps)
        offs = tuple(int(sum(caps[:k])) for k in range(len(caps)))
        sw = int(sum(caps))
        xw = pay + 2 * hd + 1

        def kernel(uslot_ref, x_ref, glue_ref, predw_ref, out_ref):
            us = uslot_ref[:, 0].astype(jnp.float32)
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, (sw, window), 1
            ).astype(jnp.float32)
            onehot = (us[:, None] == lanes).astype(cdt)
            valid = (us < float(window))[:, None].astype(jnp.float32)
            ident = (
                jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1)
            ).astype(jnp.float32)
            hx = x_ref[:, :pay]
            skip = x_ref[:, pay : pay + hd].astype(jnp.float32)
            s_srcx = x_ref[:, pay + hd : pay + 2 * hd].astype(jnp.float32)
            for l in range(num_layers):
                if variant == "nogather":
                    hu = jnp.concatenate(
                        [hx.astype(jnp.float32)]
                        * (-(-sw // window)), axis=0
                    )[:sw]
                elif variant != "split":
                    hu = jnp.dot(
                        onehot, hx, preferred_element_type=jnp.float32
                    )
                num = jnp.zeros((window, hd), jnp.float32)
                denx = jnp.zeros((window, hd), jnp.float32)
                for k in range(slots):
                    sl = slice(offs[k], offs[k] + caps[k])
                    rsl = slice(0, caps[k])
                    if variant == "split":
                        hu_k = jnp.dot(
                            onehot[sl], hx,
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        hu_k = hu[sl]
                    h_u = hu_k[:, :hd]
                    raw = s_srcx[rsl] + hu_k[:, hd:]
                    score = (
                        jnp.exp(jnp.where(raw < 0, raw * 0.2, raw))
                        * valid[sl]
                    )
                    if caps[k] < window:
                        score = jnp.dot(
                            score, ident,
                            preferred_element_type=jnp.float32,
                        )  # exact layout launder: pad rejects the raw VPU chain
                        tail = ((0, window - caps[k]), (0, 0))
                        num += jnp.pad(score * h_u, tail)
                        denx += jnp.pad(score, tail)
                    else:
                        num += score * h_u
                        denx += score
                msg = num / jnp.where(denx == 0, 1.0, denx)
                msg = msg.astype(cdt).astype(jnp.float32)
                if l != num_layers - 1:
                    feat = msg + skip
                    feat = jnp.where(feat <= 0, jnp.exp(feat) - 1, feat)
                    feat = feat.astype(cdt)
                    g = jnp.dot(
                        feat,
                        glue_ref[l * hd : (l + 1) * hd, :],
                        preferred_element_type=jnp.float32,
                    )
                    hx = g[:, :pay].astype(cdt)
                    skip = g[:, pay : pay + hd]
                    s_srcx = (
                        g[:, pay + hd :].astype(cdt).astype(jnp.float32)
                    )
                else:
                    out_ref[:] = _pool_epilogue(
                        msg + skip, x_ref, pay + 2 * hd, predw_ref,
                        window, gmax,
                    )

        return pl.pallas_call(
            kernel,
            grid=(num_windows,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            in_specs=[
                pl.BlockSpec((sw, 1), lambda w: (w, 0)),
                pl.BlockSpec((window, xw), lambda w: (w, 0)),
                pl.BlockSpec(glue_wx.shape, lambda w: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gmax, t_out), lambda w: (w, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (num_windows * gmax, t_out), jnp.float32
            ),
            interpret=os.environ.get("FLOWGNN_PALLAS_INTERPRET", "0") == "1",
        )(pstack[:, None], xcat, glue_wx, pred_hd)

    return model


def expand_score_operands(glue_w, s0, hd: int, num_heads: int):
    """Pack-time transform for the v5 payload: duplicate each per-head
    score column D× inside glue_w (and s0) so the kernel receives
    pre-expanded scores. glue_w columns [h(0:hd) ‖ s_tgt(hd:hd+H) ‖ pad ‖
    skip ‖ s_src(·:·+H)] → [h ‖ s_tgt_exp(hd) ‖ skip ‖ s_src_exp(hd)]."""
    import jax.numpy as jnp

    nh = num_heads
    d = hd // nh
    pay_old = max(128, hd + nh)
    rep = lambda cols: jnp.repeat(cols, d, axis=1)  # [*, H] -> [*, HD]
    glue_wx = jnp.concatenate(
        [glue_w[:, :hd], rep(glue_w[:, hd : hd + nh]),
         glue_w[:, pay_old : pay_old + hd],
         rep(glue_w[:, pay_old + hd : pay_old + hd + nh])], axis=1
    )
    s0x = jnp.concatenate(
        [rep(s0[:, :nh]), rep(s0[:, nh:])], axis=1
    )  # [n, 2·HD]: s_src_exp ‖ s_tgt_exp
    return glue_wx, s0x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--graphs", type=int, default=1028)
    ap.add_argument("--ell-window", type=int, default=None)
    ap.add_argument(
        "--variants",
        default="slots,dense,full,noexp,nogather,noexpand,noglue,nopool",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ..core.graphs import auto_edge_capacity, pack_dataset
    from ..core.numerics import BF16
    from ..core.synthetic import synthetic_dataset
    from ..models import registry
    from ..models.base import (
        ELL_GEOMETRY_DEFAULTS, POOL_GMAX, as_batch, choose_window,
        prepare_params,
    )
    from ..models.gat import _project, _scores, megakernel_operands
    from ..ops.pallas.local_layer import (
        gat_local_model_dense, gat_local_model_slots,
    )

    prec = BF16
    spec = registry.get("gat")
    params = prepare_params(spec.loader("/root/reference/GAT"), prec)
    graphs = registry.apply_transforms(
        spec, synthetic_dataset("molhiv", seed=0, num_graphs=args.graphs)
    )
    gw, _ = ELL_GEOMETRY_DEFAULTS["gat"]
    window = args.ell_window or choose_window(
        "gat", max(g.num_nodes for g in graphs), gw
    )
    ec = auto_edge_capacity(graphs, 32768)
    (bucket,) = pack_dataset(
        graphs, node_capacity=32768, edge_capacity=ec, graph_capacity=2048,
        align_window=window,
    )
    batch = as_batch(bucket, blocked="local_slots", window=window)
    n_slots = int(batch["slot_geom"].shape[-1])
    assert batch["slot_spill"].shape[-1] == 0, "ablation expects no spill"

    L, H, D = params["proj_w"].shape[:3]
    n = batch["node_feat"].shape[0]
    prev = jnp.zeros((n, H, D), prec.compute_dtype)
    prev = prev.at[:, 0, :9].set(batch["node_feat"].astype(prec.compute_dtype))
    h = _project(params["proj_w"][0], prev, prec)
    s0 = jnp.concatenate(
        [_scores(h, params["a_src"][0], prec),
         _scores(h, params["a_tgt"][0], prec)], axis=1,
    )
    ops = megakernel_operands(params, prec)
    skip0 = jnp.dot(
        prev.reshape(n, H * D), ops["skip0_w"],
        preferred_element_type=jnp.float32,
    )
    common = dict(
        slot_stack=batch["slot_stack"],
        slot_pstack=batch.get("slot_pstack", batch["slot_stack"]),
        h0=h.reshape(n, H * D),
        prev0=prev.reshape(n, H * D), s0=s0,
        skip_w=ops["skip_w"], proj_w=ops["proj_w"], a_next=ops["a_next"],
        pool_gl=jnp.asarray(batch["pool_gl"]), pred_hd=ops["pred_hd"],
        skip0=skip0, glue_w=ops["glue_w"],
    )

    def timed(run_fn):
        def one(c):
            a = dict(common)
            a["h0"] = a["h0"] + c
            out = run_fn(**a)
            return c + (out[0, 0] * 0).astype(c.dtype)

        trial = jax.jit(
            lambda c: jax.lax.fori_loop(
                0, args.reps, lambda i, cc: one(cc), c
            )
        )
        c0 = jnp.zeros((), prec.compute_dtype)
        np.asarray(trial(c0))
        best = 1e9
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(trial(c0))
            best = min(best, (time.perf_counter() - t0) / args.reps)
        return best

    def noop_fn(**a):
        return a["h0"] * 0 + 1

    geom = (window, n_slots, H, L, POOL_GMAX)
    from ..models.base import slot_prefix_caps

    pcaps = slot_prefix_caps(batch, n_slots)
    # Prebuilt bf16 one-hot gather tiles for the v4 variants: built ONCE
    # from the same prefix-compacted index stack the kernel would build
    # them from per layer (sentinel rows >= window become all-zero).
    caps_v4 = pcaps or (window,) * n_slots
    stack_v4 = common["slot_pstack"] if pcaps else common["slot_stack"]
    sw_v4 = int(sum(caps_v4))
    us_v4 = jnp.asarray(stack_v4).reshape(-1, sw_v4).astype(jnp.float32)
    common["onehot_tiles"] = (
        us_v4[:, :, None] == jnp.arange(window, dtype=jnp.float32)
    ).astype(prec.compute_dtype).reshape(-1, window)
    prod = dict(
        slots=lambda **a: gat_local_model_slots(
            a["slot_pstack"] if pcaps else a["slot_stack"],
            a["h0"], a["skip0"], a["s0"], a["glue_w"],
            a["pool_gl"], a["pred_hd"], *geom, prefix_caps=pcaps,
        ),
        dense=lambda **a: gat_local_model_dense(
            a["slot_stack"], a["h0"], a["prev0"], a["s0"], a["skip_w"],
            a["proj_w"], a["a_next"], a["pool_gl"], a["pred_hd"], *geom
        ),
    )

    rows = [("noop", timed(noop_fn))]
    for v in args.variants.split(","):
        if v == "v3" or v.startswith("v3:"):
            # Round-3 production-structure replica: `v3` = drift anchor
            # (must ≈ slots), `v3:<stage>` = knockout of the CURRENT
            # kernel (nogather/noexpand/noexp/nodivide/nocast/noelu/
            # noglue/nopool).
            stage = v.split(":", 1)[1] if ":" in v else "full"
            fn = (
                lambda _s: lambda **a: _variant_model_v3(
                    _s, *geom, pcaps
                )(
                    a["slot_pstack"], a["h0"], a["skip0"], a["s0"],
                    a["glue_w"], a["pool_gl"], a["pred_hd"],
                )
            )(stage)
        elif v == "v5" or v.startswith("v5:"):
            # Expanded-score payload (no expand matmuls): `v5` = stacked
            # gather, `v5:split` = per-slot gather matmuls (MXU/VPU
            # interleave), `v5:nogather` = floor check.
            stage = v.split(":", 1)[1] if ":" in v else "full"
            glue_wx, s0x = expand_score_operands(
                common["glue_w"], common["s0"], H * D, H
            )
            fn = (
                lambda _s, _g, _x: lambda **a: _variant_model_v5(
                    _s, *geom, caps_v4
                )(
                    a["slot_pstack"] if pcaps else a["slot_stack"],
                    a["h0"], a["skip0"], _x, _g,
                    a["pool_gl"], a["pred_hd"],
                )
            )(stage, glue_wx, s0x)
        elif v == "v4" or v.startswith("v4:"):
            # Prebuilt-one-hot candidate: the gather one-hot arrives as a
            # bf16 HBM operand (DMA'd per grid step) instead of being
            # built in-kernel per layer. `v4:nogather` knocks the matmul
            # out on top (keeps the operand DMA).
            stage = v.split(":", 1)[1] if ":" in v else "full"
            fn = (
                lambda _s: lambda **a: _variant_model_v4(
                    _s, *geom, caps_v4
                )(
                    a["onehot_tiles"], a["h0"], a["skip0"], a["s0"],
                    a["glue_w"], a["pool_gl"], a["pred_hd"],
                )
            )(stage)
        else:
            fn = prod.get(v) or (
                lambda _v: (
                    lambda **a: _variant_model(_v, *geom)(
                        a["slot_stack"], a["h0"], a["prev0"], a["s0"],
                        a["skip_w"], a["proj_w"], a["a_next"], a["pool_gl"],
                        a["pred_hd"],
                    )
                )
            )(v)
        rows.append((v, timed(fn)))

    noop = rows[0][1]
    full = dict(rows).get("full")
    print(f"window={window} slots={n_slots} graphs={args.graphs} "
          f"reps={args.reps} (us/pass, noop-subtracted; Δfull)")
    for name, t in rows:
        dev = (t - noop) * 1e6
        delta = f"  Δ{(dict(rows)['full'] - t) * 1e6:+9.1f}" if (
            full is not None and name not in ("noop",)
        ) else ""
        print(f"  {name:9s} {t * 1e6:9.1f}  dev {dev:9.1f}{delta}")


if __name__ == "__main__":
    main()
