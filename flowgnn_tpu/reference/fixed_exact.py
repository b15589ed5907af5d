"""Bit-exact ap_fixed GIN oracle (the top rung of the tolerance ladder).

Replays the reference kernel's quantization *placement*, not just its grid:

  * every on-grid sum (message accumulation, embedding sums, MLP-1 partial
    sums, pooling sums) is exact in f64, because sums of 2^-10-grid values
    are themselves on the grid — matching FM_TYPE's behaviour absent
    wraparound (GIN/src/message_passing.cc:136-146,
    GIN/src/node_embedding.cc:124-137),
  * MLP-1 quantizes each *product* before accumulating
    (``FM_TYPE addend = activations * weight`` — node_embedding.cc:131-135),
    which is order-independent,
  * MLP-2 and the prediction linear quantize the *running sum* after each
    product (``results += relu(acc) * weight`` with FM_TYPE results —
    node_embedding.cc:172-185, linear.cc:131-147) — replayed sequentially in
    the device's dim_in order,
  * mean pooling truncates the division (finalize.cc:111).

Validated bit-for-bit against the golden binary (reference kernel sources
compiled with the ap_fixed emulation header — flowgnn_tpu/golden). MLP
partial sums replay the device's per-step wraparound; the remaining on-grid
sums (messages, embeddings, pooling) are assert-checked against transient
range crossings instead of replayed per-add.
"""

from __future__ import annotations

import numpy as np

from ..core.features import ATOM_FEATURE_OFFSETS, BOND_FEATURE_OFFSETS
from ..core.graphs import Graph
from ..core.numerics import FixedSpec

FX = FixedSpec(16, 6, overflow="wrap")


def _q(x: np.ndarray) -> np.ndarray:
    scale = FX.scale
    q = np.floor(np.asarray(x, np.float64) * scale)
    span = 1 << FX.width
    half = 1 << (FX.width - 1)
    q = np.mod(q + half, span) - half
    return q / scale


def _check_range(x: np.ndarray, what: str) -> np.ndarray:
    if np.abs(x).max(initial=0) >= FX.max_val + 1:
        raise AssertionError(f"{what} exceeds ap_fixed range; wrap not replayed")
    return x


def _running_sum_linear(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """out[n, o] = fold over i of q(s + x[n, i]·w[o, i]), s0 = b[o]."""
    n = x.shape[0]
    s = np.broadcast_to(_q(b)[None, :], (n, w.shape[0])).copy()
    for i in range(x.shape[1]):
        s = _q(s + x[:, i, None] * w[None, :, i])
    return s


def gin_forward_fixed_exact(params: dict, g: Graph) -> dict:
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    L = params["mlp1_w"].shape[0]

    nd = _q(params["node_embedding"])
    ed = _q(params["edge_embedding"])
    w1, b1 = _q(params["mlp1_w"]), _q(params["mlp1_b"])
    w2, b2 = _q(params["mlp2_w"]), _q(params["mlp2_b"])
    pw, pb = _q(params["pred_w"]), _q(params["pred_b"])

    # Input embedding: on-grid sum of 9 rows (load_inputs.cc:174-220).
    rows = g.node_feat + ATOM_FEATURE_OFFSETS[None, :]
    h = _check_range(nd[rows].sum(axis=1), "h0")
    order = None  # built lazily, only when a message accumulator wraps

    for l in range(L):
        # Edge embedding: on-grid sum of 3 rows (message_passing.cc:136-146).
        erows = g.edge_attr + BOND_FEATURE_OFFSETS[None, :]
        ee = ed[l][erows].sum(axis=1)
        msg = np.maximum(h[u] + ee, 0.0)  # on-grid
        m = np.zeros((n, h.shape[1]), np.float64)
        np.add.at(m, v, msg)
        if np.abs(m).max(initial=0) >= FX.max_val + 1:
            # A dense destination (GIN-VN's virtual-node star) wraps the
            # FM_TYPE message BRAM — replay per edge in the device's per-PE
            # source-CSR order (load_inputs.cc:156-171; dest v lives in one
            # PE so a stable sort by u reproduces each accumulator's adds).
            # Messages are non-negative (relu), so the vectorized sum is
            # exact precisely when no partial crossed the range.
            if order is None:
                order = _pe_source_order(u, v)
            m = np.zeros((n, h.shape[1]), np.float64)
            for e in order:
                m[v[e]] = _q(m[v[e]] + msg[e])
        act = _q(m + h)  # ε = 0 on device; the single add wraps on-grid

        # MLP-1: quantized products, partial sums wrapped per step in the
        # device's dim_in order (accs is FM_TYPE — node_embedding.cc:124-137).
        z = np.broadcast_to(b1[l][None, :], (n, w1.shape[1])).copy()
        for i in range(act.shape[1]):
            z = _q(z + _q(act[:, i, None] * w1[l][None, :, i]))
        z = np.maximum(z, 0.0)

        # MLP-2: running-sum truncation in dim_in order.
        hnew = _running_sum_linear(z, w2[l], b2[l])
        if l != L - 1:
            hnew = np.maximum(hnew, 0.0)
        h = hnew

    # Mean pooling (finalize.cc:46-115): the FM_TYPE running sum WRAPS at ±32
    # for larger graphs, so the accumulation order matters — replay it: each
    # main-loop iteration folds a NODE_PARALLEL=2 pair into a fresh
    # accumulator, then adds the previous total, each step wrapped.
    d = h.shape[1]
    total = np.zeros(d, np.float64)
    num_iters = -(-n // 2) - 1
    for i in range(num_iters):
        t = _q(h[2 * i])
        t = _q(t + h[2 * i + 1])
        total = t if i == 0 else _q(t + total)
    tail = np.zeros(d, np.float64)
    for nd in range(2 * num_iters, n):
        tail = _q(tail + h[nd])
    if num_iters != 0:
        tail = _q(tail + total)
    h_graph = _q(tail / n)
    out = _running_sum_linear(h_graph[None, :], pw, pb)[0]
    return {"out": out, "h_graph": h_graph}


# ---------------------------------------------------------------------------
# DGN (ap_fixed<16,3> — DGN/src/dcl.h:54-55)
# ---------------------------------------------------------------------------

FX3 = FixedSpec(16, 3, overflow="wrap")


def _q3(x: np.ndarray) -> np.ndarray:
    scale = FX3.scale
    q = np.floor(np.asarray(x, np.float64) * scale)
    span = 1 << FX3.width
    half = 1 << (FX3.width - 1)
    q = np.mod(q + half, span) - half
    return q / scale


def _pe_source_order(u: np.ndarray, v: np.ndarray, num_pe: int = 4) -> np.ndarray:
    """Edge replay order of the reference's per-PE CSR: pass 1 counts per
    (pe = v % EDGE_PARALLEL, source u), pass 2 scatters in original edge
    order (DGN/src/load_inputs.cc load_graph) — so each PE walks its edges
    grouped by source u, original order within a source. Since every dest v
    lives in exactly one PE, a global stable sort by u reproduces each
    accumulator's add order."""
    return np.argsort(u, kind="stable")


def _pooling_fold(h: np.ndarray, n: int, q, node_parallel: int = 2) -> np.ndarray:
    """global_mean_pooling running sum (DGN/src/finalize.cc:56-105 — same
    structure in PNA): per iteration a NODE_PARALLEL pair folds into a fresh
    FM_TYPE accumulator, the previous total is added, every step on the
    wrapped grid."""
    d = h.shape[1]
    sums = np.zeros(d, np.float64)
    for i in range(-(-n // node_parallel)):
        el = np.zeros(d, np.float64)
        for off in range(node_parallel):
            nd = i * node_parallel + off
            if nd == n:
                break
            el = q(el + h[nd])
        if i != 0:
            el = q(el + sums)
        sums = el
    return q(sums / n)


def _running_linear(x, w, b, q, relu):
    """linear / linear_output_stationary: FM_TYPE out_el = bias, then
    out_el += in·w per dim_in (running sum quantized each step —
    DGN/src/linear.cc:26-48)."""
    s = q(np.asarray(b, np.float64)).copy()
    for i in range(x.shape[0]):
        s = q(s + x[i] * w[:, i])
    if relu:
        s = np.maximum(s, 0.0)
    return s


def _paired_linear(x, w, b, q, relu, parallel=2):
    """linear_input_stationary: per PARALLEL-group an FM_TYPE addend
    accumulates the group's products (quantized per add), then folds into
    the FM_TYPE output (DGN/src/linear.cc:97-151)."""
    s = q(np.asarray(b, np.float64)).copy()
    for base in range(0, x.shape[0], parallel):
        addend = np.zeros_like(s)
        for off in range(parallel):
            i = base + off
            if i < x.shape[0]:
                addend = q(addend + x[i] * w[:, i])
        s = q(s + addend)
    if relu:
        s = np.maximum(s, 0.0)
    return s


def dgn_forward_fixed_exact(params: dict, g: Graph) -> dict:
    """Bit-exact ap_fixed<16,3> DGN replay (vs the compiled reference kernel).

    Quantization placement: m1/m2 accumulate in FM_TYPE message BRAM per
    edge in per-PE source-CSR order (DGN/src/message_passing.cc:120-153 —
    m2's per-edge product is off-grid, and the ±4 range makes wraparound
    real); a1 is a truncating division by the raw out-degree; a2 quantizes
    the whole |(m2 − eigw_sum·h)/eig_abssum| quotient once
    (node_embedding.cc:145-146); the posttrans addend quantizes the
    two-product sum per (dim_in, dim_out) with the accumulator folding
    on-grid (node_embedding.cc:148-158); pooling and the 100→50→25→1 MLP
    replay finalize.cc/linear.cc's running sums.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    L = params["posttrans_w"].shape[0]

    tables = _q3(params["atom_tables"])
    pw = _q3(params["posttrans_w"])  # [L, dim_out, 2, dim_in]
    pb = _q3(params["posttrans_b"])
    eig = _q3(np.asarray(g.node_eigen, np.float64)[:, 1])

    eig_w = eig[u] - eig[v]  # on-grid (WT_TYPE diff of WT_TYPE)
    eig_abssum = np.zeros(n, np.float64)
    eigw_sum = np.zeros(n, np.float64)
    order = _pe_source_order(u, v)
    for e in order:  # WT_TYPE accumulators, original add order per node
        eig_abssum[v[e]] = _q3(eig_abssum[v[e]] + abs(eig_w[e]))
        eigw_sum[v[e]] = _q3(eigw_sum[v[e]] + eig_w[e])
    deg = np.bincount(u, minlength=n).astype(np.float64)

    # Input embedding: 9 separate [119, dim] tables indexed by raw feature
    # (DGN/src/load_inputs.cc:174-220); on-grid sum.
    h = _check_range(
        tables[np.arange(9)[None, :], g.node_feat].sum(axis=1), "dgn h0"
    )

    for l in range(L):
        m = np.zeros((n, 2, h.shape[1]), np.float64)
        for e in order:
            m[v[e], 0] = _q3(m[v[e], 0] + h[u[e]])
            m[v[e], 1] = _q3(m[v[e], 1] + h[u[e]] * eig_w[e])
        a1 = _q3(m[:, 0] / deg[:, None])
        abss = np.where(eig_abssum == 0.0, 1.0 / 8192, eig_abssum)
        a2 = np.abs(_q3((m[:, 1] - eigw_sum[:, None] * h) / abss[:, None]))
        # addend = q(a1·w[:,0,i] + a2·w[:,1,i]) per (node, dim_out, dim_in);
        # the acc fold is on-grid — replayed wrapped per dim_in step.
        acc = np.broadcast_to(pb[l][None, :], a1.shape).copy()
        for i in range(a1.shape[1]):
            addend = _q3(
                a1[:, i, None] * pw[l][None, :, 0, i]
                + a2[:, i, None] * pw[l][None, :, 1, i]
            )
            acc = _q3(acc + addend)
        h = _q3(h + np.maximum(acc, 0.0))

    h_graph = _pooling_fold(h, n, _q3)
    z = _running_linear(h_graph, _q3(params["mlp1_w"]), params["mlp1_b"], _q3, True)
    z = _paired_linear(z, _q3(params["mlp2_w"]), params["mlp2_b"], _q3, True)
    out = _running_linear(z, _q3(params["mlp3_w"]), params["mlp3_b"], _q3, False)
    return {"out": out, "h_graph": h_graph, "h": h}


# ---------------------------------------------------------------------------
# PNA (ap_fixed<16,6>)
# ---------------------------------------------------------------------------

AVG_DEG = 6.885701656341553  # PNA/src/host_load.cc:127


def pna_forward_fixed_exact(params: dict, g: Graph) -> dict:
    """Bit-exact ap_fixed<16,6> PNA replay (vs the compiled reference kernel).

    Quantization placement (PNA/src/message_passing.cc:100-147,
    node_embedding.cc:106-214): the running sum wraps per edge add in per-PE
    source-CSR order; sum² quantizes each square before adding; min/max are
    comparisons seeded at the ap_fixed extremes; mean/std are truncating
    divisions with q(mean²) subtraction and a double sqrt quantized on
    assignment; the 12-block addend quantizes every product and the two
    scaler multiplies; the accumulator folds on-grid per dim_in. Readout
    replays finalize.cc's pooling fold and the 80→40→20→1 running-sum MLP.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    L = params["conv_w"].shape[0]
    d = params["conv_w"].shape[-1]

    nd = _q(params["node_embedding"])
    cw = _q(params["conv_w"])  # [L, dim_out, NUM_SCALERS=3, NUM_AGGRS=4, dim_in]
    cb = _q(params["conv_b"])
    avg_deg = _q(np.float64(AVG_DEG))

    in_deg = np.maximum(np.bincount(v, minlength=n), 1).astype(np.float64)
    out_deg = np.bincount(u, minlength=n).astype(np.float64)
    if (out_deg == 0).any():
        raise AssertionError("out-degree 0: device divides by log(1)=0")
    log_deg = _q(np.log(out_deg + 1))  # log_degrees, load_inputs.cc:105
    t = _q(log_deg / avg_deg)
    scale = _q(avg_deg / log_deg)
    scale = np.where(scale == 0.0, 1.0, scale)  # node_embedding.cc:150

    rows = g.node_feat + ATOM_FEATURE_OFFSETS[None, :]
    h = _check_range(nd[rows].sum(axis=1), "pna h0")

    MIN_SEED = 32767.0 / 1024  # ap_fixed_max<FM_TYPE>
    MAX_SEED = -32.0  # ap_fixed_min<FM_TYPE>
    order = _pe_source_order(u, v)

    for l in range(L):
        s = np.zeros((n, d), np.float64)
        s2 = np.zeros((n, d), np.float64)
        mn = np.full((n, d), MIN_SEED, np.float64)
        mx = np.full((n, d), MAX_SEED, np.float64)
        for e in order:
            x = h[u[e]]
            s[v[e]] = _q(s[v[e]] + x)
            s2[v[e]] = _q(s2[v[e]] + _q(x * x))
            mn[v[e]] = np.minimum(mn[v[e]], x)
            mx[v[e]] = np.maximum(mx[v[e]], x)
        mean = _q(s / in_deg[:, None])
        # ap_fixed_relu<FM_TYPE>(...) converts its argument THROUGH FM_TYPE
        # first (node_embedding.cc:144-145), so a variance ≥ 32 wraps
        # negative and the relu clamps std to 0 — replayed via the _q wrap.
        var = np.maximum(_q(_q(s2 / in_deg[:, None]) - _q(mean * mean)), 0.0)
        std = _q(np.sqrt(var))
        stats = np.stack([mean, mn, mx, std], axis=1)  # AGGR enum order

        # addend(node, dim_out, dim_in): every product quantized, pairwise
        # sums on-grid; scaler multiplies quantized (node_embedding.cc:158-189).
        acc = np.broadcast_to(cb[l][None, :], (n, d)).copy()
        for i in range(d):
            # [n, dim_out, scaler]: Σ_aggr q(stat·w)
            p = _q(
                stats[:, None, None, :, i] * cw[l][None, :, :, :, i]
            ).sum(axis=3)
            block = _check_range(p, "pna block")
            term = _q(block[:, :, 0]
                      + _q(block[:, :, 1] * t[:, None])
                      + _q(block[:, :, 2] * scale[:, None]))
            acc = _q(acc + term)
        h = _q(h + np.maximum(acc, 0.0))

    h_graph = _pooling_fold(h, n, _q)
    z = _running_linear(h_graph, _q(params["mlp1_w"]), params["mlp1_b"], _q, True)
    z = _paired_linear(z, _q(params["mlp2_w"]), params["mlp2_b"], _q, True)
    out = _running_linear(z, _q(params["mlp3_w"]), params["mlp3_b"], _q, False)
    return {"out": out, "h_graph": h_graph, "h": h}


# ---------------------------------------------------------------------------
# GAT (ap_fixed<16,6>, 4 heads × dim 16)
# ---------------------------------------------------------------------------


def _gat_pe_orders(u: np.ndarray, v: np.ndarray, n: int, num_pe: int = 4):
    """GAT's per-PE gather order: CSR partitioned by pe = u % EDGE_PARALLEL,
    grouped by destination v with the self edge FIRST in v's own PE
    (GAT/src/load_inputs.cc:100-166); within (pe, v) original edge order.
    Returns per-PE lists of (u, v) pairs in walk order."""
    orders = [[] for _ in range(num_pe)]
    per = [[[] for _ in range(n)] for _ in range(num_pe)]
    for e in range(u.shape[0]):
        per[u[e] % num_pe][v[e]].append(u[e])
    for p in range(num_pe):
        for nd in range(n):
            if nd % num_pe == p:
                orders[p].append((nd, nd))  # self edge first
            for src in per[p][nd]:
                orders[p].append((src, nd))
    return orders


def gat_forward_fixed_exact(params: dict, g: Graph) -> dict:
    """Bit-exact ap_fixed<16,6> GAT replay (vs the compiled reference kernel).

    Replays, in the kernel's own fold orders: the layer-0 projection and
    score accumulators (GAT/src/load_inputs.cc:168-227, products quantized
    per the golden hls::vector semantics); raw-exp attention with per-PE
    partial accumulators merged then divided in the adapter
    (message_passing.cc:83-151, conv_layer.cc:135-195 — the raw exp WRAPS
    above ln(32) on the ±32 grid, faithfully); the fused skip+ELU and
    next-layer projection/scores of the apply unit
    (node_embedding.cc:95-271); finalize's head-average + last skip
    projection, the pooling fold, and the prediction linear
    (finalize.cc:46-130). ``g`` is the RAW graph — self edges are seeded
    in-kernel, as the device does.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    L, H, D = params["proj_w"].shape[:3]

    proj = _q(params["proj_w"])  # [L, H, D, H, D] (layer 0: [:, :, 0, :9])
    skip = _q(params["skip_w"])
    a_src = _q(params["a_src"])  # [L, H, D]
    a_tgt = _q(params["a_tgt"])
    pw, pb = _q(params["pred_w"]), _q(params["pred_b"])

    # Raw int features pass through FM_TYPE on device (load_inputs.cc:185:
    # ``FM_TYPE node_feature_nd_nf = node_feature_nd[nf]``) — atom-type
    # indices ≥ 32 WRAP on the ±32 grid before any use.
    feats = _q(np.asarray(g.node_feat, np.float64))

    # Layer-0 projection + scores (load_input_node_embeddings): vector
    # semantics — every product quantized, accumulators fold quantized.
    h = np.zeros((n, D, H), np.float64)  # [node, dim, head]
    for nf in range(9):
        h = _q(h + _q(feats[:, nf, None, None]
                      * proj[0, :, :, 0, nf].T[None, :, :]))
    s_src = np.zeros((n, H), np.float64)
    s_tgt = np.zeros((n, H), np.float64)
    for dim in range(D):
        s_src = _q(s_src + _q(h[:, dim] * a_src[0].T[None, dim]))
        s_tgt = _q(s_tgt + _q(h[:, dim] * a_tgt[0].T[None, dim]))
    # prev features: raw ints in head-0 slots.
    prev = np.zeros((n, D, H), np.float64)
    prev[:, :9, 0] = feats

    orders = _gat_pe_orders(u, v, n)
    q02 = _q(np.float64(0.2))

    out = None
    h_graph = None
    for l in range(L):
        # --- gather per PE: raw-exp scores, running message/score sums ---
        mp = np.zeros((4, n, D, H), np.float64)
        ssum = np.zeros((4, n, H), np.float64)
        for p in range(4):
            for src, dst in orders[p]:
                raw = s_src[dst] + s_tgt[src]  # on-grid
                leaky = np.where(raw < 0, _q(raw * q02), raw)
                sc = _q(np.exp(leaky))
                ssum[p, dst] = _q(ssum[p, dst] + sc)
                mp[p, dst] = _q(mp[p, dst] + _q(sc[None, :] * h[src]))
        # --- adapter: merge PE partials, divide (conv_layer.cc:135-195) ---
        msg = np.zeros((n, D, H), np.float64)
        den = np.zeros((n, H), np.float64)
        for p in range(4):
            msg = _q(msg + mp[p])
            den = _q(den + ssum[p])
        if (den == 0).any():
            raise AssertionError("zero attention denominator")
        msg = _q(msg / den[:, None, :])

        if l == L - 1:
            # finalize.make_embeddings: head sum + last skip proj folded
            # into ONE scalar accumulator, then /NUM_HEADS.
            emb = np.zeros((n, D), np.float64)
            for dim_out in range(D):
                acc = np.zeros(n, np.float64)
                for head in range(H):
                    acc = _q(acc + msg[:, dim_out, head])
                for dim_in in range(D):
                    for head_out in range(H):
                        for head_in in range(H):
                            acc = _q(acc + prev[:, dim_in, head_in]
                                     * skip[L - 1, head_out, dim_out, head_in, dim_in])
                emb[:, dim_out] = _q(acc / H)
            # pooling fold (finalize.cc — GIN-style num_iters-1 + tail).
            d2 = D
            total = np.zeros(d2, np.float64)
            num_iters = -(-n // 2) - 1
            for i in range(num_iters):
                t = _q(emb[2 * i])
                t = _q(t + emb[2 * i + 1])
                total = t if i == 0 else _q(t + total)
            tail = np.zeros(d2, np.float64)
            for nd in range(2 * num_iters, n):
                tail = _q(tail + emb[nd])
            if num_iters != 0:
                tail = _q(tail + total)
            h_graph = _q(tail / n)
            out = _running_sum_linear(h_graph[None, :], pw, pb)[0]
            break

        # --- apply unit (node_embedding.cc): per dim_out ---
        new_prev = np.zeros((n, D, H), np.float64)
        acc = np.zeros((n, D, H), np.float64)  # next-layer projection accs
        s_src_n = np.zeros((n, H), np.float64)
        s_tgt_n = np.zeros((n, H), np.float64)
        for dim_out in range(D):
            nxt = msg[:, dim_out].copy()  # [n, H] start from message
            for dim_in in range(D):
                for head_out in range(H):
                    for head_in in range(H):
                        # scalar ap_fixed: product exact, sum quantized
                        nxt[:, head_out] = _q(
                            nxt[:, head_out]
                            + prev[:, dim_in, head_in]
                            * skip[l, head_out, dim_out, head_in, dim_in]
                        )
            nxt = np.where(nxt <= 0, _q(np.exp(np.minimum(nxt, 0.0)) - 1.0), nxt)
            new_prev[:, dim_out] = nxt
            # next-layer projection: vector semantics (product quantized).
            for proj_dim_out in range(D):
                for head_in in range(H):
                    acc[:, proj_dim_out] = _q(
                        acc[:, proj_dim_out]
                        + _q(nxt[:, head_in, None]
                             * proj[l + 1, :, proj_dim_out, head_in, dim_out][None, :])
                    )
        # output(): next-layer scores, running fold over dim (APPLY_PARALLEL=1).
        for dim in range(D):
            s_src_n = _q(s_src_n + _q(acc[:, dim] * a_src[l + 1].T[None, dim]))
            s_tgt_n = _q(s_tgt_n + _q(acc[:, dim] * a_tgt[l + 1].T[None, dim]))
        h, prev, s_src, s_tgt = acc, new_prev, s_src_n, s_tgt_n

    return {"out": out, "h_graph": h_graph}


# ---------------------------------------------------------------------------
# GCN (ap_fixed<16,6>)
# ---------------------------------------------------------------------------


def gcn_forward_fixed_exact(params: dict, g: Graph) -> dict:
    """Bit-exact ap_fixed<16,6> GCN replay (vs the compiled reference kernel).

    Quantization placement: degree_inv_sqrt quantizes 1/sqrt(deg+1) once per
    node, per-edge norms quantize the dis product
    (GCN/src/load_inputs.cc:120-163, out-degree-0 nodes keep dis=0 — the
    documented reference quirk); the scatter accumulates
    q(norm·relu(h_u+ee)) per edge in per-PE source-CSR order
    (message_passing.cc:124-172); the fused previous-layer tail quantizes
    the whole (m + relu(h+root)/(deg+1)) expression once and the whole BN
    affine once (node_embedding.cc:112-147); the conv matmul quantizes each
    product with an on-grid accumulator fold; the final tail (no ReLU) runs
    inside pooling with a per-node running sum and truncating division
    (finalize.cc:39-113), then the prediction linear's running sum.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    L = params["conv_w"].shape[0]

    nd_t = _q(params["node_embedding"])
    ed = _q(params["edge_embedding"])
    cw, cb = _q(params["conv_w"]), _q(params["conv_b"])
    root = _q(params["root_emb"])
    bnw, bnb = _q(params["bn_weight"]), _q(params["bn_bias"])
    bnm, bnv = _q(params["bn_mean"]), _q(params["bn_var"])
    pw, pb = _q(params["pred_w"]), _q(params["pred_b"])
    # bn_sqrt_var = q(sqrt(var + ap_fixed_epsilon)) — load_inputs.cc:32.
    bnsv = _q(np.sqrt(bnv + 1.0 / 1024))

    out_deg = np.bincount(u, minlength=n).astype(np.float64)
    # dis stays 0 for out-degree-0 nodes (never updated in the edge loop).
    dis = np.where(out_deg > 0, _q(1.0 / np.sqrt(out_deg + 1)), 0.0)
    norms = _q(dis[u] * dis[v])

    rows = g.node_feat + ATOM_FEATURE_OFFSETS[None, :]
    h = _check_range(nd_t[rows].sum(axis=1), "gcn h0")
    erows = g.edge_attr + BOND_FEATURE_OFFSETS[None, :]
    order = _pe_source_order(u, v)

    def tail(m, h, l):
        a = _q(m + np.maximum(h + root[l][None, :], 0.0)
               / (out_deg[:, None] + 1))
        return _q((a - bnm[l]) / bnsv[l] * bnw[l] + bnb[l])

    m = np.zeros((n, h.shape[1]), np.float64)
    for l in range(L):
        act = h if l == 0 else np.maximum(tail(m, h, l - 1), 0.0)
        z = np.broadcast_to(cb[l][None, :], (n, cw.shape[1])).copy()
        for i in range(act.shape[1]):
            z = _q(z + _q(act[:, i, None] * cw[l][None, :, i]))
        h = z
        ee = ed[l][erows].sum(axis=1)  # on-grid
        m = np.zeros((n, h.shape[1]), np.float64)
        for e in order:
            m[v[e]] = _q(
                m[v[e]] + norms[e] * np.maximum(h[u[e]] + ee[e], 0.0)
            )

    # Final tail (no ReLU) fused into pooling: per-dim running FM sum over
    # nodes in order, then truncating division.
    act = tail(m, h, L - 1)
    total = np.zeros(act.shape[1], np.float64)
    for nd in range(n):
        total = _q(total + act[nd])
    h_graph = _q(total / n)
    out = _running_sum_linear(h_graph[None, :], pw, pb)[0]
    return {"out": out, "h_graph": h_graph}
