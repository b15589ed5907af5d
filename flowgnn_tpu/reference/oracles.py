"""Independent NumPy float oracles for all six model families.

These transcribe the *math* of the reference kernels (citations inline) as
straightforward per-graph NumPy programs — deliberately written in a different
style from both the HLS dataflow code and the packed JAX models, so that
agreement between the JAX models and these oracles is meaningful two-way
validation. Each oracle returns per-layer intermediates for layer-by-layer
diffing (the automated version of the reference's manual Golden_C_output.txt
comparison, GIN/.gitignore:5-6).

Edge convention everywhere: ``edge_index[:, 0] = u`` (source),
``edge_index[:, 1] = v`` (dest); messages flow u → v.
"""

from __future__ import annotations

import numpy as np

from ..core.features import ATOM_FEATURE_OFFSETS, BOND_FEATURE_OFFSETS
from ..core.graphs import Graph

F = np.float64  # oracle runs in f64: exactness ground truth


def _atom_embed(table: np.ndarray, node_feat: np.ndarray) -> np.ndarray:
    """h0[v] = Σ_f AtomTable[offset_f + feat_f[v]] (GIN/src/load_inputs.cc:174-220)."""
    rows = node_feat + ATOM_FEATURE_OFFSETS[None, :]
    return table[rows].sum(axis=1, dtype=F)


def _bond_embed(table_l: np.ndarray, edge_attr: np.ndarray) -> np.ndarray:
    """ee[e] = Σ_f BondTable_l[offset_f + attr_f[e]] (GIN/src/message_passing.cc:136-146)."""
    rows = edge_attr + BOND_FEATURE_OFFSETS[None, :]
    return table_l[rows].sum(axis=1, dtype=F)


def _scatter_add(values: np.ndarray, index: np.ndarray, num: int) -> np.ndarray:
    out = np.zeros((num,) + values.shape[1:], dtype=values.dtype)
    np.add.at(out, index, values)
    return out


def _relu(x):
    return np.maximum(x, 0)


def _out_degree(g: Graph) -> np.ndarray:
    """degree_table[u]++ per edge (GIN/src/load_inputs.cc:130)."""
    return np.bincount(g.edge_index[:, 0], minlength=g.num_nodes).astype(np.int64)


def _in_degree(g: Graph) -> np.ndarray:
    return np.bincount(g.edge_index[:, 1], minlength=g.num_nodes).astype(np.int64)


# ---------------------------------------------------------------------------
# GIN (and GIN-VN — same math; callers apply the virtual-node transform first)
# ---------------------------------------------------------------------------


def gin_forward(params: dict, g: Graph, fpga_eps: bool = True) -> dict:
    """GIN: h' = MLP_l((1+ε)h + Σ_{u→v} relu(h_u + ee_l)).

    Message: GIN/src/message_passing.cc:136-146. Update MLP (dim→200→dim,
    ReLU between, ReLU after except last layer):
    GIN/src/node_embedding.cc:117-192. ``fpga_eps=True`` reproduces the
    device, where ε never reaches the kernel (absent from the setArg list
    GIN/src/host.cc:185-200) so the zero-initialised global applies
    (GIN/src/globals.cc:3); ``False`` uses the trained ε from the file.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    L = params["mlp1_w"].shape[0]
    eps = np.zeros(L, F) if fpga_eps else params["eps"].astype(F)
    h = _atom_embed(params["node_embedding"], g.node_feat)
    layers = [h]
    for l in range(L):
        ee = _bond_embed(params["edge_embedding"][l], g.edge_attr)
        m = _scatter_add(_relu(h[u] + ee), v, g.num_nodes)
        act = m + (1 + eps[l]) * h
        z = _relu(act @ params["mlp1_w"][l].T + params["mlp1_b"][l])
        z = z @ params["mlp2_w"][l].T + params["mlp2_b"][l]
        if l != L - 1:
            z = _relu(z)
        h = z.astype(F)
        layers.append(h)
    h_graph = h.mean(axis=0, dtype=F)
    out = h_graph @ params["pred_w"].T + params["pred_b"]
    return {"layers": layers, "h_graph": h_graph, "out": out.astype(F)}


# ---------------------------------------------------------------------------
# GCN
# ---------------------------------------------------------------------------


def gcn_forward(params: dict, g: Graph, bn_eps: float = 1.0 / 1024) -> dict:
    """GCN with fused previous-layer tail (GCN/src/node_embedding.cc:122-146).

    Layer l: a = m_{l-1} + relu(h_{l-1} + root_emb_{l-1})/(deg+1), BatchNorm,
    ReLU (all skipped at l=0), then h_l = W_l a + b_l; message
    m_l[v] = Σ norm_uv · relu(h_l[u] + ee_l) with
    norm_uv = 1/√(deg_u+1)/√(deg_v+1) (GCN/src/load_inputs.cc:121-163,
    GCN/src/message_passing.cc:148-167). The final layer's tail (no ReLU) is
    fused into pooling (GCN/src/finalize.cc:39-113). ``bn_eps`` defaults to
    the device's ap_fixed ulp (GCN/src/load_inputs.cc:33 uses
    sqrt(var + ap_fixed_epsilon)).

    Documented deviation: the reference computes degree_inv_sqrt only for
    nodes it sees as a *source*, leaving dis[v]=0 (norm=0 on in-edges) for
    out-degree-0 receivers (GCN/src/load_inputs.cc:121-131); oracle and JAX
    model use 1/sqrt(deg+1)=1 there. Identical on symmetric OGB edge lists,
    divergent on directed inputs.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    deg = _out_degree(g).astype(F)
    dis = (1.0 / np.sqrt(deg + 1)).astype(F)
    norm = dis[u] * dis[v]
    L = params["conv_w"].shape[0]

    def bn(x, l):
        s = np.sqrt(params["bn_var"][l] + F(bn_eps))
        return (x - params["bn_mean"][l]) / s * params["bn_weight"][l] + params[
            "bn_bias"
        ][l]

    h = _atom_embed(params["node_embedding"], g.node_feat)
    m = np.zeros_like(h)
    layers = [h]
    for l in range(L):
        if l == 0:
            a = h
        else:
            a = m + _relu(h + params["root_emb"][l - 1]) / (deg[:, None] + 1)
            a = _relu(bn(a, l - 1))
        h = (a @ params["conv_w"][l].T + params["conv_b"][l]).astype(F)
        ee = _bond_embed(params["edge_embedding"][l], g.edge_attr)
        m = _scatter_add(norm[:, None] * _relu(h[u] + ee), v, g.num_nodes)
        layers.append(h)
    a = m + _relu(h + params["root_emb"][L - 1]) / (deg[:, None] + 1)
    a = bn(a, L - 1)  # no ReLU on the final tail (GCN/src/finalize.cc:88-96)
    h_graph = a.mean(axis=0, dtype=F)
    out = h_graph @ params["pred_w"].T + params["pred_b"]
    return {"layers": layers, "h_graph": h_graph, "out": out.astype(F)}


# ---------------------------------------------------------------------------
# GAT
# ---------------------------------------------------------------------------


def gat_forward(params: dict, g: Graph) -> dict:
    """GAT, 4 heads × dim 16, self-edge per node, no edge features.

    Per edge (u→v) and head: α = exp(leakyrelu_0.2(s_src[v] + s_tgt[u]));
    msg[v] = Σ α·h_u / Σ α (softmax over in-neighbors + self —
    GAT/src/message_passing.cc:83-151, normalisation in
    GAT/src/conv_layer.cc:170-195, *no* max-subtraction before exp, matching
    the reference). Update: feat = ELU(msg + Skip_l(prev)); next h/scores are
    the reference's eagerly-computed layer l+1 projection
    (GAT/src/node_embedding.cc:98-271) — expressed here un-pipelined: at each
    layer we project with weights[l] at the top of the iteration. Readout:
    heads averaged of (msg + Skip_4(prev)) (GAT/src/finalize.cc:46-117).

    ``prev`` starts as the raw int features placed in head-0 slots
    (GAT/src/load_inputs.cc:168-227); with the zero-padded layer-0 weights the
    layer-0 projection is the same matmul as every other layer.
    """
    L, H, D = params["proj_w"].shape[:3]
    n = g.num_nodes
    # Self edges first (GAT/src/load_inputs.cc:144-149), then input edges.
    u = np.concatenate([np.arange(n), g.edge_index[:, 0]])
    v = np.concatenate([np.arange(n), g.edge_index[:, 1]])

    # prev[v, head, dim]: raw features in head 0, dims 0..8.
    prev = np.zeros((n, H, D), F)
    prev[:, 0, :9] = g.node_feat.astype(F)

    def project(w_l, x):
        # [head_out, dim_out, head_in, dim_in] · [n, head_in, dim_in]
        return np.einsum("odhi,nhi->nod", w_l, x, dtype=F).astype(F)

    h = project(params["proj_w"][0], prev)  # [n, head, dim]
    s_src = np.einsum("nhd,hd->nh", h, params["a_src"][0]).astype(F)
    s_tgt = np.einsum("nhd,hd->nh", h, params["a_tgt"][0]).astype(F)

    layers = [h]
    out_feat = None
    for l in range(L):
        raw = s_src[v] + s_tgt[u]  # [E, head]
        score = np.exp(np.where(raw < 0, raw * F(0.2), raw))
        msg = _scatter_add(score[:, :, None] * h[u], v, n)
        denom = _scatter_add(score, v, n)
        msg = msg / denom[:, :, None]
        # skip[v, head_out, dim_out] = Σ prev[v,hi,di]·skip_w[l,ho,do,hi,di]
        skip = project(params["skip_w"][l], prev)
        if l != L - 1:
            feat = msg + skip
            feat = np.where(feat <= 0, np.exp(feat) - 1, feat).astype(F)  # ELU
            prev = feat
            h = project(params["proj_w"][l + 1], feat)
            s_src = np.einsum("nhd,hd->nh", h, params["a_src"][l + 1]).astype(F)
            s_tgt = np.einsum("nhd,hd->nh", h, params["a_tgt"][l + 1]).astype(F)
            layers.append(h)
        else:
            out_feat = (msg + skip).sum(axis=1, dtype=F) / F(H)  # head average
    h_graph = out_feat.mean(axis=0, dtype=F)
    out = h_graph @ params["pred_w"].T + params["pred_b"]
    return {"layers": layers, "h_graph": h_graph, "out": out.astype(F)}


# ---------------------------------------------------------------------------
# PNA
# ---------------------------------------------------------------------------

# Device min/max accumulator seeds = ap_fixed<16,6> extremes
# (PNA/src/message_passing.cc reset_message + PNA/src/util.h).
PNA_MIN_INIT = F(-32.0)
PNA_MAX_INIT = F(32767 / 1024)


def pna_forward(params: dict, g: Graph) -> dict:
    """PNA: 4 aggregators (mean, min, max, std) × 3 scalers (1, t, 1/t).

    Aggregation (PNA/src/message_passing.cc:121-147): per dest v running sum,
    sum², min, max of neighbor embeddings (no edge features). Update
    (PNA/src/node_embedding.cc:123-214): mean = sum/in_deg (in_deg 0→1),
    std = √relu(sum²/deg − mean²), scalers t = log(out_deg+1)/avg_deg and
    scale = avg_deg/log(out_deg+1) (→1 when degenerate); one fused
    [dim, 3, 4, dim] tower; residual h + relu(acc). Readout: mean-pool →
    MLP dim→40→20→1 with ReLU between (PNA/src/finalize.cc:34-52).

    Note the reference's asymmetry, preserved here: the mean divisor is the
    *in*-degree but the scaler degree is the *out*-degree
    (PNA/src/load_inputs.cc:87-105, node_embedding.cc:94-97).
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    in_deg = np.maximum(_in_degree(g), 1).astype(F)[:, None]
    log_deg = np.log(_out_degree(g).astype(F) + 1)[:, None]
    avg_deg = F(params["avg_deg"])
    t = log_deg / avg_deg
    scale = np.where(log_deg > 0, avg_deg / np.where(log_deg > 0, log_deg, 1), F(1))
    L = params["conv_w"].shape[0]

    h = _atom_embed(params["node_embedding"], g.node_feat)
    layers = [h]
    for l in range(L):
        x = h[u]
        s = _scatter_add(x, v, n)
        s2 = _scatter_add(x * x, v, n)
        mn = np.full_like(h, PNA_MAX_INIT)
        np.minimum.at(mn, v, x)
        mx = np.full_like(h, PNA_MIN_INIT)
        np.maximum.at(mx, v, x)
        mean = s / in_deg
        std = np.sqrt(_relu(s2 / in_deg - mean * mean))
        # stats[n, scaler, aggr, dim] — aggr order (mean, min, max, std)
        # matches the enum (PNA/src/dcl.h:29-35).
        base = np.stack([mean, mn, mx, std], axis=1)  # [n, 4, dim]
        stats = np.stack([base, base * t[:, None], base * scale[:, None]], axis=1)
        acc = (
            np.einsum("nsad,osad->no", stats, params["conv_w"][l], dtype=F)
            + params["conv_b"][l]
        )
        h = (h + _relu(acc)).astype(F)
        layers.append(h)
    h_graph = h.mean(axis=0, dtype=F)
    z = _relu(h_graph @ params["mlp1_w"].T + params["mlp1_b"])
    z = _relu(z @ params["mlp2_w"].T + params["mlp2_b"])
    out = z @ params["mlp3_w"].T + params["mlp3_b"]
    return {"layers": layers, "h_graph": h_graph, "out": out.astype(F)}


# ---------------------------------------------------------------------------
# DGN
# ---------------------------------------------------------------------------


def dgn_forward(params: dict, g: Graph, eps: float = 1.0 / 8192) -> dict:
    """DGN: mean + directional-derivative channels, eigen-weighted.

    Messages (DGN/src/message_passing.cc:120-153): m1[v] = Σ h_u,
    m2[v] = Σ (eig_u − eig_v)·h_u with eig = Laplacian eigenvector
    component [1] (DGN/src/load_inputs.cc:105-110). Update
    (DGN/src/node_embedding.cc:107-160): a1 = m1/deg,
    a2 = |m2 − eigw_sum_v·h_v| / eig_abssum_v (zero abssum → ap_fixed ulp of
    <16,3> = 2^-13), posttrans [dim,2,dim] linear, residual h + relu(acc).
    Readout: mean-pool → MLP dim→50→25→1 (DGN/src/finalize.cc:35-52).

    The device divides a1 by the raw out-degree with no zero guard
    (DGN/src/node_embedding.cc:145); we clamp deg→1 for isolated nodes whose
    message is zero anyway, and document the deviation here.
    """
    u, v = g.edge_index[:, 0], g.edge_index[:, 1]
    n = g.num_nodes
    eig = g.node_eigen[:, 1].astype(F)
    eig_w = eig[u] - eig[v]
    eig_abssum = _scatter_add(np.abs(eig_w), v, n)
    eigw_sum = _scatter_add(eig_w, v, n)
    eig_abssum = np.where(eig_abssum == 0, F(eps), eig_abssum)
    deg = np.maximum(_out_degree(g), 1).astype(F)[:, None]
    L = params["posttrans_w"].shape[0]

    h = _atom_embed_dgn(params["atom_tables"], g.node_feat)
    layers = [h]
    for l in range(L):
        m1 = _scatter_add(h[u], v, n)
        m2 = _scatter_add(eig_w[:, None] * h[u], v, n)
        a1 = m1 / deg
        a2 = np.abs(m2 - eigw_sum[:, None] * h) / eig_abssum[:, None]
        acc = (
            np.einsum("nd,od->no", a1, params["posttrans_w"][l][:, 0], dtype=F)
            + np.einsum("nd,od->no", a2, params["posttrans_w"][l][:, 1], dtype=F)
            + params["posttrans_b"][l]
        )
        h = (h + _relu(acc)).astype(F)
        layers.append(h)
    h_graph = h.mean(axis=0, dtype=F)
    z = _relu(h_graph @ params["mlp1_w"].T + params["mlp1_b"])
    z = _relu(z @ params["mlp2_w"].T + params["mlp2_b"])
    out = z @ params["mlp3_w"].T + params["mlp3_b"]
    return {"layers": layers, "h_graph": h_graph, "out": out.astype(F)}


def _atom_embed_dgn(tables: np.ndarray, node_feat: np.ndarray) -> np.ndarray:
    """DGN keeps 9 separate [119, dim] tables (DGN/src/load_inputs.cc:114-137)."""
    return sum(tables[i][node_feat[:, i]] for i in range(9)).astype(F)


ORACLES = {
    "gin": gin_forward,
    "gcn": gcn_forward,
    "gat": gat_forward,
    "pna": pna_forward,
    "dgn": dgn_forward,
}
