"""Parsers for the reference weight binaries → float32 pytrees.

Each model family checked a trained float32 weight dump into its reference
directory; the host programs read them with per-file freads (GIN, GAT —
GIN/src/host_load.cc:18-98, GAT/src/host_load.cc:14-98) or with hard-coded
``fseek`` float-offset maps into one ``*.weights.all.bin`` (GCN, PNA, DGN —
GCN/src/host_load.cc:31-190, PNA/src/host_load.cc:22-68,
DGN/src/host_load.cc:5-151). These parsers reproduce the exact same layouts
and emit natural-layout numpy pytrees; they are what makes per-layer
validation against the reference possible.

All linear weights keep the reference's [out, in] (row-major matvec)
convention; apply as ``x @ w.T + b``.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.features import ATOM_FEATURE_DIMS

F32 = np.float32


def _read(path: str, count: int, offset_floats: int = 0) -> np.ndarray:
    arr = np.fromfile(path, dtype="<f4", count=count, offset=4 * offset_floats)
    if arr.size != count:
        raise ValueError(f"{path}: expected {count} floats at offset {offset_floats}")
    return arr


def load_gin(model_dir: str, dim: int = 100) -> dict:
    """GIN per-file layout (GIN/src/host_load.cc:18-98). dim=100, 5 layers."""
    L, H = 5, 2 * dim  # NUM_LAYERS, MLP_1_OUT
    p = lambda name: os.path.join(model_dir, f"gin_ep1_{name}_dim{dim}.bin")
    return {
        "node_embedding": _read(p("nd_embed"), 173 * dim).reshape(173, dim),
        "edge_embedding": _read(p("ed_embed"), L * 13 * dim).reshape(L, 13, dim),
        "eps": _read(p("eps"), L),
        "mlp1_w": _read(p("mlp_1_weights"), L * H * dim).reshape(L, H, dim),
        "mlp1_b": _read(p("mlp_1_bias"), L * H).reshape(L, H),
        "mlp2_w": _read(p("mlp_2_weights"), L * dim * H).reshape(L, dim, H),
        "mlp2_b": _read(p("mlp_2_bias"), L * dim).reshape(L, dim),
        "pred_w": _read(p("pred_weights"), dim).reshape(1, dim),
        "pred_b": _read(p("pred_bias"), 1),
    }


def load_gcn(model_dir: str, dim: int = 100) -> dict:
    """GCN fseek-offset map into gcn_ep1_dim100.weights.all.bin
    (GCN/src/host_load.cc:31-190). Per layer l: conv_w at 17300+11500*l,
    conv_b +10000, root_emb +10100, edge_emb +10200; BN blocks at 74800+401*l
    (the +1 stride skips torch's num_batches_tracked counter)."""
    L = 5
    f = os.path.join(model_dir, f"gcn_ep1_dim{dim}.weights.all.bin")
    out = {
        "node_embedding": _read(f, 173 * dim, 0).reshape(173, dim),
        "edge_embedding": np.zeros((L, 13, dim), F32),
        "conv_w": np.zeros((L, dim, dim), F32),
        "conv_b": np.zeros((L, dim), F32),
        "root_emb": np.zeros((L, dim), F32),
        "bn_weight": np.zeros((L, dim), F32),
        "bn_bias": np.zeros((L, dim), F32),
        "bn_mean": np.zeros((L, dim), F32),
        "bn_var": np.zeros((L, dim), F32),
    }
    for l in range(L):
        base = 17300 + 11500 * l
        out["conv_w"][l] = _read(f, dim * dim, base).reshape(dim, dim)
        out["conv_b"][l] = _read(f, dim, base + 10000)
        out["root_emb"][l] = _read(f, dim, base + 10100)
        out["edge_embedding"][l] = _read(f, 13 * dim, base + 10200).reshape(13, dim)
        bn = 74800 + 401 * l
        out["bn_weight"][l] = _read(f, dim, bn)
        out["bn_bias"][l] = _read(f, dim, bn + 100)
        out["bn_mean"][l] = _read(f, dim, bn + 200)
        out["bn_var"][l] = _read(f, dim, bn + 300)
    out["pred_w"] = _read(f, dim, 76805).reshape(1, dim)
    out["pred_b"] = _read(f, 1, 76905)
    return out


def load_gat(model_dir: str, dim: int = 16, heads: int = 4, layers: int = 5) -> dict:
    """GAT per-file layout (GAT/src/host_load.cc:14-98).

    Layer-0 projections are [heads][dim][1][9] (from the 9 raw int features);
    layers 1..4 are [heads][dim][heads][dim]. We zero-pad layer 0 into the
    uniform [L, head_out, dim_out, head_in, dim_in] tensor exactly as the
    zero-initialised host array does (GAT/src/host_load.cc:69-97), which makes
    the raw-feature buffer (features in head-0 slots) a plain matmul input.
    """
    p = lambda name: os.path.join(model_dir, f"gat_ep1_{name}_layer{layers}.bin")
    proj = np.zeros((layers, heads, dim, heads, dim), F32)
    skip = np.zeros((layers, heads, dim, heads, dim), F32)
    proj0 = _read(p("linear_proj_weight_0"), heads * dim * 9).reshape(heads, dim, 1, 9)
    skip0 = _read(p("skip_proj_weight_0"), heads * dim * 9).reshape(heads, dim, 1, 9)
    proj[0, :, :, 0, :9] = proj0[:, :, 0, :]
    skip[0, :, :, 0, :9] = skip0[:, :, 0, :]
    rest = (layers - 1) * heads * dim * heads * dim
    proj[1:] = _read(p("linear_proj_weight_1"), rest).reshape(
        layers - 1, heads, dim, heads, dim
    )
    skip[1:] = _read(p("skip_proj_weight_1"), rest).reshape(
        layers - 1, heads, dim, heads, dim
    )
    return {
        "proj_w": proj,
        "skip_w": skip,
        "a_src": _read(p("scoring_fn_source"), layers * heads * dim).reshape(
            layers, heads, dim
        ),
        "a_tgt": _read(p("scoring_fn_target"), layers * heads * dim).reshape(
            layers, heads, dim
        ),
        "pred_w": _read(p("pred_weights"), dim).reshape(1, dim),
        "pred_b": _read(p("pred_bias"), 1),
    }


def load_pna(model_dir: str, dim: int = 80) -> dict:
    """PNA fseek map into pna_ep1_noBN_dim80.weights.all.bin
    (PNA/src/host_load.cc:22-68). conv_w layout [l][dim_out][scaler][aggr][dim_in]
    with scalers (none, t, scale) and aggrs (mean, min, max, std) — the enum
    order in PNA/src/dcl.h:29-42. avg_deg is the host-side constant
    6.885701656341553 (PNA/src/host_load.cc:127)."""
    L = 4
    f = os.path.join(model_dir, f"pna_ep1_noBN_dim{dim}.weights.all.bin")
    conv_w = np.zeros((L, dim, 3, 4, dim), F32)
    conv_b = np.zeros((L, dim), F32)
    for l in range(L):
        base = 13840 + (76800 + dim) * l
        conv_w[l] = _read(f, dim * 3 * 4 * dim, base).reshape(dim, 3, 4, dim)
        conv_b[l] = _read(f, dim, base + 76800)
    return {
        "node_embedding": _read(f, 173 * dim, 0).reshape(173, dim),
        "conv_w": conv_w,
        "conv_b": conv_b,
        "mlp1_w": _read(f, 40 * dim, 321360).reshape(40, dim),
        "mlp1_b": _read(f, 40, 324560),
        "mlp2_w": _read(f, 20 * 40, 324600).reshape(20, 40),
        "mlp2_b": _read(f, 20, 325400),
        "mlp3_w": _read(f, 20, 325420).reshape(1, 20),
        "mlp3_b": _read(f, 1, 325440),
        "avg_deg": np.asarray(6.885701656341553, F32),
    }


def load_dgn(model_dir: str, dim: int = 100) -> dict:
    """DGN fseek map into dgn_ep1_noBN_dim100.weights.all.bin
    (DGN/src/host_load.cc:5-151). The 9 per-feature atom tables are stored
    back-to-back ([119,100],[4,100],...) and zero-padded into the device's
    [9][119][100] array; posttrans weights are [l][dim_out][channel][dim_in]
    with channel 0 = mean aggregation, channel 1 = directional derivative."""
    L = 4
    f = os.path.join(model_dir, f"dgn_ep1_noBN_dim{dim}.weights.all.bin")
    atom_tables = np.zeros((9, 119, dim), F32)
    off = 0
    for i, vocab in enumerate(ATOM_FEATURE_DIMS):
        atom_tables[i, :vocab] = _read(f, vocab * dim, off).reshape(vocab, dim)
        off += vocab * dim
    posttrans_w = np.zeros((L, dim, 2, dim), F32)
    posttrans_b = np.zeros((L, dim), F32)
    for l in range(L):
        base = 17300 + 20100 * l
        posttrans_w[l] = _read(f, dim * 2 * dim, base).reshape(dim, 2, dim)
        posttrans_b[l] = _read(f, dim, base + 20000)
    return {
        "atom_tables": atom_tables,
        "posttrans_w": posttrans_w,
        "posttrans_b": posttrans_b,
        "mlp1_w": _read(f, 50 * dim, 97700).reshape(50, dim),
        "mlp1_b": _read(f, 50, 102700),
        "mlp2_w": _read(f, 25 * 50, 102750).reshape(25, 50),
        "mlp2_b": _read(f, 25, 104000),
        "mlp3_w": _read(f, 25, 104025).reshape(1, 25),
        "mlp3_b": _read(f, 1, 104050),
    }


LOADERS = {
    "gin": load_gin,
    "gin-vn": load_gin,  # identical weights, host-side graph transform differs
    "gcn": load_gcn,
    "gat": load_gat,
    "pna": load_pna,
    "dgn": load_dgn,
}


def load(model: str, model_dir: str) -> dict:
    return LOADERS[model](model_dir)
