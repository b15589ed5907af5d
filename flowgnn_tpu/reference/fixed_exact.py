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

    for l in range(L):
        # Edge embedding: on-grid sum of 3 rows (message_passing.cc:136-146).
        erows = g.edge_attr + BOND_FEATURE_OFFSETS[None, :]
        ee = ed[l][erows].sum(axis=1)
        msg = np.maximum(h[u] + ee, 0.0)  # on-grid
        m = np.zeros((n, h.shape[1]), np.float64)
        np.add.at(m, v, msg)
        _check_range(m, "message")
        act = _check_range(m + h, "act")  # ε = 0 on device

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
