"""Weight-binary parser tests against the committed reference files."""

import os

import numpy as np
import pytest

from flowgnn_tpu.params import loaders


def test_gin_shapes(reference_root):
    p = loaders.load_gin(os.path.join(reference_root, "GIN"))
    assert p["node_embedding"].shape == (173, 100)
    assert p["edge_embedding"].shape == (5, 13, 100)
    assert p["mlp1_w"].shape == (5, 200, 100)
    assert p["mlp2_w"].shape == (5, 100, 200)
    assert p["pred_w"].shape == (1, 100)
    assert p["eps"].shape == (5,)
    # trained weights live on a sane scale
    assert 0 < np.abs(p["mlp1_w"]).max() < 32


def test_gin_vn_same_weights(reference_root):
    a = loaders.load_gin(os.path.join(reference_root, "GIN"))
    b = loaders.load_gin(os.path.join(reference_root, "GIN-VN"))
    np.testing.assert_array_equal(a["mlp1_w"], b["mlp1_w"])


def test_gcn_shapes(reference_root):
    p = loaders.load_gcn(os.path.join(reference_root, "GCN"))
    assert p["conv_w"].shape == (5, 100, 100)
    assert p["root_emb"].shape == (5, 100)
    assert p["bn_var"].shape == (5, 100)
    # BN variances are positive — the strongest layout check available:
    # a wrong fseek offset lands on signed weights and fails this.
    assert np.all(p["bn_var"] > 0)
    assert np.all(p["bn_var"] < 1e4)


def test_gat_shapes(reference_root):
    p = loaders.load_gat(os.path.join(reference_root, "GAT"))
    assert p["proj_w"].shape == (5, 4, 16, 4, 16)
    # Layer 0 only head_in=0, dims 0..8 populated (raw-feature projection).
    assert np.all(p["proj_w"][0, :, :, 1:, :] == 0)
    assert np.all(p["proj_w"][0, :, :, 0, 9:] == 0)
    assert np.any(p["proj_w"][0, :, :, 0, :9] != 0)
    assert np.any(p["proj_w"][1] != 0)


def test_pna_shapes(reference_root):
    p = loaders.load_pna(os.path.join(reference_root, "PNA"))
    assert p["conv_w"].shape == (4, 80, 3, 4, 80)
    assert p["mlp1_w"].shape == (40, 80)
    assert p["mlp3_w"].shape == (1, 20)
    assert float(p["avg_deg"]) == pytest.approx(6.8857017)


def test_dgn_shapes(reference_root):
    p = loaders.load_dgn(os.path.join(reference_root, "DGN"))
    assert p["atom_tables"].shape == (9, 119, 100)
    # Table 1 has vocab 4: rows beyond stay zero-padded.
    assert np.all(p["atom_tables"][1, 4:] == 0)
    assert np.any(p["atom_tables"][1, :4] != 0)
    assert p["posttrans_w"].shape == (4, 100, 2, 100)
    assert p["mlp2_w"].shape == (25, 50)
