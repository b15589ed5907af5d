"""Blocked (Pallas-scatter) model path == plain XLA path, interpret mode."""

import os

import jax
import numpy as np
import pytest

from conftest import assert_allclose
from flowgnn_tpu.core.graphs import pack_graphs
from flowgnn_tpu.core.numerics import FLOAT32
from flowgnn_tpu.models import registry
from flowgnn_tpu.models.base import as_batch, prepare_params

# Interpret-mode execution is slow; keep the bucket tiny (wiring test —
# kernel coverage lives in test_pallas_spmm.py).
CAPS = dict(node_capacity=128, edge_capacity=512, graph_capacity=4)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # CPU tests run the kernel in the Pallas interpreter.
    monkeypatch.setenv("FLOWGNN_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("name", ["gin", "gcn", "gat", "pna", "dgn"])
def test_blocked_equals_plain(name, graphs16, reference_root):
    spec = registry.get(name)
    params = spec.loader(os.path.join(reference_root, spec.reference_dir))
    jp = prepare_params(params, FLOAT32)
    tg = registry.apply_transforms(spec, graphs16[:3])
    packed = pack_graphs(tg, with_eigen=spec.needs_eigen, **CAPS)

    plain = spec.forward(jp, as_batch(packed), FLOAT32)
    blocked = spec.forward(jp, as_batch(packed, blocked=True), FLOAT32)
    assert_allclose(
        np.asarray(blocked)[:3], np.asarray(plain)[:3], rtol=1e-5, atol=1e-5,
        msg=name,
    )


def test_gin_fused_layer_equals_plain(graphs16, reference_root):
    """Opt-in fused scatter+MLP kernel matches the split path."""
    import jax
    spec = registry.get("gin")
    params = spec.loader(os.path.join(reference_root, "GIN"))
    jp = prepare_params(params, FLOAT32)
    packed = pack_graphs(graphs16[:3], **CAPS)
    plain = spec.forward(jp, as_batch(packed), FLOAT32)
    fused = spec.forward(jp, as_batch(packed, blocked=True), FLOAT32, fused=True)
    assert_allclose(
        np.asarray(fused)[:3], np.asarray(plain)[:3], rtol=1e-5, atol=1e-5
    )
