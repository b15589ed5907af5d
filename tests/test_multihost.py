"""Multi-host DCN distribution (parallel/multihost.py) — SURVEY.md §7.6.

Spawns TWO real OS processes that form a ``jax.distributed`` CPU cluster
(4 fake devices each), deal the bucket stream between themselves, run the
halo-sharded step on their local data×edge meshes, and all-gather the
predictions — asserted equal to the single-process forward. This is the
same code path a TPU pod runs (initialize → shard_stream → local mesh →
gather_results); only the backend differs.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from flowgnn_tpu.core.graphs import pack_graphs
from flowgnn_tpu.core.numerics import FLOAT32
from flowgnn_tpu.core.synthetic import synthetic_molhiv
from flowgnn_tpu.models import registry
from flowgnn_tpu.models.base import as_batch, prepare_params
from flowgnn_tpu.parallel import multihost

REFERENCE = os.environ.get("FLOWGNN_REFERENCE", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "GIN")),
    reason="reference weights not mounted",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_initialize_single_process_noop():
    assert multihost.initialize() is False  # no env, no args → single process


def test_shard_stream_single_process_grouping():
    groups = multihost.shard_stream(list(range(5)), local_data=2)
    assert groups == [[0, 1], [2, 3]]  # trailing partial group dropped


def test_two_process_cluster_matches_single(tmp_path):
    port = _free_port()
    env_base = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "FLOWGNN_COORDINATOR": f"127.0.0.1:{port}",
        "FLOWGNN_NUM_PROCESSES": "2",
    }
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(tmp_path)],
            env={**env_base, "FLOWGNN_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    gathered = np.load(tmp_path / "gathered.npy")  # [2 hosts, 2 buckets, G+1, 1]
    assert gathered.shape[:2] == (2, 2)

    # Ground truth: plain single-device forward per bucket, in the dealt
    # order (round-robin: host 0 → buckets 0,2; host 1 → buckets 1,3).
    spec = registry.get("gin")
    params = prepare_params(
        spec.loader(os.path.join(REFERENCE, spec.reference_dir)), FLOAT32
    )
    graphs = registry.apply_transforms(spec, synthetic_molhiv(16, seed=11))
    caps = dict(node_capacity=256, edge_capacity=1024, graph_capacity=4)
    buckets = [pack_graphs(graphs[4 * i : 4 * i + 4], **caps) for i in range(4)]
    fwd = jax.jit(lambda p, b: spec.forward(p, b, FLOAT32))
    for host in range(2):
        for row in range(2):
            b = buckets[2 * row + host]
            ref = np.asarray(fwd(params, as_batch(b)))
            np.testing.assert_allclose(  # pad-graph row is garbage by design
                gathered[host, row, : b.num_graphs],
                ref[: b.num_graphs], rtol=2e-5, atol=2e-5,
            )
