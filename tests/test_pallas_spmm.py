"""Windowed segment-sum kernel vs plain segment_sum, on CPU interpret mode."""

import numpy as np
import pytest

from conftest import assert_allclose
from flowgnn_tpu.core.blocking import (
    EdgeBlocks,
    blocks_capacity,
    build_edge_blocks,
    segment_sum_blocked_reference,
)
from flowgnn_tpu.core.graphs import pack_graphs


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # CPU tests run the kernel in the Pallas interpreter.
    monkeypatch.setenv("FLOWGNN_PALLAS_INTERPRET", "1")


def test_blocking_layout(graphs16):
    packed = pack_graphs(graphs16, 1024, 4096, 32)
    n = 1024
    blocks = build_edge_blocks(packed.receivers, n, 4096, window=128, block=128)
    assert blocks.num_blocks == blocks_capacity(4096, n, 128, 128)
    # Every real edge appears exactly once.
    real = packed.receivers < n
    assert blocks.valid.sum() == real.sum()
    assert sorted(blocks.perm[blocks.valid]) == sorted(np.nonzero(real)[0])
    # v_local consistent with receiver and block window.
    lane_block = np.arange(blocks.perm.shape[0]) // blocks.block
    w = blocks.block_window[lane_block]
    recon = w * blocks.window + blocks.v_local
    np.testing.assert_array_equal(
        recon[blocks.valid], packed.receivers[blocks.perm[blocks.valid]]
    )
    # block_window non-decreasing.
    assert np.all(np.diff(blocks.block_window) >= 0)


def test_windowed_segment_sum_matches(graphs16):
    import jax.numpy as jnp
    from flowgnn_tpu.ops.pallas.spmm import segment_sum_via_blocks

    packed = pack_graphs(graphs16[:8], 512, 2048, 16)
    n = 512
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(2048, 100)).astype(np.float32)
    blocks = build_edge_blocks(packed.receivers, n, 2048, window=128, block=128)

    got = np.asarray(
        segment_sum_via_blocks(
            jnp.asarray(vals),
            jnp.asarray(blocks.perm),
            jnp.asarray(blocks.valid),
            jnp.asarray(blocks.v_local),
            jnp.asarray(blocks.block_window),
            n,
            blocks.window,
        )
    )

    # Plain segment-sum oracle over real edges only.
    want = np.zeros((n, 100), np.float32)
    real = packed.receivers < n
    np.add.at(want, packed.receivers[real], vals[real])
    assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # And the blocked NumPy oracle agrees too (validates the layout itself).
    ref = segment_sum_blocked_reference(vals, blocks, n)
    assert_allclose(ref, want, rtol=1e-5, atol=1e-5)


def test_empty_windows():
    """Nodes with no in-edges yield zero rows, including whole empty windows."""
    import jax.numpy as jnp
    from flowgnn_tpu.ops.pallas.spmm import segment_sum_via_blocks

    n, e = 384, 256
    receivers = np.full(e, n, np.int32)  # all pad edges except a few
    receivers[:4] = [0, 0, 301, 301]
    vals = np.ones((e, 8), np.float32)
    blocks = build_edge_blocks(receivers, n, e, window=128, block=128)
    got = np.asarray(
        segment_sum_via_blocks(
            jnp.asarray(vals), jnp.asarray(blocks.perm),
            jnp.asarray(blocks.valid), jnp.asarray(blocks.v_local),
            jnp.asarray(blocks.block_window), n, 128,
        )
    )
    want = np.zeros((n, 8), np.float32)
    want[0] = 2
    want[301] = 2
    assert_allclose(got, want, rtol=0, atol=1e-6)
