"""Golden-oracle harness: run the reference kernels as plain C++ (sw_emu).

Builds the reference's GIN kernel sources (compiled in place from
/root/reference — never copied) against the stub headers in ``include/``
(double-backed ap_fixed emulation + sequential hls::stream), producing a
binary whose per-graph outputs replay the reference's golden-output
comparison (SURVEY.md §4) with faithful ap_fixed quantization/wraparound.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_INCLUDE = os.path.join(_HERE, "include")

_COMMON = ["conv_layer.cc", "message_passing.cc", "node_embedding.cc",
           "finalize.cc", "linear.cc", "load_inputs.cc", "globals.cc"]
KERNEL_SOURCES = {
    "GIN": ["GIN_compute.cc"] + _COMMON,
    # GIN-VN's kernel sources are byte-identical to GIN's (only the hosts
    # differ — the VN augmentation is host-side, GIN-VN/src/host_load.cc:
    # 129-153); compiled from GIN-VN/src anyway so the binary is the
    # reference GIN-VN device, driven by gin_main.cc on a VN-augmented
    # dataset with the GIN-VN weight binaries.
    "GIN-VN": ["GIN_compute.cc"] + _COMMON,
    "GCN": ["GCN_compute.cc"] + _COMMON,
    "GAT": ["GAT_compute.cc"] + _COMMON,
    "PNA": ["PNA_compute.cc"] + _COMMON,
    "DGN": ["DGN_compute.cc"] + _COMMON,
}
# Host main driving each golden binary (default: <model>_main.cc).
MAIN_SOURCES = {"GIN-VN": "gin_main.cc"}


def build_golden(
    model: str, reference_root: str = "/root/reference",
    out_path: Optional[str] = None,
) -> Optional[str]:
    """Compile a model's golden binary; returns its path or None on failure."""
    src_dir = os.path.join(reference_root, model, "src")
    if not os.path.isdir(src_dir):
        return None
    slug = model.lower().replace("-", "_")
    out_path = out_path or os.path.join(_HERE, f"{slug}_golden")
    sources = [os.path.join(src_dir, s) for s in KERNEL_SOURCES[model]]
    main = MAIN_SOURCES.get(model, f"{model.lower()}_main.cc")
    sources.append(os.path.join(_HERE, main))
    newest_dep = max(
        os.path.getmtime(p)
        for p in sources + [os.path.join(_INCLUDE, h) for h in os.listdir(_INCLUDE)]
    )
    if os.path.exists(out_path) and os.path.getmtime(out_path) > newest_dep:
        return out_path
    cmd = [
        "g++", "-O2", "-std=c++17", "-w",
        f"-I{_INCLUDE}", f"-I{src_dir}",
        *sources,
        "-o", out_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return out_path


def build_gin_golden(reference_root: str = "/root/reference",
                     out_path: Optional[str] = None) -> Optional[str]:
    return build_golden("GIN", reference_root, out_path)


def run_golden(
    model: str, dataset_dir: str, num_graphs: int,
    reference_root: str = "/root/reference",
) -> np.ndarray:
    """Run a model's golden binary; returns per-graph predictions."""
    binary = build_golden(model, reference_root)
    if binary is None:
        raise RuntimeError("golden binary unavailable")
    weights_dir = os.path.join(reference_root, model)
    res = subprocess.run(
        [binary, dataset_dir, str(num_graphs), weights_dir],
        check=True, capture_output=True, text=True,
    )
    out = np.full(num_graphs, np.nan, np.float64)
    for line in res.stdout.splitlines():
        if line.startswith("g") and ":" in line:
            idx, val = line.split(":")
            out[int(idx[1:]) - 1] = float(val)
    return out


def run_gin_golden(
    dataset_dir: str, num_graphs: int, reference_root: str = "/root/reference"
) -> np.ndarray:
    return run_golden("GIN", dataset_dir, num_graphs, reference_root)
