"""flowgnn_tpu — a TPU-native GNN message-passing inference framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
sharc-lab/FlowGNN (the Vitis HLS FPGA dataflow accelerator): batched inference
for GIN, GIN-VN, GCN, GAT, PNA and DGN over OGB molecular graphs, validated
numerically against the reference weight binaries.
"""

__version__ = "0.1.0"

from .core.graphs import Graph, PackedGraphs, pack_dataset, pack_graphs  # noqa: F401
from .core.numerics import FIXED_16_3, FIXED_16_6, FLOAT32, Precision  # noqa: F401
from .models.registry import MODELS, get  # noqa: F401
