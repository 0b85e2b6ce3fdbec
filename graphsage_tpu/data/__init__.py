"""Host-side data layer: dataset contract, padded adjacency, batching.

Everything here is NumPy-only (no JAX) and runs once at startup; the
resulting dense arrays are moved to device a single time and the training
loop only ever feeds integer indices.
"""

from graphsage_tpu.data.graph import GraphData
from graphsage_tpu.data.io import load_data
from graphsage_tpu.data.adjacency import build_padded_adj
from graphsage_tpu.data.minibatch import NodeBatcher, EdgeBatcher
from graphsage_tpu.data.walks import run_random_walks, write_walks, read_walks
from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset

__all__ = [
    "GraphData",
    "load_data",
    "build_padded_adj",
    "NodeBatcher",
    "EdgeBatcher",
    "run_random_walks",
    "write_walks",
    "read_walks",
    "make_synthetic_graph",
    "write_dataset",
]
