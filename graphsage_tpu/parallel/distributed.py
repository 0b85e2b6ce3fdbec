"""P3: multi-host initialization and mesh construction over ICI + DCN.

The reference has no distributed backend at all (no NCCL/MPI/Gloo in
/root/reference — SURVEY.md §5.8). The TPU-native story: one process per
host, ``jax.distributed.initialize`` to join the cluster, then a mesh
whose ``graph``/``data`` axes span all devices — XLA routes collectives
over ICI within a slice and DCN across slices based on the mesh layout.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Join the multi-host cluster. On TPU pods the arguments are
    auto-detected from the environment; pass them explicitly for CPU/GPU
    clusters. No-op if already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def global_mesh(axis_name: str = "graph") -> Mesh:
    """1-D mesh over every device in the cluster (local + remote)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def data_graph_mesh(n_graph: int) -> Mesh:
    """2-D ("data", "graph") mesh: graph sharding within a slice (ICI),
    pure data parallelism across the outer axis (DCN-friendly)."""
    devs = np.asarray(jax.devices())
    n_data = len(devs) // n_graph
    return Mesh(devs[: n_data * n_graph].reshape(n_data, n_graph),
                ("data", "graph"))


def process_local_batch(global_batch: int) -> int:
    """Per-process batch share for host-side data loading."""
    return global_batch // jax.process_count()
