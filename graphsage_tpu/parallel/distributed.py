"""P3: multi-host initialization, global array placement, host fetch.

The reference has no distributed backend at all (no NCCL/MPI/Gloo in
/root/reference — SURVEY.md §5.8). The TPU-native story: one process per
host, ``jax.distributed.initialize`` to join the cluster, then a mesh
whose ``graph``/``data`` axes span all devices — XLA routes collectives
over ICI within a slice and DCN across slices based on the mesh layout
(keep the ``graph`` axis innermost so the per-hop all-to-alls ride ICI;
the outer ``data`` axis only carries the per-step grad psum, which is
DCN-tolerant).

Host-side pattern used by the trainers: every process runs the SAME
deterministic loop (same seeds -> same batch streams), passes full host
arrays, and places device data with :func:`put_global`; batch-sharded
outputs come back through :func:`host_array`, which all-gathers the
process-local shards. Validated end-to-end by the 2-process CPU test in
tests/test_multiprocess.py (Gloo collectives).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def put_global(array, mesh: Mesh, spec: P):
    """Place a full host array onto a (possibly multi-host) mesh.

    Every process passes the SAME complete array; each contributes only
    its addressable shards (jax.make_array_from_callback), so this works
    identically in single- and multi-process settings — the multi-host
    replacement for ``jax.device_put(x, NamedSharding(mesh, spec))``.
    """
    array = np.asarray(array)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        array.shape, sharding, lambda idx: array[idx]
    )


def put_global_rows(shape, dtype, mesh: Mesh, spec: P, row_loader):
    """Row-sharded global placement WITHOUT materializing the full table.

    Unlike :func:`put_global` (every process passes the complete host
    array), each process calls ``row_loader(lo, hi)`` only for the row
    ranges of its own addressable shards — O(rows_per_host) peak host
    memory. This is the per-host loading path for feature tables that
    exceed a single host's RAM (SURVEY §7 stage 7): pair it with
    ``data.io.load_feature_shard`` over a deferred (mmap) on-disk table.
    ``spec`` must shard the leading axis only.
    """
    sharding = NamedSharding(mesh, spec)
    cache: dict = {}

    def cb(idx):
        rows = idx[0]
        lo = rows.start or 0
        hi = rows.stop if rows.stop is not None else shape[0]
        if (lo, hi) not in cache:
            cache[(lo, hi)] = np.asarray(row_loader(lo, hi), dtype=dtype)
        return cache[(lo, hi)][(slice(None),) + tuple(idx[1:])]

    return jax.make_array_from_callback(tuple(shape), sharding, cb)


def replicate_unsharded(tree, mesh: Mesh):
    """Commit every leaf that isn't already mesh-sharded to a replicated
    NamedSharding(mesh, P()). Freshly-initialized params are uncommitted
    (jit moves them freely) but orbax-restored ones come back committed
    to their target leaf's sharding — without this, restored replicated
    params (single device) clash with mesh-sharded leaves inside jit."""
    rep = NamedSharding(mesh, P())

    def place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.spec != P():
            return x  # already row-sharded over the mesh (e.g. embeds)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def host_array(x) -> np.ndarray:
    """Fetch a device array to a full host copy on EVERY process.

    Fully-addressable arrays (single-process, or replicated outputs) are
    a plain transfer; cross-process sharded outputs are all-gathered via
    the distributed runtime.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
