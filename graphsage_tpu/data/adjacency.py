"""Padded dense adjacency construction.

The device-side sampler consumes a dense [N+1, max_degree] int32 matrix:
row i holds max_degree neighbor indices of node i (resampled with
replacement if deg < max_degree, subsampled without replacement if
deg > max_degree), and row N — the dummy node — points at itself so
zero-degree nodes aggregate the zero feature row. This reproduces the
reference builders (/root/reference/graphsage/minibatch.py:76-108,
227-259) with a vectorized NumPy path and an optional C++ fast path.

Two variants:
  * train adjacency: val/test nodes get all-dummy rows; only non
    ``train_removed`` edges contribute; also returns train degrees.
  * full ("test") adjacency: every node, every edge.
"""

from __future__ import annotations

import numpy as np

from graphsage_tpu.data.graph import GraphData


def build_padded_adj(
    graph: GraphData,
    max_degree: int,
    train: bool,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (adj [N+1, max_degree] int32, deg [N] int32)."""
    if rng is None:
        rng = np.random.default_rng(123)
    neighbors = graph.train_neighbors() if train else graph.neighbors
    n = graph.num_nodes
    return pad_neighbor_lists(neighbors, n, max_degree, rng)


def pad_neighbor_lists(
    neighbors: list,
    n: int,
    max_degree: int,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    deg = np.asarray([len(x) for x in neighbors], dtype=np.int32)
    try:
        from graphsage_tpu.data.native import native_pad_adjacency

        adj = native_pad_adjacency(
            neighbors, n, max_degree, int(rng.integers(0, 2**31 - 1))
        )
        if adj is not None:
            return adj, deg
    except Exception:
        pass
    adj = np.full((n + 1, max_degree), n, dtype=np.int32)
    for i, nbrs in enumerate(neighbors):
        d = len(nbrs)
        if d == 0:
            continue
        if d > max_degree:
            adj[i] = rng.choice(nbrs, size=max_degree, replace=False)
        elif d < max_degree:
            adj[i] = rng.choice(nbrs, size=max_degree, replace=True)
        else:
            adj[i] = nbrs
    return adj, deg


def build_both_adjs(
    graph: GraphData,
    max_degree: int,
    seed: int = 123,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(train_adj, train_deg, full_adj) with one RNG stream, mirroring the
    reference's construct_adj followed by construct_test_adj."""
    rng = np.random.default_rng(seed)
    train_adj, deg = build_padded_adj(graph, max_degree, train=True, rng=rng)
    full_adj, _ = build_padded_adj(graph, max_degree, train=False, rng=rng)
    return train_adj, deg, full_adj
