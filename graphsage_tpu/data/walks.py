"""Random-walk co-occurrence pair generation.

Host-side equivalent of the reference walk generator
(/root/reference/graphsage/utils.py:77-92): ``num_walks`` walks of length
``walk_len`` from each start node, emitting (start, visited) pairs and
skipping self co-occurrences. A fast C++ path is used when the native
extension is available (see graphsage_tpu/data/native.py).
"""

from __future__ import annotations

import numpy as np

WALK_LEN = 5
N_WALKS = 50


def run_random_walks(
    neighbors: list,
    nodes: np.ndarray,
    num_walks: int = N_WALKS,
    walk_len: int = WALK_LEN,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Return [W, 2] int32 (start, visited) pairs.

    ``neighbors`` is a list of int32 arrays (the adjacency restricted to
    whatever subgraph the caller wants to walk on — the reference walks on
    the train-node subgraph, utils.py:100-102).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    try:
        from graphsage_tpu.data.native import native_random_walks

        pairs = native_random_walks(
            neighbors, np.asarray(nodes, dtype=np.int32), num_walks, walk_len,
            int(rng.integers(0, 2**31 - 1)),
        )
        if pairs is not None:
            return pairs
    except Exception:
        pass
    return _python_random_walks(neighbors, nodes, num_walks, walk_len, rng)


def _python_random_walks(neighbors, nodes, num_walks, walk_len, rng):
    pairs = []
    for node in nodes:
        nbrs = neighbors[node]
        if len(nbrs) == 0:
            continue
        for _ in range(num_walks):
            curr = node
            for _ in range(walk_len):
                curr_nbrs = neighbors[curr]
                if len(curr_nbrs) == 0:
                    break
                nxt = int(curr_nbrs[rng.integers(len(curr_nbrs))])
                if curr != node:
                    pairs.append((node, curr))
                curr = nxt
    return np.asarray(pairs, dtype=np.int32).reshape(-1, 2)


def write_walks(path: str, pairs: np.ndarray, node_ids: list) -> None:
    """Write pairs as the reference's tab-separated walks file
    (utils.py:103-104), using original node ids."""
    with open(path, "w") as fp:
        fp.write(
            "\n".join(
                f"{node_ids[a]}\t{node_ids[b]}" for a, b in pairs
            )
        )


def read_walks(path: str, id2idx: dict) -> np.ndarray:
    """Read a walks file into [W, 2] int32 index pairs (utils.py:70-73)."""
    pairs = []
    sample_key = next(iter(id2idx))
    conv = int if isinstance(sample_key, int) else (lambda x: x)
    with open(path) as fp:
        for line in fp:
            parts = line.split()
            if len(parts) != 2:
                continue
            a, b = conv(parts[0]), conv(parts[1])
            pairs.append((id2idx[a], id2idx[b]))
    return np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
