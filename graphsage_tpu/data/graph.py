"""Immutable host-side graph container.

Replaces the reference's networkx graph + id_map + class_map triple
(/root/reference/graphsage/utils.py:19-75) with flat NumPy arrays indexed
by the id_map ordering, which is what actually feeds the device.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


@dataclasses.dataclass
class GraphData:
    """All host-side graph state, in id_map index order.

    Node index ``num_nodes`` is reserved as the "dummy" node: padded
    adjacency rows point at it and its feature row is all zeros, so that
    aggregating over it contributes nothing (reference behavior:
    minibatch.py:77 + supervised_train.py:133-135).
    """

    node_ids: list          # original node ids (JSON ids), position = index
    id2idx: dict            # original id -> index
    features: np.ndarray | None   # [N, F] float32 (train-normalized), unpadded
    class_map: dict | None        # original id -> int or list[int]
    labels: np.ndarray | None     # [N, C] float32 dense label matrix
    num_classes: int | None
    is_val: np.ndarray      # [N] bool
    is_test: np.ndarray     # [N] bool
    edges: np.ndarray       # [E, 2] int32 undirected edge list (each once)
    train_removed: np.ndarray     # [E] bool — touches a val/test endpoint
    neighbors: list         # list of [deg_i] int32 arrays, full adjacency
    walks: np.ndarray | None = None   # [W, 2] int32 co-occurrence pairs
    # Deferred-feature support (load_data(load_features=False), the
    # per-host shard-loading path — SURVEY §7 stage 7): the feats file's
    # row for each compacted node index, and (path, n_file_rows, dim) of
    # the on-disk table when ``features`` itself was not materialized.
    feat_rows: np.ndarray | None = None
    feature_meta: tuple | None = None
    # the normalize intent load_data was called with — deferred loaders
    # default to it, so a load_data(normalize=False, load_features=False)
    # table is not silently standardized at materialization time
    feature_normalize: bool = True

    @property
    def num_nodes(self) -> int:
        return len(self.node_ids)

    @property
    def feature_dim(self) -> int:
        """Feature width, whether features are in memory or deferred."""
        if self.features is not None:
            return self.features.shape[1]
        if self.feature_meta is not None:
            return self.feature_meta[2]
        return 0

    @property
    def is_train(self) -> np.ndarray:
        return ~(self.is_val | self.is_test)

    def padded_features(self) -> np.ndarray | None:
        """Features with one extra all-zero row for the dummy node."""
        if self.features is None:
            return None
        f = self.features
        return np.vstack([f, np.zeros((1, f.shape[1]), dtype=f.dtype)])

    def train_neighbors(self) -> list:
        """Adjacency restricted to train nodes and non-removed edges."""
        n = self.num_nodes
        keep = ~self.train_removed
        tr_edges = self.edges[keep]
        out: list[list[int]] = [[] for _ in range(n)]
        is_train = self.is_train
        for a, b in tr_edges:
            # construct_adj (minibatch.py:80-85) iterates train nodes only,
            # but non-removed edges have train endpoints by definition.
            out[a].append(b)
            out[b].append(a)
        return [
            np.asarray(out[i] if is_train[i] else [], dtype=np.int32)
            for i in range(n)
        ]

    def labels_for(self, idx: np.ndarray) -> np.ndarray:
        assert self.labels is not None
        return self.labels[idx]


def dense_labels(class_map: dict, node_ids: list, num_classes: int) -> np.ndarray:
    """Vectorize a class_map into a dense [N, C] float32 matrix.

    Multilabel entries (lists) pass through; integer entries become one-hot
    (reference: minibatch.py:217-225).
    """
    n = len(node_ids)
    out = np.zeros((n, num_classes), dtype=np.float32)
    for i, nid in enumerate(node_ids):
        label = class_map[nid]
        if isinstance(label, (list, np.ndarray)):
            out[i] = np.asarray(label, dtype=np.float32)
        else:
            out[i, int(label)] = 1.0
    return out


def infer_num_classes(class_map: dict) -> int:
    """Number of classes: list length for multilabel, distinct count otherwise
    (reference: supervised_train.py:128-131)."""
    first = next(iter(class_map.values()))
    if isinstance(first, (list, np.ndarray)):
        return len(first)
    return len(set(class_map.values()))


def degrees_from_neighbors(neighbors: list) -> np.ndarray:
    return np.asarray([len(x) for x in neighbors], dtype=np.int32)


def validate_graph(g: GraphData) -> None:
    n = g.num_nodes
    assert len(g.neighbors) == n
    assert g.is_val.shape == (n,) and g.is_test.shape == (n,)
    if g.features is not None:
        assert g.features.shape[0] == n
    if g.edges.size:
        assert int(g.edges.max()) < n
    if g.labels is not None:
        assert g.labels.shape == (n, g.num_classes)


def any_to_index(x: Any, id2idx: dict) -> int:
    return id2idx[x] if x in id2idx else int(x)
