"""Minibatch index iteration with pad-and-mask static shapes.

The reference feeds variable-length final batches through feed_dict
(/root/reference/graphsage/minibatch.py:127-135, 302-307), which is fine in
TF1 but breaks fixed-shape jit. Here every batch has the static size B:
short batches are padded with the dummy node index N and carry a float
mask; loss/metric reductions are mask-weighted so the semantics match the
reference's mean-over-actual-batch exactly.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from graphsage_tpu.data.graph import GraphData


@dataclasses.dataclass
class NodeBatch:
    ids: np.ndarray     # [B] int32, padded with dummy index
    labels: np.ndarray  # [B, C] float32
    mask: np.ndarray    # [B] float32, 1 for real entries


@dataclasses.dataclass
class EdgeBatch:
    batch1: np.ndarray  # [B] int32 source node indices
    batch2: np.ndarray  # [B] int32 target/context node indices
    mask: np.ndarray    # [B] float32


class NodeBatcher:
    """Supervised iteration over train nodes; val/test sweeps.

    Train nodes are the non-val/test nodes with positive train degree
    (reference: minibatch.py:209-215).
    """

    def __init__(
        self,
        graph: GraphData,
        deg: np.ndarray,
        batch_size: int,
        seed: int = 123,
    ):
        self.graph = graph
        self.batch_size = batch_size
        self.dummy = graph.num_nodes
        self._rng = np.random.default_rng(seed)

        idx = np.arange(graph.num_nodes)
        self.train_nodes = idx[graph.is_train & (deg > 0)]
        self.val_nodes = idx[graph.is_val]
        self.test_nodes = idx[graph.is_test]

    def num_batches(self) -> int:
        return -(-len(self.train_nodes) // self.batch_size)

    def epoch(self):
        """Yield shuffled NodeBatch's covering the train nodes once."""
        order = self._rng.permutation(self.train_nodes)
        yield from self._batches_of(order)

    def val_batches(self, nodes=None):
        if nodes is None:
            nodes = self.val_nodes
        yield from self._batches_of(nodes)

    def test_batches(self):
        yield from self._batches_of(self.test_nodes)

    def sample_val_batch(self, size: int, pad_to: int | None = None
                         ) -> NodeBatch:
        """Random with-replacement val sample (reference evaluate() path,
        minibatch.py:276-285). ``pad_to`` dummy-pads the batch beyond
        ``size`` (e.g. up to a multiple of the shard count) — padded rows
        carry zero mask, so metrics are unchanged."""
        nodes = self._rng.choice(self.val_nodes, size=size, replace=True)
        return self._make_batch(nodes, max(size, pad_to or 0))

    def all_node_batches(self):
        yield from self._batches_of(np.arange(self.graph.num_nodes))

    def _batches_of(self, nodes: np.ndarray):
        b = self.batch_size
        for start in range(0, len(nodes), b):
            yield self._make_batch(nodes[start:start + b], b)

    def _make_batch(self, nodes: np.ndarray, b: int) -> NodeBatch:
        k = len(nodes)
        ids = np.full((b,), self.dummy, dtype=np.int32)
        ids[:k] = nodes
        labels = np.zeros((b, self.graph.num_classes), dtype=np.float32)
        labels[:k] = self.graph.labels[nodes]
        mask = np.zeros((b,), dtype=np.float32)
        mask[:k] = 1.0
        return NodeBatch(ids=ids, labels=labels, mask=mask)


class EdgeBatcher:
    """Unsupervised iteration over edges or random-walk co-occurrence pairs.

    * training pairs: walk pairs when provided (the reference's
      ``random_context`` default), else the graph's edges — in both cases
      restricted to endpoints with positive train degree. (The reference's
      _remove_isolated at minibatch.py:60-74 intends this; its operator-
      precedence quirk also leaks test-endpoint edges into training in
      raw-edge mode, which we deliberately do not reproduce.)
    * val pairs: the ``train_removed`` edges (minibatch.py:45).
    """

    def __init__(
        self,
        graph: GraphData,
        deg: np.ndarray,
        batch_size: int,
        context_pairs: np.ndarray | None = None,
        seed: int = 123,
        n2v_retrain: bool = False,
        fixed_n2v: bool = False,
    ):
        self.graph = graph
        self.batch_size = batch_size
        self.dummy = graph.num_nodes
        self._rng = np.random.default_rng(seed)

        if context_pairs is not None:
            pairs = np.asarray(context_pairs, dtype=np.int32).reshape(-1, 2)
        else:
            pairs = graph.edges.astype(np.int32)

        if n2v_retrain:
            # n2v test-retrain mode: train on the provided pairs as-is;
            # fixed_n2v restricts contexts to existing (train) nodes
            # (reference minibatch.py:43-50, 56-58).
            if fixed_n2v:
                is_evalnode = graph.is_val | graph.is_test
                keep = ~is_evalnode[pairs[:, 1]]
                pairs = pairs[keep]
            self.train_pairs = pairs
            self.val_pairs = pairs
        else:
            keep = (deg[pairs[:, 0]] > 0) & (deg[pairs[:, 1]] > 0)
            self.train_pairs = pairs[keep]
            self.val_pairs = graph.edges[graph.train_removed].astype(np.int32)

        self.nodes = np.arange(graph.num_nodes, dtype=np.int32)

    def num_batches(self) -> int:
        return -(-len(self.train_pairs) // self.batch_size)

    def epoch(self):
        order = self._rng.permutation(len(self.train_pairs))
        pairs = self.train_pairs[order]
        yield from self._batches_of(pairs)

    def val_batches(self, size: int | None = None):
        if size is None:
            yield from self._batches_of(self.val_pairs)
        else:
            ind = self._rng.permutation(len(self.val_pairs))[:size]
            yield from self._batches_of(self.val_pairs[ind])

    def sample_val_batch(self, size: int) -> EdgeBatch:
        """Random val-edge batch. ``size <= 0`` (the reference's
        validate_batch_size=-1 convention) falls back to one full batch —
        static shapes rule out a truly variable batch here."""
        if size > self.batch_size:
            import warnings

            warnings.warn(
                f"validate_batch_size {size} exceeds batch_size "
                f"{self.batch_size}; validating on {self.batch_size} "
                f"edges (the compiled batch shape). Raise --batch_size "
                f"or use --validate_batch_size -1 for a full sweep.",
                stacklevel=2,
            )
        if size <= 0 or size > self.batch_size:
            size = self.batch_size
        ind = self._rng.permutation(len(self.val_pairs))[
            : min(size, len(self.val_pairs))
        ]
        return self._make_batch(self.val_pairs[ind], self.batch_size)

    def embed_batches(self):
        """(n, n) self-pairs over every node, for embedding export
        (reference minibatch.py:152-157)."""
        selfpairs = np.stack([self.nodes, self.nodes], axis=1)
        yield from self._batches_of(selfpairs)

    def _batches_of(self, pairs: np.ndarray):
        b = self.batch_size
        for start in range(0, len(pairs), b):
            yield self._make_batch(pairs[start:start + b], b)

    def _make_batch(self, pairs: np.ndarray, b: int) -> EdgeBatch:
        k = len(pairs)
        b1 = np.full((b,), self.dummy, dtype=np.int32)
        b2 = np.full((b,), self.dummy, dtype=np.int32)
        mask = np.zeros((b,), dtype=np.float32)
        if k:
            b1[:k] = pairs[:, 0]
            b2[:k] = pairs[:, 1]
        mask[:k] = 1.0
        return EdgeBatch(batch1=b1, batch2=b2, mask=mask)
