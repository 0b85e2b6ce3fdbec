"""Serving throughput: checkpoint-style whole-graph embedding export.

Measures the standalone inference surface (graphsage_tpu/infer.py ->
train/unsupervised.py::make_embed_sweep) on the same Reddit-shaped
zipf workload as the headline training bench (bench.py): 100k nodes,
602-dim features, fanout 25/10, dims 128/128, mean aggregator, fused
inner-hop gather. One dispatch embeds every node (the reference has NO
serving path at all — embeddings exist only as a per-feed-dict loop at
the tail of a training session, unsupervised_train.py:94-117, which on
a remoted TPU would pay one ~40ms tunnel round-trip per 512-node
batch; the sweep pays one).

Metric: embedded nodes/s (and the training-comparable sampled-edges/s:
each node aggregates S2 + S2*S1 sampled neighbor rows). Completion
barrier is a device->host element fetch — block_until_ready returns
early on this runtime (CLAUDE.md hazard). Timing excludes the bulk
device->host copy of the [N, 256] result (tunnel-bandwidth-specific,
not a chip property).

Prints exactly one JSON line. Not the driver headline — bench.py is.

``--predict`` measures the supervised serving path instead
(infer.py::predict -> train/supervised.py::make_eval_sweep: same
pyramid + l2-norm + dense head + per-batch masked loss, the
reference's incremental_evaluate shape, supervised_train.py:91-110).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

import bench  # repo-root headline bench: shared workload + constants

BATCH = bench.BATCH
NUM_NODES = bench.NUM_NODES
TRIALS = 3


def main():
    predict = "--predict" in sys.argv
    metric = ("serving_predict_nodes_per_sec" if predict
              else "serving_embed_nodes_per_sec")

    from benchmarks.tpu_probe import guarded_probe

    res = guarded_probe(150.0)
    if res["status"] != "ok":
        print(json.dumps({
            "metric": metric, "value": 0.0,
            "unit": "nodes/s/chip", "error": res.get("error", res["status"]),
        }), flush=True)
        os._exit(3)

    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.ops.gather import pad_feature_dim

    sage = SAGEConfig(
        layers=(LayerInfo(bench.FANOUTS[0], bench.DIMS[0]),
                LayerInfo(bench.FANOUTS[1], bench.DIMS[1])),
        feature_dim=bench.FEAT_DIM,
        aggregator="mean",
        concat=True,
        fused_gather=True,
        num_nodes=NUM_NODES,
    )

    rng = np.random.default_rng(0)
    features = jnp.asarray(pad_feature_dim(np.vstack([
        rng.standard_normal((NUM_NODES, bench.FEAT_DIM)).astype(np.float32),
        np.zeros((1, bench.FEAT_DIM), dtype=np.float32),
    ])))
    adj = jnp.asarray(bench.zipf_adjacency(rng))

    # infer.py id stream: every node, dummy-padded to whole batches
    n_b = -(-NUM_NODES // BATCH)
    ids_np = np.full((n_b * BATCH,), NUM_NODES, dtype=np.int32)
    ids_np[:NUM_NODES] = np.arange(NUM_NODES)
    ids_all = jnp.asarray(ids_np)
    key = jax.random.key(7)

    if predict:
        from graphsage_tpu.models.supervised import (
            SupervisedConfig,
            init_supervised_params,
        )
        from graphsage_tpu.train.supervised import make_eval_sweep

        config = SupervisedConfig(sage=sage, num_classes=bench.NUM_CLASSES,
                                  sigmoid_loss=False, weight_decay=0.0)
        params = init_supervised_params(jax.random.key(0), config)
        labels_table = np.zeros((NUM_NODES + 1, bench.NUM_CLASSES),
                                np.float32)
        labels_table[np.arange(NUM_NODES),
                     rng.integers(0, bench.NUM_CLASSES, NUM_NODES)] = 1.0
        labels_dev = jnp.asarray(labels_table)
        raw = make_eval_sweep(config, BATCH, NUM_NODES)

        def sweep(p, f, a, ids, k):
            return raw(p, f, a, ids, labels_dev, k)[1]
    else:
        from graphsage_tpu.models.unsupervised import (
            UnsupervisedConfig,
            init_unsupervised_params,
        )
        from graphsage_tpu.train.unsupervised import make_embed_sweep

        config = UnsupervisedConfig(sage=sage)
        params = init_unsupervised_params(jax.random.key(0), config)
        sweep = make_embed_sweep(config, BATCH, NUM_NODES)

    rows = sweep(params, features, adj, ids_all, key)  # compile + warmup
    float(rows[0, 0])

    best_dt = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        rows = sweep(params, features, adj, ids_all, key)
        float(rows[0, 0])
        best_dt = min(best_dt, time.perf_counter() - t0)

    s2, s1 = bench.FANOUTS[1], bench.FANOUTS[0]
    edges_per_node = s2 + s2 * s1  # same count bench.py charges per id
    nodes_per_sec = n_b * BATCH / best_dt
    print(json.dumps({
        "metric": metric,
        "value": round(nodes_per_sec, 1),
        "unit": "nodes/s/chip",
        "edges_per_sec": round(nodes_per_sec * edges_per_node, 1),
        "sweep_s": round(best_dt, 4),
        "n_nodes": NUM_NODES,
        "batch_size": BATCH,
        "graph_dist": "zipf",
        "reference": ("none: the reference has no serving surface "
                      "(embeddings only inside a training session, "
                      "unsupervised_train.py:94-117)"),
    }), flush=True)


if __name__ == "__main__":
    main()
