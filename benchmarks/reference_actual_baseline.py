"""Measure the ACTUAL reference implementation's training-step throughput.

Where benchmarks/reference_baseline.py re-enacts the reference's
supervised step, this script runs the reference CODE ITSELF — the same
tf.compat.v1 shim as benchmarks/trace_reference.py imports
/root/reference/graphsage read-only and builds a real
``SupervisedGraphsage`` (supervised_models.py:10-126, models.py
sample/aggregate, neigh_samplers.py UniformNeighborSampler) at the bench
shape (supervised_train.py:32-57 defaults: batch 512, fanout 25/10,
dims 128/128, 602-dim features, 41 classes, softmax head), then times
the reference's own execution mode: per-step feed_dict of ids + labels,
``sess.run([opt_op, loss])`` (supervised_train.py:262-312).

The reference pins tensorflow==1.8.0 + GPU; this environment is TF2-CPU,
so the v1 graph runs on CPU and the result carries that provenance.
Measurement protocol (warmup 3, 20 timed iters, uniform adjacency,
fresh random batch per step) matches reference_baseline.py so the two
numbers are directly comparable.

Updates benchmarks/BASELINE_MEASURED.json: the actual-code rate becomes
the primary ``reference_edges_per_sec`` denominator for bench.py's
``vs_baseline``; the re-enactment's rate is kept alongside as
``reenactment_edges_per_sec``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import tensorflow.compat.v1 as tf

tf.disable_v2_behavior()

# reuse trace_reference's tf.contrib shim + FLAGS + /root/reference path
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import trace_reference  # noqa: F401,E402

FLAGS = tf.app.flags.FLAGS
FLAGS.learning_rate = 0.01
FLAGS.weight_decay = 0.0

NUM_NODES = 100_000
FEAT_DIM = 602
NUM_CLASSES = 41
MAX_DEGREE = 128
BATCH = 512
FANOUTS = (25, 10)  # samples_1, samples_2
DIMS = (128, 128)
WARMUP = 3
ITERS = 20


def main():
    from graphsage.models import SAGEInfo
    from graphsage.neigh_samplers import UniformNeighborSampler
    from graphsage.supervised_models import SupervisedGraphsage

    tf.reset_default_graph()
    tf.set_random_seed(123)
    rng = np.random.default_rng(0)

    feats_np = np.vstack([
        rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
        np.zeros((1, FEAT_DIM), np.float32),
    ])
    adj_np = rng.integers(
        0, NUM_NODES, (NUM_NODES + 1, MAX_DEGREE)
    ).astype(np.int32)
    degrees = np.full((NUM_NODES,), float(MAX_DEGREE))

    ph = {
        "batch": tf.placeholder(tf.int32, shape=(BATCH,), name="batch"),
        "labels": tf.placeholder(tf.float32, shape=(BATCH, NUM_CLASSES),
                                 name="labels"),
        "dropout": tf.placeholder_with_default(np.float32(0.0), [],
                                               name="dropout"),
        "batch_size": tf.placeholder_with_default(np.int32(BATCH), [],
                                                  name="batch_size"),
    }
    adj_info = tf.Variable(tf.constant(adj_np), trainable=False,
                           name="adj_info")
    sampler = UniformNeighborSampler(adj_info)
    # supervised_train.py:163-166: [SAGEInfo(samples_1, dim_1),
    # SAGEInfo(samples_2, dim_2)]
    layer_infos = [
        SAGEInfo("node", sampler, FANOUTS[0], DIMS[0]),
        SAGEInfo("node", sampler, FANOUTS[1], DIMS[1]),
    ]
    model = SupervisedGraphsage(
        NUM_CLASSES, ph, feats_np, adj_info, degrees, layer_infos,
        concat=True, aggregator_type="mean", model_size="small",
        sigmoid_loss=False, identity_dim=0, logging=False,
    )

    sess = tf.Session()
    sess.run(tf.global_variables_initializer())

    labels_pool = np.eye(NUM_CLASSES, dtype=np.float32)[
        rng.integers(0, NUM_CLASSES, (NUM_NODES,))
    ]

    def feed():
        ids = rng.integers(0, NUM_NODES, (BATCH,)).astype(np.int32)
        return {ph["batch"]: ids, ph["labels"]: labels_pool[ids]}

    for _ in range(WARMUP):
        sess.run([model.opt_op, model.loss], feed_dict=feed())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        sess.run([model.opt_op, model.loss], feed_dict=feed())
    dt = (time.perf_counter() - t0) / ITERS

    edges_per_step = BATCH * (FANOUTS[1] + FANOUTS[1] * FANOUTS[0])
    actual_rate = round(edges_per_step / dt, 1)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    prior = {}
    try:
        with open(out_path) as fp:
            prior = json.load(fp)
    except (OSError, ValueError):
        pass

    result = {
        "reference_edges_per_sec": actual_rate,
        "sec_per_step": round(dt, 5),
        "device": "cpu",
        "framework": "tensorflow " + tf.__version__ + " (compat.v1 graph)",
        "source": "actual",
        "provenance": (
            "measured by running the REFERENCE CODE ITSELF "
            "(/root/reference/graphsage SupervisedGraphsage-mean, "
            "supervised_train.py defaults; per-step feed_dict) under "
            "tf.compat.v1 on this machine's CPU; the reference's own "
            "TF1.8-GPU environment is unavailable"
        ),
        "reenactment_edges_per_sec": prior.get("reenactment_edges_per_sec",
                                               prior.get(
                                                   "reference_edges_per_sec"
                                               )),
        "shape": {
            "num_nodes": NUM_NODES, "feat_dim": FEAT_DIM,
            "batch": BATCH, "fanouts": list(FANOUTS),
            "max_degree": MAX_DEGREE, "num_classes": NUM_CLASSES,
        },
    }
    with open(out_path, "w") as fp:
        json.dump(result, fp, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
