"""Measure the REFERENCE implementation's training-step throughput.

A tf.compat.v1 re-enactment (not a copy) of the reference's supervised
GraphSAGE-mean graph and session loop at the bench shape
(/root/reference/graphsage/supervised_train.py:32-57 defaults): batch
512, fanout 25/10, dims 128/128, 602-dim features, 41 classes, dense
padded adjacency as device Variables, per-step feed_dict of indices +
labels, sess.run([opt, loss]) — the same host<->device-every-minibatch
structure the reference has (supervised_train.py:262-312, models.py
sample/aggregate).

The reference pins tensorflow==1.8.0 + GPU; this environment has
TF2-CPU, so the measurement runs the v1 graph on CPU and the result is
recorded with that provenance. bench.py divides by this number for
``vs_baseline`` (a MEASURED denominator, replacing round 1's estimate).

Writes benchmarks/BASELINE_MEASURED.json and prints it.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

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
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    tf.set_random_seed(123)
    rng = np.random.default_rng(0)

    feats_np = np.vstack([
        rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
        np.zeros((1, FEAT_DIM), np.float32),
    ])
    adj_np = rng.integers(
        0, NUM_NODES, (NUM_NODES + 1, MAX_DEGREE)
    ).astype(np.int32)

    features = tf.Variable(tf.constant(feats_np), trainable=False)
    adj_info = tf.Variable(tf.constant(adj_np), trainable=False)

    ids_ph = tf.placeholder(tf.int32, shape=(BATCH,))
    labels_ph = tf.placeholder(tf.float32, shape=(BATCH, NUM_CLASSES))

    def glorot(shape):
        rng_ = np.sqrt(6.0 / (shape[0] + shape[1]))
        return tf.Variable(
            tf.random_uniform(shape, minval=-rng_, maxval=rng_)
        )

    def uniform_sample(ids, num_samples):
        # reference UniformNeighborSampler semantics
        # (neigh_samplers.py:26-28): gather adj rows, shuffle the
        # transposed matrix (shared column permutation), slice first k
        rows = tf.nn.embedding_lookup(adj_info, ids)
        rows = tf.transpose(tf.random_shuffle(tf.transpose(rows)))
        return tf.slice(rows, [0, 0], [-1, num_samples])

    # sample pyramid (models.py:254-275)
    s1 = ids_ph                                        # [B]
    s2 = tf.reshape(uniform_sample(s1, FANOUTS[1]), [-1])   # [B*10]
    s3 = tf.reshape(uniform_sample(s2, FANOUTS[0]), [-1])   # [B*250]

    h1 = tf.nn.embedding_lookup(features, s1)
    h2 = tf.nn.embedding_lookup(features, s2)
    h3 = tf.nn.embedding_lookup(features, s3)

    # layer-0 mean aggregator (aggregators.py:6-64), concat=True
    w_self0 = glorot((FEAT_DIM, DIMS[0]))
    w_neigh0 = glorot((FEAT_DIM, DIMS[0]))

    def agg0(self_vecs, neigh_vecs):
        means = tf.reduce_mean(neigh_vecs, axis=1)
        return tf.nn.relu(tf.concat(
            [tf.matmul(self_vecs, w_self0), tf.matmul(means, w_neigh0)],
            axis=1,
        ))

    a2 = agg0(h2, tf.reshape(h3, [BATCH * FANOUTS[1], FANOUTS[0],
                                  FEAT_DIM]))
    a1 = agg0(h1, tf.reshape(h2, [BATCH, FANOUTS[1], FEAT_DIM]))

    # layer-1 mean aggregator on 2*dim inputs, identity activation
    w_self1 = glorot((2 * DIMS[0], DIMS[1]))
    w_neigh1 = glorot((2 * DIMS[0], DIMS[1]))
    means1 = tf.reduce_mean(
        tf.reshape(a2, [BATCH, FANOUTS[1], 2 * DIMS[0]]), axis=1
    )
    out = tf.concat(
        [tf.matmul(a1, w_self1), tf.matmul(means1, w_neigh1)], axis=1
    )
    out = tf.nn.l2_normalize(out, 1)

    # dense head + softmax loss (supervised_models.py:88-118)
    w_head = glorot((2 * DIMS[1], NUM_CLASSES))
    b_head = tf.Variable(tf.zeros([NUM_CLASSES]))
    logits = tf.matmul(out, w_head) + b_head
    loss = tf.reduce_mean(
        tf.nn.softmax_cross_entropy_with_logits_v2(
            labels=labels_ph, logits=logits
        )
    )
    opt = tf.train.AdamOptimizer(0.01)
    gvs = opt.compute_gradients(loss)
    clipped = [
        (tf.clip_by_value(g, -5.0, 5.0) if g is not None else None, v)
        for g, v in gvs
    ]
    opt_op = opt.apply_gradients(clipped)

    sess = tf.Session()
    sess.run(tf.global_variables_initializer())

    labels_pool = np.eye(NUM_CLASSES, dtype=np.float32)[
        rng.integers(0, NUM_CLASSES, (NUM_NODES,))
    ]

    def feed():
        ids = rng.integers(0, NUM_NODES, (BATCH,)).astype(np.int32)
        return {ids_ph: ids, labels_ph: labels_pool[ids]}

    for _ in range(WARMUP):
        sess.run([opt_op, loss], feed_dict=feed())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        sess.run([opt_op, loss], feed_dict=feed())
    dt = (time.perf_counter() - t0) / ITERS

    edges_per_step = BATCH * (FANOUTS[1] + FANOUTS[1] * FANOUTS[0])
    rate = round(edges_per_step / dt, 1)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    # The ACTUAL reference code's rate (reference_actual_baseline.py) is
    # the primary vs_baseline denominator; this re-enactment is the
    # conservative secondary. Never clobber the primary if it exists.
    prior = {}
    try:
        with open(out_path) as fp:
            prior = json.load(fp)
    except (OSError, ValueError):
        pass
    reenact_prov = (
        "measured tf.compat.v1 re-enactment of the reference "
        "supervised GraphSAGE-mean step (supervised_train.py "
        "defaults; per-step feed_dict) on this machine's CPU; the "
        "reference's own TF1.8-GPU environment is unavailable"
    )
    shape = {
        "num_nodes": NUM_NODES, "feat_dim": FEAT_DIM,
        "batch": BATCH, "fanouts": list(FANOUTS),
        "max_degree": MAX_DEGREE, "num_classes": NUM_CLASSES,
    }
    # Key the primary-vs-secondary decision on the structured "source"
    # field (written by reference_actual_baseline.py), not on free-text
    # provenance — rewording the provenance string must never demote
    # the actual-code denominator back to the re-enactment rate.
    # Legacy substring check kept only for files written before the
    # field existed.
    is_actual = (prior.get("source") == "actual"
                 or "REFERENCE CODE ITSELF" in prior.get("provenance", ""))
    if is_actual:
        result = {**prior, "source": "actual",
                  "reenactment_edges_per_sec": rate,
                  "reenactment_sec_per_step": round(dt, 5)}
    else:
        result = {
            "reference_edges_per_sec": rate,
            "sec_per_step": round(dt, 5),
            "device": "cpu",
            "framework": "tensorflow " + tf.__version__
            + " (compat.v1 graph)",
            "source": "reenactment",
            "provenance": reenact_prov,
            "reenactment_edges_per_sec": rate,
            "shape": shape,
        }
    with open(out_path, "w") as fp:
        json.dump(result, fp, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
