"""Trace the ACTUAL reference implementation to golden test fixtures.

The environment ships TF 2.x, whose ``tensorflow.compat.v1`` executes the
reference's TF1 graph code unmodified (the only gap is ``tf.contrib``,
shimmed below from compat.v1 equivalents: xavier_initializer ->
glorot_uniform_initializer, l2_regularizer -> inert, and BasicLSTMCell ->
a faithful replica cell for tf.nn.dynamic_rnn, since Keras 3 removed the
original).

This script imports the reference package READ-ONLY from
/root/reference, runs its layers and full models forward/backward on
small deterministic inputs, and saves every input, variable value,
activation, gradient, and post-Adam-step variable to
``tests/fixtures/reference_traced.npz``. ``tests/test_reference_traced.py``
then pins this framework's math to those values WITHOUT needing TF at
test time — the "per-layer allclose vs reference activations" parity bar
from SURVEY.md §4 / BASELINE.json.

Determinism: full-model traces use a graph whose padded adjacency rows
are constant (every slot of row i holds the same neighbor), so the
reference's shuffle-based UniformNeighborSampler (neigh_samplers.py:26-28)
produces a deterministic sample multiset that our ``first_k`` sampler
reproduces exactly; the unsupervised negative sampler
(models.py:336-343) is monkeypatched to fixed ids. Aggregator-level
traces inject (self_vecs, neigh_vecs) directly, covering the
multi-neighbor math the constant rows cannot.

Usage: python benchmarks/trace_reference.py  (writes the .npz; commit it)
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

import tensorflow.compat.v1 as tf

tf.disable_v2_behavior()

# --- tf.contrib shim (TF2 removed contrib; these are the same kernels) --
from tensorflow.python.keras.layers.legacy_rnn.rnn_cell_impl import (  # noqa: E402
    LSTMStateTuple,
    RNNCell,
)


class _BasicLSTMCell(RNNCell):
    """Faithful TF1.8 BasicLSTMCell replica for tf.nn.dynamic_rnn —
    Keras 3 removed the original. Same math: fused [x,h]@kernel+bias,
    gate order i,j,f,o, forget_bias added to f pre-sigmoid, state (c,h)."""

    def __init__(self, num_units, forget_bias=1.0, name="basic_lstm_cell"):
        super().__init__(name=name)
        self._num_units = num_units
        self._forget_bias = forget_bias

    @property
    def state_size(self):
        return LSTMStateTuple(self._num_units, self._num_units)

    @property
    def output_size(self):
        return self._num_units

    def build(self, inputs_shape):
        d = int(inputs_shape[-1])
        self._kernel = self.add_weight(
            "kernel", shape=[d + self._num_units, 4 * self._num_units]
        )
        self._bias = self.add_weight(
            "bias", shape=[4 * self._num_units],
            initializer=tf.zeros_initializer(),
        )
        self.built = True

    def call(self, inputs, state):
        c, h = state
        gates = (
            tf.matmul(tf.concat([inputs, h], 1), self._kernel) + self._bias
        )
        i, j, f, o = tf.split(gates, 4, axis=1)
        new_c = (
            c * tf.sigmoid(f + self._forget_bias)
            + tf.sigmoid(i) * tf.tanh(j)
        )
        new_h = tf.tanh(new_c) * tf.sigmoid(o)
        return new_h, LSTMStateTuple(new_c, new_h)


tf.contrib = types.SimpleNamespace(
    layers=types.SimpleNamespace(
        xavier_initializer=tf.glorot_uniform_initializer,
        l2_regularizer=lambda scale: None,  # reference never adds the
        # REGULARIZATION_LOSSES collection to any loss; weight decay is
        # manual in _loss (supervised_models.py:103-108, models.py:386-388)
    ),
    rnn=types.SimpleNamespace(BasicLSTMCell=_BasicLSTMCell),
)
sys.modules["tensorflow"] = tf
sys.path.insert(0, "/root/reference")

flags = tf.app.flags
flags.DEFINE_float("learning_rate", 0.01, "")
flags.DEFINE_float("weight_decay", 0.0, "")
flags.DEFINE_integer("neg_sample_size", 4, "")
FLAGS = flags.FLAGS
FLAGS(["trace_reference"])

OUT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "reference_traced.npz",
)

store: dict[str, np.ndarray] = {}


def put(case: str, name: str, value):
    store[f"{case}/{name}"] = np.asarray(value)


def _sq_loss(t):
    return 0.5 * tf.reduce_sum(t * t)


def _dense_grads(loss, tensors):
    """tf.gradients with IndexedSlices (embedding-lookup grads) densified
    so they fetch as plain arrays."""
    return [
        tf.convert_to_tensor(g) if g is not None else None
        for g in tf.gradients(loss, tensors)
    ]


# ---------------------------------------------------------------------
# A. Aggregator-level traces: inject (self_vecs, neigh_vecs) directly
#    (reference aggregators.py classes; act=relu as in non-last layers)
# ---------------------------------------------------------------------

def trace_aggregators():
    from graphsage.aggregators import (
        GCNAggregator,
        MaxPoolingAggregator,
        MeanAggregator,
        MeanPoolingAggregator,
        SeqAggregator,
        TwoMaxLayerPoolingAggregator,
    )

    B, S, DIN, DOUT = 5, 4, 8, 6
    rng = np.random.default_rng(42)
    self_np = rng.standard_normal((B, DIN)).astype(np.float32)
    neigh_np = rng.standard_normal((B, S, DIN)).astype(np.float32)
    # zero rows for the seq length-masking trick (aggregators.py:411-414):
    # lengths 4, 2, 1, 0(clamped to 1), 3
    neigh_np[1, 2:] = 0.0
    neigh_np[2, 1:] = 0.0
    neigh_np[3, :] = 0.0
    neigh_np[4, 3:] = 0.0

    cases = [
        ("agg_mean_concat", MeanAggregator, dict(concat=True)),
        ("agg_mean_add", MeanAggregator, dict(concat=False)),
        ("agg_gcn", GCNAggregator, dict(concat=False)),
        ("agg_maxpool", MaxPoolingAggregator, dict(concat=True)),
        ("agg_meanpool", MeanPoolingAggregator, dict(concat=True)),
        ("agg_twomaxpool", TwoMaxLayerPoolingAggregator, dict(concat=True)),
        ("agg_seq", SeqAggregator, dict(concat=True)),
        # model_size="big" pins the 1024 pool-MLP / 512,1024 two-layer /
        # 256 LSTM hidden dims (aggregators.py:139-150, 296-315, 386-389)
        ("agg_maxpool_big", MaxPoolingAggregator,
         dict(concat=True, model_size="big")),
        ("agg_twomaxpool_big", TwoMaxLayerPoolingAggregator,
         dict(concat=True, model_size="big")),
        ("agg_seq_big", SeqAggregator, dict(concat=True,
                                            model_size="big")),
    ]
    for case, cls, kw in cases:
        tf.reset_default_graph()
        tf.set_random_seed(123)
        kw = dict(kw)
        model_size = kw.pop("model_size", "small")
        agg = cls(DIN, DOUT, model_size=model_size, **kw)
        sv = tf.constant(self_np)
        nv = tf.constant(neigh_np)
        out = agg((sv, nv))
        # deterministic ordering for vars + grads
        var_items = sorted(agg.vars.items())
        mlp_vars = []
        for i, dense in enumerate(getattr(agg, "mlp_layers", [])):
            for k in sorted(dense.vars):
                mlp_vars.append((f"mlp{i}_{k}", dense.vars[k]))
        cell_vars = []
        if cls is SeqAggregator:
            for v in tf.trainable_variables():
                if "basic_lstm_cell" in v.name:
                    key = "lstm_" + v.name.split("/")[-1].split(":")[0]
                    cell_vars.append((key, v))
        all_vars = var_items + mlp_vars + cell_vars
        loss = _sq_loss(out)
        grads = tf.gradients(loss, [sv, nv] + [v for _, v in all_vars])
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            out_v, grads_v = sess.run([out, grads])
            vals = sess.run([v for _, v in all_vars])
        put(case, "self_vecs", self_np)
        put(case, "neigh_vecs", neigh_np)
        put(case, "out", out_v)
        put(case, "grad_self", grads_v[0])
        put(case, "grad_neigh", grads_v[1])
        for (k, _), val, g in zip(all_vars, vals, grads_v[2:]):
            put(case, f"var_{k}", val)
            put(case, f"grad_{k}", g)
        print(f"{case}: out {out_v.shape}, {len(all_vars)} vars")


# ---------------------------------------------------------------------
# B. Dense layer (reference layers.py:73-116)
# ---------------------------------------------------------------------

def trace_dense():
    from graphsage.layers import Dense

    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((5, 8)).astype(np.float32)
    tf.reset_default_graph()
    tf.set_random_seed(123)
    layer = Dense(8, 6)  # relu + bias defaults
    x = tf.constant(x_np)
    out = layer(x)
    loss = _sq_loss(out)
    grads = tf.gradients(loss, [x, layer.vars["weights"], layer.vars["bias"]])
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        out_v, g_v, w_v, b_v = sess.run(
            [out, grads, layer.vars["weights"], layer.vars["bias"]]
        )
    case = "dense"
    put(case, "x", x_np)
    put(case, "out", out_v)
    put(case, "var_weights", w_v)
    put(case, "var_bias", b_v)
    put(case, "grad_x", g_v[0])
    put(case, "grad_weights", g_v[1])
    put(case, "grad_bias", g_v[2])
    print(f"{case}: out {out_v.shape}")


# ---------------------------------------------------------------------
# C. BipartiteEdgePredLayer (reference prediction.py:12-128)
# ---------------------------------------------------------------------

def trace_prediction():
    from graphsage.prediction import BipartiteEdgePredLayer

    B, NN, D = 5, 7, 6
    rng = np.random.default_rng(11)
    u1_np = rng.standard_normal((B, D)).astype(np.float32)
    u2_np = rng.standard_normal((B, D)).astype(np.float32)
    ng_np = rng.standard_normal((NN, D)).astype(np.float32)

    cases = [
        ("pred_xent", dict(loss_fn="xent")),
        ("pred_xent_w2", dict(loss_fn="xent", neg_sample_weights=2.0)),
        ("pred_skipgram", dict(loss_fn="skipgram")),
        ("pred_hinge", dict(loss_fn="hinge")),
        ("pred_bilinear", dict(loss_fn="xent", bilinear_weights=True)),
    ]
    for case, kw in cases:
        tf.reset_default_graph()
        tf.set_random_seed(123)
        layer = BipartiteEdgePredLayer(D, D, {"dropout": 0.0}, **kw)
        u1, u2, ng = tf.constant(u1_np), tf.constant(u2_np), tf.constant(ng_np)
        aff = layer.affinity(u1, u2)
        neg_aff = layer.neg_cost(u1, ng)
        loss = layer.loss(u1, u2, ng)
        grads = tf.gradients(loss, [u1, u2, ng])
        fetches = [aff, neg_aff, loss, grads]
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            aff_v, neg_v, loss_v, g_v = sess.run(fetches)
            wv = (
                sess.run(layer.vars["weights"])
                if kw.get("bilinear_weights") else None
            )
        put(case, "inputs1", u1_np)
        put(case, "inputs2", u2_np)
        put(case, "neg", ng_np)
        put(case, "aff", aff_v)
        put(case, "neg_aff", neg_v)
        put(case, "loss", loss_v)
        put(case, "grad_inputs1", g_v[0])
        put(case, "grad_inputs2", g_v[1])
        put(case, "grad_neg", g_v[2])
        if wv is not None:
            put(case, "var_weights", wv)
        print(f"{case}: loss {loss_v:.6f}")


# ---------------------------------------------------------------------
# D/E. Full models on a constant-row graph (deterministic sampling)
# ---------------------------------------------------------------------

N, F, C, MAXDEG = 12, 8, 5, 6
FANOUTS = (3, 2)  # layer_infos order; sample() expands reversed
DIMS = (6, 6)
BATCH = np.array([0, 3, 5, 7, 8, 11], dtype=np.int32)


def _graph_fixture():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((N + 1, F)).astype(np.float32)
    feats[N] = 0.0  # dummy row
    adj = np.zeros((N + 1, MAXDEG), dtype=np.int32)
    for i in range(N):
        adj[i, :] = (i * 5 + 3) % N  # constant row -> deterministic samples
    adj[N, :] = N
    degrees = np.full((N,), float(MAXDEG))
    return feats, adj, degrees


def _placeholders(supervised: bool):
    ph = {
        "dropout": tf.placeholder_with_default(np.float32(0.0), []),
        "batch_size": tf.placeholder_with_default(
            np.int32(len(BATCH)), []
        ),
    }
    if supervised:
        ph["batch"] = tf.placeholder(tf.int32, [None], name="batch")
        ph["labels"] = tf.placeholder(tf.float32, [None, C], name="labels")
    else:
        ph["batch1"] = tf.placeholder(tf.int32, [None], name="batch1")
        ph["batch2"] = tf.placeholder(tf.int32, [None], name="batch2")
    return ph


def _layer_infos(adj_var, n_layers: int = 2):
    from graphsage.models import SAGEInfo
    from graphsage.neigh_samplers import UniformNeighborSampler

    sampler = UniformNeighborSampler(adj_var)
    fanouts = FANOUTS + (2,) * (n_layers - len(FANOUTS))
    dims = DIMS + (6,) * (n_layers - len(DIMS))
    return [
        SAGEInfo("node", sampler, fanouts[i], dims[i])
        for i in range(n_layers)
    ]


def _collect_model_vars(model, identity: bool):
    """[(key, tf_var)] in a deterministic order mirroring our pytree."""
    pairs = []
    for li, agg in enumerate(model.aggregators):
        for k in sorted(agg.vars):
            pairs.append((f"agg{li}_{k}", agg.vars[k]))
        for mi, dense in enumerate(getattr(agg, "mlp_layers", [])):
            for k in sorted(dense.vars):
                pairs.append((f"agg{li}_mlp{mi}_{k}", dense.vars[k]))
        prefix = agg.name + "/"
        for v in tf.trainable_variables():
            if v.name.startswith(prefix) and "basic_lstm_cell" in v.name:
                k = "lstm_" + v.name.split("/")[-1].split(":")[0]
                pairs.append((f"agg{li}_{k}", v))
    if hasattr(model, "node_pred"):
        for k in sorted(model.node_pred.vars):
            pairs.append((f"head_{k}", model.node_pred.vars[k]))
    if identity:
        pairs.append(("embeds", model.embeds))
    return pairs


def trace_supervised():
    from graphsage.supervised_models import SupervisedGraphsage

    feats, adj, degrees = _graph_fixture()
    rng = np.random.default_rng(17)
    labels_soft = np.eye(C, dtype=np.float32)[
        rng.integers(0, C, len(BATCH))
    ]
    labels_sig = (rng.random((len(BATCH), C)) > 0.6).astype(np.float32)

    cases = [
        ("sup_mean_softmax", "mean", True, False, 0.0, 0),
        ("sup_mean_sigmoid", "mean", True, True, 0.0, 0),
        ("sup_mean_wd", "mean", True, False, 0.01, 0),
        ("sup_gcn", "gcn", False, False, 0.0, 0),
        ("sup_maxpool", "maxpool", True, True, 0.0, 0),
        ("sup_meanpool", "meanpool", True, False, 0.0, 0),
        ("sup_seq", "seq", True, False, 0.0, 0),
        ("sup_identity", "mean", True, False, 0.0, 3),
        # the --samples_3 deeper pyramid (supervised_train.py:153-156):
        # 3 hop levels exercise the aggregate() double loop differently
        ("sup_mean_3layer", "mean", True, False, 0.0, 0),
    ]
    for case, agg_type, concat, sigmoid, wd, id_dim in cases:
        n_layers = 3 if case == "sup_mean_3layer" else 2
        tf.reset_default_graph()
        tf.set_random_seed(123)
        FLAGS.weight_decay = wd
        FLAGS.learning_rate = 0.01
        ph = _placeholders(supervised=True)
        adj_var = tf.Variable(tf.constant(adj), trainable=False)
        model = SupervisedGraphsage(
            C, ph, feats[:, :F], adj_var, degrees,
            _layer_infos(adj_var, n_layers), concat=concat,
            aggregator_type=agg_type, model_size="small",
            sigmoid_loss=sigmoid, identity_dim=id_dim,
        )
        labels = labels_sig if sigmoid else labels_soft
        feed = {ph["batch"]: BATCH, ph["labels"]: labels}
        pairs = _collect_model_vars(model, identity=id_dim > 0)
        grads = _dense_grads(model.loss, [v for _, v in pairs])
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            vals = sess.run([v for _, v in pairs])
            outs, preds, loss_v, g_v = sess.run(
                [model.outputs1, model.node_preds, model.loss, grads],
                feed_dict=feed,
            )
            sess.run(model.opt_op, feed_dict=feed)  # clip ±5 + Adam
            post = sess.run([v for _, v in pairs])
        put(case, "labels", labels)
        put(case, "outputs1", outs)
        put(case, "logits", preds)
        put(case, "loss", loss_v)
        for (k, _), val, g, pv in zip(pairs, vals, g_v, post):
            put(case, f"var_{k}", val)
            put(case, f"grad_{k}", g)
            put(case, f"post_{k}", pv)
        print(f"{case}: loss {loss_v:.6f}, {len(pairs)} vars")


def trace_unsupervised():
    from graphsage import models as ref_models

    feats, adj, degrees = _graph_fixture()
    B = len(BATCH)
    batch2 = np.array([4, 1, 9, 2, 6, 10], dtype=np.int32)
    # negatives disjoint from batch2: a negative equal to batch2[i] makes
    # neg_aff[i,k] an EXACT tie with aff[i], and the tie resolves by
    # reduction-order ulps (matmul vs reduce_sum), not semantics
    fixed_negs = np.array([0, 3, 7, 11], dtype=np.int64)

    tf.reset_default_graph()
    tf.set_random_seed(123)
    FLAGS.weight_decay = 0.0
    FLAGS.learning_rate = 0.01
    FLAGS.neg_sample_size = len(fixed_negs)

    orig_sampler = tf.nn.fixed_unigram_candidate_sampler
    tf.nn.fixed_unigram_candidate_sampler = lambda **kw: (
        tf.constant(fixed_negs),
        tf.zeros([B, 1]),
        tf.zeros([len(fixed_negs)]),
    )
    try:
        ph = _placeholders(supervised=False)
        adj_var = tf.Variable(tf.constant(adj), trainable=False)
        model = ref_models.SampleAndAggregate(
            ph, feats[:, :F], adj_var, degrees, _layer_infos(adj_var),
            concat=True, aggregator_type="mean", model_size="small",
        )
    finally:
        tf.nn.fixed_unigram_candidate_sampler = orig_sampler

    feed = {ph["batch1"]: BATCH, ph["batch2"]: batch2}
    pairs = _collect_model_vars(model, identity=False)
    grads = _dense_grads(model.loss, [v for _, v in pairs])
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        vals = sess.run([v for _, v in pairs])
        o1, o2, ng, loss_v, mrr_v, ranks_v, g_v = sess.run(
            [model.outputs1, model.outputs2, model.neg_outputs,
             model.loss, model.mrr, model.ranks, grads],
            feed_dict=feed,
        )
        sess.run(model.opt_op, feed_dict=feed)
        post = sess.run([v for _, v in pairs])
    case = "unsup_mean"
    put(case, "batch2", batch2)
    put(case, "neg_ids", fixed_negs.astype(np.int32))
    put(case, "outputs1", o1)
    put(case, "outputs2", o2)
    put(case, "neg_outputs", ng)
    put(case, "loss", loss_v)
    put(case, "mrr", mrr_v)
    put(case, "ranks", ranks_v)
    for (k, _), val, g, pv in zip(pairs, vals, g_v, post):
        put(case, f"var_{k}", val)
        put(case, f"grad_{k}", g)
        put(case, f"post_{k}", pv)
    print(f"{case}: loss {loss_v:.6f}, mrr {mrr_v:.4f}")


def trace_node2vec():
    from graphsage import models as ref_models

    B = len(BATCH)
    batch2 = np.array([4, 1, 9, 2, 6, 10], dtype=np.int32)
    fixed_negs = np.array([0, 3, 7], dtype=np.int64)  # unique=True;
    # disjoint from batch2 (exact-tie ulp hazard, see trace_unsupervised)

    tf.reset_default_graph()
    tf.set_random_seed(123)
    FLAGS.neg_sample_size = len(fixed_negs)

    orig_sampler = tf.nn.fixed_unigram_candidate_sampler
    tf.nn.fixed_unigram_candidate_sampler = lambda **kw: (
        tf.constant(fixed_negs),
        tf.zeros([B, 1]),
        tf.zeros([len(fixed_negs)]),
    )
    try:
        ph = _placeholders(supervised=False)
        model = ref_models.Node2VecModel(
            ph, N + 1, np.full((N,), float(MAXDEG)), nodevec_dim=8,
            lr=0.5,
        )
    finally:
        tf.nn.fixed_unigram_candidate_sampler = orig_sampler

    feed = {ph["batch1"]: BATCH, ph["batch2"]: batch2}
    pairs = [("target", model.target_embeds),
             ("context", model.context_embeds),
             ("bias", model.context_bias)]
    grads = _dense_grads(model.loss, [v for _, v in pairs])
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        vals = sess.run([v for _, v in pairs])
        loss_v, mrr_v, ranks_v, g_v = sess.run(
            [model.loss, model.mrr, model.ranks, grads], feed_dict=feed
        )
        sess.run(model.opt_op, feed_dict=feed)  # plain SGD lr=0.5
        post = sess.run([v for _, v in pairs])
    case = "n2v"
    put(case, "batch2", batch2)
    put(case, "neg_ids", fixed_negs.astype(np.int32))
    put(case, "loss", loss_v)
    put(case, "mrr", mrr_v)
    put(case, "ranks", ranks_v)
    for (k, _), val, g, pv in zip(pairs, vals, g_v, post):
        put(case, f"var_{k}", val)
        put(case, f"grad_{k}", g)
        put(case, f"post_{k}", pv)
    print(f"{case}: loss {loss_v:.6f}, mrr {mrr_v:.4f}")


def trace_trajectory():
    """Multi-step Adam TRAINING TRAJECTORIES for the pooled/seq
    aggregators (the rows where end-to-end seed variance is largest —
    benchmarks/REFERENCE_PARITY.md): T=8 optimizer steps alternating two
    batches, so from step 2 on every forward/backward runs on params the
    previous steps evolved. Extends the 1-step Adam parity of
    trace_supervised into a genuine trajectory oracle: per-step losses
    plus the final variables after all T clip±5+Adam updates
    (supervised_models.py:94-100).

    NB: on the constant-row graph fixture every sampled neighbor of a
    node is identical, so max-pool == mean-pool exactly (and max's
    tie-splitting gradient == mean's 1/S): the maxpool/meanpool
    trajectories pin the shared MLP/combine/optimizer math through
    time, while the max-vs-mean REDUCE semantics stay pinned by the
    section-A aggregator traces, whose injected neighbors vary."""
    from graphsage.supervised_models import SupervisedGraphsage

    feats, adj, degrees = _graph_fixture()
    rng = np.random.default_rng(29)
    batch_b = np.array([1, 2, 4, 6, 9, 10], dtype=np.int32)
    labels_a = np.eye(C, dtype=np.float32)[rng.integers(0, C, len(BATCH))]
    labels_b = np.eye(C, dtype=np.float32)[rng.integers(0, C, len(batch_b))]
    T = 8
    for case, agg_type in [("traj_meanpool", "meanpool"),
                           ("traj_maxpool", "maxpool"),
                           ("traj_seq", "seq")]:
        tf.reset_default_graph()
        tf.set_random_seed(123)
        FLAGS.weight_decay = 0.0
        FLAGS.learning_rate = 0.01
        ph = _placeholders(supervised=True)
        adj_var = tf.Variable(tf.constant(adj), trainable=False)
        model = SupervisedGraphsage(
            C, ph, feats[:, :F], adj_var, degrees,
            _layer_infos(adj_var, 2), concat=True,
            aggregator_type=agg_type, model_size="small",
            sigmoid_loss=False, identity_dim=0,
        )
        pairs = _collect_model_vars(model, identity=False)
        losses = []
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            vals = sess.run([v for _, v in pairs])
            for t in range(T):
                ids = BATCH if t % 2 == 0 else batch_b
                lab = labels_a if t % 2 == 0 else labels_b
                feed = {ph["batch"]: ids, ph["labels"]: lab}
                # loss fetches the PRE-update value within the same run
                lv, _ = sess.run([model.loss, model.opt_op],
                                 feed_dict=feed)
                losses.append(lv)
            post = sess.run([v for _, v in pairs])
        put(case, "batch_b", batch_b)
        put(case, "labels_a", labels_a)
        put(case, "labels_b", labels_b)
        put(case, "losses", np.asarray(losses, np.float32))
        for (k, _), val, pv in zip(pairs, vals, post):
            put(case, f"var_{k}", val)
            put(case, f"post_{k}", pv)
        print(f"{case}: {T}-step losses {losses[0]:.6f} -> {losses[-1]:.6f}")


def main():
    trace_aggregators()
    trace_dense()
    trace_prediction()
    trace_supervised()
    trace_unsupervised()
    trace_node2vec()
    trace_trajectory()
    feats, adj, degrees = _graph_fixture()
    put("graph", "features", feats)
    put("graph", "adj", adj)
    put("graph", "degrees", degrees)
    put("graph", "batch", BATCH)
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    np.savez_compressed(OUT_PATH, **store)
    size = os.path.getsize(OUT_PATH) / 1e6
    print(f"wrote {OUT_PATH} ({size:.2f} MB, {len(store)} arrays)")


if __name__ == "__main__":
    main()
