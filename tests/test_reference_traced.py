"""Parity vs the ACTUAL reference implementation's traced numbers.

``tests/fixtures/reference_traced.npz`` holds inputs, variable values,
activations, gradients, and post-Adam-step variables captured by running
the reference TF1 code itself (under tf.compat.v1) on small
deterministic fixtures — see benchmarks/trace_reference.py for how. The
tests here load our implementation with the reference's exact weights
and assert allclose on every output, loss, gradient, and the one-step
Adam parameter trajectory: the "per-layer allclose vs TF1 activations"
parity bar from SURVEY.md §4 / BASELINE.json, previously approximated by
the NumPy golden mirror (tests/test_golden.py).

Optimizer note: TF1 AdamOptimizer and optax.adam differ only in epsilon
placement (TF adds eps to sqrt(v) pre-bias-correction; optax to
sqrt(v_hat)) — identical trajectories except where |grad| approaches
eps/sqrt(1-b2) ≈ 3e-7. The post-step tests therefore check (a) the
reference's trajectory against a TF-formula Adam step driven by OUR
gradients (tight, validates grads + ±5 clip end-to-end) and (b) our
optax step against the reference's within the documented eps bound.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIX_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "reference_traced.npz"
)
FIX = np.load(FIX_PATH)


def g(case, name):
    return FIX[f"{case}/{name}"]


def has(case, name):
    return f"{case}/{name}" in FIX.files


def close(a, b, atol=1e-5, rtol=1e-5, what=""):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=atol, rtol=rtol, err_msg=what
    )


# ---------------------------------------------------------------- utils

AGG_VAR_MAP = {  # TF vars dict key -> our param key
    "neigh_weights": "neigh_w",
    "self_weights": "self_w",
    "weights": "w",
    "bias": "b",
}


def agg_params_from(getter, agg_name):
    """Build our aggregator param pytree from traced reference vars."""
    p = {}
    if agg_name == "gcn":
        p["w"] = jnp.asarray(getter("weights"))
        return p
    p["neigh_w"] = jnp.asarray(getter("neigh_weights"))
    p["self_w"] = jnp.asarray(getter("self_weights"))
    if agg_name in ("maxpool", "meanpool"):
        p["mlp"] = [{
            "w": jnp.asarray(getter("mlp0_weights")),
            "b": jnp.asarray(getter("mlp0_bias")),
        }]
    elif agg_name == "twomaxpool":
        p["mlp"] = [
            {"w": jnp.asarray(getter(f"mlp{i}_weights")),
             "b": jnp.asarray(getter(f"mlp{i}_bias"))}
            for i in range(2)
        ]
    elif agg_name == "seq":
        p["lstm"] = {
            "kernel": jnp.asarray(getter("lstm_kernel")),
            "bias": jnp.asarray(getter("lstm_bias")),
        }
    return p


def tf_adam_step(var, grad, lr=0.01, b1=0.9, b2=0.999, eps=1e-8):
    """One TF1 AdamOptimizer step from zero slots, with the reference's
    ±5 value clip (supervised_models.py:96-99): var -= lr*sqrt(1-b2)/(1-b1)
    * m / (sqrt(v) + eps)."""
    gc = np.clip(grad, -5.0, 5.0)
    m = (1 - b1) * gc
    v = (1 - b2) * gc * gc
    lr_t = lr * np.sqrt(1 - b2) / (1 - b1)
    return var - lr_t * m / (np.sqrt(v) + eps)


# ------------------------------------------------------ A. aggregators

AGG_CASES = [
    ("agg_mean_concat", "mean", True),
    ("agg_mean_add", "mean", False),
    ("agg_gcn", "gcn", False),
    ("agg_maxpool", "maxpool", True),
    ("agg_meanpool", "meanpool", True),
    ("agg_twomaxpool", "twomaxpool", True),
    ("agg_seq", "seq", True),
    ("agg_maxpool_big", "maxpool", True),
    ("agg_twomaxpool_big", "twomaxpool", True),
    ("agg_seq_big", "seq", True),
]


@pytest.mark.parametrize("case,name,concat", AGG_CASES)
def test_aggregator_forward_and_grads_match_reference(case, name, concat):
    from graphsage_tpu.nn.aggregators import apply_aggregator

    params = agg_params_from(lambda k: g(case, f"var_{k}"), name)
    self_vecs = jnp.asarray(g(case, "self_vecs"))
    neigh_vecs = jnp.asarray(g(case, "neigh_vecs"))

    def loss_fn(p, sv, nv):
        out = apply_aggregator(
            name, p, sv, nv, act=jax.nn.relu, concat=concat
        )
        return 0.5 * jnp.sum(out * out), out

    (_, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                         has_aux=True)(
        params, self_vecs, neigh_vecs
    )
    close(out, g(case, "out"), what=f"{case} out")
    close(grads[1], g(case, "grad_self"), atol=1e-4, rtol=1e-4,
          what=f"{case} grad_self")
    close(grads[2], g(case, "grad_neigh"), atol=1e-4, rtol=1e-4,
          what=f"{case} grad_neigh")
    gp = grads[0]
    for tfk, ourk in (("neigh_weights", "neigh_w"),
                      ("self_weights", "self_w"), ("weights", "w")):
        if has(case, f"grad_{tfk}"):
            close(gp[ourk], g(case, f"grad_{tfk}"), atol=1e-4, rtol=1e-4,
                  what=f"{case} grad {tfk}")
    if "mlp" in gp:
        for i, layer in enumerate(gp["mlp"]):
            close(layer["w"], g(case, f"grad_mlp{i}_weights"),
                  atol=1e-4, rtol=1e-4, what=f"{case} grad mlp{i} w")
            close(layer["b"], g(case, f"grad_mlp{i}_bias"),
                  atol=1e-4, rtol=1e-4, what=f"{case} grad mlp{i} b")
    if "lstm" in gp:
        close(gp["lstm"]["kernel"], g(case, "grad_lstm_kernel"),
              atol=1e-4, rtol=1e-4, what=f"{case} grad lstm kernel")
        close(gp["lstm"]["bias"], g(case, "grad_lstm_bias"),
              atol=1e-4, rtol=1e-4, what=f"{case} grad lstm bias")


def test_dense_matches_reference():
    from graphsage_tpu.nn.dense import apply_dense

    params = {"w": jnp.asarray(g("dense", "var_weights")),
              "b": jnp.asarray(g("dense", "var_bias"))}
    x = jnp.asarray(g("dense", "x"))

    def loss_fn(p, xx):
        out = apply_dense(p, xx, act=jax.nn.relu)
        return 0.5 * jnp.sum(out * out), out

    (_, out), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, x)
    close(out, g("dense", "out"), what="dense out")
    close(grads[1], g("dense", "grad_x"), atol=1e-4, what="dense grad x")
    close(grads[0]["w"], g("dense", "grad_weights"), atol=1e-4,
          what="dense grad w")
    close(grads[0]["b"], g("dense", "grad_bias"), atol=1e-4,
          what="dense grad b")


# ------------------------------------------------------- C. prediction

PRED_CASES = [
    ("pred_xent", "xent", 1.0, False),
    ("pred_xent_w2", "xent", 2.0, False),
    ("pred_skipgram", "skipgram", 1.0, False),
    ("pred_hinge", "hinge", 1.0, False),
    ("pred_bilinear", "xent", 1.0, True),
]


@pytest.mark.parametrize("case,loss_fn,negw,bilinear", PRED_CASES)
def test_edge_prediction_matches_reference(case, loss_fn, negw, bilinear):
    from graphsage_tpu.nn import prediction

    u1 = jnp.asarray(g(case, "inputs1"))
    u2 = jnp.asarray(g(case, "inputs2"))
    ng = jnp.asarray(g(case, "neg"))
    params = (
        {"w": jnp.asarray(g(case, "var_weights"))} if bilinear else None
    )
    close(prediction.affinity(u1, u2, params), g(case, "aff"),
          what=f"{case} aff")
    close(prediction.neg_cost(u1, ng, params), g(case, "neg_aff"),
          what=f"{case} neg_aff")

    def loss(a, b, c):
        return prediction.edge_pred_loss(
            a, b, c, loss_fn=loss_fn, params=params,
            neg_sample_weights=negw,
        )

    lv, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(u1, u2, ng)
    close(lv, g(case, "loss"), atol=1e-4, what=f"{case} loss")
    close(grads[0], g(case, "grad_inputs1"), atol=1e-4,
          what=f"{case} grad u1")
    close(grads[1], g(case, "grad_inputs2"), atol=1e-4,
          what=f"{case} grad u2")
    close(grads[2], g(case, "grad_neg"), atol=1e-4, what=f"{case} grad neg")


# ------------------------------------------------ D. supervised model

SUP_CASES = [
    # case, aggregator, concat, sigmoid, weight_decay, identity_dim
    ("sup_mean_softmax", "mean", True, False, 0.0, 0),
    ("sup_mean_sigmoid", "mean", True, True, 0.0, 0),
    ("sup_mean_wd", "mean", True, False, 0.01, 0),
    ("sup_gcn", "gcn", False, False, 0.0, 0),
    ("sup_maxpool", "maxpool", True, True, 0.0, 0),
    ("sup_meanpool", "meanpool", True, False, 0.0, 0),
    ("sup_seq", "seq", True, False, 0.0, 0),
    ("sup_identity", "mean", True, False, 0.0, 3),
    ("sup_mean_3layer", "mean", True, False, 0.0, 0),  # --samples_3 depth
]


def _sup_setup(case, agg, concat, sigmoid, wd, id_dim):
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import SupervisedConfig

    n_layers = 3 if case.endswith("3layer") else 2
    layer_infos = ((LayerInfo(3, 6), LayerInfo(2, 6))
                   + ((LayerInfo(2, 6),) if n_layers == 3 else ()))
    sage = SAGEConfig(
        layers=layer_infos,
        feature_dim=8, aggregator=agg, concat=concat, model_size="small",
        identity_dim=id_dim, num_nodes=12, sampler_mode="first_k",
    )
    config = SupervisedConfig(sage=sage, num_classes=5,
                              sigmoid_loss=sigmoid, weight_decay=wd)
    aggs = [
        agg_params_from(lambda k, li=li: g(case, f"var_agg{li}_{k}"), agg)
        for li in range(n_layers)
    ]
    params = {
        "aggs": aggs,
        "head": {"w": jnp.asarray(g(case, "var_head_weights")),
                 "b": jnp.asarray(g(case, "var_head_bias"))},
    }
    if id_dim > 0:
        params["embeds"] = jnp.asarray(g(case, "var_embeds"))
    features = jnp.asarray(g("graph", "features"))
    adj = jnp.asarray(g("graph", "adj"))
    ids = jnp.asarray(g("graph", "batch"))
    labels = jnp.asarray(g(case, "labels"))
    return config, params, features, adj, ids, labels


def _flat_grad_pairs(case, grads, id_dim):
    """(traced_name, our_grad) pairs mirroring trace_reference's var order."""
    pairs = []
    for li in range(len(grads["aggs"])):
        gp = grads["aggs"][li]
        for tfk, ourk in AGG_VAR_MAP.items():
            if has(case, f"var_agg{li}_{tfk}"):
                pairs.append((f"agg{li}_{tfk}", gp[ourk]))
        if "mlp" in gp:
            for i, layer in enumerate(gp["mlp"]):
                pairs.append((f"agg{li}_mlp{i}_weights", layer["w"]))
                pairs.append((f"agg{li}_mlp{i}_bias", layer["b"]))
        if "lstm" in gp:
            pairs.append((f"agg{li}_lstm_kernel", gp["lstm"]["kernel"]))
            pairs.append((f"agg{li}_lstm_bias", gp["lstm"]["bias"]))
    pairs.append(("head_weights", grads["head"]["w"]))
    pairs.append(("head_bias", grads["head"]["b"]))
    if id_dim > 0:
        pairs.append(("embeds", grads["embeds"]))
    return pairs


@pytest.mark.parametrize("case,agg,concat,sigmoid,wd,id_dim", SUP_CASES)
def test_supervised_model_matches_reference(case, agg, concat, sigmoid,
                                            wd, id_dim):
    from graphsage_tpu.models.graphsage import l2_normalize, sage_embed
    from graphsage_tpu.models.supervised import (
        supervised_logits,
        supervised_loss,
    )

    config, params, features, adj, ids, labels = _sup_setup(
        case, agg, concat, sigmoid, wd, id_dim
    )
    rng = jax.random.key(0)
    mask = jnp.ones((ids.shape[0],), jnp.float32)

    emb = l2_normalize(
        sage_embed(params, features, adj, ids, rng, config.sage, True), 1
    )
    close(emb, g(case, "outputs1"), what=f"{case} normalized embeddings")

    logits = supervised_logits(params, features, adj, ids, rng, config,
                               deterministic=True)
    close(logits, g(case, "logits"), what=f"{case} logits")

    def loss_fn(p):
        return supervised_loss(p, features, adj, ids, labels, mask, rng,
                               config, deterministic=True)[0]

    lv, grads = jax.value_and_grad(loss_fn)(params)
    close(lv, g(case, "loss"), atol=1e-5, what=f"{case} loss")

    for tfname, ours in _flat_grad_pairs(case, grads, id_dim):
        close(ours, g(case, f"grad_{tfname}"), atol=1e-4, rtol=1e-4,
              what=f"{case} grad {tfname}")

    # reference post-Adam trajectory from OUR grads (TF eps placement)
    for tfname, ours in _flat_grad_pairs(case, grads, id_dim):
        stepped = tf_adam_step(g(case, f"var_{tfname}"), np.asarray(ours))
        close(stepped, g(case, f"post_{tfname}"), atol=2e-5,
              what=f"{case} post-Adam {tfname}")


def test_supervised_optax_step_within_eps_bound_of_reference():
    """optax.adam (our optimizer) vs the reference's TF1 Adam after one
    step: identical up to the documented epsilon-placement bound."""
    import optax

    from graphsage_tpu.models.supervised import (
        make_optimizer,
        supervised_loss,
    )

    case = "sup_mean_softmax"
    config, params, features, adj, ids, labels = _sup_setup(
        case, "mean", True, False, 0.0, 0
    )
    rng = jax.random.key(0)
    mask = jnp.ones((ids.shape[0],), jnp.float32)

    def loss_fn(p):
        return supervised_loss(p, features, adj, ids, labels, mask, rng,
                               config, deterministic=True)[0]

    grads = jax.grad(loss_fn)(params)
    opt = make_optimizer(0.01)
    updates, _ = opt.update(grads, opt.init(params), params)
    new_params = optax.apply_updates(params, updates)
    for tfname, ours in (
        ("agg0_neigh_weights", new_params["aggs"][0]["neigh_w"]),
        ("agg1_self_weights", new_params["aggs"][1]["self_w"]),
        ("head_weights", new_params["head"]["w"]),
        ("head_bias", new_params["head"]["b"]),
    ):
        close(ours, g(case, f"post_{tfname}"), atol=5e-4,
              what=f"optax vs TF adam {tfname}")


TRAJ_CASES = [
    ("traj_meanpool", "meanpool"),
    ("traj_maxpool", "maxpool"),
    ("traj_seq", "seq"),
]


@pytest.mark.parametrize("case,agg", TRAJ_CASES)
def test_supervised_trajectory_matches_reference(case, agg):
    """T=8 Adam steps alternating two batches vs the reference code's own
    executed trajectory: every step's loss (computed on the params the
    previous steps evolved) and the final variables must match. This is
    the multi-step extension of the 1-step parity — the strongest
    semantic pin available for the pooled/seq aggregators, whose
    end-to-end F1 carries the most seed variance
    (benchmarks/REFERENCE_PARITY.md)."""
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        supervised_loss,
    )

    sage = SAGEConfig(
        layers=(LayerInfo(3, 6), LayerInfo(2, 6)),
        feature_dim=8, aggregator=agg, concat=True, model_size="small",
        num_nodes=12, sampler_mode="first_k",
    )
    config = SupervisedConfig(sage=sage, num_classes=5,
                              sigmoid_loss=False, weight_decay=0.0)
    aggs = [
        agg_params_from(lambda k, li=li: g(case, f"var_agg{li}_{k}"), agg)
        for li in range(2)
    ]
    params = {
        "aggs": aggs,
        "head": {"w": jnp.asarray(g(case, "var_head_weights")),
                 "b": jnp.asarray(g(case, "var_head_bias"))},
    }
    features = jnp.asarray(g("graph", "features"))
    adj = jnp.asarray(g("graph", "adj"))
    ids_a = jnp.asarray(g("graph", "batch"))
    ids_b = jnp.asarray(g(case, "batch_b"))
    labels_a = jnp.asarray(g(case, "labels_a"))
    labels_b = jnp.asarray(g(case, "labels_b"))
    losses_ref = g(case, "losses")
    rng = jax.random.key(0)
    mask = jnp.ones((ids_a.shape[0],), jnp.float32)

    # TF1 AdamOptimizer with persistent slots (the reference's opt_op:
    # clip ±5 then Adam, supervised_models.py:96-100), run in f64-free
    # numpy exactly as TF's ApplyAdam kernel does per step t (1-indexed):
    # lr_t = lr*sqrt(1-b2^t)/(1-b1^t); var -= lr_t*m/(sqrt(v)+eps)
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    leaves, treedef = jax.tree_util.tree_flatten(params)
    m = [np.zeros_like(np.asarray(leaf)) for leaf in leaves]
    v = [np.zeros_like(np.asarray(leaf)) for leaf in leaves]

    step_fn = jax.jit(jax.value_and_grad(
        lambda p, ids, labels: supervised_loss(
            p, features, adj, ids, labels, mask, rng, config,
            deterministic=True)[0]
    ))
    for t in range(len(losses_ref)):
        ids = ids_a if t % 2 == 0 else ids_b
        labels = labels_a if t % 2 == 0 else labels_b
        lv, grads = step_fn(params, ids, labels)
        close(lv, losses_ref[t], atol=2e-4, rtol=1e-4,
              what=f"{case} step-{t} loss")
        glv = jax.tree_util.tree_leaves(grads)
        plv = jax.tree_util.tree_leaves(params)
        lr_t = lr * np.sqrt(1 - b2 ** (t + 1)) / (1 - b1 ** (t + 1))
        new_leaves = []
        for i, (pl, gl) in enumerate(zip(plv, glv)):
            gc = np.clip(np.asarray(gl, np.float32), -5.0, 5.0)
            m[i] = b1 * m[i] + (1 - b1) * gc
            v[i] = b2 * v[i] + (1 - b2) * gc * gc
            new_leaves.append(jnp.asarray(
                np.asarray(pl) - lr_t * m[i] / (np.sqrt(v[i]) + eps)
            ))
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    for tfname, ours in _flat_grad_pairs(case, params, 0):
        close(ours, g(case, f"post_{tfname}"), atol=5e-4, rtol=5e-4,
              what=f"{case} final {tfname} after {len(losses_ref)} steps")


# --------------------------------------------- E. unsupervised model

def test_unsupervised_model_matches_reference():
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        l2_normalize,
        sage_embed,
    )
    from graphsage_tpu.nn import prediction

    case = "unsup_mean"
    sage = SAGEConfig(
        layers=(LayerInfo(3, 6), LayerInfo(2, 6)),
        feature_dim=8, aggregator="mean", concat=True,
        model_size="small", sampler_mode="first_k",
    )
    aggs = [
        agg_params_from(lambda k, li=li: g(case, f"var_agg{li}_{k}"),
                        "mean")
        for li in range(2)
    ]
    params = {"aggs": aggs}
    features = jnp.asarray(g("graph", "features"))
    adj = jnp.asarray(g("graph", "adj"))
    b1 = jnp.asarray(g("graph", "batch"))
    b2 = jnp.asarray(g(case, "batch2"))
    negs = jnp.asarray(g(case, "neg_ids"))
    B = b1.shape[0]
    rng = jax.random.key(0)

    def towers(p):
        out = sage_embed(p, features, adj,
                         jnp.concatenate([b1, b2, negs]), rng, sage, True)
        return (l2_normalize(out[:B], 1), l2_normalize(out[B:2 * B], 1),
                l2_normalize(out[2 * B:], 1))

    o1, o2, ng = towers(params)
    close(o1, g(case, "outputs1"), what="unsup outputs1")
    close(o2, g(case, "outputs2"), what="unsup outputs2")
    close(ng, g(case, "neg_outputs"), what="unsup neg_outputs")

    def loss_fn(p):
        a, b, c = towers(p)
        return prediction.edge_pred_loss(a, b, c, loss_fn="xent") / B

    lv, grads = jax.value_and_grad(loss_fn)(params)
    close(lv, g(case, "loss"), atol=1e-5, what="unsup loss")

    aff = prediction.affinity(o1, o2)
    naff = prediction.neg_cost(o1, ng)
    ranks, mrr = prediction.mrr_and_ranks(aff, naff)
    close(mrr, g(case, "mrr"), atol=1e-6, what="unsup mrr")
    # reference ranks matrix: positive appended last; its 0-based rank+1
    close(ranks, g(case, "ranks")[:, -1] + 1, what="unsup positive ranks")

    for li in range(2):
        for tfk, ourk in (("neigh_weights", "neigh_w"),
                          ("self_weights", "self_w")):
            name = f"agg{li}_{tfk}"
            close(grads["aggs"][li][ourk], g(case, f"grad_{name}"),
                  atol=1e-4, rtol=1e-4, what=f"unsup grad {name}")
            stepped = tf_adam_step(
                g(case, f"var_{name}"),
                np.asarray(grads["aggs"][li][ourk]),
            )
            close(stepped, g(case, f"post_{name}"), atol=2e-5,
                  what=f"unsup post-Adam {name}")


# ------------------------------------------------- F. node2vec model

def test_node2vec_matches_reference():
    from graphsage_tpu.models.node2vec import node2vec_outputs
    from graphsage_tpu.nn import prediction

    case = "n2v"
    params = {
        "target": jnp.asarray(g(case, "var_target")),
        "context": jnp.asarray(g(case, "var_context")),
        "bias": jnp.asarray(g(case, "var_bias")),
    }
    b1 = jnp.asarray(g("graph", "batch"))
    b2 = jnp.asarray(g(case, "batch2"))
    negs = jnp.asarray(g(case, "neg_ids"))
    B = b1.shape[0]

    def loss_fn(p):
        # node2vec_loss with the traced fixed negatives injected
        # (models.py:478-487: summed xent with context bias / batch_size)
        out1, out2, out2_bias, neg, neg_bias = node2vec_outputs(
            p, b1, b2, negs
        )
        aff = jnp.sum(out1 * out2, axis=1) + out2_bias
        neg_aff = jnp.dot(out1, neg.T) + neg_bias
        true_xent = prediction.sigmoid_xent(jnp.ones_like(aff), aff)
        neg_xent = prediction.sigmoid_xent(
            jnp.zeros_like(neg_aff), neg_aff
        )
        loss = (jnp.sum(true_xent) + jnp.sum(neg_xent)) / B
        aux = (out1, out2, neg)
        return loss, aux

    (lv, (out1, out2, neg)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    close(lv, g(case, "loss"), atol=1e-5, what="n2v loss")

    # bias-free MRR path (models.py:489-501)
    aff = prediction.affinity(out1, out2)
    naff = prediction.neg_cost(out1, neg)
    ranks, mrr = prediction.mrr_and_ranks(aff, naff)
    close(mrr, g(case, "mrr"), atol=1e-6, what="n2v mrr")
    close(ranks, g(case, "ranks")[:, -1] + 1, what="n2v positive ranks")

    # plain SGD (models.py:442): exact step, var -= lr * grad
    for k in ("target", "context", "bias"):
        close(grads[k], g(case, f"grad_{k}"), atol=1e-5, rtol=1e-4,
              what=f"n2v grad {k}")
        stepped = np.asarray(params[k]) - 0.5 * np.asarray(grads[k])
        close(stepped, g(case, f"post_{k}"), atol=1e-6,
              what=f"n2v post-SGD {k}")
