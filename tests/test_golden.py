"""Golden-value parity: a pure-NumPy mirror of the reference math.

The BASELINE parity bar is per-layer allclose against the TF1 reference
under identical params/sample indices (SURVEY.md §4). TF1 can't run
here, so the reference forward (models.py:254-330 + aggregators.py:43-64
+ supervised_models.py:78-100) is re-derived by hand in NumPy and the
JAX path must match it bit-for-bit (modulo float assoc) with sampling
pinned via the deterministic first_k mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.models.graphsage import (
    LayerInfo,
    SAGEConfig,
    init_sage_params,
    l2_normalize,
    sage_embed,
)
from graphsage_tpu.models.supervised import (
    SupervisedConfig,
    init_supervised_params,
    supervised_logits,
    supervised_loss,
)


def numpy_mean_forward(params, feats, adj, ids, fanouts, dims, concat=True):
    """Reference SampleAndAggregate with MeanAggregator, first_k sampling.

    sample (models.py:254-275): frontier[k+1] = first fanout[t] adjacency
    columns of frontier[k]; aggregate (models.py:278-330): hop-pyramid
    fold with relu on all but the last layer.
    """
    n_layers = len(fanouts)
    samples = [np.asarray(ids)]
    for k in range(n_layers):
        t = n_layers - k - 1
        rows = adj[samples[k]]              # [m, max_degree]
        nxt = rows[:, : fanouts[t]]         # first_k sampling
        samples.append(nxt.reshape(-1))

    hidden = [feats[s] for s in samples]
    support = [1]
    for k in range(n_layers):
        support.append(support[-1] * fanouts[n_layers - k - 1])

    B = len(ids)
    for layer in range(n_layers):
        agg = params["aggs"][layer]
        neigh_w = np.asarray(agg["neigh_w"])
        self_w = np.asarray(agg["self_w"])
        dim_mult = 2 if concat and layer != 0 else 1
        next_hidden = []
        for hop in range(n_layers - layer):
            neigh = hidden[hop + 1].reshape(
                B * support[hop], fanouts[n_layers - hop - 1],
                dim_mult * dims[layer],
            )
            from_neighs = neigh.mean(axis=1) @ neigh_w
            from_self = hidden[hop] @ self_w
            out = (
                np.concatenate([from_self, from_neighs], axis=1)
                if concat else from_self + from_neighs
            )
            if layer != n_layers - 1:
                out = np.maximum(out, 0)    # relu on all but last
            next_hidden.append(out)
        hidden = next_hidden
    return hidden[0]


def test_sage_embed_matches_numpy_mirror(toy_graph):
    g = toy_graph
    adj_np, _, _ = build_both_adjs(g, max_degree=8)
    feats_np = g.padded_features()

    fanouts = (4, 3)
    dims = (feats_np.shape[1], 8, 8)
    config = SAGEConfig(
        layers=(LayerInfo(fanouts[0], dims[1]), LayerInfo(fanouts[1], dims[2])),
        feature_dim=feats_np.shape[1],
        aggregator="mean",
        concat=True,
        sampler_mode="first_k",
    )
    params = init_sage_params(jax.random.key(0), config)
    ids = np.arange(16, dtype=np.int32)

    got = sage_embed(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np),
        jnp.asarray(ids), jax.random.key(1), config,
    )
    want = numpy_mean_forward(params, feats_np, adj_np, ids, fanouts, dims)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_supervised_head_matches_numpy(toy_graph):
    """l2-normalize -> dense head (supervised_models.py:85-92) and the
    softmax loss normalization (:112-118)."""
    g = toy_graph
    adj_np, _, _ = build_both_adjs(g, max_degree=8)
    feats_np = g.padded_features()
    fanouts = (4, 3)
    dims = (feats_np.shape[1], 8, 8)
    sage = SAGEConfig(
        layers=(LayerInfo(fanouts[0], dims[1]), LayerInfo(fanouts[1], dims[2])),
        feature_dim=feats_np.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    ids = np.arange(12, dtype=np.int32)

    logits = supervised_logits(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np),
        jnp.asarray(ids), jax.random.key(1), sup,
    )

    emb = numpy_mean_forward(params, feats_np, adj_np, ids, fanouts, dims)
    emb = emb / np.maximum(
        np.sqrt((emb ** 2).sum(axis=1, keepdims=True)), np.sqrt(1e-12)
    )
    want = emb @ np.asarray(params["head"]["w"]) + np.asarray(
        params["head"]["b"]
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4, atol=1e-5)

    # loss: mean over batch of per-node softmax xent
    labels = g.labels[ids]
    mask = np.ones(len(ids), dtype=np.float32)
    loss, _ = supervised_loss(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask), jax.random.key(1), sup,
        deterministic=True,
    )
    z = want - want.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    want_loss = (-(labels * logp).sum(axis=1)).mean()
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-4)


def numpy_gcn_forward(params, feats, adj, ids, fanouts, dims):
    """GCN variant: mean over {neighbors + self}, one shared matmul,
    concat=False (reference aggregators.py:101-116)."""
    n_layers = len(fanouts)
    samples = [np.asarray(ids)]
    for k in range(n_layers):
        t = n_layers - k - 1
        samples.append(adj[samples[k]][:, : fanouts[t]].reshape(-1))
    hidden = [feats[s] for s in samples]
    support = [1]
    for k in range(n_layers):
        support.append(support[-1] * fanouts[n_layers - k - 1])
    B = len(ids)
    for layer in range(n_layers):
        w = np.asarray(params["aggs"][layer]["w"])
        next_hidden = []
        for hop in range(n_layers - layer):
            neigh = hidden[hop + 1].reshape(
                B * support[hop], fanouts[n_layers - hop - 1], dims[layer]
            )
            both = np.concatenate(
                [neigh, hidden[hop][:, None, :]], axis=1
            )
            out = both.mean(axis=1) @ w
            if layer != n_layers - 1:
                out = np.maximum(out, 0)
            next_hidden.append(out)
        hidden = next_hidden
    return hidden[0]


def test_gcn_matches_numpy_mirror(toy_graph):
    g = toy_graph
    adj_np, _, _ = build_both_adjs(g, max_degree=8)
    feats_np = g.padded_features()
    fanouts = (4, 3)
    dims = (feats_np.shape[1], 8, 8)
    config = SAGEConfig(
        layers=(LayerInfo(fanouts[0], dims[1]), LayerInfo(fanouts[1], dims[2])),
        feature_dim=feats_np.shape[1],
        aggregator="gcn",
        concat=False,
        sampler_mode="first_k",
    )
    params = init_sage_params(jax.random.key(2), config)
    ids = np.arange(10, dtype=np.int32)
    got = sage_embed(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np),
        jnp.asarray(ids), jax.random.key(1), config,
    )
    want = numpy_gcn_forward(params, feats_np, adj_np, ids, fanouts, dims)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_three_layer_matches_numpy_mirror(toy_graph):
    g = toy_graph
    adj_np, _, _ = build_both_adjs(g, max_degree=8)
    feats_np = g.padded_features()
    fanouts = (4, 3, 2)
    dims = (feats_np.shape[1], 8, 8, 8)
    config = SAGEConfig(
        layers=tuple(
            LayerInfo(f, d) for f, d in zip(fanouts, dims[1:])
        ),
        feature_dim=feats_np.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
    )
    params = init_sage_params(jax.random.key(3), config)
    ids = np.arange(6, dtype=np.int32)
    got = sage_embed(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np),
        jnp.asarray(ids), jax.random.key(1), config,
    )
    want = numpy_mean_forward(params, feats_np, adj_np, ids, fanouts, dims)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_fused_path_matches_numpy_mirror(toy_graph):
    """The fused-gather fast path hits the same golden values."""
    g = toy_graph
    adj_np, _, _ = build_both_adjs(g, max_degree=8)
    feats_np = g.padded_features()
    fanouts = (4, 3)
    dims = (feats_np.shape[1], 8, 8)
    config = SAGEConfig(
        layers=(LayerInfo(fanouts[0], dims[1]), LayerInfo(fanouts[1], dims[2])),
        feature_dim=feats_np.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        fused_gather=True,
    )
    params = init_sage_params(jax.random.key(0), config)
    ids = np.arange(16, dtype=np.int32)
    got = sage_embed(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np),
        jnp.asarray(ids), jax.random.key(1), config,
    )
    want = numpy_mean_forward(params, feats_np, adj_np, ids, fanouts, dims)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_unsupervised_loss_matches_numpy(toy_graph):
    """Three-tower skip-gram loss pinned against a NumPy mirror
    (reference models.py:332-391 + prediction.py:102-110): towers run as
    one batched pyramid, l2-normalized; xent = sum over edges of
    -log(sig(aff)) + sum_negs -log(1-sig(neg_aff)), divided by batch."""
    import scipy.special

    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
        unsupervised_loss,
    )
    from graphsage_tpu.nn.negative import sample_negatives, unigram_cdf
    from graphsage_tpu.data.adjacency import build_both_adjs

    g = toy_graph
    adj_np, deg, _ = build_both_adjs(g, max_degree=8)
    feats_np = g.padded_features()
    fanouts = (4, 3)
    dims = (feats_np.shape[1], 8, 8)
    sage = SAGEConfig(
        layers=(LayerInfo(fanouts[0], dims[1]), LayerInfo(fanouts[1], dims[2])),
        feature_dim=feats_np.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
    )
    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=5)
    params = init_unsupervised_params(jax.random.key(0), unsup)

    B = 8
    b1 = g.edges[:B, 0].astype(np.int32)
    b2 = g.edges[:B, 1].astype(np.int32)
    mask = np.ones(B, np.float32)
    neg_cdf = unigram_cdf(deg)
    rng = jax.random.key(9)

    loss, aux = unsupervised_loss(
        params, jnp.asarray(feats_np), jnp.asarray(adj_np),
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(mask),
        jnp.asarray(neg_cdf), rng, unsup, deterministic=True,
    )

    # replicate the negative draw (same key split as the implementation)
    r_neg, _ = jax.random.split(rng)
    neg_ids = np.asarray(
        sample_negatives(r_neg, jnp.asarray(neg_cdf), 5)
    )

    def embed(ids):
        e = numpy_mean_forward(params, feats_np, adj_np, ids, fanouts, dims)
        return e / np.maximum(
            np.sqrt((e ** 2).sum(1, keepdims=True)), np.sqrt(1e-12)
        )

    all_ids = np.concatenate([b1, b2, neg_ids])
    out = embed(all_ids)
    o1, o2, neg = out[:B], out[B:2 * B], out[2 * B:]
    aff = (o1 * o2).sum(1)
    neg_aff = o1 @ neg.T
    # sigmoid xent with true labels 1 (aff) and 0 (neg_aff)
    pos = -np.log(scipy.special.expit(aff))
    negc = -np.log(1 - scipy.special.expit(neg_aff)).sum(1)
    want = (pos + negc).sum() / B
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    assert 0.0 <= float(aux["mrr"]) <= 1.0
