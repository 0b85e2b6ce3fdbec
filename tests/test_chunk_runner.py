"""Multi-step dispatch runners == chained single-step dispatches."""

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
from graphsage_tpu.models.supervised import (
    SupervisedConfig,
    init_supervised_params,
    make_optimizer,
)
from graphsage_tpu.models.unsupervised import (
    UnsupervisedConfig,
    init_unsupervised_params,
)
from graphsage_tpu.nn.negative import unigram_cdf
from graphsage_tpu.parallel.dp import (
    make_supervised_chunk_runner,
    make_unsupervised_chunk_runner,
)


def test_supervised_chunk_equals_chained_singles(toy_graph):
    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = jnp.asarray(g.padded_features())
    adj = jnp.asarray(adj)
    B = 8
    sage = SAGEConfig(
        layers=(LayerInfo(3, 8), LayerInfo(2, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.01)

    ids_perm = jnp.asarray(
        np.random.default_rng(0).permutation(g.num_nodes)[: 4 * B]
        .astype(np.int32)
    )
    labels_table = jnp.asarray(
        np.vstack([g.labels, np.zeros((1, g.num_classes), np.float32)])
    )
    rng = jax.random.key(5)

    run = jax.jit(make_supervised_chunk_runner(sup, optimizer, B))

    p3, o3, loss3, logits3, ids3 = run(
        params, optimizer.init(params), rng, feats, adj, ids_perm,
        labels_table, 0, 3,
    )
    p1, o1 = params, optimizer.init(params)
    for s in range(3):
        p1, o1, loss1, logits1, ids1 = run(
            p1, o1, rng, feats, adj, ids_perm, labels_table, s, 1
        )
    np.testing.assert_allclose(float(loss3), float(loss1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids3), np.asarray(ids1))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        p3, p1,
    )


def test_unsupervised_chunk_ema_and_equivalence(toy_graph):
    g = toy_graph
    adj, deg, _ = build_both_adjs(g, max_degree=8)
    feats = jnp.asarray(g.padded_features())
    adj = jnp.asarray(adj)
    B = 8
    sage = SAGEConfig(
        layers=(LayerInfo(3, 8), LayerInfo(2, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        num_nodes=g.num_nodes,
    )
    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=4)
    params = init_unsupervised_params(jax.random.key(0), unsup)
    optimizer = make_optimizer(1e-4)
    neg_cdf = jnp.asarray(unigram_cdf(deg))
    pairs = jnp.asarray(g.edges[: 4 * B].astype(np.int32))
    rng = jax.random.key(5)

    run = jax.jit(
        make_unsupervised_chunk_runner(unsup, optimizer, B, g.num_nodes)
    )
    shadow0 = jnp.asarray(-1.0)
    p2, o2, sh2, loss2, mrr2 = run(
        params, optimizer.init(params), shadow0, rng, feats, adj, pairs,
        neg_cdf, 0, 2,
    )
    p1, o1, sh1 = params, optimizer.init(params), shadow0
    for s in range(2):
        p1, o1, sh1, loss1, mrr1 = run(
            p1, o1, sh1, rng, feats, adj, pairs, neg_cdf, s, 1
        )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(float(sh2), float(sh1), rtol=1e-5)
    assert float(sh2) >= 0.0  # EMA initialized from the first step's mrr
