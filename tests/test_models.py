"""Model-layer tests: frontier shapes, dim bookkeeping, losses, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.models import (
    LayerInfo,
    Node2VecConfig,
    SAGEConfig,
    SupervisedConfig,
    UnsupervisedConfig,
    init_node2vec_params,
    init_sage_params,
    init_supervised_params,
    init_unsupervised_params,
    node2vec_loss,
    sample_frontier,
    sage_embed,
    supervised_logits,
    supervised_loss,
    supervised_predict,
    unsupervised_loss,
)
from graphsage_tpu.models.graphsage import l2_normalize
from graphsage_tpu.nn.negative import unigram_cdf, unigram_logits


@pytest.fixture(scope="module")
def small_setup(toy_graph):
    adj, deg, full_adj = build_both_adjs(toy_graph, max_degree=6)
    feats = toy_graph.padded_features()
    return toy_graph, jnp.asarray(adj), jnp.asarray(feats), deg


def _sage_config(feat_dim, aggregator="mean", concat=True, fanouts=(4, 3),
                 dims=(7, 5), **kw):
    layers = tuple(LayerInfo(s, d) for s, d in zip(fanouts, dims))
    return SAGEConfig(layers=layers, feature_dim=feat_dim,
                      aggregator=aggregator, concat=concat, **kw)


def test_frontier_shapes_follow_reference_order(small_setup):
    """With layers [(S1,d1),(S2,d2)] the first expansion uses S2
    (reference models.py:268-274)."""
    _, adj, _, _ = small_setup
    ids = jnp.arange(8, dtype=jnp.int32)
    samples = sample_frontier(jax.random.key(0), adj, ids, (4, 3))
    assert samples[0].shape == (8,)
    assert samples[1].shape == (8 * 3,)   # S2 first
    assert samples[2].shape == (8 * 3 * 4,)


def test_embed_output_dims_concat_and_add(small_setup):
    g, adj, feats, _ = small_setup
    ids = jnp.arange(10, dtype=jnp.int32)
    for concat, expect in [(True, 10), (False, 5)]:
        cfg = _sage_config(g.features.shape[1], concat=concat)
        p = init_sage_params(jax.random.key(0), cfg)
        out = sage_embed(p, feats, adj, ids, jax.random.key(1), cfg)
        assert out.shape == (10, expect)
        assert np.isfinite(np.asarray(out)).all()


def test_three_layer_pyramid(small_setup):
    g, adj, feats, _ = small_setup
    cfg = _sage_config(g.features.shape[1], fanouts=(3, 3, 2), dims=(6, 6, 4))
    p = init_sage_params(jax.random.key(0), cfg)
    out = sage_embed(p, feats, adj, jnp.arange(5, dtype=jnp.int32),
                     jax.random.key(1), cfg)
    assert out.shape == (5, 8)
    assert len(p["aggs"]) == 3


@pytest.mark.parametrize("agg", ["mean", "gcn", "maxpool", "meanpool", "seq"])
def test_all_aggregators_through_pyramid(small_setup, agg):
    g, adj, feats, _ = small_setup
    concat = agg != "gcn"
    cfg = _sage_config(g.features.shape[1], aggregator=agg, concat=concat)
    p = init_sage_params(jax.random.key(0), cfg)
    out = jax.jit(
        lambda p, ids, rng: sage_embed(p, feats, adj, ids, rng, cfg)
    )(p, jnp.arange(6, dtype=jnp.int32), jax.random.key(1))
    assert out.shape[0] == 6
    assert np.isfinite(np.asarray(out)).all()


def test_identity_dim_concatenates(small_setup):
    g, adj, feats, _ = small_setup
    cfg = _sage_config(g.features.shape[1], identity_dim=4,
                       num_nodes=g.num_nodes)
    assert cfg.input_dim == g.features.shape[1] + 4
    p = init_sage_params(jax.random.key(0), cfg)
    assert p["embeds"].shape == (g.num_nodes + 1, 4)
    out = sage_embed(p, feats, adj, jnp.arange(3, dtype=jnp.int32),
                     jax.random.key(1), cfg)
    assert out.shape == (3, 10)


def test_featureless_mode(small_setup):
    g, adj, _, _ = small_setup
    cfg = _sage_config(0, identity_dim=6, num_nodes=g.num_nodes)
    p = init_sage_params(jax.random.key(0), cfg)
    out = sage_embed(p, None, adj, jnp.arange(3, dtype=jnp.int32),
                     jax.random.key(1), cfg)
    assert out.shape == (3, 10)


def test_dummy_node_embeds_to_constant(small_setup):
    """Dummy-id inputs see only dummy neighbors (zero features), so two
    dummy rows give identical embeddings."""
    g, adj, feats, _ = small_setup
    cfg = _sage_config(g.features.shape[1])
    p = init_sage_params(jax.random.key(0), cfg)
    ids = jnp.asarray([g.num_nodes, g.num_nodes], dtype=jnp.int32)
    out = np.asarray(
        sage_embed(p, feats, adj, ids, jax.random.key(1), cfg)
    )
    np.testing.assert_allclose(out[0], out[1], rtol=1e-6)


def test_supervised_loss_and_grads(small_setup):
    g, adj, feats, deg = small_setup
    cfg = SupervisedConfig(
        sage=_sage_config(g.features.shape[1]),
        num_classes=g.num_classes,
        sigmoid_loss=False,
        weight_decay=1e-4,
    )
    p = init_supervised_params(jax.random.key(0), cfg)
    ids = jnp.arange(12, dtype=jnp.int32)
    labels = jnp.asarray(g.labels[:12])
    mask = jnp.ones((12,))

    def lf(p):
        loss, _ = supervised_loss(p, feats, adj, ids, labels, mask,
                                  jax.random.key(1), cfg)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(lf))(p)
    assert np.isfinite(float(loss))
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_supervised_mask_matches_smaller_batch(small_setup):
    """Masked loss over a padded batch == loss over the unpadded batch."""
    g, adj, feats, _ = small_setup
    cfg = SupervisedConfig(
        sage=_sage_config(g.features.shape[1], dropout=0.0),
        num_classes=g.num_classes,
    )
    p = init_supervised_params(jax.random.key(0), cfg)
    rng = jax.random.key(3)

    ids_small = jnp.arange(4, dtype=jnp.int32)
    labels_small = jnp.asarray(g.labels[:4])
    # Padded version: dummy ids with mask 0. Use sampler_mode shared so the
    # per-node draws of the first 4 ids are unaffected by batch size.
    cfg_shared = SupervisedConfig(
        sage=_sage_config(g.features.shape[1], sampler_mode="shared_perm"),
        num_classes=g.num_classes,
    )
    ids_pad = jnp.concatenate(
        [ids_small, jnp.full((4,), g.num_nodes, dtype=jnp.int32)]
    )
    labels_pad = jnp.concatenate([labels_small, jnp.zeros((4, g.num_classes))])
    mask = jnp.asarray([1.0] * 4 + [0.0] * 4)

    l_small, _ = supervised_loss(
        p, feats, adj, ids_small, labels_small, jnp.ones((4,)), rng,
        cfg_shared, deterministic=True,
    )
    l_pad, _ = supervised_loss(
        p, feats, adj, ids_pad, labels_pad, mask, rng, cfg_shared,
        deterministic=True,
    )
    np.testing.assert_allclose(float(l_small), float(l_pad), rtol=1e-5)


def test_supervised_predict_modes(small_setup):
    g, adj, feats, _ = small_setup
    logits = jnp.asarray([[1.0, -1.0, 0.0]])
    soft_cfg = SupervisedConfig(
        sage=_sage_config(1), num_classes=3, sigmoid_loss=False
    )
    sig_cfg = SupervisedConfig(
        sage=_sage_config(1), num_classes=3, sigmoid_loss=True
    )
    np.testing.assert_allclose(
        float(jnp.sum(supervised_predict(logits, soft_cfg))), 1.0, rtol=1e-5
    )
    sig = np.asarray(supervised_predict(logits, sig_cfg))
    np.testing.assert_allclose(sig, 1 / (1 + np.exp(-np.asarray(logits))),
                               rtol=1e-5)


def test_unsupervised_loss_and_mrr(small_setup):
    g, adj, feats, deg = small_setup
    cfg = UnsupervisedConfig(
        sage=_sage_config(g.features.shape[1]),
        neg_sample_size=8,
    )
    p = init_unsupervised_params(jax.random.key(0), cfg)
    cdf = jnp.asarray(unigram_cdf(deg))
    b1 = jnp.arange(10, dtype=jnp.int32)
    b2 = jnp.arange(10, 20, dtype=jnp.int32)
    mask = jnp.ones((10,))

    def lf(p):
        loss, aux = unsupervised_loss(p, feats, adj, b1, b2, mask, cdf,
                                      jax.random.key(1), cfg)
        return loss, aux

    (loss, aux), grads = jax.jit(
        lambda p: jax.value_and_grad(lf, has_aux=True)(p)
    )(p)
    assert np.isfinite(float(loss))
    assert 0.0 < float(aux["mrr"]) <= 1.0
    assert aux["ranks"].shape == (10,)
    assert aux["outputs1"].shape == (10, cfg.sage.output_dim)
    # outputs1 are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(aux["outputs1"]), axis=1), 1.0, rtol=1e-4
    )
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_node2vec_loss_and_freeze():
    cfg = Node2VecConfig(num_nodes=50, dim=8, neg_sample_size=5)
    p = init_node2vec_params(jax.random.key(0), cfg)
    logits = unigram_logits(jnp.asarray(np.arange(50, dtype=np.float64)))
    b1 = jnp.arange(6, dtype=jnp.int32)
    b2 = jnp.arange(10, 16, dtype=jnp.int32)
    mask = jnp.ones((6,))

    def lf(p):
        loss, _ = node2vec_loss(p, b1, b2, mask, logits, jax.random.key(2),
                                cfg)
        return loss

    loss, grads = jax.value_and_grad(lf)(p)
    assert np.isfinite(float(loss))

    from graphsage_tpu.models.node2vec import mask_context_gradients

    update_mask = jnp.zeros((50,)).at[jnp.arange(25, 50)].set(1.0)
    masked = mask_context_gradients(grads, update_mask)
    assert float(jnp.abs(masked["context"][:25]).max()) == 0.0


def test_l2_normalize_zero_safe():
    x = jnp.zeros((2, 4))
    out = np.asarray(l2_normalize(x))
    assert np.isfinite(out).all()


def test_activation_capture_keys_and_shapes(toy_graph):
    """make_activations_fn records each aggregator call's output
    (reference layers.py:59-70 per-layer input/output histograms)."""
    import jax

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        init_sage_params,
        make_activations_fn,
    )

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    cfg = SAGEConfig(
        layers=(LayerInfo(4, 10), LayerInfo(3, 6)),
        feature_dim=feats.shape[1], aggregator="mean",
        sampler_mode="first_k", num_nodes=g.num_nodes,
    )
    params = init_sage_params(jax.random.key(0), cfg)
    fn = make_activations_fn(cfg)
    B = 8
    acts = fn(params, jnp.asarray(feats), jnp.asarray(adj),
              jnp.arange(B, dtype=jnp.int32), jax.random.key(1))
    assert set(acts) == {
        "acts/input", "acts/layer_0/hop_0", "acts/layer_0/hop_1",
        "acts/layer_1/hop_0",
    }
    assert acts["acts/layer_0/hop_0"].shape == (B, 2 * 10)  # concat
    assert acts["acts/layer_0/hop_1"].shape == (B * 3, 2 * 10)
    assert acts["acts/layer_1/hop_0"].shape == (B, 2 * 6)
    assert np.isfinite(np.asarray(acts["acts/layer_1/hop_0"])).all()
