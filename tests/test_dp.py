"""P1 pure-data-parallel tests on the virtual 8-device CPU mesh.

The --data_shards chunk runners must reproduce the single-device chunk
runners bit-for-bit under the deterministic first_k sampler (the same
acceptance bar test_graph_sharded.py applies to P2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
from graphsage_tpu.models.supervised import (
    SupervisedConfig,
    init_supervised_params,
    make_optimizer,
)
from graphsage_tpu.parallel.dp import (
    make_dp_supervised_chunk_runner,
    make_dp_unsupervised_chunk_runner,
    make_supervised_chunk_runner,
    make_unsupervised_chunk_runner,
)

D = 8


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:D]), ("data",))


def _sup_setup(toy_graph, weight_decay=0.05):
    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes,
                           weight_decay=weight_decay)
    params = init_supervised_params(jax.random.key(0), sup)
    labels_table = jnp.asarray(
        np.vstack([g.labels, np.zeros((1, g.num_classes), np.float32)])
    )
    return g, adj, feats, sup, params, labels_table


def test_dp_supervised_chunk_matches_single_device(mesh, toy_graph):
    g, adj, feats, sup, params, labels_table = _sup_setup(toy_graph)
    optimizer = make_optimizer(0.01)
    B = 16
    n_steps = 3
    ids_perm = jnp.asarray(
        np.arange(n_steps * B, dtype=np.int32) % g.num_nodes
    )
    rng = jax.random.key(7)

    single = jax.jit(
        make_supervised_chunk_runner(sup, optimizer, B),
        donate_argnums=(0, 1),
    )
    p1, _, loss1, logits1, ids1 = single(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feats), jnp.asarray(adj), ids_perm, labels_table,
        0, n_steps,
    )

    dp = make_dp_supervised_chunk_runner(sup, optimizer, mesh, B)
    p2, _, loss2, logits2, ids2 = dp(
        params, optimizer.init(params), rng, jnp.asarray(feats),
        jnp.asarray(adj), ids_perm, labels_table, 0, n_steps,
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids2), np.asarray(ids1))
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(logits1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p2["head"]["w"]), np.asarray(p1["head"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_dp_unsupervised_chunk_matches_single_device(mesh, toy_graph):
    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
    )
    from graphsage_tpu.nn.negative import unigram_cdf

    g = toy_graph
    adj, deg, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        num_nodes=g.num_nodes,
    )
    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=5,
                               weight_decay=0.01)
    params = init_unsupervised_params(jax.random.key(0), unsup)
    optimizer = make_optimizer(1e-3)
    neg_cdf = jnp.asarray(unigram_cdf(deg))

    B = 16
    n_steps = 3
    pairs = g.edges[: n_steps * B].astype(np.int32)
    pairs_perm = jnp.asarray(pairs)
    rng = jax.random.key(9)
    shadow0 = jnp.asarray(-1.0)

    single = jax.jit(
        make_unsupervised_chunk_runner(unsup, optimizer, B, g.num_nodes),
        donate_argnums=(0, 1),
    )
    p1, _, sh1, loss1, mrr1 = single(
        jax.tree.map(jnp.copy, params), optimizer.init(params), shadow0,
        rng, jnp.asarray(feats), jnp.asarray(adj), pairs_perm, neg_cdf,
        0, n_steps,
    )

    dp = make_dp_unsupervised_chunk_runner(unsup, optimizer, mesh, B)
    p2, _, sh2, loss2, mrr2 = dp(
        params, optimizer.init(params), shadow0, rng, jnp.asarray(feats),
        jnp.asarray(adj), pairs_perm, neg_cdf, 0, n_steps,
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(float(mrr2), float(mrr1), rtol=1e-5)
    np.testing.assert_allclose(float(sh2), float(sh1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p2["aggs"][0]["self_w"]),
        np.asarray(p1["aggs"][0]["self_w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_data_shards_trainer_end_to_end(tmp_path, toy_graph):
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=2, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=4,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), data_shards=D, seed=123,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    assert result["val_f1_mic"] > 0.4


def test_n_model_shards_trainer_end_to_end(tmp_path, toy_graph):
    """--n_model_shards: dp+tp pjit path (feature-dim split) trains and
    reaches the same quality bar."""
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=2, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=4,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), data_shards=4, n_model_shards=2,
        seed=123,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    assert result["val_f1_mic"] > 0.4


def test_data_shards_unsup_trainer(tmp_path, toy_graph):
    import os

    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.unsupervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=1, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=4,
        validate_batch_size=8, print_every=1000, max_total_steps=8,
        base_log_dir=str(tmp_path), data_shards=D, seed=123,
        random_context=False, neg_sample_size=4,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    emb = np.load(os.path.join(result["log_dir"], "val.npy"))
    assert emb.shape[0] == toy_graph.num_nodes


@pytest.mark.parametrize("agg", ["maxpool", "meanpool", "twomaxpool",
                                 "seq"])
def test_dp_step_matches_single_device_pool_seq(mesh, toy_graph, agg):
    """The pooled/seq aggregator zoo through the P1 data-parallel path:
    one DP SGD step (batch split over the data axis, psum'd grads) must
    reproduce the single-device loss and params (= lr*grad) under
    first_k. SGD keeps the probe well-conditioned — Adam's first step
    is ~lr*sign(grad) and amplifies psum-ordering rounding on
    near-zero pooled-MLP grads (see the P2 twin in
    test_graph_sharded.py)."""
    import optax

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator=agg,
        sampler_mode="first_k",
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    labels_table = jnp.asarray(
        np.vstack([g.labels, np.zeros((1, g.num_classes), np.float32)])
    )
    optimizer = optax.sgd(0.05)

    B = 16
    ids_perm = jnp.asarray(np.arange(B, dtype=np.int32) % g.num_nodes)
    rng = jax.random.key(7)
    args = (rng, jnp.asarray(feats), jnp.asarray(adj), ids_perm,
            labels_table, 0, 1)

    single = jax.jit(make_supervised_chunk_runner(sup, optimizer, B))
    p1, _, loss1, _, _ = single(
        jax.tree.map(jnp.copy, params), optimizer.init(params), *args
    )

    dp = make_dp_supervised_chunk_runner(sup, optimizer, mesh, B)
    p2, _, loss2, _, _ = dp(
        jax.tree.map(jnp.copy, params), optimizer.init(params), *args
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)

    def check(path, v1, v2):
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(check, p1, p2)


def test_n2v_chunk_runner_update_mask_is_runtime_arg():
    """The retrain freeze mask rides as a RUNNER ARGUMENT (a closed-over
    [N+1] table would embed an O(N) constant in the jit graph, which
    the remote-compile tunnel rejects — CLAUDE.md). Frozen context rows
    must not move; unfrozen ones must."""
    from graphsage_tpu.models import node2vec as n2v
    from graphsage_tpu.nn.negative import unigram_logits
    from graphsage_tpu.parallel.dp import make_node2vec_chunk_runner

    N = 50
    config = n2v.Node2VecConfig(num_nodes=N + 1, dim=8, neg_sample_size=4,
                                learning_rate=0.5)
    params = n2v.init_node2vec_params(jax.random.key(0), config)
    ctx_before = np.asarray(params["context"]).copy()
    optimizer = n2v.make_optimizer(0.5)
    opt_state = optimizer.init(params)

    B, n_steps = 8, 4
    rng_np = np.random.default_rng(2)
    pairs = rng_np.integers(0, N, (n_steps * B, 2)).astype(np.int32)
    pairs[:, 1] = np.arange(n_steps * B) % N  # contexts cover all ids
    uni = jnp.asarray(np.asarray(unigram_logits(
        np.ones((N + 1,), np.float32))))
    update_mask = np.zeros((N + 1,), np.float32)
    update_mask[25:] = 1.0

    runner = jax.jit(make_node2vec_chunk_runner(
        config, optimizer, B, N, with_update_mask=True,
    ))
    params2, _, _, loss, _ = runner(
        params, opt_state, jnp.asarray(-1.0), jax.random.key(5),
        jnp.asarray(pairs), uni, 0, n_steps, jnp.asarray(update_mask),
    )
    assert np.isfinite(float(loss))
    ctx_after = np.asarray(params2["context"])
    np.testing.assert_array_equal(ctx_after[:25], ctx_before[:25])
    assert np.abs(ctx_after[25:] - ctx_before[25:]).max() > 0
    # target table is never frozen
    assert np.abs(
        np.asarray(params2["target"]) - np.asarray(params["target"])
    ).max() > 0


def test_n2v_train_step_update_mask_and_flag_mismatch_guard():
    """make_node2vec_train_step honors the runtime freeze mask like the
    chunk runner, and both factories reject a flag/mask mismatch at
    trace time instead of crashing opaquely (flag set, mask missing) or
    silently dropping the freeze (mask passed, flag unset)."""
    import pytest

    from graphsage_tpu.models import node2vec as n2v
    from graphsage_tpu.nn.negative import unigram_logits
    from graphsage_tpu.parallel.dp import (
        make_node2vec_chunk_runner,
        make_node2vec_train_step,
    )

    N = 40
    config = n2v.Node2VecConfig(num_nodes=N + 1, dim=8, neg_sample_size=4,
                                learning_rate=0.5)
    params = n2v.init_node2vec_params(jax.random.key(0), config)
    ctx_before = np.asarray(params["context"]).copy()
    optimizer = n2v.make_optimizer(0.5)
    opt_state = optimizer.init(params)

    B = 8
    b1 = jnp.arange(B, dtype=jnp.int32)
    b2 = jnp.arange(B, 2 * B, dtype=jnp.int32)  # contexts: rows 8..15
    mask = jnp.ones(B, dtype=jnp.float32)
    uni = jnp.asarray(np.asarray(unigram_logits(
        np.ones((N + 1,), np.float32))))
    update_mask = np.zeros((N + 1,), np.float32)
    update_mask[12:] = 1.0  # freeze context rows < 12

    step = jax.jit(make_node2vec_train_step(
        config, optimizer, with_update_mask=True,
    ))
    params2, _, loss, _ = step(
        params, opt_state, jax.random.key(3), b1, b2, mask, uni,
        jnp.asarray(update_mask),
    )
    assert np.isfinite(float(loss))
    ctx_after = np.asarray(params2["context"])
    np.testing.assert_array_equal(ctx_after[:12], ctx_before[:12])
    assert np.abs(ctx_after[12:16] - ctx_before[12:16]).max() > 0

    # mismatch guards, both directions, both factories
    with pytest.raises(ValueError, match="no update_mask"):
        step(params, opt_state, jax.random.key(3), b1, b2, mask, uni)
    step_nomask = make_node2vec_train_step(config, optimizer)
    with pytest.raises(ValueError, match="with_update_mask=False"):
        step_nomask(params, opt_state, jax.random.key(3), b1, b2, mask,
                    uni, jnp.asarray(update_mask))
    runner = make_node2vec_chunk_runner(config, optimizer, B, N,
                                        with_update_mask=True)
    with pytest.raises(ValueError, match="no update_mask"):
        runner(params, opt_state, jnp.asarray(-1.0), jax.random.key(5),
               jnp.zeros((B, 2), jnp.int32), uni, 0, 1)
