"""P2 graph-sharding tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphsage_tpu.parallel.graph_sharded import (
    exchange_gather,
    make_sharded_supervised_step,
    make_sharded_unsupervised_step,
    shard_rows,
)

D = 8


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:D]), ("graph",))


def _replicated_gather(mesh, table, idx, capacity):
    local_t, _ = shard_rows(np.asarray(table), D)
    f = shard_map(
        functools.partial(
            exchange_gather, axis_name="graph", capacity=capacity
        ),
        mesh=mesh,
        in_specs=(P("graph"), P()),
        out_specs=P(),
        check_vma=False,
    )
    return np.asarray(f(jnp.asarray(local_t), jnp.asarray(idx)))


def test_exchange_gather_matches_take(mesh, np_rng):
    table = np_rng.standard_normal((37, 5)).astype(np.float32)
    idx = np_rng.integers(0, 37, (23,)).astype(np.int32)
    out = _replicated_gather(mesh, table, idx, capacity=23)
    np.testing.assert_allclose(out, table[idx], rtol=1e-6)


def test_exchange_gather_block_layout(mesh, np_rng):
    """layout="block" (contiguous row ranges) reads the same global rows
    as the default strided layout when table and gather agree."""
    table = np_rng.standard_normal((37, 5)).astype(np.float32)
    idx = np_rng.integers(0, 37, (23,)).astype(np.int32)
    local_t, _ = shard_rows(np.asarray(table), D, layout="block")
    f = shard_map(
        functools.partial(
            exchange_gather, axis_name="graph", capacity=23,
            layout="block",
        ),
        mesh=mesh,
        in_specs=(P("graph"), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = np.asarray(f(jnp.asarray(local_t), jnp.asarray(idx)))
    np.testing.assert_allclose(out, table[idx], rtol=1e-6)


def test_shard_rows_strided_canonical_roundtrip(np_rng):
    """embeds_to_canonical inverts shard_rows' strided permutation: the
    checkpoint-side reordering recovers exact id order, pad rows at the
    tail."""
    from graphsage_tpu.parallel.graph_sharded import (
        embeds_to_canonical,
        embeds_to_device_layout,
    )

    table = np_rng.standard_normal((37, 3)).astype(np.float32)
    dev, ss = shard_rows(table, D)
    assert dev.shape[0] == D * ss
    tree = {"embeds": jnp.asarray(dev)}
    canon = embeds_to_canonical(tree, D, "strided")
    np.testing.assert_array_equal(np.asarray(canon["embeds"])[:37], table)
    assert not np.asarray(canon["embeds"])[37:].any()
    back = embeds_to_device_layout(canon, D, "strided")
    np.testing.assert_array_equal(np.asarray(back["embeds"]), dev)
    # non-embeds leaves pass through untouched
    tree2 = {"dense": {"w": jnp.asarray(table)}}
    np.testing.assert_array_equal(
        np.asarray(embeds_to_canonical(tree2, D, "strided")["dense"]["w"]),
        table,
    )


def test_exchange_gather_int_rows(mesh, np_rng):
    table = np_rng.integers(0, 100, (24, 4)).astype(np.int32)
    idx = np_rng.integers(0, 24, (11,)).astype(np.int32)
    out = _replicated_gather(mesh, table, idx, capacity=11)
    np.testing.assert_array_equal(out, table[idx])


def test_exchange_gather_capacity_overflow_zeros(mesh):
    table = np.arange(16, dtype=np.float32).reshape(16, 1) + 1.0
    # all requests hit shard 0 (rows 0..1); capacity 3 < 6 requests.
    # split_local=False: every device routes all 6 through the
    # all-to-all, so the overflow behavior is device-uniform.
    local_t, _ = shard_rows(table, D)
    f = shard_map(
        functools.partial(
            exchange_gather, axis_name="graph", capacity=3,
            split_local=False,
        ),
        mesh=mesh,
        in_specs=(P("graph"), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = np.asarray(f(jnp.asarray(local_t), jnp.asarray(np.zeros(6, np.int32))))
    assert (out[:3] == 1.0).all()
    assert (out[3:] == 0.0).all()


def test_exchange_gather_reports_dropped(mesh):
    table = np.arange(16, dtype=np.float32).reshape(16, 1) + 1.0
    idx = np.zeros(6, dtype=np.int32)  # every request hits shard 0

    f = shard_map(
        functools.partial(
            exchange_gather, axis_name="graph", capacity=3,
            return_dropped=True, split_local=False,
        ),
        mesh=mesh,
        in_specs=(P("graph"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    local_t, _ = shard_rows(table, D)
    out, dropped = f(jnp.asarray(local_t), jnp.asarray(idx))
    # 6 requests, capacity 3 -> 3 dropped on this (replicated) request set
    assert int(dropped) == 3
    assert (np.asarray(out)[3:] == 0.0).all()


def test_exchange_gather_split_local_never_drops_own_rows(mesh):
    """With split_local (default), a device's requests for rows it owns
    bypass the all-to-all: they are exact regardless of capacity, and
    only REMOTE requests count against the budget / dropped counter."""
    table = np.arange(16, dtype=np.float32).reshape(16, 1) + 1.0
    idx = np.zeros(6, dtype=np.int32)  # all rows owned by shard 0

    def body(local, idx):
        out, dropped = exchange_gather(
            local, idx, axis_name="graph", capacity=3,
            return_dropped=True,
        )
        return out, dropped[None]

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("graph"), P()),
        out_specs=(P("graph"), P("graph")),
        check_vma=False,
    )
    local_t, _ = shard_rows(table, D)
    out, dropped = f(jnp.asarray(local_t), jnp.asarray(idx))
    out = np.asarray(out).reshape(D, 6)
    dropped = np.asarray(dropped)
    # shard 0 serves itself: all 6 exact, nothing dropped
    assert (out[0] == 1.0).all() and dropped[0] == 0
    # every other shard: remote, capacity 3 -> 3 good + 3 zero rows
    assert (out[1:, :3] == 1.0).all() and (out[1:, 3:] == 0.0).all()
    assert (dropped[1:] == 3).all()


def test_exchange_gather_split_matches_blocking(mesh, np_rng):
    """split_local and the round-2 blocking formulation return
    bit-identical rows when nothing overflows."""
    table = np_rng.standard_normal((41, 3)).astype(np.float32)
    idx = np_rng.integers(0, 41, (29,)).astype(np.int32)
    local_t, _ = shard_rows(table, D)

    def run(split):
        f = shard_map(
            functools.partial(
                exchange_gather, axis_name="graph", capacity=29,
                split_local=split,
            ),
            mesh=mesh,
            in_specs=(P("graph"), P()),
            out_specs=P(),
            check_vma=False,
        )
        return np.asarray(f(jnp.asarray(local_t), jnp.asarray(idx)))

    a, b = run(True), run(False)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, table[idx])


def test_global_masked_mrr_ignores_empty_shards(mesh):
    """A dummy-padded tail batch whose slice on most shards is ALL
    padding must not bias the MRR low: the global value is the masked
    mean over real pairs only (psum(rr*cnt)/psum(cnt)), not a pmean of
    per-shard means."""
    from graphsage_tpu.nn.prediction import mrr_and_ranks
    from graphsage_tpu.parallel.graph_sharded import _global_masked_mrr

    # per-shard batch of 2; only shard 0 has real pairs (rr = 1 and 1/3)
    aff = np.zeros((D, 2), np.float32)
    neg_aff = np.full((D, 2, 4), -1.0, np.float32)
    neg_aff[0, 1, :2] = 1.0  # shard 0 pair 1: rank 3 -> rr 1/3
    mask = np.zeros((D, 2), np.float32)
    mask[0] = 1.0

    def f(aff, neg_aff, mask):
        _, mrr = mrr_and_ranks(aff[0], neg_aff[0], mask[0])
        return _global_masked_mrr(mrr, mask[0], "graph")

    out = shard_map(
        f, mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph")),
        out_specs=P(), check_vma=False,
    )(jnp.asarray(aff), jnp.asarray(neg_aff), jnp.asarray(mask))
    np.testing.assert_allclose(float(out), (1.0 + 1.0 / 3.0) / 2.0,
                               rtol=1e-6)


def test_suggest_capacity_factor():
    from graphsage_tpu.parallel.graph_sharded import (
        suggest_capacity_factor,
    )

    rng = np.random.default_rng(0)
    # uniform ownership -> factor ~= margin
    adj_u = rng.integers(0, 1000, (1000, 16)).astype(np.int32)
    f_u = suggest_capacity_factor(adj_u, 8, margin=1.5)
    assert 1.0 <= f_u <= 2.0
    # low-id hubs: under BLOCK layout every request hits shard 0 and the
    # factor saturates at n_shards; the default STRIDED layout spreads
    # the same ids over id % 8 and the factor stays near the margin —
    # the load-flattening that motivates strided ownership.
    adj_s = rng.integers(0, 100, (1000, 16)).astype(np.int32)
    f_s = suggest_capacity_factor(adj_s, 8, margin=1.5, layout="block")
    assert f_s == 8.0
    f_flat = suggest_capacity_factor(adj_s, 8, margin=1.5)
    assert 1.0 <= f_flat <= 2.0


def test_sharded_step_counts_dropped_on_skew(mesh, toy_graph, monkeypatch):
    """A skewed batch under a too-small capacity_factor must REPORT its
    dropped requests instead of silently zero-filling."""
    import graphsage_tpu.parallel.graph_sharded as gs
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )

    monkeypatch.setattr(gs, "EXACT_CAPACITY_MAX", 0)  # force budgeted path
    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.01)

    B = 16
    ids = np.zeros(B, dtype=np.int32)  # whole batch owned by shard 0
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    step = gs.make_sharded_supervised_step(sup, optimizer, mesh,
                                           capacity_factor=1.0)
    _, _, loss, _, dropped = step(
        params, optimizer.init(params), jax.random.key(7),
        jnp.asarray(feat_sh), jnp.asarray(adj_sh), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) > 0
    assert np.isfinite(float(loss))


def test_sharded_supervised_step_matches_single_device(mesh, toy_graph):
    """With the deterministic first_k sampler the sharded step's loss is
    exactly the single-device loss."""
    import dataclasses

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
        supervised_loss,
    )

    g = toy_graph
    adj, deg, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()

    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes,
                           sigmoid_loss=False, weight_decay=0.01)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.01)
    opt_state = optimizer.init(params)

    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    ref_loss, _ = supervised_loss(
        params, jnp.asarray(feats), jnp.asarray(adj), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask), rng, sup,
        deterministic=True,
    )

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    w_before = np.asarray(params["head"]["w"])  # params donated below
    step = make_sharded_supervised_step(sup, optimizer, mesh,
                                        capacity_factor=8.0)
    params2, opt_state2, loss, preds, dropped = step(
        params, opt_state, rng, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    assert preds.shape == (B, g.num_classes)
    # one optimizer step actually happened
    diff = np.abs(np.asarray(params2["head"]["w"]) - w_before).max()
    assert diff > 0


def test_sharded_identity_embeds_match_single_device(mesh, toy_graph):
    """identity_dim > 0: the row-sharded trainable table gets the same
    one-step update as the single-device path (grads routed home through
    the all-to-all transpose)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.parallel.dp import make_supervised_train_step

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        identity_dim=4,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)
    opt_state = optimizer.init(params)

    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    # single-device step (dropout=0 => deterministic forward; sampling
    # pinned by first_k so rng derivation differences don't matter)
    single = make_supervised_train_step(sup, optimizer)
    p1, _, loss1, _ = jax.jit(single)(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feats), jnp.asarray(adj), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask),
    )

    # sharded step with row-sharded embeds
    emb_sh, _ = shard_rows(np.asarray(params["embeds"]), D)
    params_sh = dict(params)
    params_sh["embeds"] = jnp.asarray(emb_sh)
    opt_sh = optimizer.init(params_sh)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh, capacity_factor=8.0,
        params_like=params_sh, opt_state_like=opt_sh,
    )
    p2, _, loss2, _, _ = step(
        params_sh, opt_sh, rng, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    n_rows = g.num_nodes + 1
    # p2["embeds"] is in the strided device layout — canonicalize rows
    # (the same reordering checkpoints apply) before comparing.
    from graphsage_tpu.parallel.graph_sharded import embeds_to_canonical

    p2 = embeds_to_canonical(p2, D, "strided")
    np.testing.assert_allclose(
        np.asarray(p2["embeds"])[:n_rows], np.asarray(p1["embeds"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p2["head"]["w"]), np.asarray(p1["head"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_sharded_chunk_runner_matches_single_device(mesh, toy_graph):
    """The chunk runner (the path _train_sharded actually uses) matches
    the single-device loss INCLUDING weight decay under first_k."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
        supervised_loss,
    )
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_chunk_runner,
    )

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    B = 16
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes,
                           weight_decay=0.05)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.01)

    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    ref_loss, _ = supervised_loss(
        params, jnp.asarray(feats), jnp.asarray(adj), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask), rng, sup,
        deterministic=True,
    )

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    labels_table = jnp.asarray(
        np.vstack([g.labels, np.zeros((1, g.num_classes), np.float32)])
    )
    run = make_sharded_supervised_chunk_runner(
        sup, optimizer, mesh, B, capacity_factor=8.0,
    )
    _, _, loss, preds, last_ids, dropped = run(
        params, optimizer.init(params), rng, jnp.asarray(feat_sh),
        jnp.asarray(adj_sh), jnp.asarray(ids), labels_table, 0, 1,
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(last_ids), ids)


def test_graph_shards_trainer_end_to_end(tmp_path, toy_graph):
    """--graph_shards path: the full supervised trainer over the 8-device
    CPU mesh trains and writes the stats contract."""
    import os

    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=2, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=4,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), graph_shards=D, seed=123,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    assert result["val_f1_mic"] > 0.4
    log_dir = flags.log_dir("supervised")
    assert os.path.exists(os.path.join(log_dir, "val_stats.txt"))
    assert os.path.exists(os.path.join(log_dir, "test_stats.txt"))


def test_single_shard_fused_inner_matches_plain(toy_graph):
    """On a 1-device mesh the sharded step's fused inner-hop fast path
    (fuse_inner -> fused_gather_mean + last_hop_neigh_mean) reproduces
    the plain single-device step (lane-padded table, sliced back)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim
    from graphsage_tpu.parallel.dp import make_supervised_train_step

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        fused_gather=True,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)

    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    single = make_supervised_train_step(sup, optimizer)
    p1, _, loss1, _ = jax.jit(single)(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(pad_feature_dim(feats)), jnp.asarray(adj),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    opt2 = optimizer.init(params)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh1, capacity_factor=1.0,
        params_like=params, opt_state_like=opt2,
    )
    p2, _, loss2, _, dropped = step(
        jax.tree.map(jnp.copy, params), opt2, rng,
        jnp.asarray(pad_feature_dim(feats)), jnp.asarray(adj),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p2["head"]["w"]), np.asarray(p1["head"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_graph_shards_block_layout_and_cross_layout_resume(
        tmp_path, toy_graph):
    """--shard_layout block trains end-to-end, and a checkpoint written
    under the default strided layout resumes under block (checkpoints
    store the identity table in canonical id order)."""
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    base = dict(
        train_prefix=str(tmp_path / "synth"),
        epochs=1, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=1000,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), seed=123, identity_dim=4,
        graph_shards=4,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
    )
    r1 = train(TrainFlags(**base, max_total_steps=4), graph=toy_graph)
    assert r1["steps"] >= 4
    r2 = train(TrainFlags(**base, shard_layout="block",
                          max_total_steps=8, resume=True),
               graph=toy_graph)
    assert np.isfinite(r2["val_loss"])
    assert r2["steps"] > r1["steps"]


def test_graph_shards_unsupervised_trainer(tmp_path, toy_graph):
    import os

    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.unsupervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=1, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=4,
        validate_batch_size=8, print_every=1000, max_total_steps=8,
        base_log_dir=str(tmp_path), graph_shards=D, seed=123,
        random_context=False, neg_sample_size=4,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    emb = np.load(os.path.join(result["log_dir"], "val.npy"))
    assert emb.shape[0] == toy_graph.num_nodes
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_graph_shards_unsup_full_val(tmp_path, toy_graph):
    """--graph_shards + validate_batch_size=-1: the sharded full-val-set
    sweep runs and yields finite metrics."""
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.unsupervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=1, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=2,
        validate_batch_size=-1, print_every=1000, max_total_steps=4,
        base_log_dir=str(tmp_path), graph_shards=D, seed=123,
        random_context=False, neg_sample_size=4, save_embeddings=False,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    assert 0.0 <= result["val_mrr"] <= 1.0


def test_graph_shards_checkpoint_restore_different_shard_count(
        tmp_path, toy_graph):
    """A checkpoint written under graph_shards=4 (row-sharded identity
    table saved per its global sharding) restores into a graph_shards=2
    layout and training continues from the saved step."""
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    base = dict(
        train_prefix=str(tmp_path / "synth"),
        epochs=1, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=1000,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), seed=123, identity_dim=4,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
    )
    r1 = train(TrainFlags(**base, graph_shards=4, max_total_steps=4),
               graph=toy_graph)
    assert r1["steps"] >= 4
    r2 = train(TrainFlags(**base, graph_shards=2, max_total_steps=8,
                          resume=True), graph=toy_graph)
    assert np.isfinite(r2["val_loss"])
    assert r2["steps"] > r1["steps"]


def test_sharded_unsupervised_step_runs(mesh, toy_graph):
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import make_optimizer
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
    )
    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=5)
    params = init_unsupervised_params(jax.random.key(0), unsup)
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)

    B = 16
    edges = g.edges[:B]
    mask = np.ones(B, dtype=np.float32)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    neg_cdf = jnp.asarray(unigram_cdf(deg))

    step = make_sharded_unsupervised_step(unsup, optimizer, mesh,
                                          capacity_factor=8.0)
    params, opt_state, loss, mrr, out1, _ = step(
        params, opt_state, jax.random.key(1), jnp.asarray(feat_sh),
        jnp.asarray(adj_sh), jnp.asarray(edges[:, 0]),
        jnp.asarray(edges[:, 1]), jnp.asarray(mask), neg_cdf,
    )
    assert np.isfinite(float(loss))
    assert 0.0 <= float(mrr) <= 1.0
    assert out1.shape == (B, sage.output_dim)


def test_single_shard_fused_inner_unsupervised(toy_graph):
    """fuse_inner in the unsupervised sharded step (three towers batched
    through one pyramid): D=1 fused matches D=1 unfused."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import make_optimizer
    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
    )
    from graphsage_tpu.nn.negative import unigram_cdf
    from graphsage_tpu.ops.gather import pad_feature_dim

    g = toy_graph
    adj, deg, _ = build_both_adjs(g, max_degree=8)
    feats = pad_feature_dim(g.padded_features())
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    B = 16
    edges = g.edges[:B]
    mask = np.ones(B, dtype=np.float32)
    neg_cdf = jnp.asarray(unigram_cdf(deg))

    outs = []
    for fused in (False, True):
        sage = SAGEConfig(
            layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
            feature_dim=g.padded_features().shape[1],
            aggregator="mean",
            sampler_mode="first_k",
            fused_gather=fused,
            num_nodes=g.num_nodes,
        )
        unsup = UnsupervisedConfig(sage=sage, neg_sample_size=5)
        params = init_unsupervised_params(jax.random.key(0), unsup)
        optimizer = make_optimizer(1e-4)
        step = make_sharded_unsupervised_step(unsup, optimizer, mesh1,
                                              capacity_factor=1.0)
        p, _, loss, mrr, out, _ = step(
            params, optimizer.init(params), jax.random.key(1),
            jnp.asarray(feats), jnp.asarray(adj),
            jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]),
            jnp.asarray(mask), neg_cdf,
        )
        outs.append((float(loss), float(mrr), np.asarray(out)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    np.testing.assert_allclose(outs[0][2], outs[1][2],
                               rtol=1e-4, atol=1e-6)


def test_halo_overlap_matches_blocking_bitwise(mesh, toy_graph):
    """The overlap halo schedule (interleaved feature/adjacency
    exchanges + split-local fast path) matches the round-2 blocking
    schedule: forward embeddings bitwise; grads through the row-sharded
    identity table to float tolerance (the split-local path accumulates
    the owner's local scatter-add separately from the all-to-all-
    transposed remote contributions, so float summation order
    differs)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
    )
    from graphsage_tpu.parallel.graph_sharded import sharded_sage_embed

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        identity_dim=4,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    emb_sh, _ = shard_rows(np.asarray(params["embeds"]), D)
    params = dict(params)
    params["embeds"] = jnp.asarray(emb_sh)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    ids = jnp.asarray(np.arange(16, dtype=np.int32))
    rng = jax.random.key(3)

    def run(halo):
        def body(params, feat_local, adj_local, ids):
            def scalar_out(params):
                out = sharded_sage_embed(
                    params, feat_local, adj_local, ids, rng, sage,
                    "graph", capacity_factor=8.0, halo=halo,
                )
                return jnp.sum(out * out), out

            (val, out), grads = jax.value_and_grad(
                scalar_out, has_aux=True)(params)
            # embeds grads are per-shard (routed home); return this
            # shard's block, everything else is replicated
            return out, grads["embeds"], grads["aggs"][0]["self_w"]

        emb_spec = P("graph")
        f = shard_map(
            body, mesh=mesh,
            in_specs=({"embeds": emb_spec, "aggs": P(), "head": P()},
                      P("graph"), P("graph"), P()),
            out_specs=(P(), emb_spec, P()),
            check_vma=False,
        )
        out, gemb, gw = f(params, jnp.asarray(feat_sh),
                          jnp.asarray(adj_sh), ids)
        return np.asarray(out), np.asarray(gemb), np.asarray(gw)

    out_o, gemb_o, gw_o = run("overlap")
    out_b, gemb_b, gw_b = run("blocking")
    np.testing.assert_array_equal(out_o, out_b)
    np.testing.assert_allclose(gemb_o, gemb_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(gw_o, gw_b)


def test_graph_shards_deferred_features_parity(tmp_path, toy_graph):
    """--defer_features: per-host shard loading (mmap row ranges via
    put_global_rows + load_feature_shard) is numerically identical to the
    eager in-memory sharded path (SURVEY §7 stage 7)."""
    from graphsage_tpu.data.synthetic import write_dataset
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    prefix = str(tmp_path / "ds" / "synth")
    write_dataset(toy_graph, prefix)
    base = dict(
        train_prefix=prefix, epochs=1, batch_size=16, samples_1=4,
        samples_2=3, dim_1=8, dim_2=8, max_degree=8, validate_iter=1000,
        validate_batch_size=8, print_every=1000, graph_shards=D, seed=123,
        sampler_mode="first_k",
    )
    r_eager = train(TrainFlags(base_log_dir=str(tmp_path / "a"), **base))
    r_lazy = train(TrainFlags(base_log_dir=str(tmp_path / "b"),
                              defer_features=True, **base))
    np.testing.assert_allclose(r_lazy["val_loss"], r_eager["val_loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_lazy["val_f1_mic"], r_eager["val_f1_mic"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_lazy["test_f1_mic"], r_eager["test_f1_mic"],
                               rtol=1e-6)


def test_multi_shard_split_fused_inner_matches_plain(mesh, toy_graph):
    """D=8 + fused_gather: the split inner-hop mean (local fraction via
    the weighted gather kernel, remote fraction via a remote_only
    exchange, partial sums added) reproduces the plain single-device
    step — allclose, not bitwise: the split reorders the f32 sample
    sum (graph_sharded.py fuse_inner)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim
    from graphsage_tpu.parallel.dp import make_supervised_train_step

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = pad_feature_dim(g.padded_features())
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=g.padded_features().shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        fused_gather=True,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)

    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    single = make_supervised_train_step(sup, optimizer)
    p1, _, loss1, _ = jax.jit(single)(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feats), jnp.asarray(adj),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    opt2 = optimizer.init(params)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh, capacity_factor=8.0,
        params_like=params, opt_state_like=opt2,
    )
    p2, _, loss2, _, dropped = step(
        jax.tree.map(jnp.copy, params), opt2, rng,
        jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        p2, p1,
    )


def test_exchange_gather_remote_only_zeroes_local(mesh, np_rng):
    """remote_only returns remote-owned rows and ZERO rows for local
    positions; plus-split with a direct local take reproduces the full
    gather."""
    table = np_rng.standard_normal((40, 4)).astype(np.float32)
    idx = np_rng.integers(0, 40, (17,)).astype(np.int32)
    local_t, _ = shard_rows(np.asarray(table), D)

    def f(local, i):
        rem = exchange_gather(local, i, "graph", capacity=17,
                              remote_only=True)
        me = jax.lax.axis_index("graph")
        is_local = (i % D) == me
        loc = jnp.where(
            is_local[:, None],
            jnp.take(local, jnp.where(is_local, i // D, 0), axis=0),
            0.0,
        )
        # rem is zero exactly at this shard's own rows, so adding a
        # direct local take must reconstruct the full gather on EVERY
        # shard (any nonzero leak at local positions would break this)
        return rem + loc

    g = shard_map(
        f, mesh=mesh, in_specs=(P("graph"), P()),
        out_specs=P(None), check_vma=False,
    )
    full = g(jnp.asarray(local_t), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(full), table[idx], rtol=1e-6)


def test_composed_data_graph_mesh_matches_single_device(toy_graph):
    """P1xP2 composition: a (2, 4) ("data", "graph") mesh — batch split
    over data x graph, tables graph-sharded/data-replicated, halo
    exchange scoped to each slice's graph axis, grads psum'd over both
    axes (embeds over data only) — reproduces the single-device step
    (distributed.py::data_graph_mesh deployment shape)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.parallel.dp import make_supervised_train_step
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_chunk_runner,
    )

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
                           sigmoid_loss=False, weight_decay=0.01)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)

    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels_table = np.zeros((g.num_nodes + 1, g.num_classes), np.float32)
    labels_table[:g.num_nodes] = np.asarray(g.labels, np.float32)
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    # single-device 2-step reference (same rng folding as the runner)
    single = jax.jit(make_supervised_train_step(sup, optimizer))
    p1 = jax.tree.map(jnp.copy, params)
    o1 = optimizer.init(params)
    for step_idx in range(2):
        bid = ids  # same batch both steps (ids_perm repeats below)
        p1, o1, loss1, _ = single(
            p1, o1, jax.random.fold_in(rng, step_idx),
            jnp.asarray(feats), jnp.asarray(adj), jnp.asarray(bid),
            jnp.asarray(labels_table[bid]), jnp.asarray(mask),
        )

    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    feat_sh, _ = shard_rows(feats, 4)
    adj_sh, _ = shard_rows(adj, 4)
    o2 = optimizer.init(params)
    runner = make_sharded_supervised_chunk_runner(
        sup, optimizer, mesh2d, B, capacity_factor=4.0,
        params_like=params, opt_state_like=o2, data_axis="data",
    )
    ids_perm = jnp.asarray(np.concatenate([ids, ids]))
    p2, o2, loss2, preds, last_ids, dropped = runner(
        jax.tree.map(jnp.copy, params), o2, rng,
        jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        ids_perm, jnp.asarray(labels_table), 0, 2,
    )
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(last_ids), ids)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        p2, p1,
    )


def test_composed_unsup_matches_1d_eight_shard(toy_graph):
    """Unsupervised composed (2, 4) data x graph runner reproduces the
    1-D 8-shard runner: identical device->batch mapping and per-device
    negative draws, exact (capacity-sufficient) gathers either way —
    only the exchange topology (4-shard groups vs 8 shards) and psum
    grouping differ, which cannot change values beyond f32 ordering."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
    )
    from graphsage_tpu.models.supervised import make_optimizer
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_unsupervised_chunk_runner,
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
    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=4)
    params = init_unsupervised_params(jax.random.key(0), unsup)
    optimizer = make_optimizer(0.05)
    B = 16
    pairs = np.stack([np.arange(B, dtype=np.int32),
                      np.arange(B, dtype=np.int32)[::-1]], 1)
    pairs_perm = jnp.asarray(np.concatenate([pairs, pairs]))
    cdf = jnp.asarray(np.asarray(unigram_cdf(
        np.concatenate([deg, [0]]).astype(np.float32))))
    rng = jax.random.key(7)

    def run(mesh, data_axis):
        o = optimizer.init(params)
        runner = make_sharded_unsupervised_chunk_runner(
            unsup, optimizer, mesh, B, capacity_factor=8.0,
            params_like=params, opt_state_like=o, data_axis=data_axis,
        )
        feat_sh, _ = shard_rows(feats, 4 if data_axis else 8)
        adj_sh, _ = shard_rows(adj, 4 if data_axis else 8)
        p, o, shadow, loss, mrr, dropped = runner(
            jax.tree.map(jnp.copy, params), o, jnp.asarray(-1.0), rng,
            jnp.asarray(feat_sh), jnp.asarray(adj_sh), pairs_perm, cdf,
            0, 2,
        )
        assert int(dropped) == 0
        return p, float(loss), float(mrr)

    mesh1d = Mesh(np.asarray(jax.devices()[:8]), ("graph",))
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    p1, l1, m1 = run(mesh1d, None)
    p2, l2, m2 = run(mesh2d, "data")
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    np.testing.assert_allclose(m2, m1, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        p2, p1,
    )


def test_composed_trainer_end_to_end(tmp_path, toy_graph):
    """--data_shards 2 x --graph_shards 4: the full supervised trainer
    over the composed (2, 4) CPU mesh trains (batch over both axes,
    tables graph-sharded/data-replicated) and writes the stats contract;
    the eval sweeps run unchanged on the 2-D mesh."""
    import os

    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    flags = TrainFlags(
        train_prefix=str(tmp_path / "synth"),
        epochs=2, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=4,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), graph_shards=4, data_shards=2,
        fused_gather=True, seed=123,
    )
    result = train(flags, graph=toy_graph)
    assert np.isfinite(result["val_loss"])
    assert result["val_f1_mic"] > 0.4
    log_dir = flags.log_dir("supervised")
    assert os.path.exists(os.path.join(log_dir, "val_stats.txt"))
    assert os.path.exists(os.path.join(log_dir, "test_stats.txt"))


def test_composed_step_matches_single_device(toy_graph):
    """make_sharded_supervised_step with data_axis on the (2, 4) mesh:
    loss equals the single-device loss (first_k sampler)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
        supervised_loss,
    )

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
                           sigmoid_loss=False, weight_decay=0.01)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.01)
    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    ref_loss, _ = supervised_loss(
        params, jnp.asarray(feats), jnp.asarray(adj), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask), rng, sup,
        deterministic=True,
    )

    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    feat_sh, _ = shard_rows(feats, 4)
    adj_sh, _ = shard_rows(adj, 4)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh2d, capacity_factor=8.0, data_axis="data",
    )
    _, _, loss, preds, dropped = step(
        params, optimizer.init(params), rng,
        jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    assert preds.shape == (B, g.num_classes)


def test_multi_shard_fused_gcn_matches_plain(mesh, toy_graph):
    """D=8 + fused_gather with the gcn aggregator: the split inner-hop
    mean feeds gcn's (S*mean + self)/(S+1) recombination — matches the
    plain single-device step."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim
    from graphsage_tpu.parallel.dp import make_supervised_train_step

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = pad_feature_dim(g.padded_features())
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=g.padded_features().shape[1],
        aggregator="gcn",
        concat=False,
        sampler_mode="first_k",
        fused_gather=True,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)
    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    single = make_supervised_train_step(sup, optimizer)
    _, _, loss1, _ = jax.jit(single)(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feats), jnp.asarray(adj),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    o2 = optimizer.init(params)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh, capacity_factor=8.0,
        params_like=params, opt_state_like=o2,
    )
    _, _, loss2, _, dropped = step(
        jax.tree.map(jnp.copy, params), o2, rng,
        jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)


def test_multi_shard_fused_identity_matches_plain(mesh, toy_graph):
    """D=8 + fused_gather + identity_dim: the feature columns ride the
    split-fused mean while the trainable identity columns take the
    differentiable exchange; updated params (INCLUDING the row-sharded
    embeds table and its gradient routing) match the single-device
    step."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim
    from graphsage_tpu.parallel.dp import make_supervised_train_step
    from graphsage_tpu.parallel.graph_sharded import (
        embeds_to_canonical,
    )

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = pad_feature_dim(g.padded_features())
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=g.padded_features().shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        fused_gather=True,
        identity_dim=4,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)
    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    single = make_supervised_train_step(sup, optimizer)
    p1, _, loss1, _ = jax.jit(single)(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feats), jnp.asarray(adj),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    p2_init = dict(params)
    p2_init["embeds"] = jnp.asarray(
        shard_rows(np.asarray(params["embeds"]), D)[0]
    )
    o2 = optimizer.init(p2_init)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh, capacity_factor=8.0,
        params_like=p2_init, opt_state_like=o2,
    )
    p2, _, loss2, _, dropped = step(
        jax.tree.map(jnp.copy, p2_init), o2, rng,
        jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    p2 = embeds_to_canonical(p2, D, "strided")
    n_embed_rows = np.asarray(p1["embeds"]).shape[0]
    np.testing.assert_allclose(
        np.asarray(p2["embeds"])[:n_embed_rows], np.asarray(p1["embeds"]),
        rtol=2e-4, atol=1e-6,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        {k: v for k, v in p2.items() if k != "embeds"},
        {k: v for k, v in p1.items() if k != "embeds"},
    )


def test_composed_checkpoint_resumes_on_1d_mesh(tmp_path, toy_graph):
    """A checkpoint written under the composed (2, 4) data x graph mesh
    (canonical-order embeds) restores into a plain 8-shard 1-D run and
    training continues — mesh shape and shard count both change."""
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train

    base = dict(
        train_prefix=str(tmp_path / "synth"),
        epochs=1, batch_size=16, samples_1=4, samples_2=3,
        dim_1=8, dim_2=8, max_degree=8, validate_iter=1000,
        validate_batch_size=8, print_every=1000,
        base_log_dir=str(tmp_path), seed=123, identity_dim=4,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
    )
    r1 = train(TrainFlags(**base, graph_shards=4, data_shards=2,
                          max_total_steps=4), graph=toy_graph)
    assert r1["steps"] >= 4
    r2 = train(TrainFlags(**base, graph_shards=8, max_total_steps=8,
                          resume=True), graph=toy_graph)
    assert np.isfinite(r2["val_loss"])
    assert r2["steps"] > r1["steps"]


@pytest.mark.parametrize("sampler", ["first_k", "shared_perm"])
def test_composed_eval_and_embed_sweeps_match_1d(toy_graph, sampler):
    """Composed (2, 4) data x graph eval/embed sweeps split the stream
    over BOTH axes (no redundant per-data-slice evaluation) yet
    reproduce the 1-D 4-shard sweeps on the same shard tables: losses,
    reassembled preds, (loss, mrr), and exported embeddings all match
    (exact capacity). Parametrized over both position-independent
    samplers — shared_perm's one-permutation-per-call applies the same
    columns to every row, so splitting a batch across the data axis
    keeps per-id draws identical (the unsup sweep's graph-major nesting
    and graph-index rng fold guarantee matching keys)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
    )
    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
    )
    from graphsage_tpu.nn.negative import unigram_cdf
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_embed_sweep,
        make_sharded_supervised_eval_sweep,
        make_sharded_unsup_eval_sweep,
        reassemble_sharded_rows,
    )

    g = toy_graph
    adj, deg, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode=sampler,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    B = 16
    n_b = 2
    nodes = np.arange(24, dtype=np.int32)  # real rows + dummy-padded tail
    ids_all = np.full((n_b * B,), g.num_nodes, dtype=np.int32)
    ids_all[: len(nodes)] = nodes
    labels_table = np.zeros((g.num_nodes + 1, g.num_classes), np.float32)
    labels_table[: g.num_nodes] = np.asarray(g.labels, np.float32)
    rng = jax.random.key(5)

    mesh1d = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    feat_sh, _ = shard_rows(feats, 4)
    adj_sh, _ = shard_rows(adj, 4)
    args = (params, jnp.asarray(feat_sh), jnp.asarray(adj_sh))

    s1 = make_sharded_supervised_eval_sweep(sup, mesh1d, B)
    s2 = make_sharded_supervised_eval_sweep(sup, mesh2d, B,
                                            data_axis="data")
    l1, p1, d1 = s1(*args, jnp.asarray(ids_all),
                    jnp.asarray(labels_table), rng)
    l2, p2, d2 = s2(*args, jnp.asarray(ids_all),
                    jnp.asarray(labels_table), rng)
    assert int(d1) == int(d2) == 0
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-5)
    r1 = reassemble_sharded_rows(np.asarray(p1), 4, n_b)[: len(nodes)]
    r2 = reassemble_sharded_rows(np.asarray(p2), 8, n_b)[: len(nodes)]
    np.testing.assert_allclose(r2, r1, rtol=1e-5, atol=1e-6)

    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=4)
    uparams = init_unsupervised_params(jax.random.key(1), unsup)
    pairs = np.full((n_b * B, 2), g.num_nodes, dtype=np.int32)
    pairs[:24, 0] = nodes
    pairs[:24, 1] = nodes[::-1]
    cdf = jnp.asarray(np.asarray(unigram_cdf(
        np.concatenate([deg, [0]]).astype(np.float32))))
    u1 = make_sharded_unsup_eval_sweep(unsup, mesh1d, B)
    u2 = make_sharded_unsup_eval_sweep(unsup, mesh2d, B,
                                       data_axis="data")
    uargs = (uparams, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
             jnp.asarray(pairs), cdf, rng)
    ul1, um1, ud1 = u1(*uargs)
    ul2, um2, ud2 = u2(*uargs)
    assert int(ud1) == int(ud2) == 0
    # the unsup sweep nests GRAPH-major and folds its rng on the graph
    # index alone, so the composed sweep reproduces the 1-D values
    # exactly: same pair->owner map, same negative draws
    np.testing.assert_allclose(float(ul2), float(ul1), rtol=1e-5)
    np.testing.assert_allclose(float(um2), float(um1), rtol=1e-5)

    e1 = make_sharded_embed_sweep(unsup, mesh1d, B)
    e2 = make_sharded_embed_sweep(unsup, mesh2d, B, data_axis="data")
    o1, ed1 = e1(uparams, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
                 jnp.asarray(ids_all), rng)
    o2, ed2 = e2(uparams, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
                 jnp.asarray(ids_all), rng)
    assert int(ed1) == int(ed2) == 0
    ro1 = reassemble_sharded_rows(np.asarray(o1), 4, n_b)[: len(nodes)]
    ro2 = reassemble_sharded_rows(np.asarray(o2), 8, n_b)[: len(nodes)]
    np.testing.assert_allclose(ro2, ro1, rtol=1e-5, atol=1e-6)


def test_sweep_rejects_non_divisible_batch(toy_graph):
    """Builders that slice a replicated stream fail fast when the total
    shard count does not divide batch_size (a silent split would drop
    tail rows and misalign stacked outputs)."""
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import SupervisedConfig
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_eval_sweep,
    )

    g = toy_graph
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=4, num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    with pytest.raises(ValueError, match="divisible"):
        make_sharded_supervised_eval_sweep(sup, mesh2d, 12,
                                           data_axis="data")


@pytest.mark.parametrize("agg", ["maxpool", "meanpool", "twomaxpool",
                                 "seq"])
def test_sharded_step_matches_single_device_pool_seq(mesh, toy_graph, agg):
    """The pooled/seq aggregator zoo through the graph-sharded path:
    sharded_sage_embed is aggregator-agnostic (full rows gathered, the
    pyramid folds on top), so one sharded optimizer step must reproduce
    the single-device loss and params under first_k (the P2 parity
    invariant — the fused mean fast path is gated to mean/gcn and never
    engages here).

    SGD, not the reference Adam: params-after-step then equals
    params - lr*grad, a well-conditioned gradient-parity probe. Adam
    first-step updates are ~lr*sign(grad), so psum-vs-serial f32
    reduction ordering on near-zero pooled-MLP grads (relu dead units)
    flips a handful of elements by 2*lr — amplified rounding noise, not
    a routing bug (the Adam path is parity-tested on the mean-family
    above)."""
    import optax

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
    )
    from graphsage_tpu.parallel.dp import make_supervised_train_step

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
    optimizer = optax.sgd(0.05)

    B = 16
    ids = np.arange(B, dtype=np.int32)
    labels = g.labels[ids]
    mask = np.ones(B, dtype=np.float32)
    rng = jax.random.key(7)

    single = make_supervised_train_step(sup, optimizer)
    p1, _, loss1, _ = jax.jit(single)(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feats), jnp.asarray(adj), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(mask),
    )

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh, capacity_factor=8.0,
    )
    p2, _, loss2, _, dropped = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
        jnp.asarray(feat_sh), jnp.asarray(adj_sh),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask),
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)

    def check(path, v1, v2):
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(check, p1, p2)


def test_sharded_dropout_fused_trains(mesh, toy_graph):
    """round-5: dropout > 0 keeps the sharded fuse_inner path engaged
    (D=1 in-kernel mask; D>1 independent jax.random masks on the split
    local/remote partial sums). The step must run finite, be
    deterministic per rng, differ across rngs (masks realized), and
    move the params."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = pad_feature_dim(g.padded_features())
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=g.padded_features().shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        fused_gather=True,
        dropout=0.4,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)

    B = 16
    ids = jnp.arange(B, dtype=jnp.int32)
    labels = jnp.asarray(g.labels[:B])
    mask = jnp.ones(B, dtype=jnp.float32)

    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    opt2 = optimizer.init(params)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh, capacity_factor=8.0,
        params_like=params, opt_state_like=opt2,
    )

    def run(rng):
        p, _, loss, _, dropped = step(
            jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
            jnp.asarray(feat_sh), jnp.asarray(adj_sh),
            ids, labels, mask,
        )
        return p, float(loss), int(dropped)

    p_a, loss_a, dropped_a = run(jax.random.key(7))
    assert dropped_a == 0
    assert np.isfinite(loss_a)
    flat, _ = jax.tree_util.tree_flatten(p_a)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)

    _, loss_a2, _ = run(jax.random.key(7))
    assert loss_a == loss_a2  # deterministic per rng
    _, loss_b, _ = run(jax.random.key(8))
    assert loss_a != loss_b   # dropout masks realized

    # params moved away from init
    moved = jax.tree_util.tree_flatten(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     p_a, params)
    )[0]
    assert max(moved) > 0


def test_single_shard_dropout_fused_trains(toy_graph):
    """D=1 sharded path with dropout > 0: fuse_inner stays engaged and
    routes the whole-mean through fused_gather_mean with the drop key
    (in-kernel mask on TPU; jax.random fallback here). Deterministic
    per rng, rng-sensitive, finite."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = pad_feature_dim(g.padded_features())
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=g.padded_features().shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        fused_gather=True,
        dropout=0.4,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(0.05)

    B = 16
    ids = jnp.arange(B, dtype=jnp.int32)
    labels = jnp.asarray(g.labels[:B])
    mask = jnp.ones(B, dtype=jnp.float32)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    opt1 = optimizer.init(params)
    step = make_sharded_supervised_step(
        sup, optimizer, mesh1, capacity_factor=1.0,
        params_like=params, opt_state_like=opt1,
    )

    def run(rng):
        _, _, loss, _, dropped = step(
            jax.tree.map(jnp.copy, params), optimizer.init(params), rng,
            jnp.asarray(feats), jnp.asarray(adj), ids, labels, mask,
        )
        return float(loss), int(dropped)

    la, da = run(jax.random.key(3))
    assert da == 0 and np.isfinite(la)
    la2, _ = run(jax.random.key(3))
    assert la == la2
    lb, _ = run(jax.random.key(4))
    assert la != lb


def test_sharded_eval_losses_include_weight_decay(mesh, toy_graph):
    """Sharded eval/eval-sweep losses must carry the same weight-decay
    term the single-device evals report (supervised_loss inside
    make_eval_step/make_eval_sweep) so val/test losses are comparable
    across --graph_shards settings: (a) exact-value parity with the
    single-device evals under first_k; (b) the wd-on minus wd-off delta
    equals the full decay sum."""
    import dataclasses

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        sage_decay_weights,
    )
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
    )
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_eval,
        make_sharded_supervised_eval_sweep,
    )
    from graphsage_tpu.train.supervised import make_eval_step, make_eval_sweep

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        num_nodes=g.num_nodes,  # the sweep's dummy pad id
    )
    wd = 0.05
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes,
                           sigmoid_loss=False, weight_decay=wd)
    params = init_supervised_params(jax.random.key(0), sup)

    B = 16
    ids = jnp.arange(B, dtype=jnp.int32)
    labels = jnp.asarray(g.labels[:B])
    mask = jnp.ones(B, dtype=jnp.float32)
    rng = jax.random.key(9)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    sh_args = (jnp.asarray(feat_sh), jnp.asarray(adj_sh), ids, labels,
               mask, rng)

    ref_loss, _ = make_eval_step(sup)(
        params, jnp.asarray(feats), jnp.asarray(adj), ids, labels, mask,
        rng,
    )
    loss, _, dropped = make_sharded_supervised_eval(
        sup, mesh, capacity_factor=8.0
    )(params, *sh_args)
    assert int(dropped) == 0
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # the decay delta is exactly the full (undivided) decay sum
    sup0 = dataclasses.replace(sup, weight_decay=0.0)
    loss0, _, _ = make_sharded_supervised_eval(
        sup0, mesh, capacity_factor=8.0
    )(params, *sh_args)
    decayed = sage_decay_weights(params, sage)
    decayed += [params["head"]["w"], params["head"]["b"]]
    expected = wd * sum(0.5 * float(jnp.sum(w * w)) for w in decayed)
    np.testing.assert_allclose(float(loss) - float(loss0), expected,
                               rtol=1e-5)

    # sweep: per-batch losses match the single-device sweep
    n_b = 2
    ids_all = np.full((n_b * B,), g.num_nodes, dtype=np.int32)
    ids_all[:24] = np.arange(24)
    labels_table = np.zeros((g.num_nodes + 1, g.num_classes), np.float32)
    labels_table[: g.num_nodes] = np.asarray(g.labels, np.float32)
    ref_losses, _ = make_eval_sweep(sup, B, g.num_nodes)(
        params, jnp.asarray(feats), jnp.asarray(adj),
        jnp.asarray(ids_all), jnp.asarray(labels_table), rng,
    )
    sh_losses, _, d2 = make_sharded_supervised_eval_sweep(
        sup, mesh, B, capacity_factor=8.0
    )(params, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
      jnp.asarray(ids_all), jnp.asarray(labels_table), rng)
    assert int(d2) == 0
    np.testing.assert_allclose(np.asarray(sh_losses),
                               np.asarray(ref_losses), rtol=1e-5)


def test_sharded_unsup_eval_losses_include_weight_decay(mesh, toy_graph):
    """Unsupervised sharded eval and eval sweep: the wd-on minus wd-off
    loss delta equals the full decay sum (the single-device
    unsupervised_loss term; negatives differ between the sharded and
    single-device rng streams, so the delta identity is the exact
    invariant to pin)."""
    import dataclasses

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        sage_decay_weights,
    )
    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
    )
    from graphsage_tpu.nn.negative import unigram_cdf
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_unsup_eval_sweep,
        make_sharded_unsupervised_eval,
    )

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
    wd = 0.02
    unsup = UnsupervisedConfig(sage=sage, neg_sample_size=4,
                               weight_decay=wd)
    unsup0 = dataclasses.replace(unsup, weight_decay=0.0)
    params = init_unsupervised_params(jax.random.key(1), unsup)
    expected = wd * sum(
        0.5 * float(jnp.sum(w * w)) for w in sage_decay_weights(params, sage)
    )

    B = 16
    b1 = jnp.arange(B, dtype=jnp.int32)
    b2 = jnp.arange(B, 2 * B, dtype=jnp.int32)
    mask = jnp.ones(B, dtype=jnp.float32)
    cdf = jnp.asarray(np.asarray(unigram_cdf(deg)))
    rng = jax.random.key(3)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)
    args = (params, jnp.asarray(feat_sh), jnp.asarray(adj_sh), b1, b2,
            mask, cdf, rng)

    loss, _, d = make_sharded_unsupervised_eval(
        unsup, mesh, capacity_factor=8.0)(*args)
    loss0, _, _ = make_sharded_unsupervised_eval(
        unsup0, mesh, capacity_factor=8.0)(*args)
    assert int(d) == 0
    np.testing.assert_allclose(float(loss) - float(loss0), expected,
                               rtol=1e-5)

    n_b = 2
    pairs = np.full((n_b * B, 2), g.num_nodes, dtype=np.int32)
    pairs[:24, 0] = np.arange(24)
    pairs[:24, 1] = np.arange(24)[::-1]
    sweep_args = (params, jnp.asarray(feat_sh), jnp.asarray(adj_sh),
                  jnp.asarray(pairs), cdf, rng)
    sl, _, sd = make_sharded_unsup_eval_sweep(
        unsup, mesh, B, capacity_factor=8.0)(*sweep_args)
    sl0, _, _ = make_sharded_unsup_eval_sweep(
        unsup0, mesh, B, capacity_factor=8.0)(*sweep_args)
    assert int(sd) == 0
    # decay is k-weighted per batch, so the edge-weighted mean carries
    # it through exactly
    np.testing.assert_allclose(float(sl) - float(sl0), expected,
                               rtol=1e-5)


def test_sharded_head_input_dropout_matches_replica(mesh, toy_graph):
    """With dropout > 0 the sharded supervised forward drops the HEAD
    INPUT like the single-device path (models/supervised.py
    supervised_logits: dropout on the l2-normalized embedding under
    fold_in tag 7, then the dense head). A manual composition must
    reproduce _sup_per_node_xent's logits exactly — pins both the
    placement and the rng tag."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        l2_normalize,
    )
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
    )
    from graphsage_tpu.nn.init import dropout as drop_fn
    from graphsage_tpu.parallel.graph_sharded import (
        _sup_per_node_xent,
        sharded_sage_embed,
    )

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = g.padded_features()
    sage = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator="mean",
        sampler_mode="first_k",
        dropout=0.4,
        num_nodes=g.num_nodes,
    )
    sup = SupervisedConfig(sage=sage, num_classes=g.num_classes)
    params = init_supervised_params(jax.random.key(0), sup)
    B = 16
    ids = jnp.arange(B, dtype=jnp.int32)
    labels = jnp.asarray(g.labels[:B])
    rng = jax.random.key(11)
    feat_sh, _ = shard_rows(feats, D)
    adj_sh, _ = shard_rows(adj, D)

    def fused(params, feat, adj, ids, labels, rng):
        _, logits, _ = _sup_per_node_xent(
            sup, params, feat, adj, ids, labels, rng, "graph", 8.0,
            deterministic=False,
        )
        return logits

    def replica(params, feat, adj, ids, labels, rng):
        emb, _ = sharded_sage_embed(
            params, feat, adj, ids, rng, sage, "graph", 8.0,
            deterministic=False, return_stats=True,
        )
        emb = l2_normalize(emb, axis=1)
        emb = drop_fn(jax.random.fold_in(rng, 7), emb, sage.dropout, False)
        return (jnp.dot(emb, params["head"]["w"],
                        preferred_element_type=jnp.float32)
                + params["head"]["b"])

    rep, sh = P(), P("graph")
    specs = dict(mesh=mesh, in_specs=(rep, sh, sh, sh, sh, rep),
                 out_specs=sh, check_vma=False)
    args = (params, jnp.asarray(feat_sh), jnp.asarray(adj_sh), ids,
            labels, rng)
    out_f = jax.jit(shard_map(fused, **specs))(*args)
    out_r = jax.jit(shard_map(replica, **specs))(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-6, atol=1e-7)
    # and the mask is actually realized: a different rng changes logits
    out_g = jax.jit(shard_map(fused, **specs))(
        params, jnp.asarray(feat_sh), jnp.asarray(adj_sh), ids, labels,
        jax.random.key(12),
    )
    assert np.abs(np.asarray(out_g) - np.asarray(out_f)).max() > 0
