"""Data-layer tests: loader contract, adjacency semantics, batchers, walks."""

import numpy as np
import pytest

from graphsage_tpu.data.adjacency import build_both_adjs, build_padded_adj
from graphsage_tpu.data.io import load_data, standardize_features
from graphsage_tpu.data.minibatch import EdgeBatcher, NodeBatcher
from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset
from graphsage_tpu.data.walks import run_random_walks, write_walks, read_walks
from graphsage_tpu.data.graph import degrees_from_neighbors, validate_graph


def test_synthetic_graph_valid(toy_graph):
    validate_graph(toy_graph)
    assert toy_graph.num_classes == 3
    assert toy_graph.labels.sum(axis=1).min() >= 1.0


def test_roundtrip_through_disk(tmp_path, toy_graph):
    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    loaded = load_data(prefix, normalize=False)
    assert loaded.num_nodes == toy_graph.num_nodes
    assert loaded.num_classes == toy_graph.num_classes
    np.testing.assert_array_equal(loaded.is_val, toy_graph.is_val)
    np.testing.assert_array_equal(loaded.is_test, toy_graph.is_test)
    np.testing.assert_allclose(loaded.features, toy_graph.features, rtol=1e-6)
    assert set(map(tuple, loaded.edges)) == set(
        map(tuple, np.sort(toy_graph.edges, axis=1))
    )
    np.testing.assert_array_equal(loaded.labels, toy_graph.labels)


def test_feature_normalization_uses_train_rows_only(toy_graph):
    feats = toy_graph.features.copy()
    train_mask = toy_graph.is_train
    normed = standardize_features(feats, train_mask)
    tr = feats[train_mask]
    expect = (feats - tr.mean(0)) / np.where(tr.std(0) == 0, 1, tr.std(0))
    np.testing.assert_allclose(normed, expect, rtol=1e-5)


def test_padded_adj_semantics(toy_graph):
    max_degree = 5
    rng = np.random.default_rng(0)
    adj, deg = build_padded_adj(toy_graph, max_degree, train=True, rng=rng)
    n = toy_graph.num_nodes
    assert adj.shape == (n + 1, max_degree)
    assert adj.dtype == np.int32
    # Dummy row points at dummy.
    assert (adj[n] == n).all()
    # Val/test nodes have zero train degree and all-dummy rows.
    eval_nodes = np.flatnonzero(toy_graph.is_val | toy_graph.is_test)
    assert (deg[eval_nodes] == 0).all()
    assert (adj[eval_nodes] == n).all()
    # Train rows contain only train neighbors (or dummy for isolated).
    train_nbrs = toy_graph.train_neighbors()
    for i in np.flatnonzero(toy_graph.is_train):
        allowed = set(train_nbrs[i].tolist()) | {n}
        assert set(adj[i].tolist()) <= allowed
        if deg[i] >= max_degree:
            # Without replacement: entries distinct.
            assert len(set(adj[i].tolist())) == max_degree
        if deg[i] > 0:
            assert n not in set(adj[i].tolist())


def test_full_adj_covers_all_nodes(toy_graph):
    rng = np.random.default_rng(0)
    adj, _ = build_padded_adj(toy_graph, 4, train=False, rng=rng)
    n = toy_graph.num_nodes
    for i in range(n):
        if len(toy_graph.neighbors[i]) > 0:
            assert set(adj[i].tolist()) <= set(
                toy_graph.neighbors[i].tolist()
            )


def test_native_matches_python_semantics(toy_graph):
    """The C++ and NumPy padders must agree on the support set of each row
    (exact values differ: separate RNGs)."""
    from graphsage_tpu.data import native

    if not native.native_available():
        pytest.skip("native library not built")
    nbrs = toy_graph.neighbors
    n = toy_graph.num_nodes
    adj = native.native_pad_adjacency(nbrs, n, 6, seed=42)
    assert adj.shape == (n + 1, 6)
    assert (adj[n] == n).all()
    for i in range(n):
        if len(nbrs[i]) == 0:
            assert (adj[i] == n).all()
        else:
            assert set(adj[i].tolist()) <= set(nbrs[i].tolist())
            if len(nbrs[i]) >= 6:
                assert len(set(adj[i].tolist())) == 6


def test_node_batcher_covers_train_nodes(toy_graph):
    _, deg, _ = build_both_adjs(toy_graph, 5)
    b = NodeBatcher(toy_graph, deg, batch_size=16, seed=1)
    seen = []
    for batch in b.epoch():
        assert batch.ids.shape == (16,)
        assert batch.labels.shape == (16, 3)
        real = batch.ids[batch.mask > 0]
        seen.extend(real.tolist())
    assert sorted(seen) == sorted(b.train_nodes.tolist())
    # Padding uses the dummy id with mask zero.
    last = list(b.epoch())[-1]
    pad = last.ids[last.mask == 0]
    assert (pad == toy_graph.num_nodes).all()


def test_edge_batcher_train_and_val_split(toy_graph):
    _, deg, _ = build_both_adjs(toy_graph, 5)
    b = EdgeBatcher(toy_graph, deg, batch_size=32, seed=1)
    # Every train pair endpoint has positive train degree.
    assert (deg[b.train_pairs] > 0).all()
    # Val pairs are exactly the train_removed edges.
    assert set(map(tuple, b.val_pairs)) == set(
        map(tuple, toy_graph.edges[toy_graph.train_removed])
    )
    count = 0
    for batch in b.epoch():
        assert batch.batch1.shape == (32,)
        count += int(batch.mask.sum())
    assert count == len(b.train_pairs)


def test_edge_batcher_embed_batches(toy_graph):
    _, deg, _ = build_both_adjs(toy_graph, 5)
    b = EdgeBatcher(toy_graph, deg, batch_size=50, seed=1)
    nodes = []
    for batch in b.embed_batches():
        real = batch.batch1[batch.mask > 0]
        nodes.extend(real.tolist())
    assert nodes == list(range(toy_graph.num_nodes))


def test_random_walks_emit_cooccurrence(toy_graph):
    train_nbrs = toy_graph.train_neighbors()
    deg = degrees_from_neighbors(train_nbrs)
    starts = np.flatnonzero(toy_graph.is_train & (deg > 0))
    pairs = run_random_walks(
        train_nbrs, starts, num_walks=3, walk_len=4,
        rng=np.random.default_rng(5),
    )
    assert pairs.shape[1] == 2
    assert len(pairs) > 0
    # No self pairs; all endpoints are train nodes.
    assert (pairs[:, 0] != pairs[:, 1]).all()
    assert toy_graph.is_train[pairs.ravel()].all()


def test_walks_file_roundtrip(tmp_path, toy_graph):
    train_nbrs = toy_graph.train_neighbors()
    deg = degrees_from_neighbors(train_nbrs)
    starts = np.flatnonzero(toy_graph.is_train & (deg > 0))[:10]
    pairs = run_random_walks(
        train_nbrs, starts, num_walks=2, walk_len=3,
        rng=np.random.default_rng(5),
    )
    path = str(tmp_path / "toy-walks.txt")
    write_walks(path, pairs, toy_graph.node_ids)
    back = read_walks(path, toy_graph.id2idx)
    np.testing.assert_array_equal(back, pairs)


def test_fast_synthetic_partition_structure():
    """Vectorized large-graph generator: community structure present,
    valid arrays."""
    from graphsage_tpu.data.graph import validate_graph
    from graphsage_tpu.data.synthetic import make_synthetic_graph

    g = make_synthetic_graph(
        num_nodes=5000, num_classes=4, feat_dim=8,
        intra_p=2e-3, inter_p=5e-5, seed=9,
    )
    validate_graph(g)
    assert len(g.edges) > 1000
    # undirected each-once, no self loops
    assert (g.edges[:, 0] < g.edges[:, 1]).all()
    # intra-class edges dominate given the planted partition
    import numpy as np

    classes = np.argmax(g.labels, axis=1)
    same = (classes[g.edges[:, 0]] == classes[g.edges[:, 1]]).mean()
    assert same > 0.7


def test_powerlaw_graph_statistics():
    """Degree-corrected SBM proxy: power-law degree skew, community
    structure, valid arrays, dataset-contract roundtrip."""
    import numpy as np

    from graphsage_tpu.data.graph import validate_graph
    from graphsage_tpu.data.synthetic import make_powerlaw_graph

    g = make_powerlaw_graph(
        num_nodes=3000, num_classes=8, feat_dim=16, avg_degree=20,
        alpha=1.0, seed=2,
    )
    validate_graph(g)
    deg = np.asarray([len(n) for n in g.neighbors])
    assert deg.mean() > 8
    # heavy tail: the top 1% of nodes hold >10% of edge endpoints, and
    # the max degree is far above the mean (neither holds for the
    # uniform community fixture)
    srt = np.sort(deg)[::-1]
    assert srt[:30].sum() / deg.sum() > 0.10
    assert deg.max() > 8 * deg.mean()
    # labels community-aligned
    classes = np.argmax(g.labels, axis=1)
    same = (classes[g.edges[:, 0]] == classes[g.edges[:, 1]]).mean()
    assert same > 0.7


def test_powerlaw_multilabel_roundtrip(tmp_path):
    from graphsage_tpu.data.io import load_data
    from graphsage_tpu.data.synthetic import (
        make_powerlaw_graph,
        write_dataset,
    )

    g = make_powerlaw_graph(
        num_nodes=400, num_classes=6, feat_dim=8, avg_degree=10,
        multilabel=True, seed=3,
    )
    prefix = str(tmp_path / "pl" / "pl")
    write_dataset(g, prefix)
    g2 = load_data(prefix)
    assert g2.num_nodes == g.num_nodes
    assert g2.labels.shape == (g.num_nodes, 6)
    assert (g2.labels.sum(axis=1) >= 1).all()


def test_deferred_feature_shard_matches_full_load(tmp_path, toy_graph):
    """load_data(load_features=False) + load_feature_shard reads only a
    row range off disk yet reproduces the eagerly-loaded standardized
    table exactly (per-host shard loading, SURVEY §7 stage 7)."""
    from graphsage_tpu.data.io import feature_stats, load_feature_shard

    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    full = load_data(prefix)  # eager, train-standardized
    lazy = load_data(prefix, load_features=False)

    assert lazy.features is None
    assert lazy.feature_meta is not None
    assert lazy.feature_dim == full.features.shape[1]
    np.testing.assert_array_equal(lazy.node_ids, full.node_ids)

    # chunked mmap stats == in-memory standardize stats
    mean, std = feature_stats(lazy, chunk=17)
    raw = np.load(prefix + "-feats.npy").astype(np.float32)[lazy.feat_rows]
    tr = raw[lazy.is_train]
    np.testing.assert_allclose(mean, tr.mean(axis=0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(std, tr.std(axis=0), rtol=1e-5, atol=1e-6)

    n = full.num_nodes
    padded = np.vstack([full.features,
                        np.zeros((3, full.features.shape[1]), np.float32)])
    # arbitrary shard ranges incl. ones crossing into dummy/pad rows
    for lo, hi in [(0, 40), (40, 100), (100, n + 3), (n, n + 3)]:
        shard = load_feature_shard(lazy, lo, hi, stats=(mean, std))
        np.testing.assert_allclose(shard, padded[lo:hi], rtol=1e-5,
                                   atol=1e-5)


def test_materialize_features_copies_and_load_rows_strided(
        tmp_path, toy_graph):
    """materialize_features never mutates the caller's deferred graph
    (it returns a copy), and load_feature_rows serves arbitrary
    non-contiguous id sets (the strided per-host loading path)."""
    from graphsage_tpu.data.io import (
        load_feature_rows,
        materialize_features,
    )

    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    full = load_data(prefix)
    lazy = load_data(prefix, load_features=False)

    mat = materialize_features(lazy)
    assert lazy.features is None  # caller's graph untouched
    np.testing.assert_allclose(mat.features, full.features,
                               rtol=1e-5, atol=1e-5)
    assert materialize_features(full) is full  # eager passes through

    n = full.num_nodes
    ids = np.array([n + 1, 0, 7, n, 3, 7], dtype=np.int64)  # dups + pads
    rows = load_feature_rows(lazy, ids)
    padded = np.vstack([full.features,
                        np.zeros((2, full.features.shape[1]), np.float32)])
    np.testing.assert_allclose(rows, padded[ids], rtol=1e-5, atol=1e-5)


def test_deferred_load_honors_normalize_false(tmp_path, toy_graph):
    """load_data(normalize=False, load_features=False) must NOT be
    standardized at materialization time: the deferred loaders default
    to the normalize intent recorded on the graph (review finding —
    they used to unconditionally re-standardize)."""
    from graphsage_tpu.data.io import (
        load_feature_rows,
        materialize_features,
    )

    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    raw_eager = load_data(prefix, normalize=False)
    lazy_raw = load_data(prefix, normalize=False, load_features=False)

    mat = materialize_features(lazy_raw)
    np.testing.assert_allclose(mat.features, raw_eager.features,
                               rtol=1e-6, atol=1e-6)

    ids = np.array([0, 5, 2], dtype=np.int64)
    rows = load_feature_rows(lazy_raw, ids)
    np.testing.assert_allclose(rows, raw_eager.features[ids],
                               rtol=1e-6, atol=1e-6)
    # an explicit override still standardizes
    rows_norm = load_feature_rows(lazy_raw, ids, normalize=True)
    assert not np.allclose(rows_norm, rows)


def test_put_global_rows_loads_only_local_ranges(toy_graph, tmp_path):
    """put_global_rows materializes exactly the addressable row ranges
    and the assembled global equals a put_global of the full table."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from graphsage_tpu.parallel.distributed import put_global, put_global_rows

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("graph",))
    table = np.arange(64, dtype=np.float32).reshape(16, 4)

    seen = []

    def loader(lo, hi):
        seen.append((lo, hi))
        return table[lo:hi]

    g = put_global_rows((16, 4), "float32", mesh, P("graph"), loader)
    ref = put_global(table, mesh, P("graph"))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))
    assert sorted(set(seen)) == [(0, 4), (4, 8), (8, 12), (12, 16)]


def test_degree_relabel_isomorphism(tmp_path, toy_graph):
    """degree_relabel permutes internal indices only: per-ORIGINAL-id
    features/labels/split flags/neighbor sets are unchanged, walks map
    to the same original pairs, and indices are degree-descending."""
    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    import os

    from graphsage_tpu.data.walks import write_walks

    base = load_data(prefix, normalize=False)
    # give the relabeled load a walks file derived from the base order
    pairs = np.stack([
        np.arange(0, 20, dtype=np.int32),
        np.arange(5, 25, dtype=np.int32),
    ], axis=1)
    write_walks(prefix + "-walks.txt", pairs, base.node_ids)
    assert os.path.exists(prefix + "-walks.txt")
    base = load_data(prefix, normalize=False, load_walks=True)
    rel = load_data(prefix, normalize=False, load_walks=True,
                    degree_relabel=True)

    deg = np.array([len(v) for v in rel.neighbors])
    assert np.all(np.diff(deg) <= 0), "indices not degree-descending"
    assert sorted(rel.node_ids) == sorted(base.node_ids)

    for nid in base.node_ids:
        bi, ri = base.id2idx[nid], rel.id2idx[nid]
        np.testing.assert_array_equal(base.features[bi], rel.features[ri])
        np.testing.assert_array_equal(base.labels[bi], rel.labels[ri])
        assert base.is_val[bi] == rel.is_val[ri]
        assert base.is_test[bi] == rel.is_test[ri]
        b_nbrs = sorted(base.node_ids[j] for j in base.neighbors[bi])
        r_nbrs = sorted(rel.node_ids[j] for j in rel.neighbors[ri])
        assert b_nbrs == r_nbrs

    # edges as original-id pairs (order-preserved rows, so train_removed
    # stays aligned)
    assert len(base.edges) == len(rel.edges)
    for k in range(len(base.edges)):
        b = {base.node_ids[base.edges[k, 0]],
             base.node_ids[base.edges[k, 1]]}
        r = {rel.node_ids[rel.edges[k, 0]], rel.node_ids[rel.edges[k, 1]]}
        assert b == r
    np.testing.assert_array_equal(base.train_removed, rel.train_removed)

    # walks map to the same original-id pairs
    b_pairs = {(base.node_ids[a], base.node_ids[b])
               for a, b in base.walks}
    r_pairs = {(rel.node_ids[a], rel.node_ids[b]) for a, b in rel.walks}
    assert b_pairs == r_pairs


def test_degree_relabel_deferred_feat_rows(tmp_path, toy_graph):
    """With load_features=False, feat_rows must still map each (new)
    index to its node's on-disk feature row."""
    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    base = load_data(prefix, normalize=False)
    rel = load_data(prefix, normalize=False, load_features=False,
                    degree_relabel=True)
    disk = np.load(prefix + "-feats.npy")
    for nid in base.node_ids[:20]:
        ri = rel.id2idx[nid]
        np.testing.assert_array_equal(disk[rel.feat_rows[ri]],
                                      base.features[base.id2idx[nid]])


def test_degree_relabel_train_smoke(tmp_path, toy_graph):
    """End-to-end: supervised training with --degree_relabel runs and
    evaluates; unsupervised export writes ORIGINAL node ids in val.txt."""
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train as sup_train
    from graphsage_tpu.train.unsupervised import train as unsup_train

    prefix = str(tmp_path / "toy")
    write_dataset(toy_graph, prefix)
    flags = TrainFlags(
        train_prefix=prefix, model="graphsage_mean", epochs=1,
        batch_size=16, samples_1=4, samples_2=3, dim_1=8, dim_2=8,
        max_degree=8, validate_iter=50, print_every=50,
        base_log_dir=str(tmp_path / "logs"), degree_relabel=True,
    )
    res = sup_train(flags)
    assert np.isfinite(res["val_loss"])

    uflags = TrainFlags(
        train_prefix=prefix, model="graphsage_mean", epochs=1,
        batch_size=16, samples_1=4, samples_2=3, dim_1=8, dim_2=8,
        max_degree=8, validate_iter=50, print_every=50,
        base_log_dir=str(tmp_path / "ulogs"), degree_relabel=True,
        random_context=False,
    )
    unsup_train(uflags)
    import glob

    txt = glob.glob(str(tmp_path / "ulogs" / "*" / "*" / "val.txt"))[0]
    exported = [line.strip() for line in open(txt) if line.strip()]
    assert sorted(exported) == sorted(str(i) for i in toy_graph.node_ids)
