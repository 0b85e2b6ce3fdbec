"""Dataset loader for the public GraphSAGE on-disk contract.

Reads ``<prefix>-G.json`` (networkx node-link format), ``<prefix>-id_map.json``,
``<prefix>-class_map.json``, optional ``<prefix>-feats.npy`` and
``<prefix>-walks.txt`` — the same files the reference consumes
(/root/reference/graphsage/utils.py:19-75) — without a networkx dependency:
the node-link JSON is parsed directly into flat arrays.

Semantics reproduced from the reference loader:
  * nodes missing ``val``/``test`` annotations are dropped (utils.py:46-50)
  * every edge touching a val/test endpoint is flagged ``train_removed``
    (utils.py:55-60)
  * features are standardized with mean/std fitted on train rows only
    (utils.py:62-68)
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from graphsage_tpu.data.graph import (
    GraphData,
    dense_labels,
    infer_num_classes,
)
from graphsage_tpu.data.walks import read_walks


def _node_key_conversion(sample_key):
    """id_map / class_map keys may be stringified ints (utils.py:22-25)."""
    if isinstance(sample_key, int):
        return int
    return lambda x: x


def parse_node_link_graph(g_data: dict):
    """Parse a networkx(<=1.11) node-link dict into (nodes, flags, edge list).

    In networkx 1.x ``node_link_data`` emits ``links`` whose source/target are
    *positions* in the ``nodes`` list; the public GraphSAGE datasets follow
    that convention. Ids appear under each node's ``id`` key.

    Returns (node_ids, is_val, is_test, edges_by_position).
    """
    nodes = g_data["nodes"]
    links = g_data.get("links", g_data.get("edges", []))

    node_ids = [nd.get("id") for nd in nodes]
    is_val = np.array([bool(nd.get("val", False)) for nd in nodes])
    is_test = np.array([bool(nd.get("test", False)) for nd in nodes])
    has_flags = np.array(
        [("val" in nd) and ("test" in nd) for nd in nodes], dtype=bool
    )

    n = len(nodes)
    # Detect the link convention: positions (nx 1.x) vs ids (nx >= 2).
    ids_are_ints = all(isinstance(i, (int, np.integer)) for i in node_ids)
    srcs = [lk["source"] for lk in links]
    tgts = [lk["target"] for lk in links]
    all_int_refs = all(isinstance(s, (int, np.integer)) for s in srcs + tgts)
    if all_int_refs and (not ids_are_ints or _looks_positional(srcs, tgts, node_ids, n)):
        edges = np.array(list(zip(srcs, tgts)), dtype=np.int64).reshape(-1, 2)
    else:
        idx_of = {nid: i for i, nid in enumerate(node_ids)}
        edges = np.array(
            [(idx_of[s], idx_of[t]) for s, t in zip(srcs, tgts)], dtype=np.int64
        ).reshape(-1, 2)
    return node_ids, is_val, is_test, has_flags, edges


def _looks_positional(srcs, tgts, node_ids, n) -> bool:
    """With integer node ids, positional refs and id refs are only
    distinguishable when ids are not 0..n-1 in order; prefer positional
    (the nx 1.x writer) whenever all refs are in range."""
    if not srcs:
        return True
    lo = min(min(srcs), min(tgts))
    hi = max(max(srcs), max(tgts))
    return lo >= 0 and hi < n


def load_data(
    prefix: str,
    normalize: bool = True,
    load_walks: bool = False,
    load_features: bool = True,
    degree_relabel: bool = False,
) -> GraphData:
    """Load a dataset into a :class:`GraphData`. See module docstring.

    ``load_features=False`` defers the feature table: graph metadata
    (nodes, edges, labels, splits) loads as usual, but ``features``
    stays None and ``feature_meta``/``feat_rows`` record the on-disk
    table so :func:`load_feature_shard` can later materialize ONLY one
    host's row range — the multi-host path where the table exceeds a
    single host's memory (SURVEY §7 stage 7).

    ``degree_relabel`` re-orders internal node indices by descending
    degree (see :func:`relabel_by_degree`): reference id_maps are
    arbitrary (utils.py:22-35 string-keyed dicts), and a degree-dense
    id layout makes hub rows contiguous/low for gather locality.
    Original ids round-trip via ``node_ids``/``id2idx`` as always, so
    exports, walks, and eval are unaffected.
    """
    with open(prefix + "-G.json") as fp:
        g_data = json.load(fp)
    node_ids, is_val, is_test, has_flags, edges = parse_node_link_graph(g_data)

    with open(prefix + "-id_map.json") as fp:
        raw_id_map = json.load(fp)
    conv = _node_key_conversion(node_ids[0] if node_ids else "")
    id_map = {conv(k): int(v) for k, v in raw_id_map.items()}

    class_map = None
    class_path = prefix + "-class_map.json"
    if os.path.exists(class_path):
        with open(class_path) as fp:
            raw_class_map = json.load(fp)
        first_label = next(iter(raw_class_map.values()))
        lab_conv = (lambda x: x) if isinstance(first_label, list) else int
        class_map = {conv(k): lab_conv(v) for k, v in raw_class_map.items()}

    feats = None
    feats_path = prefix + "-feats.npy"
    have_feats = os.path.exists(feats_path)
    if have_feats and load_features:
        feats = np.load(feats_path).astype(np.float32)

    # Drop nodes missing val/test annotations (utils.py:46-50), then reindex
    # every node to its id_map position so arrays align with the feature file.
    keep_positions = np.flatnonzero(has_flags)
    kept_ids = [node_ids[p] for p in keep_positions]
    n = len(kept_ids)

    # The canonical index order is the id_map's: feature row i belongs to the
    # node whose id_map value is i. Dropped nodes leave holes; compact them.
    order = sorted(range(n), key=lambda j: id_map[kept_ids[j]])
    ordered_ids = [kept_ids[j] for j in order]
    new_index_of_position = {}
    for new_idx, j in enumerate(order):
        new_index_of_position[keep_positions[j]] = new_idx

    id2idx = {nid: i for i, nid in enumerate(ordered_ids)}
    new_is_val = np.array(
        [is_val[keep_positions[j]] for j in order], dtype=bool
    )
    new_is_test = np.array(
        [is_test[keep_positions[j]] for j in order], dtype=bool
    )

    feat_rows = None
    feature_meta = None
    if have_feats:
        feat_rows = np.array([id_map[nid] for nid in ordered_ids])
        if feats is not None:
            feats = feats[feat_rows]
        else:
            shape = _npy_shape(feats_path)
            feature_meta = (feats_path, int(shape[0]), int(shape[1]))

    # Remap edges, dropping those touching removed nodes; dedupe (undirected).
    remapped = []
    seen = set()
    for a, b in edges:
        if a not in new_index_of_position or b not in new_index_of_position:
            continue
        i, j = new_index_of_position[a], new_index_of_position[b]
        if i == j:
            continue
        key = (i, j) if i < j else (j, i)
        if key in seen:
            continue
        seen.add(key)
        remapped.append(key)
    edge_arr = np.array(remapped, dtype=np.int32).reshape(-1, 2)

    train_removed = (
        new_is_val[edge_arr[:, 0]] | new_is_test[edge_arr[:, 0]]
        | new_is_val[edge_arr[:, 1]] | new_is_test[edge_arr[:, 1]]
    )

    neighbors = _build_neighbor_lists(n, edge_arr)

    if normalize and feats is not None:
        train_mask = ~(new_is_val | new_is_test)
        feats = standardize_features(feats, train_mask)

    labels = None
    num_classes = None
    if class_map is not None:
        num_classes = infer_num_classes(class_map)
        labels = dense_labels(class_map, ordered_ids, num_classes)

    walks = None
    if load_walks:
        walks = read_walks(prefix + "-walks.txt", id2idx)

    graph = GraphData(
        node_ids=ordered_ids,
        id2idx=id2idx,
        features=feats,
        class_map=class_map,
        labels=labels,
        num_classes=num_classes,
        is_val=new_is_val,
        is_test=new_is_test,
        edges=edge_arr,
        train_removed=train_removed,
        neighbors=neighbors,
        walks=walks,
        feat_rows=feat_rows,
        feature_meta=feature_meta,
        feature_normalize=normalize,
    )
    if degree_relabel:
        graph = relabel_by_degree(graph)
    return graph


def relabel_by_degree(graph: GraphData) -> GraphData:
    """Permute internal node indices so the highest-degree node is 0.

    The reference's id_map order is arbitrary (utils.py:22-35), so hub
    nodes land anywhere in the feature table; a degree-descending
    layout packs the hot gather set into dense low rows (the layout the
    isolated-gather locality facts favor — benchmarks/KERNEL_NOTES.md
    "Round-3 locality facts"; the chunked training loop itself hides
    most of the difference, round-5 sweep). Purely an internal-index
    permutation: every array is re-indexed consistently and original
    node ids still round-trip via ``node_ids``/``id2idx``, so walks,
    exports, and eval outputs are unchanged as sets. ``class_map`` is
    keyed by original ids and needs no change; ``train_removed`` stays
    aligned with its (re-indexed, order-preserved) edge rows. Ties
    break by original index (stable sort) for determinism.
    """
    n = graph.num_nodes
    deg = np.fromiter((len(v) for v in graph.neighbors), count=n,
                      dtype=np.int64)
    order = np.argsort(-deg, kind="stable")      # new idx -> old idx
    perm = np.empty(n, dtype=np.int64)
    perm[order] = np.arange(n)                   # old idx -> new idx

    node_ids = [graph.node_ids[o] for o in order]
    return dataclasses.replace(
        graph,
        node_ids=node_ids,
        id2idx={nid: i for i, nid in enumerate(node_ids)},
        features=(graph.features[order]
                  if graph.features is not None else None),
        labels=graph.labels[order] if graph.labels is not None else None,
        is_val=graph.is_val[order],
        is_test=graph.is_test[order],
        edges=perm[graph.edges].astype(np.int32),
        neighbors=[perm[graph.neighbors[o]].astype(np.int32)
                   for o in order],
        walks=(perm[graph.walks].astype(np.int32)
               if graph.walks is not None else None),
        feat_rows=(graph.feat_rows[order]
                   if graph.feat_rows is not None else None),
    )


def _npy_shape(path: str) -> tuple:
    """Array shape from the .npy header — no data read (mmap open)."""
    return np.load(path, mmap_mode="r").shape


def feature_stats(graph: GraphData, chunk: int = 65536):
    """(mean, std) over TRAIN rows of a deferred feature table, computed
    in a chunked pass over the mmap — peak memory O(chunk) rows. Matches
    :func:`standardize_features`' population-std semantics (utils.py:62-68)
    with float64 accumulation."""
    path, _, F = graph.feature_meta
    mm = np.load(path, mmap_mode="r")
    train_rows = np.sort(graph.feat_rows[graph.is_train])
    s = np.zeros(F, np.float64)
    ss = np.zeros(F, np.float64)
    cnt = 0
    for i in range(0, len(train_rows), chunk):
        block = np.asarray(mm[train_rows[i:i + chunk]], dtype=np.float64)
        s += block.sum(axis=0)
        ss += (block * block).sum(axis=0)
        cnt += block.shape[0]
    mean = s / max(cnt, 1)
    var = np.maximum(ss / max(cnt, 1) - mean * mean, 0.0)
    std = np.sqrt(var)
    std[std == 0.0] = 1.0
    return mean.astype(np.float32), std.astype(np.float32)


def materialize_features(graph: GraphData) -> GraphData:
    """Graph with its features in memory: a deferred table is read fully
    into a shallow COPY of ``graph`` (the caller's GraphData is never
    mutated — it stays deferred for e.g. a later per-host sharded run).
    Eager graphs pass through unchanged."""
    if graph.features is not None or graph.feature_meta is None:
        return graph
    import dataclasses

    return dataclasses.replace(
        graph, features=load_feature_shard(graph, 0, graph.num_nodes)
    )


def load_feature_shard(
    graph: GraphData,
    lo: int,
    hi: int,
    normalize: bool | None = None,
    stats=None,
    dtype=np.float32,
    chunk: int = 65536,
) -> np.ndarray:
    """Rows [lo, hi) of the compacted+padded feature table, reading ONLY
    those rows from the deferred on-disk table (mmap fancy-index).

    Row indices follow the device layout: row i < num_nodes is node i's
    (standardized) features; rows >= num_nodes (the dummy node and any
    shard padding) are zero. ``normalize=None`` keeps the intent
    load_data was called with (``graph.feature_normalize``). Peak memory
    is O(hi - lo + chunk) rows — never the full table. Requires
    ``load_data(load_features=False)``.
    """
    return load_feature_rows(
        graph, np.arange(lo, hi), normalize=normalize, stats=stats,
        dtype=dtype, chunk=chunk,
    )


def load_feature_rows(
    graph: GraphData,
    node_ids: np.ndarray,
    normalize: bool | None = None,
    stats=None,
    dtype=np.float32,
    chunk: int = 65536,
) -> np.ndarray:
    """Rows ``node_ids`` of the compacted+padded feature table, reading
    ONLY those rows from the deferred on-disk table (mmap fancy-index).

    Ids >= num_nodes (the dummy node and shard padding) yield zero rows.
    ``normalize=None`` keeps the intent load_data was called with
    (``graph.feature_normalize``). Non-contiguous id sets are how
    strided-layout shards load (each host owns rows ``d::n_shards`` —
    parallel/graph_sharded.py::shard_rows); peak memory is
    O(len(node_ids) + chunk) rows, never the full table. Requires
    ``load_data(load_features=False)``.
    """
    if graph.feature_meta is None:
        raise ValueError(
            "load_feature_rows needs a deferred feature table — load the "
            "graph with load_data(..., load_features=False)"
        )
    if normalize is None:
        normalize = graph.feature_normalize
    path, _, F = graph.feature_meta
    mm = np.load(path, mmap_mode="r")
    n = graph.num_nodes
    node_ids = np.asarray(node_ids)
    out = np.zeros((len(node_ids), F), dtype=np.float32)
    real = node_ids < n
    if real.any():
        file_rows = graph.feat_rows[node_ids[real]]
        out[real] = mm[file_rows]
        if normalize:
            mean, std = stats if stats is not None else feature_stats(
                graph, chunk
            )
            out[real] = (out[real] - mean) / std
    return out.astype(dtype)


def standardize_features(feats: np.ndarray, train_mask: np.ndarray) -> np.ndarray:
    """StandardScaler semantics fitted on train rows only (utils.py:62-68)."""
    train_rows = feats[train_mask]
    mean = train_rows.mean(axis=0)
    std = train_rows.std(axis=0)  # population std, ddof=0, like sklearn
    std = np.where(std == 0.0, 1.0, std)
    return ((feats - mean) / std).astype(np.float32)


def _build_neighbor_lists(n: int, edges: np.ndarray) -> list:
    out: list[list[int]] = [[] for _ in range(n)]
    for a, b in edges:
        out[a].append(b)
        out[b].append(a)
    return [np.asarray(x, dtype=np.int32) for x in out]
