"""Standalone checkpoint inference: embeddings and class predictions.

The reference has no serving entry point — embeddings exist only as the
tail of unsupervised training (unsupervised_train.py:319-322) and class
predictions only inside the training session's eval loop
(supervised_train.py:91-110), so deploying a trained model means
re-running a trainer. Here a checkpoint written by either trainer
(``--checkpoint_dir``) loads on its own and applies, in one device
dispatch (the trainers' fori_loop sweeps), to any dataset with the
reference file contract — including graphs never seen in training:
GraphSAGE is inductive, the aggregator/dense weights are
graph-independent. The one transductive exception, inherited from the
reference (models.py:229-240), is ``identity_dim > 0``: the trained
[N+1, d] identity table is tied to the training graph's nodes (on a
different graph, rows beyond the stored table restore as zeros).

Scale-out serving: ``--graph_shards N`` (optionally composed with
``--data_shards M``) runs the sweeps over row-sharded tables with
all-to-all halo exchange (parallel/graph_sharded.py) — tables larger
than one chip's HBM serve across the mesh. Checkpoints store identity
tables in canonical id order, so any trainer's checkpoint loads under
any serving topology.

CLI: ``graphsage embed ...`` / ``graphsage predict ...``.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.data.io import load_data
from graphsage_tpu.models.supervised import (
    init_supervised_params,
    make_optimizer,
)
from graphsage_tpu.models.unsupervised import init_unsupervised_params
from graphsage_tpu.train import checkpoint as ckpt
from graphsage_tpu.train.config import TrainFlags

NODE_SETS = ("test", "val", "train", "all")


def _prepare(flags: TrainFlags, graph):
    """Load the dataset (full/eval adjacency) and place device arrays."""
    if graph is None:
        graph = load_data(flags.train_prefix, load_walks=False,
                          degree_relabel=flags.degree_relabel)
    # inference always sees the full graph (the reference's "test"
    # adjacency, minibatch.py:247-259, swapped in for every eval)
    _, _, full_adj_np = build_both_adjs(
        graph, flags.max_degree, seed=flags.seed
    )
    feats_np = graph.padded_features()
    if feats_np is not None and flags.fused_gather:
        from graphsage_tpu.ops.gather import pad_feature_dim

        feats_np = pad_feature_dim(feats_np)
    features = None if feats_np is None else jnp.asarray(
        feats_np, dtype=jnp.dtype(flags.feature_dtype)
    )
    return graph, features, jnp.asarray(full_adj_np)


def _restore_params(flags: TrainFlags, params_like, opt_state_like=None):
    """Restore trained params from flags.checkpoint_dir (-> params, step).

    Optimizer state is restored only for pytree-structure compatibility
    with the trainers' checkpoints and then discarded.
    """
    if not flags.checkpoint_dir:
        raise ValueError("inference requires --checkpoint_dir")
    if opt_state_like is None:
        opt_state_like = make_optimizer(flags.learning_rate).init(
            params_like
        )
    restored = ckpt.restore(flags.checkpoint_dir, params_like,
                            opt_state_like)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint found under {flags.checkpoint_dir!r}"
        )
    params, _, step = restored
    if flags.identity_dim > 0:
        print(
            "WARNING: identity_dim > 0 is transductive (reference "
            "models.py:229-240): the identity table is tied to the "
            "training graph; rows for nodes it did not cover are zeros."
        )
    return params, step


@dataclasses.dataclass
class _ShardedEnv:
    """Mesh + placed tables + restored params for --graph_shards inference
    (the trainers' _train_sharded placement, minus the train-only state).
    Checkpoints store identity tables in canonical id order, so any
    trainer's checkpoint (single-device, sharded under a different
    --graph_shards/--shard_layout, composed) loads here."""

    mesh: object
    feat_sh: object
    full_adj_sh: object
    cap_factor: float
    params: dict
    step: int
    total: int
    data_axis: str | None


def _prepare_sharded(flags: TrainFlags, graph, params_like) -> _ShardedEnv:
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from graphsage_tpu.parallel.distributed import (
        put_global,
        replicate_unsharded,
    )
    from graphsage_tpu.parallel.graph_sharded import (
        embeds_to_device_layout,
        shard_rows,
        suggest_capacity_factor,
    )
    from graphsage_tpu.train.supervised import _place_sharded_features

    D = flags.graph_shards
    Dd = max(flags.data_shards, 1)
    total = D * Dd
    if flags.batch_size % total:
        raise ValueError("batch_size must divide data_shards * graph_shards")
    devices = jax.devices()
    if len(devices) < total:
        devices = jax.devices("cpu")
    if len(devices) < total:
        raise ValueError(
            f"need {total} devices for --graph_shards {D} "
            f"x --data_shards {Dd}"
        )
    if Dd > 1:
        mesh = Mesh(np.asarray(devices[:total]).reshape(Dd, D),
                    ("data", "graph"))
    else:
        mesh = Mesh(np.asarray(devices[:D]), ("graph",))

    _, _, full_adj_np = build_both_adjs(
        graph, flags.max_degree, seed=flags.seed
    )
    layout = flags.shard_layout
    feat_sh = _place_sharded_features(graph, D, mesh, flags.feature_dtype,
                                      layout, lane_pad=flags.fused_gather)
    full_adj_sh = put_global(shard_rows(full_adj_np, D, layout)[0],
                             mesh, P("graph"))
    cap_factor = flags.capacity_factor or suggest_capacity_factor(
        full_adj_np, D, layout=layout
    )

    if flags.identity_dim > 0:
        params_like = dict(params_like)
        params_like["embeds"] = put_global(
            shard_rows(np.asarray(params_like["embeds"]), D, layout)[0],
            mesh, P("graph"),
        )
    params_like = replicate_unsharded(params_like, mesh)
    opt_state_like = replicate_unsharded(
        make_optimizer(flags.learning_rate).init(params_like), mesh
    )
    params, step = _restore_params(flags, params_like, opt_state_like)
    params = embeds_to_device_layout(params, D, layout)
    return _ShardedEnv(mesh=mesh, feat_sh=feat_sh, full_adj_sh=full_adj_sh,
                       cap_factor=cap_factor, params=params, step=step,
                       total=total, data_axis="data" if Dd > 1 else None)


def _warn_dropped(dropped, cap_factor: float, where: str) -> None:
    d = int(dropped)
    if d > 0:
        print(f"WARNING: {where}: {d} gather requests overflowed the "
              f"all-to-all capacity and returned ZERO rows "
              f"(capacity_factor={cap_factor:.2f}). "
              f"Raise --capacity_factor.")


def _select_nodes(graph, nodes: str) -> np.ndarray:
    if nodes == "all":
        return np.arange(graph.num_nodes)
    mask = {
        "train": graph.is_train, "val": graph.is_val, "test": graph.is_test,
    }[nodes]
    return np.flatnonzero(mask)


def export_embeddings(flags: TrainFlags, out_dir: str | None = None,
                      graph=None) -> str:
    """Checkpoint -> l2-normalized embeddings for every node, written as
    val.npy + val.txt (the trainer's export contract, reference
    unsupervised_train.py:94-117) under ``out_dir``.

    Uses the same sweep and RNG derivation as the trainer's final
    export, so re-exporting a training run's checkpoint reproduces its
    val.npy bit-for-bit.
    """
    from graphsage_tpu.train.unsupervised import (
        build_unsupervised_config,
        make_embed_sweep,
    )

    if flags.model == "n2v":
        raise ValueError(
            "n2v is embedding-table-only (transductive); its embeddings "
            "are exported by the trainer itself (val.npy / val-test.npy)"
        )
    B = flags.batch_size
    if flags.graph_shards > 1:
        from graphsage_tpu.parallel.graph_sharded import (
            make_sharded_embed_sweep,
            reassemble_sharded_rows,
        )

        if graph is None:
            graph = load_data(flags.train_prefix, load_walks=False,
                              load_features=not flags.defer_features,
                              degree_relabel=flags.degree_relabel)
        config = build_unsupervised_config(flags, graph)
        env = _prepare_sharded(flags, graph, init_unsupervised_params(
            jax.random.key(flags.seed), config
        ))
        step = env.step
        dummy = graph.num_nodes
        embed_sweep = make_sharded_embed_sweep(
            config, env.mesh, B, capacity_factor=env.cap_factor,
            params_like=env.params, data_axis=env.data_axis,
        )
        n_b = max(1, -(-graph.num_nodes // B))
        ids_all = np.full((n_b * B,), dummy, dtype=np.int32)
        ids_all[: graph.num_nodes] = np.arange(graph.num_nodes)
        # same export-key derivation as the sharded trainer
        out_sh, dropped = embed_sweep(
            env.params, env.feat_sh, env.full_adj_sh, jnp.asarray(ids_all),
            jax.random.key(flags.seed + 2),
        )
        _warn_dropped(dropped, env.cap_factor, "embedding export")
        rows = reassemble_sharded_rows(out_sh, env.total,
                                       n_b)[: graph.num_nodes]
    else:
        graph, features, full_adj = _prepare(flags, graph)
        config = build_unsupervised_config(flags, graph)
        params_like = init_unsupervised_params(
            jax.random.key(flags.seed), config
        )
        params, step = _restore_params(flags, params_like)

        dummy = graph.num_nodes
        embed_sweep = make_embed_sweep(config, B, dummy)
        n_b = max(1, -(-graph.num_nodes // B))
        ids_all = np.full((n_b * B,), dummy, dtype=np.int32)
        ids_all[: graph.num_nodes] = np.arange(graph.num_nodes)
        # same eval-key derivation as the trainer (train/unsupervised.py)
        rows = np.asarray(embed_sweep(
            params, features, full_adj, jnp.asarray(ids_all),
            jax.random.key(flags.seed + 1),
        ))[: graph.num_nodes]

    out_dir = out_dir or flags.log_dir("unsupervised")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "val.npy"), rows)
    with open(os.path.join(out_dir, "val.txt"), "w") as fp:
        fp.write("\n".join(map(str, graph.node_ids)))
    print(f"Wrote {rows.shape[0]} x {rows.shape[1]} embeddings "
          f"(checkpoint step {step}) to {out_dir}")
    return out_dir


def predict(flags: TrainFlags, out_dir: str | None = None,
            nodes: str = "test", num_classes: int = 0,
            graph=None) -> dict:
    """Checkpoint -> class predictions for a node set, written as
    preds.npy ([n, C] sigmoid probabilities or softmax distribution,
    supervised_models.py:122-126) + nodes.txt (original node ids).

    When the dataset carries labels, also reports loss and the
    reference's micro/macro F1 (supervised_train.py:63-70); an
    unlabeled dataset (no class_map) needs ``num_classes`` from the
    training run.
    """
    from graphsage_tpu.train.metrics import calc_f1
    from graphsage_tpu.train.supervised import (
        _run_eval_sweep,
        build_supervised_config,
        make_eval_sweep,
    )

    if nodes not in NODE_SETS:
        raise ValueError(f"nodes must be one of {NODE_SETS}")
    sharded = flags.graph_shards > 1
    if sharded:
        if graph is None:
            graph = load_data(flags.train_prefix, load_walks=False,
                              load_features=not flags.defer_features,
                              degree_relabel=flags.degree_relabel)
    else:
        graph, features, full_adj = _prepare(flags, graph)
    if graph.num_classes is None:
        if num_classes <= 0:
            raise ValueError(
                "dataset has no class_map; pass the training run's "
                "--num_classes"
            )
        graph = dataclasses.replace(graph, num_classes=num_classes)
    config = build_supervised_config(flags, graph)

    node_idx = _select_nodes(graph, nodes)
    if len(node_idx) == 0:
        raise ValueError(f"node set {nodes!r} is empty in this dataset")
    labels_np = graph.labels
    have_labels = labels_np is not None
    if not have_labels:
        labels_np = np.zeros(
            (graph.num_nodes, graph.num_classes), dtype=np.float32
        )
    if sharded:
        from graphsage_tpu.parallel.graph_sharded import (
            make_sharded_supervised_eval_sweep,
            reassemble_sharded_rows,
        )

        env = _prepare_sharded(flags, graph, init_supervised_params(
            jax.random.key(flags.seed), config
        ))
        step = env.step
        eval_sweep = make_sharded_supervised_eval_sweep(
            config, env.mesh, flags.batch_size,
            capacity_factor=env.cap_factor,
            params_like=env.params, data_axis=env.data_axis,
        )
        t0 = time.time()
        bs = flags.batch_size
        n_b = max(1, -(-len(node_idx) // bs))
        ids_all = np.full((n_b * bs,), graph.num_nodes, dtype=np.int32)
        ids_all[: len(node_idx)] = node_idx
        labels_table = np.zeros(
            (graph.num_nodes + 1, graph.num_classes), dtype=np.float32
        )
        labels_table[: graph.num_nodes] = labels_np
        losses, preds_sh, dropped = eval_sweep(
            env.params, env.feat_sh, env.full_adj_sh, jnp.asarray(ids_all),
            jnp.asarray(labels_table), jax.random.key(flags.seed + 1),
        )
        _warn_dropped(dropped, env.cap_factor, "eval sweep")
        preds = reassemble_sharded_rows(preds_sh, env.total,
                                        n_b)[: len(node_idx)]
        loss = float(np.mean(np.asarray(losses)))
        labels = labels_np[node_idx]
        dt = time.time() - t0
    else:
        params_like = init_supervised_params(
            jax.random.key(flags.seed), config
        )
        params, step = _restore_params(flags, params_like)
        sweep = make_eval_sweep(config, flags.batch_size, graph.num_nodes)
        loss, preds, labels, dt = _run_eval_sweep(
            sweep, params, features, full_adj, node_idx, labels_np,
            flags.batch_size, graph.num_nodes,
            jax.random.key(flags.seed + 1),
        )

    out_dir = out_dir or flags.log_dir("supervised")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "preds.npy"), preds)
    with open(os.path.join(out_dir, "nodes.txt"), "w") as fp:
        fp.write("\n".join(str(graph.node_ids[i]) for i in node_idx))
    result = {
        "out_dir": out_dir, "nodes": nodes, "n": len(node_idx),
        "step": step, "time": dt,
    }
    msg = (f"Predicted {len(node_idx)} {nodes} nodes "
           f"(checkpoint step {step}) -> {out_dir}")
    if have_labels:
        f1_mic, f1_mac = calc_f1(labels, preds, flags.sigmoid)
        result.update(loss=loss, f1_micro=f1_mic, f1_macro=f1_mac)
        msg += (f"  loss={loss:.5f} f1_micro={f1_mic:.5f} "
                f"f1_macro={f1_mac:.5f}")
    print(msg)
    return result
