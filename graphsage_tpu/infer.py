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

CLI: ``graphsage embed ...`` / ``graphsage predict ...``.
"""

from __future__ import annotations

import dataclasses
import os

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
        graph = load_data(flags.train_prefix, load_walks=False)
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


def _restore_params(flags: TrainFlags, params_like):
    """Restore trained params from flags.checkpoint_dir (-> params, step).

    Optimizer state is restored only for pytree-structure compatibility
    with the trainers' checkpoints and then discarded.
    """
    if not flags.checkpoint_dir:
        raise ValueError("inference requires --checkpoint_dir")
    optimizer = make_optimizer(flags.learning_rate)
    opt_state = optimizer.init(params_like)
    restored = ckpt.restore(flags.checkpoint_dir, params_like, opt_state)
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
    graph, features, full_adj = _prepare(flags, graph)
    config = build_unsupervised_config(flags, graph)
    params_like = init_unsupervised_params(
        jax.random.key(flags.seed), config
    )
    params, step = _restore_params(flags, params_like)

    B = flags.batch_size
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
    graph, features, full_adj = _prepare(flags, graph)
    if graph.num_classes is None:
        if num_classes <= 0:
            raise ValueError(
                "dataset has no class_map; pass the training run's "
                "--num_classes"
            )
        graph = dataclasses.replace(graph, num_classes=num_classes)
    config = build_supervised_config(flags, graph)
    params_like = init_supervised_params(jax.random.key(flags.seed), config)
    params, step = _restore_params(flags, params_like)

    node_idx = _select_nodes(graph, nodes)
    if len(node_idx) == 0:
        raise ValueError(f"node set {nodes!r} is empty in this dataset")
    labels_np = graph.labels
    have_labels = labels_np is not None
    if not have_labels:
        labels_np = np.zeros(
            (graph.num_nodes, graph.num_classes), dtype=np.float32
        )
    sweep = make_eval_sweep(config, flags.batch_size, graph.num_nodes)
    loss, preds, labels, dt = _run_eval_sweep(
        sweep, params, features, full_adj, node_idx, labels_np,
        flags.batch_size, graph.num_nodes, jax.random.key(flags.seed + 1),
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
