"""Standalone inference (graphsage_tpu/infer.py): checkpoint -> embeddings
and class predictions, decoupled from the trainers.

The reference has no serving entry point (embeddings only at the tail of
unsupervised training, predictions only inside the training session) —
these tests pin the new surface's contract: bitwise re-export of a
training run's embeddings, exact reproduction of the trainer's final
test F1, and true inductive application to a graph never seen in
training.
"""

import dataclasses
import os

import numpy as np
import pytest

from graphsage_tpu.data.synthetic import make_synthetic_graph
from tests.test_train import tiny_flags


@pytest.fixture(scope="module")
def graph():
    return make_synthetic_graph(num_nodes=80, num_classes=3, feat_dim=8,
                                seed=7)


def test_embed_reproduces_trainer_export(tmp_path, graph):
    from graphsage_tpu.infer import export_embeddings
    from graphsage_tpu.train.unsupervised import train

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=8, random_context=False,
        save_embeddings=True, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    result = train(flags, graph=graph)
    trainer_rows = np.load(os.path.join(result["log_dir"], "val.npy"))

    out = export_embeddings(flags, out_dir=str(tmp_path / "re-export"),
                            graph=graph)
    rows = np.load(os.path.join(out, "val.npy"))
    # same checkpoint, same sweep, same eval-key derivation -> bitwise
    np.testing.assert_array_equal(rows, trainer_rows)
    with open(os.path.join(out, "val.txt")) as fp:
        ids = fp.read().splitlines()
    assert ids == [str(i) for i in graph.node_ids]


def test_predict_reproduces_trainer_test_f1(tmp_path, graph):
    from graphsage_tpu.infer import predict
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    result = train(flags, graph=graph)

    pred = predict(flags, out_dir=str(tmp_path / "preds"), nodes="test",
                   graph=graph)
    # same checkpoint, same eval sweep + key + node order as the
    # trainer's final test sweep
    assert pred["f1_micro"] == pytest.approx(result["test_f1_mic"])
    preds = np.load(os.path.join(pred["out_dir"], "preds.npy"))
    assert preds.shape == (int(graph.is_test.sum()), graph.num_classes)
    # softmax predictions are distributions (supervised_models.py:122-126)
    np.testing.assert_allclose(preds.sum(axis=1), 1.0, rtol=1e-5)
    with open(os.path.join(pred["out_dir"], "nodes.txt")) as fp:
        assert len(fp.read().splitlines()) == preds.shape[0]


def test_predict_inductive_on_new_graph(tmp_path, graph):
    """A checkpoint trained on graph A applies to an unseen graph B with
    the same feature/label spaces (GraphSAGE is inductive)."""
    from graphsage_tpu.infer import predict
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    train(flags, graph=graph)

    graph_b = make_synthetic_graph(num_nodes=60, num_classes=3, feat_dim=8,
                                   seed=11)
    pred = predict(flags, out_dir=str(tmp_path / "preds_b"), nodes="all",
                   graph=graph_b)
    assert pred["n"] == graph_b.num_nodes
    # same generator family -> transferred model beats random (1/3)
    assert pred["f1_micro"] > 0.4
    assert np.isfinite(pred["loss"])


def test_predict_unlabeled_needs_num_classes(tmp_path, graph):
    from graphsage_tpu.infer import predict
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    train(flags, graph=graph)

    unlabeled = dataclasses.replace(
        graph, labels=None, class_map=None, num_classes=None
    )
    with pytest.raises(ValueError, match="num_classes"):
        predict(flags, nodes="all", graph=unlabeled)
    pred = predict(flags, out_dir=str(tmp_path / "preds_u"), nodes="all",
                   num_classes=3, graph=unlabeled)
    assert "f1_micro" not in pred  # no labels -> no F1 row
    preds = np.load(os.path.join(pred["out_dir"], "preds.npy"))
    assert preds.shape == (graph.num_nodes, 3)


def test_infer_requires_checkpoint(tmp_path, graph):
    from graphsage_tpu.infer import export_embeddings

    flags = tiny_flags(tmp_path, random_context=False)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        export_embeddings(flags, graph=graph)
    flags = tiny_flags(tmp_path, random_context=False,
                       checkpoint_dir=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        export_embeddings(flags, graph=graph)


def test_sharded_embed_reproduces_sharded_trainer_export(tmp_path, graph):
    """--graph_shards inference re-exports a sharded training run's
    embeddings bit-for-bit (same sweep, capacity, key derivation)."""
    from graphsage_tpu.infer import export_embeddings
    from graphsage_tpu.train.unsupervised import train

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=6, random_context=False,
        save_embeddings=True, graph_shards=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    result = train(flags, graph=graph)
    trainer_rows = np.load(os.path.join(result["log_dir"], "val.npy"))

    out = export_embeddings(flags, out_dir=str(tmp_path / "re-export"),
                            graph=graph)
    rows = np.load(os.path.join(out, "val.npy"))
    np.testing.assert_array_equal(rows, trainer_rows)


def test_predict_single_device_checkpoint_on_sharded_mesh(tmp_path, graph):
    """A single-device training checkpoint serves under --graph_shards 4
    (canonical-order checkpoints are topology-portable); under the
    deterministic first_k sampler the sharded predictions match the
    single-device ones (the P2 bit-parity invariant)."""
    from graphsage_tpu.infer import predict
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, sampler_mode="first_k", identity_dim=4,
                       checkpoint_dir=str(tmp_path / "ckpt"))
    train(flags, graph=graph)

    single = predict(flags, out_dir=str(tmp_path / "p1"), nodes="test",
                     graph=graph)
    sharded_flags = dataclasses.replace(flags, graph_shards=4)
    sharded = predict(sharded_flags, out_dir=str(tmp_path / "p4"),
                      nodes="test", graph=graph)
    p1 = np.load(os.path.join(single["out_dir"], "preds.npy"))
    p4 = np.load(os.path.join(sharded["out_dir"], "preds.npy"))
    np.testing.assert_allclose(p4, p1, rtol=2e-5, atol=2e-6)
    assert sharded["f1_micro"] == pytest.approx(single["f1_micro"])


def test_cli_parses_infer_commands():
    from graphsage_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["embed", "--train_prefix", "/d/x/x",
                      "--checkpoint_dir", "/tmp/c", "--model", "gcn"])
    assert a.command == "embed" and a.model == "gcn"
    a = p.parse_args(["predict", "--train_prefix", "/d/x/x",
                      "--checkpoint_dir", "/tmp/c", "--nodes", "val",
                      "--sigmoid", "--num_classes", "5"])
    assert a.command == "predict" and a.nodes == "val"
    assert a.num_classes == 5 and a.sigmoid
