"""Downstream logistic-regression eval harness tests."""

import numpy as np

from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset
from graphsage_tpu.evaluation import evaluate_embeddings, run_regression


def test_run_regression_single_label():
    rng = np.random.default_rng(0)
    centers = np.eye(3, 8, dtype=np.float32) * 4
    y_train = rng.integers(0, 3, 200)
    y_test = rng.integers(0, 3, 100)
    x_train = centers[y_train] + rng.normal(0, 0.5, (200, 8))
    x_test = centers[y_test] + rng.normal(0, 0.5, (100, 8))
    res = run_regression(x_train, y_train, x_test, y_test)
    assert res["test_f1"] > 0.9
    assert res["test_f1"] > res["dummy_f1"]


def test_run_regression_multilabel():
    rng = np.random.default_rng(1)
    y_train = (rng.random((200, 4)) > 0.5).astype(np.int32)
    y_test = (rng.random((100, 4)) > 0.5).astype(np.int32)
    x_train = y_train + rng.normal(0, 0.3, (200, 4))
    x_test = y_test + rng.normal(0, 0.3, (100, 4))
    res = run_regression(x_train, y_train, x_test, y_test)
    assert res["test_f1"] > 0.8


def test_evaluate_embeddings_feat_baseline(tmp_path):
    g = make_synthetic_graph(num_nodes=150, num_classes=3, feat_dim=8, seed=2)
    prefix = str(tmp_path / "synth")
    write_dataset(g, prefix)
    res = evaluate_embeddings(prefix, "feat", "test")
    # synthetic features carry the class signal directly
    assert res["test_f1"] > 0.6


def test_evaluate_embeddings_from_files(tmp_path):
    g = make_synthetic_graph(num_nodes=150, num_classes=3, feat_dim=8, seed=2)
    prefix = str(tmp_path / "synth")
    write_dataset(g, prefix)
    # fake "perfect" embeddings = labels + noise, exported in shuffled order
    rng = np.random.default_rng(3)
    order = rng.permutation(g.num_nodes)
    embeds = g.labels[order] + rng.normal(0, 0.2, (g.num_nodes, 3))
    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    np.save(emb_dir / "val.npy", embeds)
    (emb_dir / "val.txt").write_text(
        "\n".join(str(g.node_ids[i]) for i in order)
    )
    res = evaluate_embeddings(prefix, str(emb_dir), "test")
    assert res["test_f1"] > 0.9


def test_eval_cli_subcommand(tmp_path, capsys):
    from graphsage_tpu.cli import main
    from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset

    g = make_synthetic_graph(num_nodes=120, num_classes=3, feat_dim=8, seed=4)
    prefix = str(tmp_path / "synth")
    write_dataset(g, prefix)
    assert main(["eval", prefix, "feat", "test"]) == 0
    out = capsys.readouterr().out
    assert "test F1 (micro):" in out


def test_label_tsvs_citation_scheme(tmp_path):
    from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset
    from graphsage_tpu.evaluation import evaluate_embeddings

    g = make_synthetic_graph(num_nodes=150, num_classes=3, feat_dim=8, seed=2)
    prefix = str(tmp_path / "synth")
    write_dataset(g, prefix)
    classes = np.argmax(g.labels, axis=1)
    tsvs = []
    for c in range(3):
        p = tmp_path / f"class_{c}.tsv"
        lines = ["id\tmeta"] + [
            f"{g.node_ids[i]}\tx" for i in np.flatnonzero(classes == c)
        ]
        p.write_text("\n".join(lines))
        tsvs.append(str(p))
    res = evaluate_embeddings(prefix, "feat", "test", label_tsvs=tsvs)
    assert res["test_f1"] > 0.6  # same labels as class_map -> same signal
