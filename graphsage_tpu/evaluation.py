"""Downstream evaluation: logistic regression over saved embeddings.

Generalizes the reference eval_scripts
(/root/reference/eval_scripts/ppi_eval.py:15-30,
reddit_eval.py:8-22, citation_eval.py:19-29): fit an SGD logistic
classifier on train-node embeddings, report micro-F1 on val/test nodes,
with a raw-features baseline ("feat") and a dummy baseline. Multilabel
datasets (PPI) use one classifier per label column; single-label
(Reddit/citation) a single classifier. This is the acceptance harness
for unsupervised training.
"""

from __future__ import annotations

import os

import numpy as np


def run_regression(train_embeds, train_labels, test_embeds, test_labels,
                   seed: int = 1, sgd_max_iter: int | None = None) -> dict:
    """-> {"test_f1", "train_f1", "dummy_f1"} (+ "*_f1_pos" multilabel).

    sklearn SGD logistic regression (loss="log" in the reference's older
    sklearn = "log_loss" now); multilabel wraps in MultiOutputClassifier
    (ppi_eval.py:21-23).

    Multilabel metrics: ``*_f1`` aggregates the reference's per-column
    binary micro-F1 prints (ppi_eval.py:26-30) over all cells — which
    equals cell accuracy and has a high base-rate floor on dense labels.
    ``*_f1_pos`` is the standard positives-only multilabel micro-F1 (the
    paper's PPI metric, and what calc_f1 reports for supervised runs):
    an all-negative predictor scores 0, so this is the metric with
    discriminative teeth — acceptance margins use it.

    ``sgd_max_iter`` bounds SGD epochs (the reference's sklearn-0.18-era
    n_iter default was 5; modern sklearn defaults to 1000, which is
    prohibitive at Reddit scale — pass a small value and report it).
    """
    np.random.seed(seed)
    from sklearn.dummy import DummyClassifier
    from sklearn.linear_model import SGDClassifier
    from sklearn.metrics import f1_score
    from sklearn.multioutput import MultiOutputClassifier

    multilabel = np.asarray(train_labels).ndim == 2
    sgd_kw = {} if sgd_max_iter is None else {
        "max_iter": sgd_max_iter, "tol": None,
    }

    if multilabel:
        dummy = MultiOutputClassifier(DummyClassifier())
        log = MultiOutputClassifier(
            SGDClassifier(loss="log_loss", **sgd_kw), n_jobs=-1
        )
    else:
        dummy = DummyClassifier()
        log = SGDClassifier(loss="log_loss", **sgd_kw)

    dummy.fit(train_embeds, train_labels)
    log.fit(train_embeds, train_labels)

    def f1(y_true, y_pred):
        if multilabel:
            # reference prints per-column; aggregate micro over all columns
            return f1_score(
                np.asarray(y_true).ravel(), np.asarray(y_pred).ravel(),
                average="micro",
            )
        return f1_score(y_true, y_pred, average="micro")

    test_pred = log.predict(test_embeds)
    train_pred = log.predict(train_embeds)
    dummy_pred = dummy.predict(test_embeds)
    out = {
        "test_f1": float(f1(test_labels, test_pred)),
        "train_f1": float(f1(train_labels, train_pred)),
        "dummy_f1": float(f1(test_labels, dummy_pred)),
    }
    if multilabel:
        out["test_f1_pos"] = float(f1_score(
            np.asarray(test_labels), np.asarray(test_pred),
            average="micro", zero_division=0,
        ))
        out["train_f1_pos"] = float(f1_score(
            np.asarray(train_labels), np.asarray(train_pred),
            average="micro", zero_division=0,
        ))
        out["dummy_f1_pos"] = float(f1_score(
            np.asarray(test_labels), np.asarray(dummy_pred),
            average="micro", zero_division=0,
        ))
    return out


def load_embeddings(embed_dir: str, mod: str = ""):
    """(embeds [K, d], id->row map) from val<mod>.npy / val<mod>.txt."""
    embeds = np.load(os.path.join(embed_dir, f"val{mod}.npy"))
    id_map = {}
    with open(os.path.join(embed_dir, f"val{mod}.txt")) as fp:
        for i, line in enumerate(fp):
            id_map[line.strip()] = i
    return embeds, id_map


def read_label_tsvs(paths):
    """Class map from per-class TSV files: class i = index of the file,
    node id = first column, header skipped (the reference citation eval's
    scheme, citation_eval.py:8-17, generalized from its hardcoded paths)."""
    class_map = {}
    for i, path in enumerate(paths):
        with open(path) as fp:
            fp.readline()
            for line in fp:
                parts = line.split()
                if parts:
                    class_map[parts[0]] = i
    return class_map


def evaluate_embeddings(
    prefix: str,
    embed_dir: str,
    setting: str = "test",
    seed: int = 1,
    label_tsvs=None,
    sgd_max_iter: int | None = None,
) -> dict:
    """Full pipeline: load dataset + embeddings, split, regress.

    ``embed_dir='feat'`` runs the raw-feature baseline
    (ppi_eval.py:55-69): train-fitted StandardScaler over the feature
    matrix. The n2v two-embedding path (reddit_eval.py:61-94) is handled
    automatically when val-test.npy exists: train rows come from the
    original embeddings, eval rows from the retrained ones.
    """
    from graphsage_tpu.data.io import load_data

    graph = load_data(prefix, normalize=False)
    assert setting in ("val", "test")
    is_eval = graph.is_val if setting == "val" else graph.is_test
    train_idx = np.flatnonzero(graph.is_train)
    eval_idx = np.flatnonzero(is_eval)

    if label_tsvs:
        # citation-style external labels (one TSV per class); nodes absent
        # from every TSV are excluded from both splits (the reference eval
        # only iterates labeled nodes)
        cm = read_label_tsvs(label_tsvs)
        labeled = np.asarray(
            [str(nid) in cm for nid in graph.node_ids], dtype=bool
        )
        train_idx = train_idx[labeled[train_idx]]
        eval_idx = eval_idx[labeled[eval_idx]]
        y = np.asarray(
            [cm.get(str(nid), -1) for nid in graph.node_ids],
            dtype=np.int64,
        )
    else:
        labels = graph.labels
        first = next(iter(graph.class_map.values()))
        multilabel = isinstance(first, (list, np.ndarray))
        if multilabel:
            y = labels.astype(np.int32)
        else:
            y = np.argmax(labels, axis=1)
    train_labels, eval_labels = y[train_idx], y[eval_idx]

    if embed_dir == "feat":
        from sklearn.preprocessing import StandardScaler

        feats = graph.features.copy()
        scaler = StandardScaler().fit(feats[train_idx])
        feats = scaler.transform(feats)
        train_embeds, eval_embeds = feats[train_idx], feats[eval_idx]
    else:
        embeds, id_map = load_embeddings(embed_dir)
        rows = lambda idx: [id_map[str(graph.node_ids[i])] for i in idx]
        train_embeds = embeds[rows(train_idx)]
        if os.path.exists(os.path.join(embed_dir, "val-test.npy")):
            embeds2, id_map2 = load_embeddings(embed_dir, mod="-test")
            rows2 = [id_map2[str(graph.node_ids[i])] for i in eval_idx]
            eval_embeds = embeds2[rows2]
        else:
            eval_embeds = embeds[rows(eval_idx)]

    result = run_regression(
        train_embeds, train_labels, eval_embeds, eval_labels, seed=seed,
        sgd_max_iter=sgd_max_iter,
    )
    print(f"{setting} F1 (micro): {result['test_f1']:.5f}")
    print(f"train F1 (micro): {result['train_f1']:.5f}")
    print(f"dummy baseline F1 (micro): {result['dummy_f1']:.5f}")
    if "test_f1_pos" in result:
        print(f"{setting} multilabel micro-F1 (positives): "
              f"{result['test_f1_pos']:.5f} "
              f"(dummy {result['dummy_f1_pos']:.5f})")
    return result
