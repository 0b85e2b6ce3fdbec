"""End-to-end trainer tests: tiny synthetic graphs, few steps, on the
8-virtual-device CPU backend (conftest.py).

Mirrors the reference's de-facto verification (SURVEY.md §4): the example
smoke scripts become real pytest cases with F1/output-contract checks.
"""

import dataclasses
import os

import numpy as np
import pytest

from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset
from graphsage_tpu.train.config import TrainFlags, build_layer_infos


def tiny_flags(tmp_path, **kw):
    base = dict(
        model="graphsage_mean",
        learning_rate=0.01,
        epochs=2,
        batch_size=16,
        samples_1=4,
        samples_2=3,
        dim_1=8,
        dim_2=8,
        max_degree=8,
        validate_iter=4,
        validate_batch_size=8,
        print_every=1000,
        base_log_dir=str(tmp_path),
        train_prefix=str(tmp_path / "synth"),
        seed=123,
    )
    base.update(kw)
    return TrainFlags(**base)


@pytest.fixture(scope="module")
def graph():
    return make_synthetic_graph(num_nodes=80, num_classes=3, feat_dim=8,
                                seed=3)


def test_supervised_end_to_end(tmp_path, graph):
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path)
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])
    # informative features -> should beat the 1/3 random baseline
    assert result["val_f1_mic"] > 0.4
    log_dir = flags.log_dir("supervised")
    for stats in ("val_stats.txt", "test_stats.txt"):
        with open(os.path.join(log_dir, stats)) as fp:
            content = fp.read()
        assert "f1_micro=" in content


def test_supervised_sigmoid_multilabel(tmp_path):
    from graphsage_tpu.train.supervised import train

    g = make_synthetic_graph(num_nodes=80, num_classes=4, feat_dim=8,
                             multilabel=True, seed=5)
    flags = tiny_flags(tmp_path, sigmoid=True, epochs=1)
    result = train(flags, graph=g)
    assert np.isfinite(result["val_loss"])
    assert 0.0 <= result["val_f1_mic"] <= 1.0


def test_supervised_gcn_three_layer_dispatch(tmp_path, graph):
    from graphsage_tpu.train.supervised import train

    # gcn: concat=False, doubled dims
    flags = tiny_flags(tmp_path, model="gcn", epochs=1, max_total_steps=3)
    agg, concat, layers = build_layer_infos(flags, supervised=True)
    assert agg == "gcn" and not concat
    assert layers[0].output_dim == 2 * flags.dim_1
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])

    # samples_3 adds a third layer for graphsage_mean only
    flags3 = tiny_flags(tmp_path, samples_3=2)
    _, _, layers3 = build_layer_infos(flags3, supervised=True)
    assert len(layers3) == 3
    _, _, layers_gcn = build_layer_infos(
        tiny_flags(tmp_path, model="gcn", samples_3=2), supervised=True
    )
    assert len(layers_gcn) == 2


@pytest.mark.parametrize(
    "model", ["graphsage_seq", "graphsage_maxpool", "graphsage_meanpool"]
)
def test_model_zoo_trainer_smoke(tmp_path, graph, model):
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, model=model, epochs=1, max_total_steps=4)
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])


def test_unsupervised_end_to_end(tmp_path, graph):
    from graphsage_tpu.train.unsupervised import train

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=10, random_context=False,
        save_embeddings=True,
    )
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])
    log_dir = result["log_dir"]
    emb = np.load(os.path.join(log_dir, "val.npy"))
    with open(os.path.join(log_dir, "val.txt")) as fp:
        nodes = fp.read().splitlines()
    assert emb.shape[0] == len(nodes) == graph.num_nodes
    # embeddings are l2-normalized
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_n2v_end_to_end(tmp_path, graph):
    from graphsage_tpu.train.unsupervised import train

    flags = tiny_flags(
        tmp_path, model="n2v", epochs=1, max_total_steps=10,
        random_context=False, save_embeddings=True, n2v_test_epochs=1,
        dim_1=4,
    )
    result = train(flags, graph=graph)
    log_dir = result["log_dir"]
    emb = np.load(os.path.join(log_dir, "val.npy"))
    emb_test = np.load(os.path.join(log_dir, "val-test.npy"))
    assert emb.shape == (graph.num_nodes, 2 * flags.dim_1)
    assert emb_test.shape == emb.shape


def test_checkpoint_resume(tmp_path, graph):
    from graphsage_tpu.train import checkpoint as ckpt
    from graphsage_tpu.train.supervised import (
        build_supervised_config,
        train,
    )

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    result = train(flags, graph=graph)
    assert ckpt.latest_step(flags.checkpoint_dir) == result["steps"]

    # restore round-trips the param pytree exactly
    import jax

    config = build_supervised_config(flags, graph)
    from graphsage_tpu.models.supervised import (
        init_supervised_params,
        make_optimizer,
    )

    params0 = init_supervised_params(jax.random.key(0), config)
    opt0 = make_optimizer(flags.learning_rate).init(params0)
    restored = ckpt.restore(flags.checkpoint_dir, params0, opt0)
    assert restored is not None
    params, _, step = restored
    assert step == result["steps"]
    trained_head = np.asarray(result["params"]["head"]["w"])
    np.testing.assert_allclose(
        np.asarray(params["head"]["w"]), trained_head, rtol=1e-6
    )


def test_checkpoint_rejects_resized_model(tmp_path, graph):
    """Resuming with genuinely changed model shapes (dim_1 here) must
    error, not silently pad/truncate weights — only leading-row resizes
    of the identity 'embeds' table qualify for the relaxed restore."""
    import jax
    import pytest

    from graphsage_tpu.models.supervised import (
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.train import checkpoint as ckpt
    from graphsage_tpu.train.supervised import build_supervised_config, train

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    train(flags, graph=graph)

    resized = dataclasses.replace(flags, dim_1=16, dim_2=16)
    config = build_supervised_config(resized, graph)
    params0 = init_supervised_params(jax.random.key(0), config)
    opt0 = make_optimizer(resized.learning_rate).init(params0)
    with pytest.raises(ValueError, match="shape-incompatible"):
        ckpt.restore(flags.checkpoint_dir, params0, opt0)


def test_cli_walks_and_dataset_roundtrip(tmp_path, graph):
    from graphsage_tpu.cli import main
    from graphsage_tpu.data.io import load_data

    prefix = str(tmp_path / "synth")
    write_dataset(graph, prefix)
    out = str(tmp_path / "synth-walks.txt")
    assert main(["walks", prefix + "-G.json", out,
                 "--num_walks", "3", "--walk_len", "2"]) == 0
    g2 = load_data(prefix, load_walks=True)
    assert g2.num_nodes == graph.num_nodes
    assert g2.walks is not None and g2.walks.shape[1] == 2
    # walk endpoints are train nodes
    is_train = g2.is_train
    assert is_train[g2.walks].all()


def test_cli_parser_defaults():
    from graphsage_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(["supervised", "--train_prefix", "x", "--sigmoid"])
    assert args.model == "graphsage_mean"
    assert args.learning_rate == 0.01 and args.epochs == 10
    assert args.sigmoid

    args = p.parse_args(["unsupervised", "--train_prefix", "x"])
    assert args.learning_rate == 0.00001
    assert args.epochs == 1 and args.max_degree == 100
    assert args.neg_sample_size == 20


def test_dataclass_flags_roundtrip():
    # dataset name comes from the prefix's PARENT directory
    # (reference supervised_train.py:82 split("/")[-2])
    f = TrainFlags(train_prefix="/tmp/reddit/reddit")
    d = f.log_dir("supervised")
    assert d.endswith("graphsage_mean_small_0.0100")
    assert "sup-reddit" in d
    # unsupervised uses a 0.6f lr format (unsupervised_train.py:62)
    du = f.log_dir("unsupervised")
    assert du.endswith("graphsage_mean_small_0.010000")
    assert "unsup-reddit" in du
    f2 = dataclasses.replace(f, model="gcn")
    assert f2.model == "gcn"


def test_rows_gather_flag_reaches_config(graph):
    """--rows_gather plumbs through to SAGEConfig in both trainers (the
    opt-in row-DMA gather for pooled/seq aggregators)."""
    from graphsage_tpu.train.supervised import build_supervised_config
    from graphsage_tpu.train.unsupervised import build_unsupervised_config

    f = TrainFlags(train_prefix="/tmp/x/x", model="graphsage_maxpool",
                   rows_gather=True)
    assert build_supervised_config(f, graph).sage.rows_gather
    assert build_unsupervised_config(f, graph).sage.rows_gather
    f0 = TrainFlags(train_prefix="/tmp/x/x")
    assert not build_supervised_config(f0, graph).sage.rows_gather


def test_one_layer_dispatch(tmp_path, graph):
    """samples_2=0 -> single-layer graphsage_mean (reference
    supervised_train.py:157-161)."""
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, samples_2=0, epochs=1, max_total_steps=3)
    _, _, layers = build_layer_infos(flags, supervised=True)
    assert len(layers) == 1
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])


def test_full_incremental_validation(tmp_path, graph):
    """validate_batch_size=-1 -> full incremental val sweep inside the
    loop (reference supervised_train.py:281-282)."""
    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, validate_batch_size=-1, epochs=1,
                       max_total_steps=3)
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])


def test_n2v_retrain_prunes_eval_contexts(graph):
    """The n2v retrain iterator must drop pairs whose CONTEXT endpoint is
    a val/test node (reference fixed_n2v=True, unsupervised_train.py:351,
    minibatch.py:56-58)."""
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.data.minibatch import EdgeBatcher

    _, deg, _ = build_both_adjs(graph, 8, seed=0)
    is_eval = graph.is_val | graph.is_test
    evalnodes = np.flatnonzero(is_eval)
    # pairs: eval source -> mixed contexts (some eval, some train)
    trainnodes = np.flatnonzero(~is_eval)
    pairs = np.stack([
        np.repeat(evalnodes[:4], 2),
        np.concatenate([evalnodes[:4], trainnodes[:4]]),
    ], axis=1).astype(np.int32)
    b = EdgeBatcher(graph, deg, 4, context_pairs=pairs, seed=0,
                    n2v_retrain=True, fixed_n2v=True)
    assert len(b.train_pairs) == 4
    assert not is_eval[b.train_pairs[:, 1]].any()
    # without fixed_n2v all pairs survive
    b2 = EdgeBatcher(graph, deg, 4, context_pairs=pairs, seed=0,
                     n2v_retrain=True, fixed_n2v=False)
    assert len(b2.train_pairs) == 8


def test_unsupervised_full_set_validation(tmp_path, graph):
    """validate_batch_size=-1 -> device-resident sweep over ALL val edges
    (reference val_feed_dict(size=None), minibatch.py:137-144)."""
    from graphsage_tpu.train.unsupervised import train

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=6, random_context=False,
        save_embeddings=False, validate_batch_size=-1, validate_iter=2,
    )
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])
    assert 0.0 <= result["val_mrr"] <= 1.0


def test_sample_val_batch_pad_to(graph):
    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.data.minibatch import NodeBatcher

    _, deg, _ = build_both_adjs(graph, 8, seed=0)
    b = NodeBatcher(graph, deg, 16, seed=0)
    vb = b.sample_val_batch(5, pad_to=8)
    assert vb.ids.shape == (8,)
    assert vb.mask.sum() == 5
    assert (vb.ids[5:] == graph.num_nodes).all()


def test_log_histograms_flag(tmp_path, graph):
    """--log_histograms writes TB event files with histogram data."""
    import glob

    from graphsage_tpu.train.supervised import train

    flags = tiny_flags(tmp_path, epochs=1, max_total_steps=3,
                       print_every=1, log_histograms=True)
    train(flags, graph=graph)
    events = glob.glob(
        str(tmp_path) + "/sup-*/*/events.out.tfevents*"
    )
    assert events, "tensorboard event file not written"


def test_n2v_learns_class_separable_embeddings(tmp_path):
    """DeepWalk over an assortative community graph must yield
    class-separable TARGET embeddings for train AND (via the fixed_n2v
    retrain, which is test nodes' ONLY training — train-subgraph walks
    never visit them) for val/test nodes.

    SGD-skipgram scaling regression (root-caused on hardware): the loss
    is summed xent / batch_size into plain SGD (reference
    models.py:442, 478-487), so a node's row moves ~lr*||ctx||/batch
    per visit and needs lr O(1) + ~1-2k visits to leave its
    uniform(-1, 1) init; at lr 0.01 / 1 retrain epoch the table
    provably stays at init and the probe equals the dummy baseline
    (benchmarks/accuracy_acceptance.py n2v config comment).
    """
    import jax

    from graphsage_tpu.data.walks import run_random_walks, write_walks
    from graphsage_tpu.train.unsupervised import train

    g = make_synthetic_graph(num_nodes=200, num_classes=3, feat_dim=8,
                             intra_p=0.12, inter_p=0.006, seed=5)
    lab = g.labels.argmax(1) if g.labels.ndim == 2 else g.labels
    prefix = str(tmp_path / "com")
    from graphsage_tpu.data.synthetic import write_dataset

    write_dataset(g, prefix)
    is_train = g.is_train
    sub = [nb[is_train[nb]] if is_train[i] else nb[:0]
           for i, nb in enumerate(g.neighbors)]
    pairs = run_random_walks(sub, np.flatnonzero(is_train), num_walks=25,
                             walk_len=5, rng=np.random.default_rng(7))
    write_walks(prefix + "-walks.txt", pairs, g.node_ids)

    flags = tiny_flags(
        tmp_path, model="n2v", epochs=30, max_total_steps=4000,
        batch_size=128, dim_1=8, learning_rate=2.0,
        random_context=True, save_embeddings=True, n2v_test_epochs=10,
        train_prefix=prefix,
    )
    result = train(flags)

    def centroid_acc(E, ids, mask):
        id2row = {nid: i for i, nid in enumerate(ids)}
        rows = np.asarray([id2row[n] for n in np.asarray(g.node_ids)])
        X = E[rows]
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-9)
        cents = np.stack([
            Xn[is_train & (lab == c)].mean(0) for c in range(3)
        ])
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-9
        return ((Xn[mask] @ cents.T).argmax(1) == lab[mask]).mean()

    d = result["log_dir"]
    conv = type(np.asarray(g.node_ids).tolist()[0])
    Ev = np.load(os.path.join(d, "val.npy"))
    ids_v = [conv(l.strip()) for l in open(os.path.join(d, "val.txt"))]
    Et = np.load(os.path.join(d, "val-test.npy"))
    ids_t = [conv(l.strip()) for l in open(os.path.join(d, "val-test.txt"))]

    train_acc = centroid_acc(Ev, ids_v, is_train)
    eval_acc = centroid_acc(Et, ids_t, g.is_val | g.is_test)
    assert train_acc > 0.7, f"train embeddings not separable: {train_acc}"
    assert eval_acc > 0.55, f"retrained eval embeddings at chance: {eval_acc}"


def test_unsupervised_dropout_fused_trains(tmp_path, graph):
    """round-5: the unsupervised (three-tower) trainer with dropout > 0
    keeps the fused inner hop (in-kernel mask on TPU; jax.random on the
    CPU fallback) — the step must run finite end-to-end."""
    from graphsage_tpu.train.unsupervised import train

    flags = tiny_flags(
        tmp_path, epochs=1, max_total_steps=10, random_context=False,
        save_embeddings=False, dropout=0.4, fused_gather=True,
    )
    result = train(flags, graph=graph)
    assert np.isfinite(result["val_loss"])
    assert 0.0 <= result["val_mrr"] <= 1.0
