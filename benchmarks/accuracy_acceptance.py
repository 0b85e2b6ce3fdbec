"""Accuracy acceptance on power-law proxy datasets (run on TPU).

The real PPI/Reddit datasets cannot be fetched in this environment
(zero egress), so this runs the FULL pipeline — supervised
(mean/maxpool/seq) and unsupervised+logistic-probe — on two
degree-skewed proxies generated to match the real datasets' published
statistics, and records micro-F1 into benchmarks/RESULTS.md. Provenance
is stated in the table; these are proxy numbers, compared against the
paper's real-dataset numbers (BASELINE.md) for orientation only.

  proxy-ppi:    15k nodes, 121 multilabel classes, 50 feats,
                power-law degrees (real PPI: 57k nodes / 819k edges /
                50 feats / 121 classes, mean degree ~29)
  proxy-reddit: 50k nodes, 41 classes, 602 feats, power-law degrees
                (real Reddit: 233k nodes / 11.6M edges / 602 feats /
                41 classes — scaled ~1/5, same feature/label shape)

Usage:  timeout 3000 python benchmarks/accuracy_acceptance.py \
            [--quick] [--out benchmarks/RESULTS.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_datasets(root: str, quick: bool):
    from graphsage_tpu.data.synthetic import (
        make_powerlaw_graph,
        write_dataset,
    )
    from graphsage_tpu.data.walks import run_random_walks, write_walks

    specs = {
        "proxy-ppi": dict(
            num_nodes=4_000 if quick else 15_000, num_classes=121,
            feat_dim=50, avg_degree=29, alpha=1.0, multilabel=True,
            feature_snr=0.5, seed=11,  # weak feats: aggregation must help
        ),
        "proxy-reddit": dict(
            num_nodes=10_000 if quick else 50_000, num_classes=41,
            feat_dim=602, avg_degree=60, alpha=1.0, multilabel=False,
            feature_snr=1.5, seed=12,
        ),
    }
    prefixes = {}
    for name, spec in specs.items():
        prefix = os.path.join(root, name, name)
        os.makedirs(os.path.dirname(prefix), exist_ok=True)
        print(f"[gen] {name}: {spec}", flush=True)
        g = make_powerlaw_graph(**spec)
        write_dataset(g, prefix)
        deg = np.asarray([len(n) for n in g.neighbors])
        print(f"[gen] {name}: {len(g.edges)} edges, mean deg "
              f"{deg.mean():.1f}, p99 {np.percentile(deg, 99):.0f}, "
              f"max {deg.max()}", flush=True)
        # train-subgraph walks for the unsupervised runs (reference
        # utils.py:97-103 semantics; 25 walks to bound runtime — stated)
        is_train = g.is_train
        sub_neighbors = [
            nbrs[is_train[nbrs]] if is_train[i] else nbrs[:0]
            for i, nbrs in enumerate(g.neighbors)
        ]
        pairs = run_random_walks(
            sub_neighbors, np.flatnonzero(is_train), num_walks=25,
            walk_len=5, rng=np.random.default_rng(7),
        )
        write_walks(prefix + "-walks.txt", pairs, g.node_ids)
        prefixes[name] = (prefix, spec)
    return prefixes


HEADER = [
    "# Accuracy acceptance — power-law proxy datasets",
    "",
    "Real PPI/Reddit are unfetchable here (zero egress); these runs",
    "exercise the full pipeline on degree-skewed proxies matched to",
    "the real datasets' shape (see benchmarks/accuracy_acceptance.py",
    "for the exact generator specs). Proxy F1 is NOT comparable 1:1",
    "to the paper's real-dataset numbers (BASELINE.md: Reddit sup",
    "~0.950, PPI sup ~0.598, Reddit unsup+logreg ~0.897) — the",
    "acceptance bar is: trains stably on hub-skewed graphs, beats",
    "the raw-feature baseline, all on the real TPU path.",
    "",
    "Metric: standard positives-only micro-F1 everywhere (for",
    "multilabel probes an all-negative predictor scores 0 — the dummy",
    "base-rate classifier has no floor). The reference ppi_eval's own",
    "per-column binary F1 (= cell accuracy; ppi_eval.py:26-30) is kept",
    "in the notes column as `cell-F1` for parity. SGD probe epochs are",
    "capped at 15 on proxy-reddit (modern sklearn defaults to 1000;",
    "the reference's sklearn-0.18-era n_iter default was 5) — the cap",
    "applies to probe AND baselines alike, so margins are fair.",
    "",
]

FOOTER = [
    "",
    "## Why transductive n2v outscores the inductive unsup probe here",
    "",
    "The proxies are strongly class-assortative (proxy-reddit: 76% of",
    "edges within-class vs 2.4% chance), so a transductive table that",
    "memorizes community structure (n2v trains one embedding row per",
    "node, test rows via the fixed_n2v retrain) can near-solve them,",
    "while the inductive unsup GraphSAGE probe must generalize from",
    "weak features. On the real datasets the paper shows the opposite",
    "ordering (DeepWalk 0.324 vs unsup GraphSAGE 0.897 on Reddit) --",
    "the proxy bar is 'each path trains and beats its baselines', not",
    "cross-model ordering.",
    "",
    "## maxpool/seq on proxy-ppi: trained 40 epochs (root-caused, "
    "not a bug)",
    "",
    "At 10 epochs the pooled/seq supervised runs sit at F1 ~0.08-0.12",
    "on proxy-ppi while mean reaches ~0.41 — reproduced at small scale",
    "(`benchmarks/maxpool_repro_jax.py`) and decided with a",
    "from-scratch PyTorch replica of the reference's exact semantics",
    "(`benchmarks/maxpool_repro_torch.py`: xavier init, Adam lr=0.01",
    "eps=1e-8, clip ±5, concat aggregators, l2-normed head — matching",
    "/root/reference/graphsage/aggregators.py:168-195,",
    "supervised_models.py:111-118) on the identical generator: the",
    "replica collapses identically (BCE flat ~0.64, zero sigmoid",
    "outputs >0.5 for ~6 epochs) then climbs to val F1 ≈0.41 by epoch",
    "40. On this weak-feature (snr 0.5) dense-multilabel proxy the",
    "pooled/seq models need ~4x more epochs than mean to escape the",
    "all-below-threshold regime of the sigmoid loss — a property of",
    "the data shape, not the aggregators (pinned bitwise by",
    "tests/test_golden.py). The table therefore trains them 40 epochs.",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small graphs + few steps (pipeline smoke)")
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "RESULTS.md"))
    ap.add_argument("--root", default="/tmp/graphsage_proxy_data")
    ap.add_argument("--datasets", default=None,
                    help="comma-separated subset, e.g. proxy-ppi")
    args = ap.parse_args()

    from graphsage_tpu.evaluation import evaluate_embeddings
    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train as train_sup
    from graphsage_tpu.train.unsupervised import train as train_unsup

    prefixes = gen_datasets(args.root, args.quick)
    if args.datasets:
        keep = set(args.datasets.split(","))
        prefixes = {k: v for k, v in prefixes.items() if k in keep}
    rows = []

    def flush_rows():
        """Write the table after every run so a timeout loses nothing."""
        lines = list(HEADER)
        lines.append(f"mode: {'QUICK (smoke)' if args.quick else 'full'}; "
                     f"device: {__import__('jax').devices()[0].platform}")
        lines += ["", "| dataset | run | test micro-F1 | macro-F1 | "
                  "wall(s) | notes |", "|---|---|---|---|---|---|"]
        for name, run, mic, mac, wall, note in rows:
            mac_s = "—" if mac != mac else f"{mac:.4f}"
            lines.append(f"| {name} | {run} | {mic:.4f} | {mac_s} | "
                         f"{wall:.0f} | {note} |")
        lines += FOOTER
        with open(args.out, "w") as fp:
            fp.write("\n".join(lines) + "\n")

    def sup_flags(prefix, name, **kw):
        base = dict(
            train_prefix=prefix, base_log_dir=os.path.join(args.root,
                                                           "logs", name),
            epochs=2 if args.quick else 10,
            max_total_steps=30 if args.quick else 10**9,
            batch_size=512, samples_1=25, samples_2=10,
            dim_1=128, dim_2=128, max_degree=128,
            validate_iter=5000, validate_batch_size=256,
            print_every=200, learning_rate=0.01, seed=123,
        )
        if args.quick:  # pipeline smoke: tiny model, few steps
            base.update(batch_size=64, samples_1=5, samples_2=5,
                        dim_1=16, dim_2=16, max_degree=32)
        base.update(kw)
        return TrainFlags(**base)

    for name, (prefix, spec) in prefixes.items():
        sigmoid = bool(spec["multilabel"])
        for model in ("graphsage_mean", "gcn", "graphsage_maxpool",
                      "graphsage_meanpool", "graphsage_seq"):
            t0 = time.time()
            kw = dict(model=model, sigmoid=sigmoid)
            note = ""
            if sigmoid and not args.quick:
                # pooled/seq need ~4x the reference-default 10 epochs to
                # escape the all-negative regime of the dense-multilabel
                # sigmoid loss on this proxy — reference-replica behaves
                # identically (see footer); mean gets the same budget so
                # the aggregator comparison is apples-to-apples
                kw["epochs"] = 40
                note = "40 ep (see footer)"
            flags = sup_flags(prefix, name, **kw)
            print(f"[sup] {name} {model} ...", flush=True)
            res = train_sup(flags)
            rows.append((name, f"supervised {model}",
                         res["test_f1_mic"], res["test_f1_mac"],
                         time.time() - t0, note))
            print(f"[sup] {name} {model}: test micro-F1 "
                  f"{res['test_f1_mic']:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
            flush_rows()

        # unsupervised mean + logistic probe (reference eval_scripts path)
        t0 = time.time()
        flags = sup_flags(
            prefix, name, model="graphsage_mean",
            learning_rate=2e-6 if not args.quick else 1e-5,
            epochs=1, max_total_steps=60 if args.quick else 3000,
            max_degree=32 if args.quick else 100,
            random_context=True, save_embeddings=True,
        )
        print(f"[unsup] {name} ...", flush=True)
        res = train_unsup(flags)
        # SGD epoch cap: probe AND baselines use the same setting so the
        # acceptance margin is an apples-to-apples comparison
        cap = 15 if name == "proxy-reddit" else None

        def probe_rows(run_name, scores, wall):
            mic = scores.get("test_f1_pos", scores["test_f1"])
            note = (f"cell-F1 {scores['test_f1']:.4f}"
                    if "test_f1_pos" in scores else "")
            rows.append((name, run_name, mic, float("nan"), wall, note))
            return mic

        scores = evaluate_embeddings(prefix, res["log_dir"], "test",
                                     seed=1, sgd_max_iter=cap)
        p = probe_rows("unsupervised mean + logreg", scores,
                       time.time() - t0)
        t1 = time.time()
        feat_scores = evaluate_embeddings(prefix, "feat", "test", seed=1,
                                          sgd_max_iter=cap)
        f = probe_rows("raw features + logreg (baseline)", feat_scores,
                       time.time() - t1)
        d_mic = scores.get("dummy_f1_pos", scores["dummy_f1"])
        d_note = (f"cell-F1 {scores['dummy_f1']:.4f}"
                  if "dummy_f1_pos" in scores else "")
        rows.append((name, "random dummy + logreg (baseline)",
                     d_mic, float("nan"), 0.0, d_note))
        print(f"[unsup] {name}: probe micro-F1 {p:.4f} "
              f"(feat baseline {f:.4f}, dummy {d_mic:.4f})", flush=True)
        flush_rows()

        # n2v (DeepWalk) + logistic probe — transductive embedding
        # baseline over the same walks (reference n2v path)
        t0 = time.time()
        # SGD-skipgram scaling (root-caused on hardware): the loss is
        # summed xent / batch_size into plain SGD (models.py:442,
        # 478-487), so per-visit row movement is ~lr*||ctx||/batch and a
        # node needs ~10 units of total movement to leave its
        # uniform(-1,1) init. That demands lr O(1) — the TF word2vec
        # tutorial's own SGD scale — and enough epochs for ~1-2k visits
        # per node. Test nodes train ONLY in the fixed_n2v retrain
        # (train-subgraph walks never visit them), so n2v_test_epochs
        # must be ~10 (one retrain epoch = ~150 visits/test node). At
        # the old lr 0.01 / 1 retrain epoch the target table provably
        # stayed at init (probe == dummy; movement 8e-4).
        n2v_flags = sup_flags(
            prefix, name, model="n2v",
            learning_rate=2.0, dim_1=25,  # nodevec_dim 50 (models.py:409)
            epochs=40,
            max_total_steps=100 if args.quick else 300_000,
            random_context=True, save_embeddings=True,
            n2v_test_epochs=2 if args.quick else 10,
        )
        print(f"[n2v] {name} ...", flush=True)
        n2v_res = train_unsup(n2v_flags)
        n2v_scores = evaluate_embeddings(prefix, n2v_res["log_dir"],
                                         "test", seed=1, sgd_max_iter=cap)
        pn = probe_rows("n2v + logreg", n2v_scores, time.time() - t0)
        print(f"[n2v] {name}: probe micro-F1 {pn:.4f}", flush=True)
        flush_rows()

    flush_rows()
    with open(args.out) as fp:
        print(fp.read())


if __name__ == "__main__":
    main()
