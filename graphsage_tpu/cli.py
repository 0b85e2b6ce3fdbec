"""Command-line interface.

``graphsage supervised|unsupervised|walks ...`` reproduces the reference
entry points (python -m graphsage.supervised_train /
graphsage.unsupervised_train / graphsage.utils) with the same flag names
and defaults (supervised_train.py:28-57, unsupervised_train.py:25-55,
utils.py:94-104), as one typed argparse surface.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from graphsage_tpu.train.config import (
    SUPERVISED_MODELS,
    TrainFlags,
    UNSUPERVISED_MODELS,
)


def _add_common(p: argparse.ArgumentParser, defaults: TrainFlags):
    d = defaults
    p.add_argument("--train_prefix", required=True,
                   help="prefix identifying training data")
    p.add_argument("--learning_rate", type=float, default=d.learning_rate)
    p.add_argument("--model_size", choices=("small", "big"),
                   default=d.model_size)
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--weight_decay", type=float, default=d.weight_decay)
    p.add_argument("--max_degree", type=int, default=d.max_degree)
    p.add_argument("--samples_1", type=int, default=d.samples_1)
    p.add_argument("--samples_2", type=int, default=d.samples_2)
    p.add_argument("--dim_1", type=int, default=d.dim_1)
    p.add_argument("--dim_2", type=int, default=d.dim_2)
    p.add_argument("--random_context", action=argparse.BooleanOptionalAction,
                   default=d.random_context)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--identity_dim", type=int, default=d.identity_dim)
    p.add_argument("--base_log_dir", default=d.base_log_dir)
    p.add_argument("--validate_iter", type=int, default=d.validate_iter)
    p.add_argument("--validate_batch_size", type=int,
                   default=d.validate_batch_size)
    p.add_argument("--print_every", type=int, default=d.print_every)
    p.add_argument("--max_total_steps", type=int, default=d.max_total_steps)
    # accepted for drop-in compatibility with the reference CLI; no-ops
    # on TPU (reference: --gpu pins CUDA_VISIBLE_DEVICES,
    # supervised_train.py:55-59; --log_device_placement is a TF1 knob)
    p.add_argument("--gpu", type=int, default=1, help=argparse.SUPPRESS)
    p.add_argument("--log_device_placement", action="store_true",
                   help=argparse.SUPPRESS)
    # TPU-native additions
    p.add_argument("--sampler_mode",
                   choices=("independent", "shared_perm", "first_k"),
                   default=d.sampler_mode,
                   help="neighbor sampling: per-node draws (default), "
                        "the reference's shared-permutation quirk, or "
                        "deterministic first-k (parity tests)")
    p.add_argument("--fused_gather", action=argparse.BooleanOptionalAction,
                   default=d.fused_gather,
                   help="Pallas fused gather+mean for the innermost hop")
    p.add_argument("--dedup_gather", action=argparse.BooleanOptionalAction,
                   default=d.dedup_gather,
                   help="skip duplicate-sample DMAs in the fused gather "
                        "(wins on low-degree/power-law graphs)")
    p.add_argument("--rows_gather", action=argparse.BooleanOptionalAction,
                   default=d.rows_gather,
                   help="direct row-DMA kernel for the pooled/seq "
                        "aggregators' innermost-hop row gather "
                        "(measured at XLA-take parity on v5e; opt-in)")
    p.add_argument("--feature_dtype", choices=("float32", "bfloat16"),
                   default=d.feature_dtype,
                   help="on-device feature table dtype (bfloat16 halves "
                        "gather bandwidth)")
    p.add_argument("--graph_shards", type=int, default=d.graph_shards,
                   help="row-shard feature/adjacency tables across N "
                        "devices with all-to-all halo exchange (supervised)")
    p.add_argument("--data_shards", type=int, default=d.data_shards,
                   help="pure data parallelism: replicate tables, split "
                        "the batch over N devices, psum grads; combined "
                        "with --graph_shards G it composes into a 2-D "
                        "(data, graph) mesh — graph sharding within each "
                        "G-device slice (ICI), DP across the N slices "
                        "(DCN-friendly), N*G devices total")
    p.add_argument("--n_model_shards", type=int, default=d.n_model_shards,
                   help="feature-dim tensor parallelism over a "
                        "('data','model') mesh (supervised; composes "
                        "with --data_shards)")
    p.add_argument("--capacity_factor", type=float,
                   default=d.capacity_factor,
                   help="--graph_shards per-destination all-to-all request "
                        "budget as a multiple of the balanced share; 0 "
                        "auto-sizes from the adjacency's shard-ownership "
                        "skew (overflowed requests are counted and warned)")
    p.add_argument("--shard_layout", choices=("strided", "block"),
                   default=d.shard_layout,
                   help="--graph_shards row-ownership map: 'strided' "
                        "(id %% n_shards) spreads degree-sorted hubs "
                        "evenly so the exchange capacity sizes to the "
                        "balanced share; 'block' keeps contiguous row "
                        "ranges")
    p.add_argument("--defer_features", action=argparse.BooleanOptionalAction,
                   default=d.defer_features,
                   help="don't load the feature table up front: mmap it "
                        "and materialize only this host's --graph_shards "
                        "row range (tables larger than one host's RAM)")
    p.add_argument("--degree_relabel", action=argparse.BooleanOptionalAction,
                   default=d.degree_relabel,
                   help="re-order internal node ids by descending degree "
                        "at ingest so hub rows are dense/low (gather "
                        "locality); original node ids round-trip in all "
                        "exports, walks, and eval outputs")
    p.add_argument("--seed", type=int, default=d.seed)
    # multi-host (P3): one process per host joins the cluster before any
    # device op; auto-detected on TPU pods, explicit for CPU/GPU clusters
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (multi-host training; "
                        "auto-detected on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="number of processes in the multi-host cluster")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank in the multi-host cluster")
    p.add_argument("--checkpoint_dir", default=d.checkpoint_dir)
    p.add_argument("--checkpoint_every", type=int, default=d.checkpoint_every)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile_dir", default=d.profile_dir)
    p.add_argument("--log_histograms", action="store_true",
                   help="param histograms to TensorBoard at print steps "
                        "(reference layers.py logging=True analogue)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="graphsage")
    sub = parser.add_subparsers(dest="command", required=True)

    sup_defaults = TrainFlags()
    p_sup = sub.add_parser("supervised", help="supervised node classification")
    p_sup.add_argument("--model", choices=SUPERVISED_MODELS,
                       default="graphsage_mean")
    p_sup.add_argument("--samples_3", type=int, default=0)
    p_sup.add_argument("--sigmoid", action="store_true",
                       help="use sigmoid (multilabel) loss")
    _add_common(p_sup, sup_defaults)

    unsup_defaults = TrainFlags(
        learning_rate=0.00001, epochs=1, max_degree=100, print_every=50
    )
    p_unsup = sub.add_parser("unsupervised",
                             help="unsupervised embedding training")
    p_unsup.add_argument("--model", choices=UNSUPERVISED_MODELS,
                         default="graphsage_mean")
    p_unsup.add_argument("--neg_sample_size", type=int, default=20)
    p_unsup.add_argument("--n2v_test_epochs", type=int, default=1)
    p_unsup.add_argument(
        "--save_embeddings", action=argparse.BooleanOptionalAction,
        default=True)
    _add_common(p_unsup, unsup_defaults)

    p_embed = sub.add_parser(
        "embed", help="checkpoint -> embeddings for any dataset "
        "(inductive serving; no reference equivalent)")
    p_embed.add_argument("--model", choices=SUPERVISED_MODELS,
                         default="graphsage_mean")
    p_embed.add_argument("--neg_sample_size", type=int, default=20)
    p_embed.add_argument("--out_dir", default=None,
                         help="output dir (default: the reference "
                              "log-dir layout)")
    _add_common(p_embed, unsup_defaults)

    p_pred = sub.add_parser(
        "predict", help="checkpoint -> class predictions for any dataset "
        "(inductive serving; no reference equivalent)")
    p_pred.add_argument("--model", choices=SUPERVISED_MODELS,
                        default="graphsage_mean")
    p_pred.add_argument("--samples_3", type=int, default=0)
    p_pred.add_argument("--sigmoid", action="store_true")
    p_pred.add_argument("--nodes", choices=("test", "val", "train", "all"),
                        default="test")
    p_pred.add_argument("--num_classes", type=int, default=0,
                        help="required when the dataset has no class_map")
    p_pred.add_argument("--out_dir", default=None)
    _add_common(p_pred, sup_defaults)

    p_eval = sub.add_parser(
        "eval", help="logistic-regression eval of saved embeddings "
        "(reference eval_scripts/)")
    p_eval.add_argument("train_prefix", help="dataset prefix")
    p_eval.add_argument("embed_dir",
                        help="directory with val.npy/val.txt, or 'feat'")
    p_eval.add_argument("setting", choices=("val", "test"))
    p_eval.add_argument("--seed", type=int, default=1)
    p_eval.add_argument(
        "--sgd_max_iter", type=int, default=None,
        help="cap the SGD logistic-regression epochs (modern sklearn "
             "defaults to 1000 — prohibitive at Reddit scale; the "
             "reference's sklearn-0.18-era n_iter default was 5)")
    p_eval.add_argument(
        "--label_tsvs", default=None,
        help="comma-separated per-class TSV label files (the reference "
             "citation eval's scheme)")

    p_walks = sub.add_parser("walks", help="generate random-walk pairs "
                             "(reference utils.py:94-104)")
    p_walks.add_argument("graph_file", help="<prefix>-G.json path")
    p_walks.add_argument("out_file")
    p_walks.add_argument("--num_walks", type=int, default=50)
    p_walks.add_argument("--walk_len", type=int, default=5)
    p_walks.add_argument("--seed", type=int, default=123)
    return parser


def _flags_from_args(args, defaults: TrainFlags) -> TrainFlags:
    field_names = {f.name for f in dataclasses.fields(TrainFlags)}
    vals = {k: v for k, v in vars(args).items() if k in field_names}
    return dataclasses.replace(defaults, **vals)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    # (the persistent XLA compile cache is enabled by graphsage_tpu.train's
    # package import — see train/__init__.py)
    if getattr(args, "coordinator_address", None) or (
        getattr(args, "num_processes", None) or 0
    ) > 1:
        from graphsage_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    if args.command == "supervised":
        from graphsage_tpu.train.supervised import train

        train(_flags_from_args(args, TrainFlags()))
    elif args.command == "unsupervised":
        from graphsage_tpu.train.unsupervised import train

        train(_flags_from_args(
            args,
            TrainFlags(learning_rate=0.00001, epochs=1, max_degree=100,
                       print_every=50),
        ))
    elif args.command == "embed":
        from graphsage_tpu.infer import export_embeddings

        export_embeddings(
            _flags_from_args(
                args,
                TrainFlags(learning_rate=0.00001, epochs=1, max_degree=100,
                           print_every=50),
            ),
            out_dir=args.out_dir,
        )
    elif args.command == "predict":
        from graphsage_tpu.infer import predict

        predict(
            _flags_from_args(args, TrainFlags()),
            out_dir=args.out_dir,
            nodes=args.nodes,
            num_classes=args.num_classes,
        )
    elif args.command == "eval":
        from graphsage_tpu.evaluation import evaluate_embeddings

        evaluate_embeddings(
            args.train_prefix, args.embed_dir, args.setting,
            seed=args.seed,
            sgd_max_iter=args.sgd_max_iter,
            label_tsvs=(
                args.label_tsvs.split(",") if args.label_tsvs else None
            ),
        )
    elif args.command == "walks":
        import numpy as np

        from graphsage_tpu.data.io import load_data
        from graphsage_tpu.data.walks import run_random_walks, write_walks

        prefix = args.graph_file[: -len("-G.json")]
        graph = load_data(prefix, normalize=False)
        # reference: walks run on the train-node subgraph (utils.py:97-103)
        is_train = graph.is_train
        nodes = np.flatnonzero(is_train)
        sub_neighbors = [
            nbrs[is_train[nbrs]] if is_train[i] else nbrs[:0]
            for i, nbrs in enumerate(graph.neighbors)
        ]
        pairs = run_random_walks(
            sub_neighbors, nodes, num_walks=args.num_walks,
            walk_len=args.walk_len, rng=np.random.default_rng(args.seed),
        )
        write_walks(args.out_file, pairs, graph.node_ids)
    return 0


if __name__ == "__main__":
    sys.exit(main())
