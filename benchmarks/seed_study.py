"""Framework-side seed-variance study for the escape-dominated rows.

REFERENCE_PARITY.md's meanpool/seq proxy-ppi rows carry +-0.03-0.05 of
init/shuffle noise (the weak-feature dense-multilabel sigmoid proxy is
dominated by when the model escapes the all-below-threshold regime —
RESULTS.md footer). Round-4's defense used 2 reference seeds vs 3-4
framework seeds; this driver produces the n>=5-per-side framework half
with an EXACT seed list (VERDICT round-4 items 3 and 8). Protocol is
identical to benchmarks/accuracy_acceptance.py full mode: proxy-ppi
generator seed 11, batch 512, fanout 25/10, dims 128/128, max_degree
128, Adam lr 0.01, sigmoid loss, 40 epochs.

Usage: timeout 5400 python benchmarks/seed_study.py \
           [--models graphsage_meanpool,graphsage_seq] [--seeds 123-127]

Appends one JSON line per run to benchmarks/SEED_STUDY.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
for p in (REPO, HERE):
    if p not in sys.path:
        sys.path.insert(0, p)

OUT_PATH = os.path.join(HERE, "SEED_STUDY.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models",
                    default="graphsage_meanpool,graphsage_seq")
    ap.add_argument("--seeds", default="123-127",
                    help="inclusive range a-b or comma list")
    ap.add_argument("--root", default="/tmp/graphsage_proxy_data")
    args = ap.parse_args()

    if "-" in args.seeds:
        a, b = args.seeds.split("-")
        seeds = list(range(int(a), int(b) + 1))
    else:
        seeds = [int(s) for s in args.seeds.split(",")]

    from accuracy_acceptance import gen_datasets

    from graphsage_tpu.train.config import TrainFlags
    from graphsage_tpu.train.supervised import train as train_sup

    prefixes = gen_datasets(args.root, quick=False)
    prefix, _spec = prefixes["proxy-ppi"]

    for model in args.models.split(","):
        for seed in seeds:
            flags = TrainFlags(
                train_prefix=prefix,
                base_log_dir=os.path.join(args.root, "logs",
                                          f"seedstudy-{model}-{seed}"),
                model=model, sigmoid=True, epochs=40,
                batch_size=512, samples_1=25, samples_2=10,
                dim_1=128, dim_2=128, max_degree=128,
                validate_iter=5000, validate_batch_size=256,
                print_every=200, learning_rate=0.01, seed=seed,
            )
            t0 = time.time()
            res = train_sup(flags)
            row = {
                "dataset": "proxy-ppi", "model": model, "seed": seed,
                "test_f1_mic": round(float(res["test_f1_mic"]), 4),
                "test_f1_mac": round(float(res["test_f1_mac"]), 4),
                "wall_s": round(time.time() - t0, 1),
                "epochs": 40,
                "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
            }
            print(json.dumps(row), flush=True)
            with open(OUT_PATH, "a") as fp:
                fp.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
