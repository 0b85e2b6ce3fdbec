#!/bin/bash
# Supervised smoke run (reference example_supervised.sh:1).
set -e
[ -f example_data/toy-ppi-G.json ] || python examples/make_example_data.py
python -m graphsage_tpu.cli supervised --train_prefix ./example_data/toy-ppi \
    --model graphsage_mean --sigmoid --epochs 2 --batch_size 64 \
    --validate_iter 10 --print_every 5 --base_log_dir /tmp/graphsage_logs
