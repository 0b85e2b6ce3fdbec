#!/bin/bash
# Unsupervised smoke run (reference example_unsupervised.sh:1).
set -e
[ -f example_data/toy-ppi-G.json ] || python examples/make_example_data.py
python -m graphsage_tpu.cli unsupervised --train_prefix ./example_data/toy-ppi \
    --model graphsage_mean --max_total_steps 1000 --validate_iter 10 \
    --batch_size 64 --print_every 20 --base_log_dir /tmp/graphsage_logs
