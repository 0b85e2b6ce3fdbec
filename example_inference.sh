#!/bin/bash
# Serving smoke run: train with a checkpoint, then apply it standalone
# (no reference equivalent — the reference can only produce predictions
# or embeddings from inside a training session).
set -e
[ -f example_data/toy-ppi-G.json ] || python examples/make_example_data.py

CKPT=/tmp/graphsage_logs/ckpt-example
python -m graphsage_tpu.cli supervised --train_prefix ./example_data/toy-ppi \
    --model graphsage_mean --sigmoid --epochs 2 --batch_size 64 \
    --validate_iter 10 --print_every 5 --base_log_dir /tmp/graphsage_logs \
    --checkpoint_dir "$CKPT"

# checkpoint -> class predictions for the test nodes (any dataset with the
# same feature/label spaces works here, including graphs never trained on)
python -m graphsage_tpu.cli predict --train_prefix ./example_data/toy-ppi \
    --checkpoint_dir "$CKPT" --model graphsage_mean --sigmoid --batch_size 64 \
    --nodes test --out_dir /tmp/graphsage_logs/preds
ls /tmp/graphsage_logs/preds
