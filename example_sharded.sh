#!/bin/bash
# Scale-out smoke run: the same supervised contract over an 8-device
# ("graph",) mesh — P2 row-sharded tables + all-to-all halo exchange
# (parallel/graph_sharded.py). On a real pod slice, drop the two env
# vars (the mesh picks up the actual chips); here 8 virtual CPU
# devices demonstrate the full sharded path anywhere.
#
# Flags shown: --graph_shards (row-shard feat/adj/identity tables),
# --shard_layout strided (degree-balancing row ownership, the default),
# --capacity_factor 0 (auto-size the exchange budget from the
# adjacency's shard-ownership skew), --defer_features (mmap the feature
# table; each host materializes only its own rows).
# Pure data parallelism instead: swap --graph_shards for --data_shards.
# Composed P1xP2 (DP across slices x graph sharding within a slice):
# pass BOTH, e.g. --data_shards 2 --graph_shards 4 -> a 2-D
# (data, graph) mesh over 8 devices (second invocation below).
set -e
[ -f example_data/toy-ppi-G.json ] || python examples/make_example_data.py
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -m graphsage_tpu.cli supervised --train_prefix ./example_data/toy-ppi \
    --model graphsage_mean --sigmoid --epochs 2 --batch_size 64 \
    --graph_shards 8 --shard_layout strided --capacity_factor 0 \
    --identity_dim 16 --defer_features \
    --validate_iter 10 --print_every 5 --base_log_dir /tmp/graphsage_logs

JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -m graphsage_tpu.cli supervised --train_prefix ./example_data/toy-ppi \
    --model graphsage_mean --sigmoid --epochs 2 --batch_size 64 \
    --data_shards 2 --graph_shards 4 --capacity_factor 0 \
    --validate_iter 10 --print_every 5 --base_log_dir /tmp/graphsage_logs
