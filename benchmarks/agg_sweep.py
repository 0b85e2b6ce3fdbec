"""Chunked-mode training throughput per aggregator, on real hardware.

Closes the round-4 evidence gap: every committed hardware number was
mean-family, yet the reference treats pool and LSTM as first-class (its
best Reddit accuracy is the LSTM aggregator — paper Table 1;
/root/reference/graphsage/aggregators.py:119-273, 363-449), and the
round-3 chunked-mode A/B showed XLA-gather variants can collapse ~2x in
the trainers' actual chunked execution mode (benchmarks/KERNEL_NOTES.md
"Chunked-mode A/B"). This sweep times the SAME device-resident chunked
fori_loop the trainers use (parallel/dp.py chunk runners), at the
headline bench shape, for any subset of configs.

Usage (run configs a few per invocation — each distinct executable
costs a 60-100s remote compile on first run; results append to
benchmarks/AGG_SWEEP.jsonl):

    python benchmarks/agg_sweep.py mean maxpool
    python benchmarks/agg_sweep.py meanpool seq
    python benchmarks/agg_sweep.py maxpool_big seq_big
    python benchmarks/agg_sweep.py mean_uniform unsup_mean

Each line: {"config": ..., "sec_per_step": ..., "edges_per_sec": ...,
"ms_per_step": ..., "trials": 3, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

NUM_NODES = 100_000
FEAT_DIM = 602
NUM_CLASSES = 41
MAX_DEGREE = 128
BATCH = 512
FANOUTS = (25, 10)
DIMS = (128, 128)
ITERS = 100          # steps per chunk
WARMUP_CHUNKS = 2
TRIALS = 3
OUT_PATH = os.path.join(HERE, "AGG_SWEEP.jsonl")

# (aggregator, model_size, fused, dist, identity_dim, unsup[, dropout])
# dist may carry a ":bf16" suffix to build the feature table in bfloat16
CONFIGS = {
    "mean":         ("mean",     "small", True,  "zipf",    0, False),
    "mean_nofused": ("mean",     "small", False, "zipf",    0, False),
    "gcn":          ("gcn",      "small", True,  "zipf",    0, False),
    "maxpool":      ("maxpool",  "small", False, "zipf",    0, False),
    "meanpool":     ("meanpool", "small", False, "zipf",    0, False),
    "maxpool_fused":  ("maxpool",  "small", True, "zipf",   0, False),
    "meanpool_fused": ("meanpool", "small", True, "zipf",   0, False),
    "maxpool_big_fused": ("maxpool", "big", True, "zipf",   0, False),
    "meanpool_big_fused": ("meanpool", "big", True, "zipf", 0, False),
    "seq":          ("seq",      "small", False, "zipf",    0, False),
    "seq_fused":    ("seq",      "small", True,  "zipf",    0, False),
    "seq_big_fused": ("seq",     "big",   True,  "zipf",    0, False),
    "maxpool_big":  ("maxpool",  "big",   False, "zipf",    0, False),
    "meanpool_big": ("meanpool", "big",   False, "zipf",    0, False),
    "seq_big":      ("seq",      "big",   False, "zipf",    0, False),
    "mean_uniform": ("mean",     "small", True,  "uniform", 0, False),
    # zipf degree skew with hub ids value-scattered over the id space —
    # the layout a real dataset's arbitrary id_map produces, i.e. what
    # --degree_relabel turns back into plain "zipf"
    "mean_zipf_scattered": ("mean", "small", True, "zipf_scattered",
                            0, False),
    "identity64":   ("mean",     "small", True,  "zipf",   64, False),
    "unsup_mean":   ("mean",     "small", True,  "zipf",    0, True),
    # round-5 in-kernel dropout A/B: trailing element = dropout rate
    # (training steps run deterministic=False in the chunk runners, so
    # the rate engages the reference's pre-reduce element dropout —
    # in-kernel Mosaic PRNG when fused, jax.random masks otherwise)
    "mean_drop":           ("mean", "small", True,  "zipf", 0, False, 0.5),
    "mean_nofused_drop":   ("mean", "small", False, "zipf", 0, False, 0.5),
    "meanpool_fused_drop": ("meanpool", "small", True, "zipf", 0, False,
                            0.5),
    "meanpool_drop":       ("meanpool", "small", False, "zipf", 0, False,
                            0.5),
    # bf16 feature table (--feature_dtype bfloat16): halves the [B*S, F]
    # take materialization bandwidth that floors the unfused/pooled paths
    "maxpool_bf16":      ("maxpool", "small", False, "zipf:bf16", 0, False),
    "seq_bf16":          ("seq",     "small", False, "zipf:bf16", 0, False),
    "mean_nofused_bf16": ("mean",    "small", False, "zipf:bf16", 0, False),
    # (the Pallas kernels gate to 4-byte dtypes -- KERNEL_NOTES round-2
    # fact: bf16 halves XLA's bandwidth but not the kernel's DMA-issue
    # count -- so bf16 rows always ride the XLA paths)
    "meanpool_bf16":     ("meanpool", "small", False, "zipf:bf16", 0,
                          False),
}


def zipf_adjacency(rng, alpha: float = 1.05):
    ranks = np.arange(1, NUM_NODES + 1, dtype=np.float64)
    p = ranks ** -alpha
    p /= p.sum()
    flat = rng.choice(NUM_NODES, size=(NUM_NODES + 1) * MAX_DEGREE, p=p)
    return flat.reshape(NUM_NODES + 1, MAX_DEGREE).astype(np.int32)


def build_graph(dist: str):
    from graphsage_tpu.ops.gather import pad_feature_dim

    dist, _, tag = dist.partition(":")
    dtype = jnp.bfloat16 if tag == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    features = jnp.asarray(pad_feature_dim(
        np.vstack([
            rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
            np.zeros((1, FEAT_DIM), dtype=np.float32),
        ]), dtype,
    )).astype(dtype)
    if dist == "zipf":
        adj = jnp.asarray(zipf_adjacency(rng))
    elif dist == "zipf_scattered":
        raw = zipf_adjacency(rng)
        scatter = rng.permutation(NUM_NODES).astype(np.int32)
        adj = jnp.asarray(scatter[raw])
    else:
        adj = jnp.asarray(rng.integers(
            0, NUM_NODES, (NUM_NODES + 1, MAX_DEGREE), dtype=np.int32
        ))
    return features, adj


def make_sage(agg, model_size, fused, identity_dim, dropout=0.0):
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig

    return SAGEConfig(
        layers=(LayerInfo(FANOUTS[0], DIMS[0]),
                LayerInfo(FANOUTS[1], DIMS[1])),
        feature_dim=FEAT_DIM,
        aggregator=agg,
        concat=agg != "gcn",
        model_size=model_size,
        identity_dim=identity_dim,
        num_nodes=NUM_NODES,
        fused_gather=fused,
        dropout=dropout,
    )


def time_chunks(run_chunk, fetch_loss):
    """WARMUP_CHUNKS warmup chunks then best-of-TRIALS timed chunks;
    completion barrier is a device->host fetch (block_until_ready
    returns early on the tunneled runtime — CLAUDE.md hazard)."""
    for _ in range(WARMUP_CHUNKS):
        state = run_chunk()
    fetch_loss(state)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        state = run_chunk()
        fetch_loss(state)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def run_supervised(name, agg, model_size, fused, dist, identity_dim,
                   dropout=0.0):
    import optax  # noqa: F401  (optimizer dep of the runners)

    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.parallel.dp import make_supervised_chunk_runner

    sage = make_sage(agg, model_size, fused, identity_dim, dropout)
    sup = SupervisedConfig(sage=sage, num_classes=NUM_CLASSES,
                           sigmoid_loss=False, weight_decay=0.0)
    features, adj = build_graph(dist)
    rng_np = np.random.default_rng(3)
    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(1e-2)
    opt_state = optimizer.init(params)
    runner = jax.jit(
        make_supervised_chunk_runner(sup, optimizer, BATCH),
        donate_argnums=(0, 1),
    )
    labels_table = np.zeros((NUM_NODES + 1, NUM_CLASSES), np.float32)
    labels_table[np.arange(NUM_NODES),
                 rng_np.integers(0, NUM_CLASSES, NUM_NODES)] = 1.0
    labels_dev = jnp.asarray(labels_table)
    n_total = (WARMUP_CHUNKS + TRIALS) * ITERS
    ids_perm = jnp.asarray(rng_np.integers(
        0, NUM_NODES, (n_total * BATCH,), dtype=np.int32))
    key = jax.random.key(11)
    state = {"params": params, "opt": opt_state, "start": 0, "loss": None}

    def run_chunk():
        state["params"], state["opt"], state["loss"], *_ = runner(
            state["params"], state["opt"], key, features, adj, ids_perm,
            labels_dev, state["start"], ITERS,
        )
        state["start"] += ITERS
        return state

    def fetch(state):
        assert np.isfinite(float(state["loss"]))

    sec = time_chunks(run_chunk, fetch)
    edges = BATCH * (FANOUTS[1] + FANOUTS[1] * FANOUTS[0])
    return sec, edges


def run_unsupervised(name, agg, model_size, fused, dist, identity_dim,
                     dropout=0.0):
    from graphsage_tpu.models.supervised import make_optimizer
    from graphsage_tpu.models.unsupervised import (
        UnsupervisedConfig,
        init_unsupervised_params,
    )
    from graphsage_tpu.nn.negative import unigram_cdf
    from graphsage_tpu.parallel.dp import make_unsupervised_chunk_runner

    NEG = 20
    sage = make_sage(agg, model_size, fused, identity_dim, dropout)
    uconf = UnsupervisedConfig(sage=sage, neg_sample_size=NEG)
    features, adj = build_graph(dist)
    rng_np = np.random.default_rng(5)
    params = init_unsupervised_params(jax.random.key(0), uconf)
    optimizer = make_optimizer(1e-5)
    opt_state = optimizer.init(params)
    runner = jax.jit(
        make_unsupervised_chunk_runner(uconf, optimizer, BATCH, NUM_NODES),
        donate_argnums=(0, 1),
    )
    degrees = np.full((NUM_NODES + 1,), float(MAX_DEGREE), np.float32)
    cdf = jnp.asarray(np.asarray(unigram_cdf(degrees)))
    n_total = (WARMUP_CHUNKS + TRIALS) * ITERS
    pairs = jnp.asarray(rng_np.integers(
        0, NUM_NODES, (n_total * BATCH, 2), dtype=np.int32))
    key = jax.random.key(13)
    state = {"params": params, "opt": opt_state,
             "shadow": jnp.asarray(-1.0), "start": 0, "loss": None}

    def run_chunk():
        (state["params"], state["opt"], state["shadow"], state["loss"],
         _) = runner(
            state["params"], state["opt"], state["shadow"], key, features,
            adj, pairs, cdf, state["start"], ITERS,
        )
        state["start"] += ITERS
        return state

    def fetch(state):
        assert np.isfinite(float(state["loss"]))

    sec = time_chunks(run_chunk, fetch)
    # sampled edges per step across the three towers (b1 + b2 + negs
    # roots, each expanded S2 + S2*S1)
    edges = (2 * BATCH + NEG) * (FANOUTS[1] + FANOUTS[1] * FANOUTS[0])
    return sec, edges


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: agg_sweep.py <config> [config ...]; configs:",
              ", ".join(CONFIGS), file=sys.stderr)
        return 2

    from benchmarks.tpu_probe import guarded_probe

    probe = guarded_probe(150.0)
    if probe["status"] != "ok":
        print(json.dumps({"error": f"preflight: {probe}"}))
        return 3

    for name in names:
        agg, size, fused, dist, id_dim, unsup, *extra = CONFIGS[name]
        drop = extra[0] if extra else 0.0
        fn = run_unsupervised if unsup else run_supervised
        t0 = time.perf_counter()
        sec, edges = fn(name, agg, size, fused, dist, id_dim, drop)
        row = {
            "config": name,
            "aggregator": agg,
            "model_size": size,
            "fused_gather": fused,
            "dist": dist,
            "identity_dim": id_dim,
            "unsupervised": unsup,
            "dropout": drop,
            "ms_per_step": round(sec * 1e3, 4),
            "edges_per_step": edges,
            "edges_per_sec": round(edges / sec, 1),
            "iters_per_chunk": ITERS,
            "trials": TRIALS,
            "wall_s": round(time.perf_counter() - t0, 1),
            "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
        }
        print(json.dumps(row), flush=True)
        with open(OUT_PATH, "a") as fp:
            fp.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
