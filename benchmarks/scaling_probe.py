"""Multi-chip scaling probe for the P2 graph-sharded train step.

Runs the bench.py workload (100k-node zipf(1.05) graph, Reddit perf
contract: batch 512, fanout 25/10, dims 128/128, 602-dim features)
through make_sharded_supervised_chunk_runner over ("graph",) meshes of
increasing size and reports edges/s plus scaling efficiency vs the
smallest mesh. This is THE artifact for BASELINE.json's >=80% 1->8-chip
target — run it on a real TPU slice when one is available:

    python benchmarks/scaling_probe.py              # all powers of 2
    python benchmarks/scaling_probe.py --devices 1,4,8
    python benchmarks/scaling_probe.py --devices 4 --data_shards=2
                       # composed P1xP2: (2, 4) (data, graph) mesh

Without multi-chip hardware it falls back to the 8-virtual-device CPU
mesh (--cpu forces this): those numbers check the SPMD program end to
end but say nothing about ICI — collectives are memcpys and every
"chip" shares one host's cores, so efficiency there is NOT the target
metric (expect super/sub-linear noise). The JSON lines are labeled with
the platform so the two regimes can't be confused.

Timing: one jit dispatch runs CHUNK steps (fori_loop inside shard_map);
the barrier is a device->host fetch of the last loss (CLAUDE.md:
block_until_ready returns early under the axon tunnel).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import os

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import (  # noqa: E402  (the single-chip bench's workload)
    BATCH,
    FANOUTS,
    DIMS,
    FEAT_DIM,
    NUM_CLASSES,
    NUM_NODES,
    zipf_adjacency,
)

WARMUP_CHUNKS = 2
CHUNK = 20
TIMED_CHUNKS = 3
EDGES_PER_STEP = BATCH * (FANOUTS[1] + FANOUTS[1] * FANOUTS[0])


def parse_devices(avail: int) -> list[int]:
    for a in sys.argv:
        if a.startswith("--devices="):
            return [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--devices"):
            i = sys.argv.index(a)
            return [int(x) for x in sys.argv[i + 1].split(",")]
    out, d = [], 1
    while d <= avail:
        out.append(d)
        d *= 2
    return out


def run_at(D: int, data_shards: int = 1) -> float:
    """Edges/s of the sharded supervised chunk runner on a D-chip
    ("graph",) mesh — or, with ``data_shards`` M > 1, the composed P1xP2
    runner on an (M, D) ("data", "graph") mesh (M*D chips)."""
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.parallel.distributed import put_global
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_chunk_runner,
        shard_rows,
        suggest_capacity_factor,
    )

    from graphsage_tpu.ops.gather import pad_feature_dim

    sage = SAGEConfig(
        layers=(LayerInfo(FANOUTS[0], DIMS[0]),
                LayerInfo(FANOUTS[1], DIMS[1])),
        feature_dim=FEAT_DIM,
        aggregator="mean",
        num_nodes=NUM_NODES,
        # engages the fused inner-hop gather: the whole mean at D=1,
        # the split local-mean + remote-only exchange at D>1
        # (graph_sharded.py fuse_inner)
        fused_gather=True,
    )
    sup = SupervisedConfig(sage=sage, num_classes=NUM_CLASSES,
                           sigmoid_loss=False, weight_decay=0.0)

    rng = np.random.default_rng(0)
    feats = np.vstack([
        rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
        np.zeros((1, FEAT_DIM), np.float32),
    ])
    # lane-align for the fused inner-hop kernel (whole mean at D=1,
    # split-local fraction at D>1); costs +6% outer-hop all-to-all
    # payload (602->640) in exchange for fusing the dominant gather
    feats = pad_feature_dim(feats)
    adj = np.asarray(zipf_adjacency(rng))
    labels_table = np.zeros((NUM_NODES + 1, NUM_CLASSES), np.float32)
    labels_table[np.arange(NUM_NODES),
                 rng.integers(0, NUM_CLASSES, NUM_NODES)] = 1.0

    if data_shards > 1:
        mesh = Mesh(
            np.asarray(jax.devices()[:data_shards * D])
            .reshape(data_shards, D),
            ("data", "graph"),
        )
    else:
        mesh = Mesh(np.asarray(jax.devices()[:D]), ("graph",))
    cap = suggest_capacity_factor(adj, D)
    feat_sh = put_global(shard_rows(feats, D)[0], mesh, P("graph"))
    adj_sh = put_global(shard_rows(adj, D)[0], mesh, P("graph"))

    params = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(1e-2)
    opt_state = optimizer.init(params)
    from graphsage_tpu.parallel.distributed import replicate_unsharded

    params = replicate_unsharded(params, mesh)
    opt_state = replicate_unsharded(opt_state, mesh)

    runner = make_sharded_supervised_chunk_runner(
        sup, optimizer, mesh, BATCH, capacity_factor=cap,
        params_like=params, opt_state_like=opt_state,
        data_axis="data" if data_shards > 1 else None,
    )
    n_steps = (WARMUP_CHUNKS + TIMED_CHUNKS) * CHUNK
    ids_perm = jnp.asarray(rng.integers(
        0, NUM_NODES, (n_steps * BATCH,), dtype=np.int32))
    labels_dev = jnp.asarray(labels_table)
    key = jax.random.key(7)

    start = 0
    for _ in range(WARMUP_CHUNKS):
        params, opt_state, loss, *_ = runner(
            params, opt_state, key, feat_sh, adj_sh, ids_perm,
            labels_dev, start, CHUNK,
        )
        start += CHUNK
    float(loss)  # fetch barrier: warmup + compile fully done
    t0 = time.perf_counter()
    for _ in range(TIMED_CHUNKS):
        params, opt_state, loss, *_ = runner(
            params, opt_state, key, feat_sh, adj_sh, ids_perm,
            labels_dev, start, CHUNK,
        )
        start += CHUNK
    assert np.isfinite(float(loss))  # fetch barrier ends the timing
    dt = (time.perf_counter() - t0) / (TIMED_CHUNKS * CHUNK)
    return EDGES_PER_STEP / dt


def main():
    platform = jax.devices()[0].platform
    avail = jax.device_count()
    sizes = [d for d in parse_devices(avail) if d <= avail]
    print(f"# platform={platform} devices={avail} sizes={sizes}",
          file=sys.stderr, flush=True)
    data_shards = 1
    for a in sys.argv:
        if a.startswith("--data_shards="):
            data_shards = int(a.split("=", 1)[1])
    base = None
    for D in sizes:
        if data_shards * D > avail:
            continue
        eps = run_at(D, data_shards)
        base = base if base is not None else (D, eps)
        eff = eps / (base[1] * D / base[0])
        print(json.dumps({
            "metric": "sharded_train_edges_per_sec",
            "devices": D,
            "data_shards": data_shards,
            "platform": platform,
            "value": round(eps),
            "unit": "edges/s",
            "scaling_efficiency_vs_smallest": round(eff, 4),
            "icinote": (None if platform != "cpu" else
                        "CPU mesh: SPMD correctness only, not ICI"),
        }), flush=True)


if __name__ == "__main__":
    main()
