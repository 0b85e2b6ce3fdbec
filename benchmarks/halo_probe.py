"""A/B probe: halo='overlap' vs 'blocking' exchange schedules (P2).

Times sharded_sage_embed's two halo schedules on the 8-virtual-device
CPU mesh, diffs their compiled HLO collective footprint, and finds the
minimum capacity factor each schedule needs for zero dropped requests.
CPU-mesh wall times are NOT ICI numbers — collectives here are
memcpys — so the timing column is a scheduling-level check of the
dependency structure. Collective operand bytes are equal by
construction at a fixed capacity factor (static shapes: the all-to-all
carries the capacity-padded buffer however full it is); the
split-local fast path's payload win shows up as the LOWER capacity
factor it needs — own-shard rows bypass the collectives and stop
consuming per-destination capacity slots, so the same workload fits in
smaller (cheaper) exchange buffers. The interleaved schedule
additionally removes the serialization between frontier k+1's
expansion and frontier k's feature pull, so XLA's async-collective
scheduler can keep an all-to-all in flight during local work.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/halo_probe.py
(force CPU is done in-process; results recorded in KERNEL_NOTES.md)
"""

from __future__ import annotations

import os
import re
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from graphsage_tpu.models.graphsage import (  # noqa: E402
    LayerInfo,
    SAGEConfig,
)
from graphsage_tpu.models.supervised import (  # noqa: E402
    SupervisedConfig,
    init_supervised_params,
)
from graphsage_tpu.parallel.graph_sharded import (  # noqa: E402
    shard_rows,
    sharded_sage_embed,
)

D = 8
NUM_NODES = 64_000
FEAT_DIM = 128          # CPU-sized stand-in for Reddit's 602
MAX_DEGREE = 32
BATCH = 512
FANOUTS = (25, 10)
ITERS = 10


def build(halo: str, capacity_factor: float = 4.0,
          return_stats: bool = False, layout: str = "strided"):
    sage = SAGEConfig(
        layers=(LayerInfo(FANOUTS[0], 128), LayerInfo(FANOUTS[1], 128)),
        feature_dim=FEAT_DIM,
        aggregator="mean",
        sampler_mode="first_k",
        num_nodes=NUM_NODES,
        shard_layout=layout,
    )
    sup = SupervisedConfig(sage=sage, num_classes=8)
    rng = np.random.default_rng(0)
    feats = np.vstack([
        rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
        np.zeros((1, FEAT_DIM), np.float32),
    ])
    # zipf ids: hub-skewed frontiers, the shape capacity sizing cares about
    ranks = np.arange(1, NUM_NODES + 1, dtype=np.float64)
    p = ranks ** -1.05
    p /= p.sum()
    adj = rng.choice(NUM_NODES, size=(NUM_NODES + 1) * MAX_DEGREE,
                     p=p).reshape(NUM_NODES + 1, MAX_DEGREE)
    adj = adj.astype(np.int32)

    params = init_supervised_params(jax.random.key(0), sup)
    feat_sh, _ = shard_rows(feats, D, layout)
    adj_sh, _ = shard_rows(adj, D, layout)
    ids = jnp.asarray(
        rng.integers(0, NUM_NODES, (BATCH,), dtype=np.int32))
    mesh = Mesh(np.array(jax.devices("cpu")[:D]), ("graph",))

    def body(params, feat_local, adj_local, ids, rng_key):
        res = sharded_sage_embed(
            params, feat_local, adj_local, ids, rng_key, sage, "graph",
            capacity_factor=capacity_factor, halo=halo,
            return_stats=return_stats,
        )
        if return_stats:
            out, dropped = res
            return out, jax.lax.psum(dropped, "graph")
        return res

    f = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("graph"), P("graph"), P(), P()),
        out_specs=(P(), P()) if return_stats else P(),
        check_vma=False,
    ))
    args = (params, jnp.asarray(feat_sh), jnp.asarray(adj_sh), ids,
            jax.random.key(1))
    return f, args


def collective_stats(f, args):
    """(#all-to-all ops, total all-to-all operand bytes) in compiled HLO."""
    hlo = f.lower(*args).compile().as_text()
    n = 0
    total_bytes = 0
    for line in hlo.splitlines():
        if "all-to-all(" not in line:
            continue
        n += 1
        # sum the result-tuple payload (dtype[dims] tokens on the line's
        # LHS == bytes each device receives per exchange)
        lhs = line.split("all-to-all(")[0]
        for sm in re.finditer(r"(f32|s32|u32|bf16|u8|s8|pred)\[([\d,]*)\]",
                              lhs):
            dt = {"bf16": 2, "u8": 1, "s8": 1, "pred": 1}.get(
                sm.group(1), 4)
            dims = [int(x) for x in sm.group(2).split(",") if x]
            total_bytes += dt * (int(np.prod(dims)) if dims else 1)
    return n, total_bytes


def timed(f, args):
    out = f(*args)
    jax.block_until_ready(out)  # CPU backend: real barrier
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def min_capacity_zero_drops(halo: str, layout: str = "strided"):
    """Smallest capacity_factor (0.5 steps) with zero dropped requests
    over 4 sampled steps of the zipf workload."""
    for cap in np.arange(0.5, 8.01, 0.5):
        f, args = build(halo, capacity_factor=float(cap),
                        return_stats=True, layout=layout)
        params, feat_sh, adj_sh, _, _ = args
        total = 0
        rng = np.random.default_rng(7)
        for i in range(4):
            # distinct uniform batches each step (first_k sampling is
            # deterministic, so varying only the rng key would re-probe
            # the identical frontier 4 times)
            ids = jnp.asarray(rng.integers(
                0, NUM_NODES, (BATCH,), dtype=np.int32))
            _, d = f(params, feat_sh, adj_sh, ids, jax.random.key(i))
            total += int(d)
        if total == 0:
            return float(cap)
    return float("inf")


def main():
    results = {}
    for halo in ("blocking", "overlap"):
        f, args = build(halo)
        n, b = collective_stats(f, args)
        dt = timed(f, args)
        cap = min_capacity_zero_drops(halo)
        results[halo] = (dt, n, b, cap)
        print(f"{halo:9s}: {dt * 1e3:7.2f} ms/fwd   "
              f"all-to-all ops: {n:3d}   operand MB: {b / 1e6:8.2f}   "
              f"min zero-drop capacity_factor: {cap}", flush=True)
    b_dt, _, _, b_cap = results["blocking"]
    o_dt, _, _, o_cap = results["overlap"]
    print(f"overlap vs blocking: {b_dt / o_dt:.2f}x wall; zero-drop "
          f"exchange buffers {b_cap / o_cap:.1f}x smaller with "
          f"split-local", flush=True)
    # layout A/B: zipf hubs are the low ids, so block ownership parks
    # them all on shard 0 — strided ownership is the load-balancing fix
    for layout in ("strided", "block"):
        cap = min_capacity_zero_drops("overlap", layout=layout)
        print(f"layout={layout:7s}: min zero-drop capacity_factor "
              f"{cap}", flush=True)


if __name__ == "__main__":
    main()
