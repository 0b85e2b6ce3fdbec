"""Worker for the 2-process GRAPH-SHARDED multi-host test
(tests/test_multiprocess.py::test_two_process_graph_sharded_parity).

Each process: 4 virtual CPU devices, joins a 2-process Gloo cluster
(("graph",) mesh = 8 devices spanning both processes), then asserts:

  * per-host shard loading: put_global_rows + load_feature_shard over a
    deferred (load_features=False) on-disk table reads ONLY this
    process's addressable row ranges — no process materializes the full
    feature table (SURVEY §7 stage 7);
  * the P2 sharded supervised chunk runner over the CROSS-PROCESS mesh
    matches a process-local single-device chunk runner bit-for-bit
    (first_k sampler);
  * the composed P1xP2 runner over a (2, 4) ("data", "graph") mesh with
    the DATA axis spanning the two processes (graph sharding process-
    local — the ICI-in-slice / DP-over-DCN deployment shape) matches
    the same single-device reference.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=4 \
     python tests/_mp_worker_sharded.py <port> <process_id> <prefix>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

port, pid, prefix = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=pid,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from graphsage_tpu.data.adjacency import build_both_adjs  # noqa: E402
from graphsage_tpu.data.io import (  # noqa: E402
    feature_stats,
    load_data,
    load_feature_rows,
)
from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig  # noqa: E402
from graphsage_tpu.models.supervised import (  # noqa: E402
    SupervisedConfig,
    init_supervised_params,
    make_optimizer,
)
from graphsage_tpu.parallel.distributed import (  # noqa: E402
    host_array,
    put_global,
    put_global_rows,
    replicate_unsharded,
)
from graphsage_tpu.parallel.dp import make_supervised_chunk_runner  # noqa: E402
from graphsage_tpu.parallel.graph_sharded import (  # noqa: E402
    device_rows_to_node_ids,
    make_sharded_supervised_chunk_runner,
    shard_rows,
)

assert jax.process_count() == 2
assert jax.device_count() == 8

D = 8
mesh = Mesh(np.asarray(jax.devices()), ("graph",))

# --- per-host shard loading off the deferred on-disk table
lazy = load_data(prefix, load_features=False)
assert lazy.features is None and lazy.feature_meta is not None
n = lazy.num_nodes
F = lazy.feature_dim
shard_size = -(-(n + 1) // D)
stats = feature_stats(lazy)
requested = []


def loader(lo, hi):
    requested.append((lo, hi))
    # rows [lo, hi) of the STRIDED device-layout table (shard_rows
    # default layout; mirrors train/supervised.py::_place_sharded_features)
    node_ids = device_rows_to_node_ids(np.arange(lo, hi), D, shard_size)
    return load_feature_rows(lazy, node_ids, stats=stats)


feat_sh = put_global_rows(
    (shard_size * D, F), "float32", mesh, P("graph"), loader
)
# this process owns 4 contiguous shards: rows [pid*4*ss, (pid+1)*4*ss)
my_lo, my_hi = pid * 4 * shard_size, (pid + 1) * 4 * shard_size
assert requested, "loader never called"
for lo, hi in requested:
    assert my_lo <= lo and hi <= my_hi, (
        f"process {pid} asked for rows [{lo},{hi}) outside its "
        f"addressable range [{my_lo},{my_hi})"
    )

# --- cross-process sharded runner vs local single-device reference
graph = load_data(prefix)  # eager copy for the local reference only
adj, _, _ = build_both_adjs(graph, max_degree=8, seed=1)
feats = graph.padded_features()
B, STEPS = 16, 2
sage = SAGEConfig(
    layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
    feature_dim=F, aggregator="mean", sampler_mode="first_k",
    num_nodes=n,
)
sup = SupervisedConfig(sage=sage, num_classes=graph.num_classes,
                       weight_decay=0.05)
params = init_supervised_params(jax.random.key(0), sup)
optimizer = make_optimizer(0.01)
rng = jax.random.key(7)
ids_perm = (np.arange(STEPS * B, dtype=np.int32) % n)
labels_table = np.vstack(
    [graph.labels, np.zeros((1, graph.num_classes), np.float32)]
)

single = jax.jit(make_supervised_chunk_runner(sup, optimizer, B))
p1, _, loss1, preds1, _ = single(
    params, optimizer.init(params), rng, jnp.asarray(feats),
    jnp.asarray(adj), jnp.asarray(ids_perm), jnp.asarray(labels_table),
    0, STEPS,
)

adj_sh = put_global(shard_rows(adj, D)[0], mesh, P("graph"))
params_g = replicate_unsharded(params, mesh)
opt_g = replicate_unsharded(optimizer.init(params), mesh)
run = make_sharded_supervised_chunk_runner(
    sup, optimizer, mesh, B, capacity_factor=8.0,
    params_like=params_g, opt_state_like=opt_g,
)
p2, _, loss2, preds2, last_ids, dropped = run(
    params_g, opt_g, rng, feat_sh, adj_sh, ids_perm, labels_table,
    0, STEPS,
)
assert int(host_array(dropped)) == 0
np.testing.assert_allclose(float(host_array(loss2)), float(loss1),
                           rtol=1e-5)
np.testing.assert_allclose(
    host_array(p2["head"]["w"]), np.asarray(p1["head"]["w"]),
    rtol=1e-4, atol=1e-6,
)
# single-device chunk runner returns raw logits; the sharded one returns
# supervised_predict outputs (probabilities)
from graphsage_tpu.models.supervised import supervised_predict  # noqa: E402

ref_preds = np.asarray(supervised_predict(preds1, sup))
np.testing.assert_allclose(
    host_array(preds2), ref_preds, rtol=1e-4, atol=1e-6,
)
print(f"MP_SHARDED_OK {pid}", flush=True)

# --- composed P1xP2 with the DATA axis spanning the two processes:
# each process is one data slice of 4 graph shards — graph sharding
# stays process-local (the ICI-in-slice / DP-over-DCN deployment shape)
cmesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "graph"))
feat_c = put_global(
    shard_rows(np.asarray(feats, np.float32), 4)[0], cmesh, P("graph")
)
adj_c = put_global(shard_rows(adj, 4)[0], cmesh, P("graph"))
# fresh init: the 1-D runner above DONATED its params/opt buffers
params_f = init_supervised_params(jax.random.key(0), sup)
params_c = replicate_unsharded(params_f, cmesh)
opt_c = replicate_unsharded(optimizer.init(params_f), cmesh)
runc = make_sharded_supervised_chunk_runner(
    sup, optimizer, cmesh, B, capacity_factor=8.0,
    params_like=params_c, opt_state_like=opt_c, data_axis="data",
)
p3, _, loss3, preds3, _, dropped3 = runc(
    params_c, opt_c, rng, feat_c, adj_c, ids_perm, labels_table,
    0, STEPS,
)
assert int(host_array(dropped3)) == 0
np.testing.assert_allclose(float(host_array(loss3)), float(loss1),
                           rtol=1e-5)
np.testing.assert_allclose(
    host_array(p3["head"]["w"]), np.asarray(p1["head"]["w"]),
    rtol=1e-4, atol=1e-6,
)
print(f"MP_COMPOSED_OK {pid}", flush=True)
