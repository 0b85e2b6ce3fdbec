"""Worker for the 2-process multi-host CPU test (tests/test_multiprocess.py).

Each process: 4 virtual CPU devices, joins a 2-process Gloo cluster
(global mesh = 8 devices), then asserts that

  * put_global + host_array round-trip a row-sharded table exactly;
  * the P1 DP chunk runner over the CROSS-PROCESS ("data",) mesh matches
    a process-local single-device chunk runner bit-for-bit (first_k).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=4 \
     python tests/_mp_worker.py <port> <process_id>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

port, pid = int(sys.argv[1]), int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=pid,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig  # noqa: E402
from graphsage_tpu.models.supervised import (  # noqa: E402
    SupervisedConfig,
    init_supervised_params,
    make_optimizer,
)
from graphsage_tpu.parallel.distributed import (  # noqa: E402
    host_array,
    put_global,
)
from graphsage_tpu.parallel.dp import (  # noqa: E402
    make_dp_supervised_chunk_runner,
    make_supervised_chunk_runner,
)

assert jax.process_count() == 2
assert jax.device_count() == 8

mesh = Mesh(np.asarray(jax.devices()), ("data",))

# --- put_global / host_array round trip (cross-process sharded table)
table = np.arange(64, dtype=np.float32).reshape(16, 4)
g = put_global(table, mesh, P("data"))
assert not g.is_fully_addressable
np.testing.assert_array_equal(host_array(g), table)

# --- DP chunk runner over the cross-process mesh vs local single-device
rng_np = np.random.default_rng(0)
N, F, C, B, STEPS = 64, 8, 3, 16, 2
feats = np.vstack([
    rng_np.standard_normal((N, F), dtype=np.float32),
    np.zeros((1, F), np.float32),
])
adj = rng_np.integers(0, N, (N + 1, 8), dtype=np.int32)
labels_table = np.eye(C, dtype=np.float32)[
    rng_np.integers(0, C, (N + 1,))
]
ids_perm = (np.arange(STEPS * B, dtype=np.int32) % N)

sage = SAGEConfig(
    layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
    feature_dim=F, aggregator="mean", sampler_mode="first_k",
    num_nodes=N,
)
sup = SupervisedConfig(sage=sage, num_classes=C, weight_decay=0.01)
params = init_supervised_params(jax.random.key(0), sup)
optimizer = make_optimizer(0.01)
rng = jax.random.key(7)

single = jax.jit(make_supervised_chunk_runner(sup, optimizer, B))
p1, _, loss1, logits1, _ = single(
    params, optimizer.init(params), rng, jnp.asarray(feats),
    jnp.asarray(adj), jnp.asarray(ids_perm), jnp.asarray(labels_table),
    0, STEPS,
)

dp = make_dp_supervised_chunk_runner(sup, optimizer, mesh, B)
p2, _, loss2, logits2, _ = dp(
    params, optimizer.init(params), rng, feats, adj, ids_perm,
    labels_table, 0, STEPS,
)
np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
np.testing.assert_allclose(
    host_array(logits2), np.asarray(logits1), rtol=1e-4, atol=1e-6
)
np.testing.assert_allclose(
    host_array(p2["head"]["w"]), np.asarray(p1["head"]["w"]),
    rtol=1e-4, atol=1e-6,
)
print(f"MP_WORKER_OK {pid}", flush=True)
