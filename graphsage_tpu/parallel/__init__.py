"""Multi-chip parallelism: device meshes and sharded train steps.

The reference is single-process/single-GPU (no DP/TP/PP anywhere in
/root/reference — see SURVEY.md §2 P1-P3); this package is the new
first-class scaling story: a named `jax.sharding.Mesh`, NamedSharding
annotations on every train-step input, and XLA-inserted collectives
(psum for gradients over the ``data`` axis, all-gather/reduce-scatter for
the feature-sharded ``model`` axis) riding ICI.
"""

from graphsage_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    shard_batch,
    shard_features,
)
from graphsage_tpu.parallel.graph_sharded import (  # noqa: F401
    exchange_gather,
    make_sharded_supervised_step,
    shard_rows,
    sharded_sage_embed,
)
