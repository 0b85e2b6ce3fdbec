"""Device mesh construction and sharding helpers.

Axes:
  * ``data``  — minibatch (node/edge index) sharding; gradients are
    psum-reduced over this axis by XLA.
  * ``model`` — feature-dimension sharding of the node feature table and
    the first-layer aggregator projections (tensor parallelism). Gathers
    stay local (rows are replicated along ``data``, split along the
    feature axis); the first matmul contracts the split axis and XLA
    inserts the reduce-scatter/all-reduce.

The reference has no distributed code at all; this design follows the
standard JAX recipe: pick a mesh, annotate shardings, let XLA insert
collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """A ("data", "model") mesh over the available devices.

    With ``n_data=None`` all remaining devices go to the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over ``data`` for per-batch arrays."""
    return NamedSharding(mesh, P("data"))


def shard_features(mesh: Mesh) -> NamedSharding:
    """[N+1, F] feature table split along the feature axis over ``model``."""
    return NamedSharding(mesh, P(None, "model"))


def shard_contracting(mesh: Mesh) -> NamedSharding:
    """[F, d] weight split along its contracting (input) axis over ``model``."""
    return NamedSharding(mesh, P("model", None))


def device_put_sharded_tree(tree, sharding: NamedSharding):
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
