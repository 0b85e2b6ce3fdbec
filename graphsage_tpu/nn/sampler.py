"""On-device uniform neighbor sampling over the padded adjacency.

The reference samples by gathering adjacency rows, shuffling the *columns*
with one shared permutation per call, and slicing the first ``num_samples``
(/root/reference/graphsage/neigh_samplers.py:24-29) — i.e. every node in
the batch shares the same column permutation. That is a quirk, not the
paper's semantics. We default to true per-node independent sampling
(``mode="independent"``) and keep ``mode="shared_perm"`` for reference-
parity experiments.

Because padded rows re-sample neighbors *with replacement* when
deg < max_degree (adjacency.py), a uniform column draw is a uniform draw
over the node's neighbor multiset in both modes.

Replacement semantics differ for HIGH-degree nodes (deg > max_degree):
the reference's shuffle-slice draws ``num_samples`` distinct columns
per call (without replacement among the max_degree retained neighbors;
neigh_samplers.py:26-28), whereas ``independent`` draws each column
i.i.d. — the same neighbor can repeat within one node's fanout. Both
are unbiased single-draw-marginal estimators of the neighbor mean; the
independent draw has slightly higher variance on hub nodes. Use
``shared_perm`` where the without-replacement property itself matters
for a parity experiment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sample(rng, adj, ids, num_samples: int, mode: str = "independent"):
    """Sample ``num_samples`` neighbors for each id.

    Args:
      rng: PRNG key.
      adj: [N+1, max_degree] int32 padded adjacency.
      ids: [n] int32 node indices.
      num_samples: static fanout.
      mode: "independent" (per-node draws) or "shared_perm" (reference).

    Returns:
      [n, num_samples] int32 neighbor indices.
    """
    rows = jnp.take(adj, ids, axis=0)  # [n, D]
    return sample_from_rows(rng, rows, num_samples, mode)


def sample_from_rows(rng, rows, num_samples: int, mode: str = "independent"):
    """Sample fanout columns from pre-gathered adjacency rows [n, D].

    Modes: "independent" (per-node uniform draws), "shared_perm" (the
    reference's one-permutation-per-call quirk, neigh_samplers.py:26-28),
    "first_k" (deterministic first columns — for cross-sharding parity
    tests, not training).
    """
    max_degree = rows.shape[1]
    if mode == "shared_perm":
        perm = jax.random.permutation(rng, max_degree)
        return rows[:, perm[:num_samples]]
    if mode == "first_k":
        return rows[:, :num_samples]
    cols = jax.random.randint(
        rng, (rows.shape[0], num_samples), 0, max_degree, dtype=jnp.int32
    )
    return jnp.take_along_axis(rows, cols, axis=1)
