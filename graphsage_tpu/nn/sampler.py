"""On-device uniform neighbor sampling over the padded adjacency.

The reference samples by gathering adjacency rows, shuffling the *columns*
with one shared permutation per call, and slicing the first ``num_samples``
(/root/reference/graphsage/neigh_samplers.py:24-29) — i.e. every node in
the batch shares the same column permutation. ``mode="shared_perm"``
reproduces that exactly and is the DEFAULT, for two reasons:

1. Reference parity: the published accuracy numbers were produced with
   this sampler.
2. TPU cost: per-node draws need a [n, k] ``take_along_axis`` — 128k
   element-level XLA gathers per step at the Reddit shape, measured at
   ~1.1 ms of a 4.9 ms step (benchmarks/sampler_probe.py; shared_perm
   cuts the full train step 22%, 5.13 -> 4.01 ms on v5e).

``mode="independent"`` (true per-node i.i.d. column draws) remains
available for experiments that want batch-decorrelated sampling.

Because padded rows re-sample neighbors *with replacement* when
deg < max_degree (adjacency.py), a uniform column draw is a uniform draw
over the node's neighbor multiset in both modes.

Replacement semantics differ for HIGH-degree nodes (deg > max_degree):
the reference's shuffle-slice draws ``num_samples`` distinct columns
per call (without replacement among the max_degree retained neighbors;
neigh_samplers.py:26-28), whereas ``independent`` draws each column
i.i.d. — the same neighbor can repeat within one node's fanout. Both
are unbiased single-draw-marginal estimators of the neighbor mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sample(rng, adj, ids, num_samples: int, mode: str = "shared_perm"):
    """Sample ``num_samples`` neighbors for each id.

    Args:
      rng: PRNG key.
      adj: [N+1, max_degree] int32 padded adjacency.
      ids: [n] int32 node indices.
      num_samples: static fanout.
      mode: "shared_perm" (reference semantics, default) or
        "independent" (per-node draws).

    Returns:
      [n, num_samples] int32 neighbor indices.
    """
    rows = jnp.take(adj, ids, axis=0)  # [n, D]
    return sample_from_rows(rng, rows, num_samples, mode)


def sample_from_rows(rng, rows, num_samples: int, mode: str = "shared_perm"):
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
