"""Jit-safe unigram^distortion negative sampling.

TPU-native replacement for TF's ``fixed_unigram_candidate_sampler``
(/root/reference/graphsage/models.py:336-343, 450-457): sample node
indices with probability proportional to degree^0.75.

* ``unique=False`` (SampleAndAggregate): inverse-CDF sampling —
  precompute the cumulative distorted-degree table once on host, then
  each draw is a uniform + ``searchsorted``. Exact distribution.
* ``unique=True`` (Node2Vec): Gumbel top-k, which is exactly sampling
  without replacement from the same distribution.

Zero-degree nodes (all val/test nodes in the train adjacency) have zero
probability and are never sampled, matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def unigram_cdf(degrees: np.ndarray, distortion: float = 0.75) -> np.ndarray:
    """Host-side cumulative table of degree^distortion, float32 [N]."""
    p = np.power(np.asarray(degrees, dtype=np.float64), distortion)
    cdf = np.cumsum(p)
    return (cdf / cdf[-1]).astype(np.float32)


def sample_negatives(rng, cdf, num_samples: int):
    """iid draws from the distorted unigram distribution (unique=False)."""
    u = jax.random.uniform(rng, (num_samples,), dtype=jnp.float32)
    idx = jnp.searchsorted(cdf, u, side="left")
    return jnp.clip(idx, 0, cdf.shape[0] - 1).astype(jnp.int32)


def unigram_logits(degrees, distortion: float = 0.75):
    """Device-side log-probabilities (unnormalized) for Gumbel top-k."""
    deg = jnp.asarray(degrees, dtype=jnp.float32)
    return jnp.where(deg > 0, distortion * jnp.log(jnp.maximum(deg, 1e-20)),
                     -jnp.inf)


def sample_negatives_unique(rng, logits, num_samples: int):
    """Without-replacement draws via Gumbel top-k (unique=True)."""
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logits + g, num_samples)
    return idx.astype(jnp.int32)
