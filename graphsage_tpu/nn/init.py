"""Weight initializers.

Match the reference's initializers exactly for parity
(/root/reference/graphsage/inits.py:9-30): glorot is the Glorot & Bengio
uniform with limit sqrt(6/(fan_in+fan_out)), which is also what TF1's
xavier_initializer (used by Dense, layers.py:96) produces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot(key, shape, dtype=jnp.float32):
    limit = np.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def uniform(key, shape, scale=0.05, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def truncated_normal(key, shape, stddev, dtype=jnp.float32):
    """TF truncated_normal semantics: resample beyond 2 sigma."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def dropout(rng, x, rate: float, deterministic: bool):
    """TF-style dropout: zero with prob ``rate``, scale kept by 1/(1-rate)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
