"""The aggregator zoo, as pure init/apply function pairs.

Six aggregators with parameter shapes and math matching the reference
(/root/reference/graphsage/aggregators.py):

  mean      — neighbor mean -> two matmuls (self/neigh), add or concat (:6-64)
  gcn       — mean over {neighbors + self} -> one shared matmul (:66-116)
  maxpool   — per-neighbor MLP -> elementwise max -> matmuls (:119-195)
  meanpool  — same with mean reduction (:197-273)
  twomaxpool— 2-layer MLP then max-pool (:276-361; CLI-unreachable in the
              reference, included for completeness)
  seq       — LSTM over the neighbor sequence with zero-row length masking
              (:363-449)

Dropout placement matches the reference: mean/gcn dropout both inputs;
pooling variants dropout only inside the MLP (Dense drops its input);
seq uses no dropout.

The combine step is ``self_out + neigh_out`` or ``concat([self_out,
neigh_out], -1)`` (doubling the output dim) per the ``concat`` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphsage_tpu.nn.dense import apply_dense, init_dense
from graphsage_tpu.nn.init import dropout, glorot, zeros
from graphsage_tpu.nn.lstm import init_lstm, lstm_last_output, neighbor_lengths

POOL_HIDDEN = {"small": 512, "big": 1024}
TWOPOOL_HIDDEN = {"small": (512, 256), "big": (1024, 512)}
LSTM_HIDDEN = {"small": 128, "big": 256}


def _split(rng, n):
    if rng is None:
        return (None,) * n
    return jax.random.split(rng, n)


def _combine(from_self, from_neighs, params, act, concat):
    if concat:
        out = jnp.concatenate([from_self, from_neighs], axis=1)
    else:
        out = from_self + from_neighs
    if "b" in params:
        out = out + params["b"]
    return act(out)


# ---------------------------------------------------------------- mean

def init_mean(key, input_dim, output_dim, model_size="small", bias=False):
    k1, k2 = jax.random.split(key)
    p = {
        "neigh_w": glorot(k1, (input_dim, output_dim)),
        "self_w": glorot(k2, (input_dim, output_dim)),
    }
    if bias:
        p["b"] = zeros((output_dim * 1,))
    return p


def apply_mean(params, self_vecs, neigh_vecs, *, act, concat,
               dropout_rate=0.0, rng=None, deterministic=True):
    """``neigh_vecs`` is [n, S, d] — or an already-reduced [n, d] mean
    from the fused gather-mean fast path, in which case the reference's
    pre-mean neighbor dropout (aggregators.py:52) was already applied
    inside the kernel and is skipped here (only self dropout runs)."""
    r1, r2 = _split(rng, 2)
    if neigh_vecs.ndim != 2:
        neigh_vecs = dropout(r1, neigh_vecs, dropout_rate, deterministic)
    self_vecs = dropout(r2, self_vecs, dropout_rate, deterministic)
    if neigh_vecs.ndim == 2:
        neigh_means = neigh_vecs
    else:
        neigh_means = jnp.mean(neigh_vecs, axis=1)
    from_neighs = jnp.dot(neigh_means, params["neigh_w"],
                          preferred_element_type=jnp.float32)
    from_self = jnp.dot(self_vecs, params["self_w"],
                        preferred_element_type=jnp.float32)
    return _combine(from_self, from_neighs, params, act, concat)


# ----------------------------------------------------------------- gcn

def init_gcn(key, input_dim, output_dim, model_size="small", bias=False):
    p = {"w": glorot(key, (input_dim, output_dim))}
    if bias:
        p["b"] = zeros((output_dim,))
    return p


def apply_gcn(params, self_vecs, neigh_vecs, *, act, concat,
              dropout_rate=0.0, rng=None, deterministic=True,
              n_samples=None):
    del concat  # gcn is used with concat=False; output never concatenates
    r1, r2 = _split(rng, 2)
    if neigh_vecs.ndim != 2:
        neigh_vecs = dropout(r1, neigh_vecs, dropout_rate, deterministic)
    self_vecs = dropout(r2, self_vecs, dropout_rate, deterministic)
    if neigh_vecs.ndim == 2:
        # pre-reduced [n, d] neighbor mean (fused gather-mean fast path;
        # the reference's pre-mean neighbor dropout was applied inside
        # the kernel): the self-inclusive gcn mean over S neighbors +
        # self recombines as (S*mean + self) / (S+1) — dropout commutes
        # per-element with the mean, so the recombination stays exact.
        means = (n_samples * neigh_vecs + self_vecs) * (
            1.0 / (n_samples + 1)
        )
    else:
        means = jnp.mean(
            jnp.concatenate([neigh_vecs, self_vecs[:, None, :]], axis=1),
            axis=1,
        )
    out = jnp.dot(means, params["w"], preferred_element_type=jnp.float32)
    if "b" in params:
        out = out + params["b"]
    return act(out)


# ------------------------------------------------------------- pooling

def _init_pool(key, input_dim, output_dim, hidden_dims, bias):
    keys = jax.random.split(key, 2 + len(hidden_dims))
    mlp = []
    d = input_dim
    for i, h in enumerate(hidden_dims):
        mlp.append(init_dense(keys[i], d, h))
        d = h
    p = {
        "mlp": mlp,
        "neigh_w": glorot(keys[-2], (d, output_dim)),
        "self_w": glorot(keys[-1], (input_dim, output_dim)),
    }
    if bias:
        p["b"] = zeros((output_dim,))
    return p


def _apply_pool(params, self_vecs, neigh_vecs, reduce_fn, *, act, concat,
                dropout_rate, rng, deterministic, pre_pooled=False):
    """``neigh_vecs`` is [n, S, d]: per-neighbor MLP, then reduce over S
    (reference aggregators.py:119-273). With ``pre_pooled`` it is the
    already-reduced [n, H] MLP output (the fused gather->MLP->pool
    kernel's result, ops/pool.py) and the MLP/reduce are skipped."""
    if pre_pooled:
        h = neigh_vecs
    else:
        n, s, d = neigh_vecs.shape
        h = neigh_vecs.reshape(n * s, d)
        rngs = _split(rng, len(params["mlp"]))
        for layer, r in zip(params["mlp"], rngs):
            h = apply_dense(
                layer, h, act=jax.nn.relu, dropout_rate=dropout_rate,
                rng=r, deterministic=deterministic,
            )
        h = reduce_fn(h.reshape(n, s, -1), axis=1)
    from_neighs = jnp.dot(h, params["neigh_w"],
                          preferred_element_type=jnp.float32)
    from_self = jnp.dot(self_vecs, params["self_w"],
                        preferred_element_type=jnp.float32)
    return _combine(from_self, from_neighs, params, act, concat)


def init_maxpool(key, input_dim, output_dim, model_size="small", bias=False):
    return _init_pool(key, input_dim, output_dim,
                      (POOL_HIDDEN[model_size],), bias)


def apply_maxpool(params, self_vecs, neigh_vecs, *, act, concat,
                  dropout_rate=0.0, rng=None, deterministic=True,
                  pre_pooled=False):
    return _apply_pool(params, self_vecs, neigh_vecs, jnp.max, act=act,
                       concat=concat, dropout_rate=dropout_rate, rng=rng,
                       deterministic=deterministic, pre_pooled=pre_pooled)


def init_meanpool(key, input_dim, output_dim, model_size="small", bias=False):
    return _init_pool(key, input_dim, output_dim,
                      (POOL_HIDDEN[model_size],), bias)


def apply_meanpool(params, self_vecs, neigh_vecs, *, act, concat,
                   dropout_rate=0.0, rng=None, deterministic=True,
                   pre_pooled=False):
    return _apply_pool(params, self_vecs, neigh_vecs, jnp.mean, act=act,
                       concat=concat, dropout_rate=dropout_rate, rng=rng,
                       deterministic=deterministic, pre_pooled=pre_pooled)


def init_twomaxpool(key, input_dim, output_dim, model_size="small", bias=False):
    return _init_pool(key, input_dim, output_dim,
                      TWOPOOL_HIDDEN[model_size], bias)


def apply_twomaxpool(params, self_vecs, neigh_vecs, *, act, concat,
                     dropout_rate=0.0, rng=None, deterministic=True):
    return _apply_pool(params, self_vecs, neigh_vecs, jnp.max, act=act,
                       concat=concat, dropout_rate=dropout_rate, rng=rng,
                       deterministic=deterministic)


# ----------------------------------------------------------------- seq

def init_seq(key, input_dim, output_dim, model_size="small", bias=False):
    hidden = LSTM_HIDDEN[model_size]
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "lstm": init_lstm(k1, input_dim, hidden),
        "neigh_w": glorot(k2, (hidden, output_dim)),
        "self_w": glorot(k3, (input_dim, output_dim)),
    }
    if bias:
        p["b"] = zeros((output_dim,))
    return p


def apply_seq(params, self_vecs, neigh_vecs, *, act, concat,
              dropout_rate=0.0, rng=None, deterministic=True):
    del dropout_rate, rng, deterministic  # reference seq agg has no dropout
    lengths = neighbor_lengths(neigh_vecs)
    neigh_h = lstm_last_output(params["lstm"], neigh_vecs, lengths)
    from_neighs = jnp.dot(neigh_h, params["neigh_w"],
                          preferred_element_type=jnp.float32)
    from_self = jnp.dot(self_vecs, params["self_w"],
                        preferred_element_type=jnp.float32)
    return _combine(from_self, from_neighs, params, act, concat)


# ------------------------------------------------------------ registry

AGGREGATORS = {
    "mean": (init_mean, apply_mean),
    "gcn": (init_gcn, apply_gcn),
    "maxpool": (init_maxpool, apply_maxpool),
    "meanpool": (init_meanpool, apply_meanpool),
    "twomaxpool": (init_twomaxpool, apply_twomaxpool),
    "seq": (init_seq, apply_seq),
}


def init_aggregator(name, key, input_dim, output_dim, model_size="small",
                    bias=False):
    return AGGREGATORS[name][0](key, input_dim, output_dim,
                                model_size=model_size, bias=bias)


def apply_aggregator(name, params, self_vecs, neigh_vecs, **kw):
    return AGGREGATORS[name][1](params, self_vecs, neigh_vecs, **kw)


def decay_weights(name, params):
    """The weights the reference applies weight decay to: the aggregator's
    own ``vars`` dict — self/neigh projection (and gcn's single weight),
    NOT the pooling MLP or the LSTM kernel (supervised_models.py:104-106
    iterates aggregator.vars only)."""
    keys = ("w", "neigh_w", "self_w", "b")
    return [params[k] for k in keys if k in params]
