"""LSTM over neighbor sequences via `jax.lax.scan`.

Reproduces the reference SeqAggregator's recurrence
(/root/reference/graphsage/aggregators.py:403-433): a TF1
BasicLSTMCell (gate order i, j, f, o; forget_bias 1.0; zero initial
state) run with `dynamic_rnn` sequence-length masking, reading the output
at position length-1. Lengths come from the number of non-zero neighbor
rows (the dummy-node masking trick, aggregators.py:411-414).

On TPU the fanout is static so the scan has a fixed trip count; state
updates are frozen once t >= length, which makes "hidden state after the
full scan" identical to "output at length-1".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphsage_tpu.nn.init import glorot, zeros


def init_lstm(key, input_dim: int, hidden_dim: int):
    """Single fused kernel [input+hidden, 4*hidden] like BasicLSTMCell."""
    return {
        "kernel": glorot(key, (input_dim + hidden_dim, 4 * hidden_dim)),
        "bias": zeros((4 * hidden_dim,)),
    }


def lstm_last_output(params, seq, lengths, forget_bias: float = 1.0):
    """Run the LSTM over ``seq`` [n, S, d]; return h at step length-1.

    ``lengths`` [n] int32 in [1, S].
    """
    n, s, _ = seq.shape
    hidden_dim = params["kernel"].shape[1] // 4
    # State is f32 regardless of the input dtype: the gate matmul
    # accumulates in f32 (preferred_element_type), so a bf16 carry
    # would be a scan carry-dtype mismatch (and a precision loss).
    h0 = jnp.zeros((n, hidden_dim), dtype=jnp.float32)
    c0 = jnp.zeros((n, hidden_dim), dtype=jnp.float32)

    def step(carry, inp):
        h, c, t = carry
        x_t = inp
        gates = (
            jnp.dot(
                jnp.concatenate([x_t, h], axis=1),
                params["kernel"],
                preferred_element_type=jnp.float32,
            )
            + params["bias"]
        )
        i, j, f, o = jnp.split(gates, 4, axis=1)
        new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        active = (t < lengths)[:, None]
        h = jnp.where(active, new_h, h)
        c = jnp.where(active, new_c, c)
        return (h, c, t + 1), None

    (h, _, _), _ = jax.lax.scan(
        step, (h0, c0, jnp.int32(0)), jnp.swapaxes(seq, 0, 1)
    )
    return h


def neighbor_lengths(neigh_vecs):
    """Non-zero-row count per sequence, clamped to >= 1
    (reference aggregators.py:411-414)."""
    used = jnp.sign(jnp.max(jnp.abs(neigh_vecs), axis=2))
    length = jnp.sum(used, axis=1)
    return jnp.maximum(length, 1.0).astype(jnp.int32)
