"""Dense layer: dropout -> matmul -> +bias -> activation.

Functional equivalent of the reference Dense
(/root/reference/graphsage/layers.py:73-116): glorot-uniform weights,
zero bias, dropout applied to the input.
"""

from __future__ import annotations

import jax.numpy as jnp

from graphsage_tpu.nn.init import glorot, zeros, dropout


def init_dense(key, input_dim: int, output_dim: int, bias: bool = True):
    params = {"w": glorot(key, (input_dim, output_dim))}
    if bias:
        params["b"] = zeros((output_dim,))
    return params


def apply_dense(
    params,
    x,
    *,
    act=None,
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
):
    x = dropout(rng, x, dropout_rate, deterministic)
    out = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    if "b" in params:
        out = out + params["b"]
    if act is not None:
        out = act(out)
    return out
