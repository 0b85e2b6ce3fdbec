"""Sharded training steps: data parallelism + optional feature-dim TP.

One jitted function per model family does forward + backward + optimizer
update on device. Under a mesh, inputs are committed with NamedShardings
(batch indices split over ``data``, the feature table optionally split
over ``model``) and XLA inserts the gradient psum / contraction
all-reduce; the step function itself is mesh-agnostic pure JAX.

The reference's equivalent is the per-step ``sess.run`` feed_dict loop
(/root/reference/graphsage/supervised_train.py:262-312) — single device,
host round-trip each step. Here only int32 indices cross host→device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from graphsage_tpu.models.node2vec import Node2VecConfig, node2vec_loss
from graphsage_tpu.models.supervised import SupervisedConfig, supervised_loss
from graphsage_tpu.models.unsupervised import (
    UnsupervisedConfig,
    unsupervised_loss,
)
from graphsage_tpu.parallel.mesh import (
    replicated,
    shard_batch,
    shard_contracting,
    shard_features,
)


def make_supervised_train_step(config: SupervisedConfig, optimizer):
    """step(params, opt_state, rng, features, adj, ids, labels, mask)
    -> (params, opt_state, loss, logits)."""

    def step(params, opt_state, rng, features, adj, ids, labels, mask):
        (loss, logits), grads = jax.value_and_grad(
            supervised_loss, has_aux=True
        )(params, features, adj, ids, labels, mask, rng, config,
          deterministic=False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    return step


def make_unsupervised_train_step(config: UnsupervisedConfig, optimizer):
    """step(params, opt_state, rng, features, adj, b1, b2, mask, neg_cdf)
    -> (params, opt_state, loss, aux)."""

    def step(params, opt_state, rng, features, adj, b1, b2, mask, neg_cdf):
        (loss, aux), grads = jax.value_and_grad(
            unsupervised_loss, has_aux=True
        )(params, features, adj, b1, b2, mask, neg_cdf, rng, config,
          deterministic=False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


def make_node2vec_train_step(config: Node2VecConfig, optimizer,
                             context_update_mask=None):
    """step(params, opt_state, rng, b1, b2, mask, unigram_logits)."""

    def step(params, opt_state, rng, b1, b2, mask, unigram_logits):
        (loss, aux), grads = jax.value_and_grad(
            node2vec_loss, has_aux=True
        )(params, b1, b2, mask, unigram_logits, rng, config)
        if context_update_mask is not None:
            grads = dict(grads)
            grads["context"] = (
                grads["context"] * context_update_mask[:, None]
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


# ------------------------------------------------------------- sharding


def sage_param_shardings(params, mesh, sage_config, tp: bool = False):
    """NamedSharding pytree for a SAGE param tree.

    With ``tp``, layer-0 weights whose leading dim is the raw input dim are
    split along ``model`` (matching a feature table split on its feature
    axis); everything else is replicated.
    """
    rep = replicated(mesh)
    if not tp:
        return jax.tree.map(lambda _: rep, params)
    in_dim = sage_config.agg_input_dim(0)
    con = shard_contracting(mesh)

    def spec_layer0(x):
        if x.ndim == 2 and x.shape[0] == in_dim:
            return con
        return rep

    shardings = jax.tree.map(lambda _: rep, params)
    shardings["aggs"] = list(shardings["aggs"])
    shardings["aggs"][0] = jax.tree.map(spec_layer0, params["aggs"][0])
    if "embeds" in params:
        # identity table splits on its embedding axis, like the features
        shardings["embeds"] = shard_features(mesh)
    return shardings


def place_train_state(params, optimizer, param_shardings):
    """device_put params per sharding, then init opt state (zeros_like
    inherits each leaf's sharding)."""
    params = jax.tree.map(jax.device_put, params, param_shardings)
    opt_state = optimizer.init(params)
    return params, opt_state


def place_graph_arrays(features, adj, mesh, tp: bool = False):
    """Features replicated (or model-split under tp); adjacency replicated."""
    rep = replicated(mesh)
    if features is not None:
        features = jax.device_put(
            features, shard_features(mesh) if tp else rep
        )
    adj = jax.device_put(adj, rep)
    return features, adj


def place_batch(mesh, *arrays):
    sh = shard_batch(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)
