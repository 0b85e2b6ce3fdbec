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


def make_supervised_chunk_runner(config: SupervisedConfig, optimizer,
                                 batch_size: int):
    """Run ``n_steps`` training steps in ONE dispatch via lax.fori_loop.

    The reference crosses the host<->device boundary every minibatch
    (supervised_train.py:270-275). Here the whole epoch's shuffled id
    stream lives on device (``ids_perm`` = device-side permutation of the
    padded train-node array; dummy-padded entries carry zero mask), so a
    dispatch covers n_steps steps and the host only syncs at chunk
    boundaries — essential when each host round-trip costs ~40ms on a
    remoted TPU.

    runner(params, opt_state, rng, features, adj, ids_perm, labels_table,
           start_step, n_steps) -> (params, opt_state, last_loss,
           last_logits, last_ids)

    ``n_steps`` is a TRACED fori_loop bound (dynamic trip count), so one
    compiled executable serves every chunk size — a static bound would
    recompile (~60s on remoted TPUs) for each distinct epoch tail.
    """
    num_nodes = config.sage.num_nodes

    def one_step(carry, step_idx, features, adj, ids_perm, labels_table,
                 rng):
        params, opt_state = carry
        ids = jax.lax.dynamic_slice(
            ids_perm, (step_idx * batch_size,), (batch_size,)
        )
        labels = jnp.take(labels_table, ids, axis=0)
        mask = (ids != num_nodes).astype(jnp.float32)
        step_rng = jax.random.fold_in(rng, step_idx)
        (loss, logits), grads = jax.value_and_grad(
            supervised_loss, has_aux=True
        )(params, features, adj, ids, labels, mask, step_rng, config,
          deterministic=False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, logits, ids)

    def runner(params, opt_state, rng, features, adj, ids_perm,
               labels_table, start_step, n_steps):
        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j, features, adj, ids_perm,
                            labels_table, rng)

        bsz = batch_size
        dummy_out = (
            jnp.zeros(()),
            jnp.zeros((bsz, labels_table.shape[1])),
            jnp.zeros((bsz,), jnp.int32),
        )
        (params, opt_state), (loss, logits, ids) = jax.lax.fori_loop(
            0, n_steps, body, ((params, opt_state), dummy_out)
        )
        return params, opt_state, loss, logits, ids

    return runner


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


def make_unsupervised_chunk_runner(config: UnsupervisedConfig, optimizer,
                                   batch_size: int, num_nodes: int):
    """n_steps unsupervised steps per dispatch (see
    make_supervised_chunk_runner; n_steps is a traced bound). The
    train-MRR EMA ("shadow", reference unsupervised_train.py:277-279) is
    carried through the loop on device.

    runner(params, opt_state, shadow_mrr, rng, features, adj, pairs_perm
           [P,2], neg_cdf, start_step, n_steps)
    -> (params, opt_state, shadow_mrr, last_loss, last_mrr)
    """

    def one_step(carry, step_idx, features, adj, pairs_perm, neg_cdf, rng):
        params, opt_state, shadow = carry
        pair = jax.lax.dynamic_slice(
            pairs_perm, (step_idx * batch_size, 0), (batch_size, 2)
        )
        b1, b2 = pair[:, 0], pair[:, 1]
        mask = (b1 != num_nodes).astype(jnp.float32)
        step_rng = jax.random.fold_in(rng, step_idx)
        (loss, aux), grads = jax.value_and_grad(
            unsupervised_loss, has_aux=True
        )(params, features, adj, b1, b2, mask, neg_cdf, step_rng, config,
          deterministic=False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mrr = aux["mrr"]
        shadow = jnp.where(
            shadow < 0, mrr, shadow - (1 - 0.99) * (shadow - mrr)
        )
        return (params, opt_state, shadow), (loss, mrr)

    def runner(params, opt_state, shadow_mrr, rng, features, adj,
               pairs_perm, neg_cdf, start_step, n_steps):
        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j, features, adj,
                            pairs_perm, neg_cdf, rng)

        init = ((params, opt_state, shadow_mrr),
                (jnp.zeros(()), jnp.zeros(())))
        (params, opt_state, shadow_mrr), (loss, mrr) = jax.lax.fori_loop(
            0, n_steps, body, init
        )
        return params, opt_state, shadow_mrr, loss, mrr

    return runner


def make_node2vec_chunk_runner(config: Node2VecConfig, optimizer,
                               batch_size: int, num_nodes: int,
                               context_update_mask=None):
    """n_steps node2vec steps per dispatch (see
    make_supervised_chunk_runner; n_steps is a traced bound).
    ``num_nodes`` is the dummy id used to pad the pair stream; the
    trainable tables have num_nodes+1 rows so dummy lookups are
    in-bounds and masked out of the loss.

    runner(params, opt_state, shadow_mrr, rng, pairs_perm, uni_logits,
           start_step, n_steps) -> (params, opt_state, shadow_mrr, loss,
           mrr)
    """

    def one_step(carry, step_idx, pairs_perm, uni_logits, rng):
        params, opt_state, shadow = carry
        pair = jax.lax.dynamic_slice(
            pairs_perm, (step_idx * batch_size, 0), (batch_size, 2)
        )
        b1, b2 = pair[:, 0], pair[:, 1]
        mask = (b1 != num_nodes).astype(jnp.float32)
        step_rng = jax.random.fold_in(rng, step_idx)
        (loss, aux), grads = jax.value_and_grad(
            node2vec_loss, has_aux=True
        )(params, b1, b2, mask, uni_logits, step_rng, config)
        if context_update_mask is not None:
            grads = dict(grads)
            grads["context"] = (
                grads["context"] * context_update_mask[:, None]
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mrr = aux["mrr"]
        shadow = jnp.where(
            shadow < 0, mrr, shadow - (1 - 0.99) * (shadow - mrr)
        )
        return (params, opt_state, shadow), (loss, mrr)

    def runner(params, opt_state, shadow_mrr, rng, pairs_perm, uni_logits,
               start_step, n_steps):
        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j, pairs_perm, uni_logits,
                            rng)

        init = ((params, opt_state, shadow_mrr),
                (jnp.zeros(()), jnp.zeros(())))
        (params, opt_state, shadow_mrr), (loss, mrr) = jax.lax.fori_loop(
            0, n_steps, body, init
        )
        return params, opt_state, shadow_mrr, loss, mrr

    return runner


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
