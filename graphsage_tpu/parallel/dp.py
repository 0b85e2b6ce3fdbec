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

from graphsage_tpu.models.node2vec import (
    Node2VecConfig,
    mask_context_gradients,
    node2vec_loss,
)
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


def _require_num_nodes(num_nodes: int, stream: str = "stream") -> None:
    """Factories that pad device-resident streams with the dummy id
    ``num_nodes`` must reject an unset config: left at the default 0,
    the pad id would silently mask out node 0 instead of the pad rows."""
    if num_nodes <= 0:
        raise ValueError(
            "config.sage.num_nodes must be set (> 0): it is the dummy "
            f"pad id for the device-resident {stream} — left at the "
            "default 0 it would silently mask out node 0 instead of "
            "the pad rows"
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
                                 batch_size: int, mesh=None):
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

    With ``mesh`` (a ("data","model") mesh), each step's batch is
    sharding-constrained along ``data`` so GSPMD partitions the whole
    step: batch ops split over ``data`` (grads all-reduced), and with the
    feature table / layer-0 weights placed via shard_features /
    sage_param_shardings(tp=True) the feature-dim contraction reduces
    over ``model`` — the --n_model_shards path.
    """
    num_nodes = config.sage.num_nodes
    _require_num_nodes(num_nodes, "id stream")
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

    def one_step(carry, step_idx, features, adj, ids_perm, labels_table,
                 rng):
        params, opt_state = carry
        ids = jax.lax.dynamic_slice(
            ids_perm, (step_idx * batch_size,), (batch_size,)
        )
        if batch_sharding is not None:
            ids = jax.lax.with_sharding_constraint(ids, batch_sharding)
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
                               with_update_mask: bool = False):
    """n_steps node2vec steps per dispatch (see
    make_supervised_chunk_runner; n_steps is a traced bound).
    ``num_nodes`` is the dummy id used to pad the pair stream; the
    trainable tables have num_nodes+1 rows so dummy lookups are
    in-bounds and masked out of the loss.

    With ``with_update_mask`` the runner takes a trailing
    ``update_mask`` [num_nodes+1] float argument (1.0 = trainable
    context row) multiplied into the context-table grads — the retrain
    freeze. It is a RUNTIME argument, not a factory closure: a
    closed-over [N+1] table would embed an O(N) constant in the jit
    graph, which the remote-compile tunnel rejects (HTTP 413, see
    CLAUDE.md "Environment hazards").

    runner(params, opt_state, shadow_mrr, rng, pairs_perm, uni_logits,
           start_step, n_steps[, update_mask]) -> (params, opt_state,
           shadow_mrr, loss, mrr)
    """

    def one_step(carry, step_idx, pairs_perm, uni_logits, rng,
                 update_mask):
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
        if with_update_mask:
            grads = mask_context_gradients(grads, update_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mrr = aux["mrr"]
        shadow = jnp.where(
            shadow < 0, mrr, shadow - (1 - 0.99) * (shadow - mrr)
        )
        return (params, opt_state, shadow), (loss, mrr)

    def runner(params, opt_state, shadow_mrr, rng, pairs_perm, uni_logits,
               start_step, n_steps, update_mask=None):
        _check_update_mask(with_update_mask, update_mask)

        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j, pairs_perm, uni_logits,
                            rng, update_mask)

        init = ((params, opt_state, shadow_mrr),
                (jnp.zeros(()), jnp.zeros(())))
        (params, opt_state, shadow_mrr), (loss, mrr) = jax.lax.fori_loop(
            0, n_steps, body, init
        )
        return params, opt_state, shadow_mrr, loss, mrr

    return runner


def _check_update_mask(with_update_mask: bool, update_mask) -> None:
    """Trace-time check that the factory flag and the runtime mask agree:
    flag set but no mask would crash opaquely inside
    mask_context_gradients; mask passed with the flag unset would train
    with the freeze silently dropped."""
    if with_update_mask and update_mask is None:
        raise ValueError(
            "with_update_mask=True but no update_mask argument was "
            "passed — the context-table freeze would crash at trace time"
        )
    if not with_update_mask and update_mask is not None:
        raise ValueError(
            "update_mask passed but the factory was built with "
            "with_update_mask=False — the freeze would be silently "
            "ignored"
        )


def make_node2vec_train_step(config: Node2VecConfig, optimizer,
                             with_update_mask: bool = False):
    """step(params, opt_state, rng, b1, b2, mask, unigram_logits
    [, update_mask]). ``update_mask`` is a runtime argument for the
    same remote-compile reason as make_node2vec_chunk_runner."""

    def step(params, opt_state, rng, b1, b2, mask, unigram_logits,
             update_mask=None):
        _check_update_mask(with_update_mask, update_mask)
        (loss, aux), grads = jax.value_and_grad(
            node2vec_loss, has_aux=True
        )(params, b1, b2, mask, unigram_logits, rng, config)
        if with_update_mask:
            grads = mask_context_gradients(grads, update_mask)
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


# ------------------------------------------------ P1: pure data parallelism


def make_dp_supervised_chunk_runner(
    sup_config: SupervisedConfig,
    optimizer,
    mesh,
    batch_size: int,
    axis_name: str = "data",
):
    """--data_shards N: chunked supervised training over a 1-D ("data",)
    mesh via shard_map — tables and params replicated, each device takes
    its batch_size/D split of every step's batch, gradients psum over the
    axis. Same call signature and return layout as the jitted
    make_supervised_chunk_runner, so the trainer swaps them 1:1.

    Loss/grad math reproduces the single-device step bit-for-bit under
    the deterministic first_k sampler: per-device masked loss sums are
    normalized by the psum'd global mask count before the grad psum.
    """
    from graphsage_tpu.parallel.graph_sharded import _check_batch_divisible

    _check_batch_divisible(mesh, batch_size, axis_name, None)
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from graphsage_tpu.models.graphsage import (
        l2_normalize,
        sage_decay_weights,
        sage_embed,
    )
    from graphsage_tpu.models.supervised import (
        _sigmoid_xent,
        _softmax_xent,
    )
    from graphsage_tpu.nn.dense import apply_dense

    config = sup_config.sage
    num_nodes = config.num_nodes
    _require_num_nodes(num_nodes, "id stream")

    def local_loss(params, features, adj, ids, labels, mask, rng,
                   global_mask_sum):
        emb = sage_embed(
            params, features, adj, ids, rng, config,
            deterministic=config.dropout == 0.0,
        )
        emb = l2_normalize(emb, axis=1)
        head_rng = jax.random.fold_in(rng, 7)
        logits = apply_dense(
            params["head"], emb, act=None,
            dropout_rate=config.dropout, rng=head_rng,
            deterministic=config.dropout == 0.0,
        )
        if sup_config.sigmoid_loss:
            per_node = _sigmoid_xent(logits, labels) / sup_config.num_classes
        else:
            per_node = _softmax_xent(logits, labels)
        loss = jnp.sum(per_node * mask) / global_mask_sum
        if sup_config.weight_decay > 0.0:
            decayed = sage_decay_weights(params, config)
            decayed += [params["head"]["w"], params["head"]["b"]]
            # replicated work: /D so the psum of shard losses/grads
            # reproduces the single-device value
            D = jax.lax.axis_size(axis_name)
            loss = loss + sup_config.weight_decay * sum(
                0.5 * jnp.sum(w * w) for w in decayed
            ) / D
        return loss, logits

    def mapped(params, opt_state, rng, features, adj, ids_perm,
               labels_table, start_step, n_steps):
        D = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        local_b = batch_size // D

        def one_step(carry, step_idx):
            params, opt_state = carry
            ids = jax.lax.dynamic_slice(
                ids_perm, (step_idx * batch_size + me * local_b,),
                (local_b,),
            )
            labels = jnp.take(labels_table, ids, axis=0)
            mask = (ids != num_nodes).astype(jnp.float32)
            global_mask_sum = jnp.maximum(
                jax.lax.psum(jnp.sum(mask), axis_name), 1.0
            )
            step_rng = jax.random.fold_in(
                jax.random.fold_in(rng, step_idx), me
            )
            (loss, logits), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, features, adj, ids, labels, mask, step_rng,
              global_mask_sum)
            loss = jax.lax.psum(loss, axis_name)
            grads = jax.lax.psum(grads, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, logits, ids)

        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j)

        dummy_out = (
            jnp.zeros(()),
            jnp.zeros((local_b, sup_config.num_classes)),
            jnp.zeros((local_b,), ids_perm.dtype),
        )
        (params, opt_state), (loss, logits, ids) = jax.lax.fori_loop(
            0, n_steps, body, ((params, opt_state), dummy_out)
        )
        return params, opt_state, loss, logits, ids

    rep = P()
    sh = P(axis_name)
    return jax.jit(
        shard_map(
            mapped,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, rep, rep, sh, sh),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


def make_dp_unsupervised_chunk_runner(
    unsup_config: UnsupervisedConfig,
    optimizer,
    mesh,
    batch_size: int,
    axis_name: str = "data",
):
    """--data_shards N unsupervised: edge pairs split over the axis, the
    negative tower drawn ONCE per step (identical on every device, like
    the single-device three-tower step), grads psum'd. Bit-matches the
    single-device chunk runner under first_k (negatives share the same
    rng stream; per-edge losses renormalize by the global mask count)."""
    from graphsage_tpu.parallel.graph_sharded import _check_batch_divisible

    _check_batch_divisible(mesh, batch_size, axis_name, None)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from graphsage_tpu.models.graphsage import (
        l2_normalize,
        sage_decay_weights,
        sage_embed,
    )
    from graphsage_tpu.nn import prediction
    from graphsage_tpu.nn.negative import sample_negatives

    config = unsup_config.sage
    num_nodes = config.num_nodes
    _require_num_nodes(num_nodes, "pair stream")

    def mapped(params, opt_state, shadow, rng, features, adj, pairs_perm,
               neg_cdf, start_step, n_steps):
        D = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        local_b = batch_size // D

        def local_loss(params, b1, b2, mask, step_rng, global_mask_sum):
            # same (r_neg, r_fwd) split as unsupervised_outputs so the
            # negative tower matches the single-device stream exactly
            r_neg, r_fwd = jax.random.split(step_rng)
            neg_ids = sample_negatives(
                r_neg, neg_cdf, unsup_config.neg_sample_size
            )
            lb = b1.shape[0]
            all_ids = jnp.concatenate([b1, b2, neg_ids])
            out = sage_embed(
                params, features, adj, all_ids,
                jax.random.fold_in(r_fwd, me), config,
                deterministic=config.dropout == 0.0,
            )
            o1 = l2_normalize(out[:lb], 1)
            o2 = l2_normalize(out[lb:2 * lb], 1)
            neg = l2_normalize(out[2 * lb:], 1)
            raw = prediction.edge_pred_loss(
                o1, o2, neg, loss_fn=unsup_config.loss_fn, mask=mask,
                neg_sample_weights=unsup_config.neg_sample_weights,
            )
            loss = raw / global_mask_sum
            if unsup_config.weight_decay > 0.0:
                loss = loss + unsup_config.weight_decay * sum(
                    0.5 * jnp.sum(w * w)
                    for w in sage_decay_weights(params, config)
                ) / D
            aff = prediction.affinity(o1, o2)
            neg_aff = prediction.neg_cost(o1, neg)
            _, mrr = prediction.mrr_and_ranks(aff, neg_aff, mask)
            return loss, (mrr, jnp.sum(mask))

        def one_step(carry, step_idx):
            params, opt_state, shadow = carry
            pair = jax.lax.dynamic_slice(
                pairs_perm, (step_idx * batch_size + me * local_b, 0),
                (local_b, 2),
            )
            b1, b2 = pair[:, 0], pair[:, 1]
            mask = (b1 != num_nodes).astype(jnp.float32)
            global_mask_sum = jnp.maximum(
                jax.lax.psum(jnp.sum(mask), axis_name), 1.0
            )
            step_rng = jax.random.fold_in(rng, step_idx)
            (loss, (mrr, cnt)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, b1, b2, mask, step_rng, global_mask_sum)
            loss = jax.lax.psum(loss, axis_name)
            # exact global masked mean, robust to uneven shard mask counts
            mrr = (jax.lax.psum(mrr * cnt, axis_name)
                   / jnp.maximum(jax.lax.psum(cnt, axis_name), 1.0))
            grads = jax.lax.psum(grads, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            shadow = jnp.where(
                shadow < 0, mrr, shadow - (1 - 0.99) * (shadow - mrr)
            )
            return (params, opt_state, shadow), (loss, mrr)

        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j)

        init = ((params, opt_state, shadow),
                (jnp.zeros(()), jnp.zeros(())))
        (params, opt_state, shadow), (loss, mrr) = jax.lax.fori_loop(
            0, n_steps, body, init
        )
        return params, opt_state, shadow, loss, mrr

    rep = P()
    return jax.jit(
        shard_map(
            mapped,
            mesh=mesh,
            in_specs=(rep,) * 10,
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )
