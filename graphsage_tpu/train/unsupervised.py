"""Unsupervised training loop (reference unsupervised_train.py:132-372).

Covers the GraphSAGE three-tower skip-gram path, MRR EMA ("shadow")
tracking, embedding export (val.npy/val.txt), the n2v baseline, and the
n2v post-hoc inductive retrain with frozen train-node context rows.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.data.io import load_data
from graphsage_tpu.data.minibatch import EdgeBatcher
from graphsage_tpu.data.walks import run_random_walks
from graphsage_tpu.models import node2vec as n2v
from graphsage_tpu.models.graphsage import SAGEConfig
from graphsage_tpu.models.unsupervised import (
    UnsupervisedConfig,
    init_unsupervised_params,
    unsupervised_loss,
    unsupervised_outputs,
)
from graphsage_tpu.models.supervised import make_optimizer
from graphsage_tpu.nn.negative import unigram_cdf, unigram_logits
from graphsage_tpu.train import checkpoint as ckpt
from graphsage_tpu.train.config import TrainFlags, build_layer_infos


def build_unsupervised_config(flags: TrainFlags, graph) -> UnsupervisedConfig:
    agg, concat, layers = build_layer_infos(flags, supervised=False)
    feature_dim = graph.feature_dim  # in-memory or deferred (mmap) table
    if feature_dim == 0 and flags.identity_dim == 0:
        raise ValueError(
            "Must have a positive value for identity feature dimension if no "
            "input features given."
        )
    sage = SAGEConfig(
        layers=layers,
        feature_dim=feature_dim,
        aggregator=agg,
        concat=concat,
        model_size=flags.model_size,
        identity_dim=flags.identity_dim,
        num_nodes=graph.num_nodes,
        dropout=flags.dropout,
        sampler_mode=flags.sampler_mode,
        fused_gather=flags.fused_gather,
        dedup_gather=flags.dedup_gather,
        rows_gather=flags.rows_gather,
        shard_layout=flags.shard_layout,
    )
    return UnsupervisedConfig(
        sage=sage,
        neg_sample_size=flags.neg_sample_size,
        weight_decay=flags.weight_decay,
    )


def make_embed_step(config: UnsupervisedConfig):
    """jitted deterministic forward: normalized outputs1 for export."""

    def embed_step(params, features, adj, b1, b2, neg_cdf, rng):
        out1, _, _ = unsupervised_outputs(
            params, features, adj, b1, b2, neg_cdf, rng, config,
            deterministic=True,
        )
        return out1

    return jax.jit(embed_step)


def make_embed_sweep(config: UnsupervisedConfig, batch_size: int,
                     num_nodes: int):
    """Whole-graph embedding export in ONE dispatch: fori_loop over the
    dummy-padded node-id stream, l2-normalized rows into a device buffer
    (the per-batch feed loop at reference unsupervised_train.py:94-117
    costs one ~40ms tunnel round-trip per batch on remoted TPUs).

    sweep(params, features, adj, ids_all, rng) -> [n_b*B, dim]
    """
    from graphsage_tpu.models.graphsage import l2_normalize, sage_embed

    def sweep(params, features, adj, ids_all, rng):
        n_b = ids_all.shape[0] // batch_size

        def body(i, buf):
            ids = jax.lax.dynamic_slice(
                ids_all, (i * batch_size,), (batch_size,)
            )
            out = sage_embed(params, features, adj, ids, rng,
                             config.sage, deterministic=True)
            out = l2_normalize(out, 1)
            return jax.lax.dynamic_update_slice(
                buf, out, (i * batch_size, 0)
            )

        init = jnp.zeros((n_b * batch_size, config.sage.output_dim))
        return jax.lax.fori_loop(0, n_b, body, init)

    return jax.jit(sweep)


def make_unsup_eval_step(config: UnsupervisedConfig):
    def eval_step(params, features, adj, b1, b2, mask, neg_cdf, rng):
        loss, aux = unsupervised_loss(
            params, features, adj, b1, b2, mask, neg_cdf, rng, config,
            deterministic=True,
        )
        return loss, aux["mrr"]

    return jax.jit(eval_step)


def make_unsup_eval_sweep(config: UnsupervisedConfig, batch_size: int,
                          num_nodes: int):
    """Full val-edge-set evaluation in ONE dispatch (the reference's
    validate_batch_size=-1 / ``val_feed_dict(size=None)`` semantics,
    unsupervised_train.py:72-77, minibatch.py:137-144): fori_loop over a
    device-resident dummy-padded pair stream; returns the edge-weighted
    mean (loss, mrr) over every real pair.
    """

    def sweep(params, features, adj, pairs_all, neg_cdf, rng):
        n_b = pairs_all.shape[0] // batch_size

        def body(i, acc):
            loss_sum, mrr_sum, cnt = acc
            pair = jax.lax.dynamic_slice(
                pairs_all, (i * batch_size, 0), (batch_size, 2)
            )
            b1, b2 = pair[:, 0], pair[:, 1]
            mask = (b1 != num_nodes).astype(jnp.float32)
            loss, aux = unsupervised_loss(
                params, features, adj, b1, b2, mask, neg_cdf, rng, config,
                deterministic=True,
            )
            k = jnp.sum(mask)
            return (loss_sum + loss * k, mrr_sum + aux["mrr"] * k, cnt + k)

        loss_sum, mrr_sum, cnt = jax.lax.fori_loop(
            0, n_b, body, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        )
        cnt = jnp.maximum(cnt, 1.0)
        return loss_sum / cnt, mrr_sum / cnt

    return jax.jit(sweep)


def pad_pairs(pairs: np.ndarray, batch_size: int, dummy: int) -> np.ndarray:
    """Dummy-pad an [E, 2] pair array to a multiple of batch_size."""
    n_b = max(1, -(-len(pairs) // batch_size))
    out = np.full((n_b * batch_size, 2), dummy, dtype=np.int32)
    out[: len(pairs)] = pairs
    return out


def save_val_embeddings(embed_fn, batcher, graph, out_dir: str, mod=""):
    """Export one embedding row per node to val<mod>.npy + val<mod>.txt
    (original node ids), reference unsupervised_train.py:94-117."""
    rows, nodes, seen = [], [], set()
    pending_out, pending_batches = [], []

    def flush():
        if not pending_out:
            return
        outs = np.asarray(jnp.stack(pending_out))  # one host fetch
        for out, b in zip(outs, pending_batches):
            k = int(b.mask.sum())
            for i in range(k):
                nid = int(b.batch1[i])
                if nid not in seen:
                    seen.add(nid)
                    rows.append(out[i])
                    nodes.append(graph.node_ids[nid])
        pending_out.clear()
        pending_batches.clear()

    for batch in batcher.embed_batches():
        pending_out.append(embed_fn(batch))
        pending_batches.append(batch)
        if len(pending_out) >= 64:
            flush()
    flush()
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"val{mod}.npy"), np.vstack(rows))
    with open(os.path.join(out_dir, f"val{mod}.txt"), "w") as fp:
        fp.write("\n".join(map(str, nodes)))


def train(flags: TrainFlags, graph=None) -> dict:
    if graph is None:
        print("Loading training data..")
        graph = load_data(flags.train_prefix, load_walks=flags.random_context,
                          load_features=not flags.defer_features,
                          degree_relabel=flags.degree_relabel)
        print("Done loading training data..")

    train_adj_np, deg, full_adj_np = build_both_adjs(
        graph, flags.max_degree, seed=flags.seed
    )
    context_pairs = graph.walks if flags.random_context else None
    batcher = EdgeBatcher(
        graph, deg, flags.batch_size, context_pairs=context_pairs,
        seed=flags.seed,
    )
    log_dir = flags.log_dir("unsupervised")

    if flags.model == "n2v":
        # n2v is embedding-only: never materialize a deferred table
        return _train_n2v(flags, graph, deg, batcher, log_dir)

    if flags.graph_shards > 1:
        return _train_sharded(flags, graph, deg, batcher, log_dir,
                              train_adj_np, full_adj_np)

    # Deferred table but a single-device run: materialize it fully into
    # a copy (per-host shard loading only pays off under --graph_shards).
    from graphsage_tpu.data.io import materialize_features

    graph = materialize_features(graph)

    config = build_unsupervised_config(flags, graph)
    feats_np = graph.padded_features()
    if feats_np is not None and flags.fused_gather:
        from graphsage_tpu.ops.gather import pad_feature_dim

        feats_np = pad_feature_dim(feats_np)
    features = None if feats_np is None else jnp.asarray(
        feats_np, dtype=jnp.dtype(flags.feature_dtype)
    )
    train_adj = jnp.asarray(train_adj_np)
    full_adj = jnp.asarray(full_adj_np)
    neg_cdf = jnp.asarray(unigram_cdf(deg))

    key = jax.random.key(flags.seed)
    key, init_key = jax.random.split(key)
    params = init_unsupervised_params(init_key, config)
    optimizer = make_optimizer(flags.learning_rate)
    opt_state = optimizer.init(params)

    # Device-resident epoch stream (see supervised.py): padded edge pairs
    # on device, permuted per epoch, chunked dispatches via lax.fori_loop.
    from graphsage_tpu.parallel.dp import make_unsupervised_chunk_runner

    B = flags.batch_size
    dummy = graph.num_nodes
    train_pairs = batcher.train_pairs
    steps_per_epoch = max(1, -(-len(train_pairs) // B))
    pairs_padded = np.full((steps_per_epoch * B, 2), dummy, dtype=np.int32)
    pairs_padded[: len(train_pairs)] = train_pairs
    pairs_padded_dev = jnp.asarray(pairs_padded)

    if flags.data_shards > 1:
        # P1 pure data parallelism (parallel/dp.py)
        from jax.sharding import Mesh

        from graphsage_tpu.parallel.dp import (
            make_dp_unsupervised_chunk_runner,
        )

        Ddp = flags.data_shards
        assert B % Ddp == 0, "batch_size must divide data_shards"
        devices = jax.devices()
        if len(devices) < Ddp:
            devices = jax.devices("cpu")
        assert len(devices) >= Ddp, (
            f"need {Ddp} devices for --data_shards {Ddp}"
        )
        dp_mesh = Mesh(np.asarray(devices[:Ddp]), ("data",))
        run_chunk = make_dp_unsupervised_chunk_runner(
            config, optimizer, dp_mesh, B
        )
    else:
        run_chunk = jax.jit(
            make_unsupervised_chunk_runner(config, optimizer, B, dummy),
            donate_argnums=(0, 1),
        )

    eval_step = make_unsup_eval_step(config)
    eval_key = jax.random.key(flags.seed + 1)
    full_val = flags.validate_batch_size <= 0
    if full_val:
        eval_sweep = make_unsup_eval_sweep(config, B, dummy)
        val_pairs_dev = jnp.asarray(
            pad_pairs(batcher.val_pairs, B, dummy)
        )

    total_steps = 0
    if flags.checkpoint_dir and flags.resume:
        restored = ckpt.restore(flags.checkpoint_dir, params, opt_state)
        if restored is not None:
            params, opt_state, total_steps = restored
            print(f"Resumed from checkpoint at step {total_steps}")

    from graphsage_tpu.train.tblog import ScalarLogger

    logger = ScalarLogger(log_dir)
    acts_fn = probe_ids = None
    if flags.log_histograms:
        from graphsage_tpu.models.graphsage import make_activations_fn

        acts_fn = make_activations_fn(config.sage)
        probe_ids = jnp.asarray(
            np.resize(np.where(graph.is_train)[0],
                      flags.batch_size).astype(np.int32)
        )
    train_shadow_mrr = None
    shadow_mrr = None
    val_cost = val_mrr = 0.0
    avg_time = 0.0
    timed_steps = 0  # steps timed in THIS process (excludes resumed steps)
    stop = False

    if flags.profile_dir:
        jax.profiler.start_trace(flags.profile_dir)

    train_shadow = jnp.asarray(-1.0)  # <0 sentinel: EMA not initialized
    chunk = max(1, min(flags.print_every, flags.validate_iter))
    for epoch in range(flags.epochs):
        print("Epoch: %04d" % (epoch + 1))
        key, epoch_key, loop_key = jax.random.split(key, 3)
        pairs_perm = jax.random.permutation(
            epoch_key, pairs_padded_dev, axis=0
        )
        it = 0
        while it < steps_per_epoch:
            n = min(chunk, steps_per_epoch - it,
                    max(1, flags.max_total_steps + 1 - total_steps))
            t = time.time()
            params, opt_state, train_shadow, loss, train_mrr = run_chunk(
                params, opt_state, train_shadow, loop_key, features,
                train_adj, pairs_perm, neg_cdf, it, n,
            )

            # validate when [it, it+n) crosses a multiple of validate_iter
            if (it + n - 1) % flags.validate_iter < n:
                if full_val:
                    val_cost, val_mrr = eval_sweep(
                        params, features, full_adj, val_pairs_dev,
                        neg_cdf, eval_key,
                    )
                else:
                    vb = batcher.sample_val_batch(flags.validate_batch_size)
                    val_cost, val_mrr = eval_step(
                        params, features, full_adj,
                        jnp.asarray(vb.batch1), jnp.asarray(vb.batch2),
                        jnp.asarray(vb.mask), neg_cdf, eval_key,
                    )
            if shadow_mrr is None:
                shadow_mrr = val_mrr
            else:
                # The reference applies the 0.99 EMA EVERY step with the
                # (possibly stale) val_mrr (unsupervised_train.py:284-291);
                # a chunk of n steps at constant val_mrr telescopes to one
                # 0.99**n decay toward it.
                shadow_mrr = val_mrr + (shadow_mrr - val_mrr) * 0.99 ** n

            it += n
            total_steps += n
            timed_steps += n
            avg_time = (
                avg_time * (timed_steps - n) + time.time() - t
            ) / timed_steps

            if (total_steps - 1) % flags.print_every < n:
                scal = {
                    "train_loss": float(loss),
                    "train_mrr": float(train_mrr),
                    "train_mrr_ema": float(train_shadow),
                    "val_loss": float(val_cost),
                    "val_mrr": float(val_mrr),
                    "val_mrr_ema": float(shadow_mrr),
                }
                print(
                    "Iter:", "%04d" % (it - 1),
                    "train_loss=", "{:.5f}".format(scal["train_loss"]),
                    "train_mrr=", "{:.5f}".format(scal["train_mrr"]),
                    "train_mrr_ema=", "{:.5f}".format(scal["train_mrr_ema"]),
                    "val_loss=", "{:.5f}".format(scal["val_loss"]),
                    "val_mrr=", "{:.5f}".format(scal["val_mrr"]),
                    "val_mrr_ema=", "{:.5f}".format(scal["val_mrr_ema"]),
                    "time=", "{:.5f}".format(avg_time),
                )
                logger.log(total_steps - 1, step_time=avg_time, **scal)
                if flags.log_histograms:
                    logger.log_histograms(total_steps - 1, params)
                    if acts_fn is not None:
                        logger.log_activations(
                            total_steps - 1,
                            acts_fn(params, features, train_adj,
                                    probe_ids, eval_key),
                        )

            if (flags.checkpoint_dir and flags.checkpoint_every
                    and total_steps % flags.checkpoint_every < n):
                ckpt.save(flags.checkpoint_dir, params, opt_state,
                          total_steps)
            if total_steps > flags.max_total_steps:
                stop = True
                break
        if stop:
            break
    train_shadow_mrr = train_shadow  # for the return dict

    if flags.profile_dir:
        jax.profiler.stop_trace()
    logger.close()

    print("Optimization Finished!")
    if flags.save_embeddings:
        # whole-graph export in ONE dispatch (vs one per batch)
        embed_sweep = make_embed_sweep(config, B, dummy)
        n_b = max(1, -(-graph.num_nodes // B))
        ids_all = np.full((n_b * B,), dummy, dtype=np.int32)
        ids_all[: graph.num_nodes] = np.arange(graph.num_nodes)
        rows = np.asarray(embed_sweep(
            params, features, full_adj, jnp.asarray(ids_all), eval_key
        ))[: graph.num_nodes]
        os.makedirs(log_dir, exist_ok=True)
        np.save(os.path.join(log_dir, "val.npy"), rows)
        with open(os.path.join(log_dir, "val.txt"), "w") as fp:
            fp.write("\n".join(map(str, graph.node_ids)))

    if flags.checkpoint_dir:
        ckpt.save(flags.checkpoint_dir, params, opt_state, total_steps)

    return {
        "params": params,
        "val_loss": float(val_cost),
        "val_mrr": float(val_mrr),
        "shadow_mrr": float(shadow_mrr) if shadow_mrr is not None else 0.0,
        "steps": total_steps,
        "log_dir": log_dir,
    }


def _train_n2v(flags: TrainFlags, graph, deg, batcher: EdgeBatcher,
               log_dir: str) -> dict:
    """DeepWalk/n2v baseline + the post-hoc inductive retrain
    (unsupervised_train.py:324-372)."""
    config = n2v.Node2VecConfig(
        num_nodes=graph.num_nodes + 1,
        dim=2 * flags.dim_1,
        neg_sample_size=flags.neg_sample_size,
        learning_rate=flags.learning_rate,
    )
    key = jax.random.key(flags.seed)
    key, init_key = jax.random.split(key)
    params = n2v.init_node2vec_params(init_key, config)
    optimizer = n2v.make_optimizer(flags.learning_rate)
    opt_state = optimizer.init(params)

    deg_padded = np.concatenate([deg, [0]]).astype(np.float32)
    uni_logits = jnp.asarray(np.asarray(unigram_logits(deg_padded)))

    from graphsage_tpu.parallel.dp import make_node2vec_chunk_runner

    def run_n2v_epochs(params, opt_state, n_epochs, pairs, update_mask,
                      max_steps, verbose):
        """Device-resident chunked epochs over a pair stream (shared by
        the main loop and the inductive retrain)."""
        nonlocal key
        B = flags.batch_size
        dummy = graph.num_nodes
        steps_per_epoch = max(1, -(-len(pairs) // B))
        padded = np.full((steps_per_epoch * B, 2), dummy, dtype=np.int32)
        padded[: len(pairs)] = pairs
        padded_dev = jnp.asarray(padded)

        # update_mask rides as a runner ARGUMENT (a closed-over [N+1]
        # table would embed an O(N) constant in the jit graph — the
        # remote-compile tunnel rejects those, CLAUDE.md)
        run_chunk = jax.jit(
            make_node2vec_chunk_runner(
                config, optimizer, B, dummy,
                with_update_mask=update_mask is not None,
            ),
            donate_argnums=(0, 1),
        )
        mask_dev = (None if update_mask is None
                    else jnp.asarray(update_mask))

        shadow = jnp.asarray(-1.0)
        total = 0
        avg_time = 0.0
        chunk = max(1, flags.print_every)
        stop = False
        for epoch in range(n_epochs):
            if verbose:
                print("Epoch: %04d" % (epoch + 1))
            key, ek, lk = jax.random.split(key, 3)
            perm = jax.random.permutation(ek, padded_dev, axis=0)
            it = 0
            while it < steps_per_epoch:
                n = min(chunk, steps_per_epoch - it,
                        max(1, max_steps + 1 - total))
                t = time.time()
                params, opt_state, shadow, loss, mrr = run_chunk(
                    params, opt_state, shadow, lk, perm, uni_logits, it,
                    n, mask_dev,
                )
                it += n
                total += n
                avg_time = (
                    avg_time * (total - n) + time.time() - t
                ) / total
                if verbose and (total - 1) % flags.print_every < n:
                    print(
                        "Iter:", "%04d" % (it - 1),
                        "train_loss=", "{:.5f}".format(float(loss)),
                        "train_mrr=", "{:.5f}".format(float(mrr)),
                        "train_mrr_ema=", "{:.5f}".format(float(shadow)),
                        "time=", "{:.5f}".format(avg_time),
                    )
                if total > max_steps:
                    stop = True
                    break
            if stop:
                break
        return params, opt_state, total

    params, opt_state, total_steps = run_n2v_epochs(
        params, opt_state, flags.epochs, batcher.train_pairs,
        update_mask=None, max_steps=flags.max_total_steps, verbose=True,
    )

    print("Optimization Finished!")
    if flags.save_embeddings:
        _save_n2v_embeddings(params, batcher, graph, log_dir, mod="")
        # Inductive patch-up: fresh walks over the full graph, retrain with
        # train-node context rows frozen (unsupervised_train.py:324-372).
        pairs = run_random_walks(
            graph.neighbors,
            np.flatnonzero(graph.is_val | graph.is_test),
            rng=np.random.default_rng(flags.seed),
        )
        # fixed_n2v=True matches the reference retrain iterator
        # (unsupervised_train.py:351): context nodes restricted to
        # existing train nodes so frozen rows provide the signal.
        retrain_batcher = EdgeBatcher(
            graph, deg, flags.batch_size, context_pairs=pairs,
            seed=flags.seed, n2v_retrain=True, fixed_n2v=True,
        )
        update_mask = np.zeros((graph.num_nodes + 1,), dtype=np.float32)
        evalnodes = np.flatnonzero(graph.is_val | graph.is_test)
        update_mask[evalnodes] = 1.0
        opt_state = optimizer.init(params)
        params, opt_state, _ = run_n2v_epochs(
            params, opt_state, flags.n2v_test_epochs,
            retrain_batcher.train_pairs,
            update_mask=jnp.asarray(update_mask),
            max_steps=flags.max_total_steps, verbose=False,
        )
        _save_n2v_embeddings(params, batcher, graph, log_dir, mod="-test")

    return {"params": params, "steps": total_steps, "log_dir": log_dir}


def _save_n2v_embeddings(params, batcher, graph, out_dir, mod=""):
    target = np.asarray(params["target"])

    def embed_fn(batch):
        return target[np.asarray(batch.batch1)]

    save_val_embeddings(embed_fn, batcher, graph, out_dir, mod=mod)


def _train_sharded(flags: TrainFlags, graph, deg, batcher: EdgeBatcher,
                   log_dir: str, train_adj_np, full_adj_np) -> dict:
    """--graph_shards N unsupervised path: row-sharded tables + all-to-all
    halo exchange (parallel/graph_sharded.py); host-driven per-batch loop.
    The padded adjacencies arrive from train() — rebuilding them here
    would double the O(N * max_degree) host-ingest cost at startup."""
    from jax.sharding import Mesh

    from jax.sharding import PartitionSpec as P

    from graphsage_tpu.parallel.distributed import put_global
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_unsupervised_eval,
        shard_rows,
        suggest_capacity_factor,
    )

    D = flags.graph_shards
    # Composed P1xP2 (--data_shards M with --graph_shards N): 2-D
    # (data, graph) mesh — see train/supervised.py::_train_sharded.
    Dd = max(flags.data_shards, 1)
    total = D * Dd
    assert flags.batch_size % total == 0, (
        "batch_size must divide data_shards * graph_shards"
    )
    devices = jax.devices()
    if len(devices) < total:
        devices = jax.devices("cpu")
    assert len(devices) >= total, (
        f"need {total} devices for --graph_shards {D} x --data_shards {Dd}"
    )
    if Dd > 1:
        mesh = Mesh(np.asarray(devices[:total]).reshape(Dd, D),
                    ("data", "graph"))
    else:
        mesh = Mesh(np.asarray(devices[:D]), ("graph",))

    config = build_unsupervised_config(flags, graph)
    from graphsage_tpu.train.supervised import _place_sharded_features

    layout = flags.shard_layout
    feat_sh = _place_sharded_features(graph, D, mesh, flags.feature_dtype,
                                      layout,
                                      lane_pad=flags.fused_gather)
    train_adj_sh = put_global(shard_rows(train_adj_np, D, layout)[0],
                              mesh, P("graph"))
    full_adj_sh = put_global(shard_rows(full_adj_np, D, layout)[0],
                             mesh, P("graph"))
    neg_cdf = jnp.asarray(unigram_cdf(deg))
    cap_factor = flags.capacity_factor or suggest_capacity_factor(
        full_adj_np, D, layout=layout
    )
    print(f"graph_shards={D} layout={layout} "
          f"capacity_factor={cap_factor:.2f}"
          + (" (auto)" if not flags.capacity_factor else ""))
    dropped_total = 0

    def note_dropped(dropped, where: str) -> None:
        nonlocal dropped_total
        d = int(dropped)
        if d > 0:
            dropped_total += d
            print(f"WARNING: {where}: {d} gather requests overflowed the "
                  f"all-to-all capacity and returned ZERO rows "
                  f"(capacity_factor={cap_factor:.2f}; total dropped "
                  f"{dropped_total}). Raise --capacity_factor.")

    key = jax.random.key(flags.seed)
    key, init_key = jax.random.split(key)
    params = init_unsupervised_params(init_key, config)
    if config.sage.identity_dim > 0:
        params["embeds"] = put_global(
            shard_rows(np.asarray(params["embeds"]), D, layout)[0], mesh,
            P("graph"),
        )
    from graphsage_tpu.parallel.distributed import replicate_unsharded

    params = replicate_unsharded(params, mesh)
    optimizer = make_optimizer(flags.learning_rate)
    opt_state = replicate_unsharded(optimizer.init(params), mesh)

    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_unsupervised_chunk_runner,
    )

    run_chunk = make_sharded_unsupervised_chunk_runner(
        config, optimizer, mesh, flags.batch_size,
        capacity_factor=cap_factor,
        params_like=params, opt_state_like=opt_state,
        data_axis="data" if Dd > 1 else None,
    )
    eval_step = make_sharded_unsupervised_eval(
        config, mesh, capacity_factor=cap_factor, params_like=params
    )
    eval_key = jax.random.key(flags.seed + 1)

    # device-resident pair stream (global; shards slice locally)
    B = flags.batch_size
    dummy = graph.num_nodes
    train_pairs = batcher.train_pairs
    steps_per_epoch = max(1, -(-len(train_pairs) // B))
    pairs_padded = np.full((steps_per_epoch * B, 2), dummy, dtype=np.int32)
    pairs_padded[: len(train_pairs)] = train_pairs
    pairs_padded_dev = jnp.asarray(pairs_padded)

    full_val = flags.validate_batch_size <= 0
    if full_val:
        from graphsage_tpu.parallel.graph_sharded import (
            make_sharded_unsup_eval_sweep,
        )

        eval_sweep = make_sharded_unsup_eval_sweep(
            config, mesh, B, capacity_factor=cap_factor,
            params_like=params, data_axis="data" if Dd > 1 else None,
        )
        val_pairs_dev = jnp.asarray(pad_pairs(batcher.val_pairs, B, dummy))

    total_steps = 0
    # Checkpoints store the identity table in CANONICAL id order so a
    # run can resume under a different --shard_layout / --graph_shards
    # (parallel/graph_sharded.py::embeds_to_canonical).
    from graphsage_tpu.parallel.graph_sharded import (
        embeds_to_canonical,
        embeds_to_device_layout,
    )

    def ckpt_save(step):
        ckpt.save(flags.checkpoint_dir,
                  embeds_to_canonical(params, D, layout),
                  embeds_to_canonical(opt_state, D, layout), step)

    if flags.checkpoint_dir and flags.resume:
        restored = ckpt.restore(flags.checkpoint_dir, params, opt_state)
        if restored is not None:
            params, opt_state, total_steps = restored
            params = embeds_to_device_layout(params, D, layout)
            opt_state = embeds_to_device_layout(opt_state, D, layout)
            print(f"Resumed from checkpoint at step {total_steps}")

    from graphsage_tpu.train.tblog import ScalarLogger

    logger = ScalarLogger(log_dir)
    shadow = jnp.asarray(-1.0)
    shadow_mrr = None
    val_cost = val_mrr = 0.0
    avg_time = 0.0
    timed_steps = 0
    stop = False
    # Overflow drops accumulate ON DEVICE (async add, no fetch) so every
    # chunk's count is surfaced, while the host still syncs only at
    # print boundaries.
    pending_dropped = jnp.zeros((), jnp.int32)
    if flags.profile_dir:
        jax.profiler.start_trace(flags.profile_dir)
    chunk = max(1, min(flags.print_every, flags.validate_iter))
    for epoch in range(flags.epochs):
        print("Epoch: %04d" % (epoch + 1))
        key, epoch_key, loop_key = jax.random.split(key, 3)
        pairs_perm = jax.random.permutation(
            epoch_key, pairs_padded_dev, axis=0
        )
        it = 0
        while it < steps_per_epoch:
            n = min(chunk, steps_per_epoch - it,
                    max(1, flags.max_total_steps + 1 - total_steps))
            t = time.time()
            params, opt_state, shadow, loss, mrr, dropped = run_chunk(
                params, opt_state, shadow, loop_key, feat_sh,
                train_adj_sh, pairs_perm, neg_cdf, it, n,
            )
            pending_dropped = pending_dropped + dropped
            if (it + n - 1) % flags.validate_iter < n:
                if full_val:
                    val_cost, val_mrr, vdropped = eval_sweep(
                        params, feat_sh, full_adj_sh, val_pairs_dev,
                        neg_cdf, eval_key,
                    )
                else:
                    vb = batcher.sample_val_batch(flags.validate_batch_size)
                    val_cost, val_mrr, vdropped = eval_step(
                        params, feat_sh, full_adj_sh,
                        jnp.asarray(vb.batch1), jnp.asarray(vb.batch2),
                        jnp.asarray(vb.mask), neg_cdf, eval_key,
                    )
                note_dropped(vdropped, "validation")
            if shadow_mrr is None:
                shadow_mrr = val_mrr
            else:
                # per-step 0.99 EMA telescoped over the n-step chunk
                shadow_mrr = val_mrr + (shadow_mrr - val_mrr) * 0.99 ** n
            it += n
            total_steps += n
            timed_steps += n
            avg_time = (
                avg_time * (timed_steps - n) + time.time() - t
            ) / timed_steps
            if (total_steps - 1) % flags.print_every < n:
                note_dropped(pending_dropped, "train chunks")
                pending_dropped = jnp.zeros((), jnp.int32)
                scal = {
                    "train_loss": float(loss),
                    "train_mrr": float(mrr),
                    "train_mrr_ema": float(shadow),
                    "val_loss": float(val_cost),
                    "val_mrr": float(val_mrr),
                    "val_mrr_ema": float(shadow_mrr),
                }
                print(
                    "Iter:", "%04d" % (it - 1),
                    "train_loss=", "{:.5f}".format(scal["train_loss"]),
                    "train_mrr=", "{:.5f}".format(scal["train_mrr"]),
                    "train_mrr_ema=", "{:.5f}".format(
                        scal["train_mrr_ema"]),
                    "val_loss=", "{:.5f}".format(scal["val_loss"]),
                    "val_mrr=", "{:.5f}".format(scal["val_mrr"]),
                    "val_mrr_ema=", "{:.5f}".format(scal["val_mrr_ema"]),
                    "time=", "{:.5f}".format(avg_time),
                )
                logger.log(total_steps - 1, step_time=avg_time, **scal)
                if flags.log_histograms:
                    logger.log_histograms(total_steps - 1, params)
            if (flags.checkpoint_dir and flags.checkpoint_every
                    and total_steps % flags.checkpoint_every < n):
                ckpt_save(total_steps)
            if total_steps > flags.max_total_steps:
                stop = True
                break
        if stop:
            break
    train_shadow_mrr = shadow

    if flags.profile_dir:
        jax.profiler.stop_trace()
    note_dropped(pending_dropped, "train chunks")
    logger.close()

    print("Optimization Finished!")
    if flags.save_embeddings:
        # whole-graph export in ONE dispatch (fori_loop inside shard_map)
        from graphsage_tpu.parallel.graph_sharded import (
            make_sharded_embed_sweep,
            reassemble_sharded_rows,
        )

        embed_sweep = make_sharded_embed_sweep(
            config, mesh, B, capacity_factor=cap_factor,
            params_like=params, data_axis="data" if Dd > 1 else None,
        )
        n_b = max(1, -(-graph.num_nodes // B))
        ids_all = np.full((n_b * B,), dummy, dtype=np.int32)
        ids_all[: graph.num_nodes] = np.arange(graph.num_nodes)
        out_sh, edropped = embed_sweep(
            params, feat_sh, full_adj_sh, jnp.asarray(ids_all),
            jax.random.key(flags.seed + 2),
        )
        note_dropped(edropped, "embedding export")
        rows = reassemble_sharded_rows(out_sh, D * Dd,
                                       n_b)[: graph.num_nodes]
        os.makedirs(log_dir, exist_ok=True)
        np.save(os.path.join(log_dir, "val.npy"), rows)
        with open(os.path.join(log_dir, "val.txt"), "w") as fp:
            fp.write("\n".join(map(str, graph.node_ids)))

    if flags.checkpoint_dir:
        ckpt_save(total_steps)

    return {
        "params": params,
        "val_loss": float(val_cost),
        "val_mrr": float(val_mrr),
        "shadow_mrr": (
            float(train_shadow_mrr) if train_shadow_mrr is not None else 0.0
        ),
        "steps": total_steps,
        "log_dir": log_dir,
    }
