"""Supervised training loop (reference supervised_train.py:122-330).

TPU-native restructuring of the reference's sess.run loop: the whole
train step (sample -> aggregate -> head -> loss -> grad -> Adam) is one
jitted function; the train/full adjacency swap (reference tf.assign at
:260-261) is just passing a different same-shaped device array, which
re-uses the compiled executable.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.data.io import load_data
from graphsage_tpu.data.minibatch import NodeBatcher
from graphsage_tpu.models.graphsage import SAGEConfig
from graphsage_tpu.models.supervised import (
    SupervisedConfig,
    init_supervised_params,
    make_optimizer,
    supervised_loss,
    supervised_predict,
)
from graphsage_tpu.train import checkpoint as ckpt
from graphsage_tpu.train.config import TrainFlags, build_layer_infos
from graphsage_tpu.train.metrics import calc_f1


def build_supervised_config(flags: TrainFlags, graph) -> SupervisedConfig:
    agg, concat, layers = build_layer_infos(flags, supervised=True)
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
    return SupervisedConfig(
        sage=sage,
        num_classes=graph.num_classes,
        sigmoid_loss=flags.sigmoid,
        weight_decay=flags.weight_decay,
    )


def make_eval_step(config: SupervisedConfig):
    """jitted (loss, preds) on a fixed-shape batch, no dropout."""

    def eval_step(params, features, adj, ids, labels, mask, rng):
        loss, logits = supervised_loss(
            params, features, adj, ids, labels, mask, rng, config,
            deterministic=True,
        )
        return loss, supervised_predict(logits, config)

    return jax.jit(eval_step)


def make_eval_sweep(config: SupervisedConfig, batch_size: int,
                    num_nodes: int):
    """Whole-sweep evaluation in ONE dispatch: fori_loop over batches of
    a device-resident padded id stream (dummy-padded, masked). Returns
    (per-batch losses [n_b], flat preds [n_b*B, C]); one compile per
    distinct stream length, cached.

    sweep(params, features, adj, ids_all, labels_table, rng)
    """

    def sweep(params, features, adj, ids_all, labels_table, rng):
        n_b = ids_all.shape[0] // batch_size

        def body(i, acc):
            losses, preds = acc
            ids = jax.lax.dynamic_slice(
                ids_all, (i * batch_size,), (batch_size,)
            )
            labels = jnp.take(labels_table, ids, axis=0)
            mask = (ids != num_nodes).astype(jnp.float32)
            loss, logits = supervised_loss(
                params, features, adj, ids, labels, mask, rng, config,
                deterministic=True,
            )
            p = supervised_predict(logits, config)
            return (
                losses.at[i].set(loss),
                jax.lax.dynamic_update_slice(preds, p, (i * batch_size, 0)),
            )

        init = (
            jnp.zeros((n_b,)),
            jnp.zeros((n_b * batch_size, config.num_classes)),
        )
        return jax.lax.fori_loop(0, n_b, body, init)

    return jax.jit(sweep)


def _run_eval_sweep(sweep_fn, params, features, adj, nodes, labels_np,
                    batch_size: int, num_nodes: int, rng):
    """Device-resident sweep wrapper -> (mean loss, preds, labels, dt)."""
    t0 = time.time()
    n_b = max(1, -(-len(nodes) // batch_size))
    ids_all = np.full((n_b * batch_size,), num_nodes, dtype=np.int32)
    ids_all[: len(nodes)] = nodes
    labels_table = np.zeros(
        (num_nodes + 1, labels_np.shape[1]), dtype=np.float32
    )
    labels_table[: labels_np.shape[0]] = labels_np
    losses, preds = sweep_fn(
        params, features, adj, jnp.asarray(ids_all),
        jnp.asarray(labels_table), rng,
    )
    preds = np.asarray(preds)[: len(nodes)]
    labels = labels_np[nodes]
    return float(np.mean(np.asarray(losses))), preds, labels, (
        time.time() - t0
    )


def train(flags: TrainFlags, graph=None) -> dict:
    if graph is None:
        print("Loading training data..")
        graph = load_data(flags.train_prefix,
                          load_features=not flags.defer_features,
                          degree_relabel=flags.degree_relabel)
        print("Done loading training data..")

    if flags.graph_shards > 1:
        if flags.n_model_shards > 1:
            raise ValueError(
                "--n_model_shards (feature-dim TP over a pjit mesh) does "
                "not compose with --graph_shards (shard_map halo "
                "exchange); combine --graph_shards with --data_shards "
                "instead (2-D data x graph mesh)"
            )
        return _train_sharded(flags, graph)

    # Deferred table but a single-device run: materialize it fully into
    # a copy (per-host shard loading only pays off under --graph_shards).
    from graphsage_tpu.data.io import materialize_features

    graph = materialize_features(graph)

    if flags.n_model_shards > 1:
        # feature-dim TP runs under GSPMD; the Pallas fused gather is an
        # opaque custom call GSPMD cannot partition over the model-split
        # feature table — fall back to the XLA gather path.
        import dataclasses

        flags = dataclasses.replace(flags, fused_gather=False)

    config = build_supervised_config(flags, graph)
    sigmoid = flags.sigmoid

    train_adj_np, deg, full_adj_np = build_both_adjs(
        graph, flags.max_degree, seed=flags.seed
    )
    batcher = NodeBatcher(graph, deg, flags.batch_size, seed=flags.seed)

    feats_np = graph.padded_features()
    if feats_np is not None and flags.fused_gather:
        from graphsage_tpu.ops.gather import pad_feature_dim

        feats_np = pad_feature_dim(feats_np)
    features = None if feats_np is None else jnp.asarray(
        feats_np, dtype=jnp.dtype(flags.feature_dtype)
    )
    train_adj = jnp.asarray(train_adj_np)
    full_adj = jnp.asarray(full_adj_np)

    key = jax.random.key(flags.seed)
    key, init_key = jax.random.split(key)
    params = init_supervised_params(init_key, config)
    optimizer = make_optimizer(flags.learning_rate)
    opt_state = optimizer.init(params)

    # Device-resident epoch stream: the padded train-id array and the
    # label table live on device; each dispatch runs a CHUNK of steps via
    # lax.fori_loop, so the host syncs only at print/validate cadence
    # (per-step feed_dict round-trips are the reference's structural
    # bottleneck, supervised_train.py:270-275 — and cost ~40ms each on
    # remoted TPUs).
    from graphsage_tpu.parallel.dp import make_supervised_chunk_runner

    B = flags.batch_size
    dummy = graph.num_nodes
    train_nodes = batcher.train_nodes
    steps_per_epoch = max(1, -(-len(train_nodes) // B))
    ids_padded = np.full((steps_per_epoch * B,), dummy, dtype=np.int32)
    ids_padded[: len(train_nodes)] = train_nodes
    ids_padded_dev = jnp.asarray(ids_padded)
    labels_table = np.zeros(
        (graph.num_nodes + 1, graph.num_classes), dtype=np.float32
    )
    labels_table[: graph.num_nodes] = graph.labels
    labels_table_dev = jnp.asarray(labels_table)

    # one executable for every chunk size: n_steps is a traced loop bound
    tp_mesh = None
    if flags.n_model_shards > 1:
        # --n_model_shards: ("data","model") mesh; the feature table and
        # layer-0 weights split on the feature axis (parallel/mesh.py),
        # the batch constrained along "data"; XLA inserts the layer-0
        # contraction all-reduce and the grad psums (dp+tp via pjit).
        from graphsage_tpu.parallel.dp import (
            place_graph_arrays,
            place_train_state,
            sage_param_shardings,
        )
        from graphsage_tpu.parallel.mesh import make_mesh

        n_dev = flags.data_shards * flags.n_model_shards
        devices = jax.devices()
        if len(devices) < n_dev:
            devices = jax.devices("cpu")
        assert len(devices) >= n_dev, (
            f"need {n_dev} devices for data_shards x n_model_shards"
        )
        assert B % max(flags.data_shards, 1) == 0
        tp_mesh = make_mesh(n_data=flags.data_shards,
                            n_model=flags.n_model_shards,
                            devices=devices[:n_dev])
        shardings = sage_param_shardings(params, tp_mesh, config.sage,
                                         tp=True)
        params, opt_state = place_train_state(params, optimizer, shardings)
        features, train_adj = place_graph_arrays(
            features, train_adj, tp_mesh, tp=True
        )
        full_adj = jax.device_put(full_adj, train_adj.sharding)
        run_chunk = jax.jit(
            make_supervised_chunk_runner(config, optimizer, B,
                                         mesh=tp_mesh),
            donate_argnums=(0, 1),
        )
    elif flags.data_shards > 1:
        # P1 pure data parallelism: batch split over a ("data",) mesh,
        # replicated tables, psum'd grads (parallel/dp.py)
        from jax.sharding import Mesh

        from graphsage_tpu.parallel.dp import (
            make_dp_supervised_chunk_runner,
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
        run_chunk = make_dp_supervised_chunk_runner(
            config, optimizer, dp_mesh, B
        )
    else:
        run_chunk = jax.jit(
            make_supervised_chunk_runner(config, optimizer, B),
            donate_argnums=(0, 1),
        )

    eval_step = make_eval_step(config)
    eval_sweep = make_eval_sweep(config, B, dummy)
    eval_key = jax.random.key(flags.seed + 1)

    def full_eval(nodes):
        return _run_eval_sweep(
            eval_sweep, params, features, full_adj, nodes, graph.labels,
            B, dummy, eval_key,
        )

    total_steps = 0
    if flags.checkpoint_dir and flags.resume:
        restored = ckpt.restore(flags.checkpoint_dir, params, opt_state)
        if restored is not None:
            params, opt_state, total_steps = restored
            print(f"Resumed from checkpoint at step {total_steps}")

    log_dir = flags.log_dir("supervised")
    from graphsage_tpu.train.tblog import ScalarLogger

    logger = ScalarLogger(log_dir)
    acts_fn = probe_ids = None
    if flags.log_histograms:
        from graphsage_tpu.models.graphsage import make_activations_fn

        acts_fn = make_activations_fn(config.sage)
        probe_ids = jnp.asarray(
            np.resize(np.where(graph.is_train)[0], B).astype(np.int32)
        )
    avg_time = 0.0
    timed_steps = 0  # steps timed in THIS process (excludes resumed steps)
    val_cost = val_f1_mic = val_f1_mac = 0.0
    stop = False

    if flags.profile_dir:
        jax.profiler.start_trace(flags.profile_dir)

    chunk = max(1, min(flags.print_every, flags.validate_iter))
    for epoch in range(flags.epochs):
        print("Epoch: %04d" % (epoch + 1))
        key, epoch_key, loop_key = jax.random.split(key, 3)
        ids_perm = jax.random.permutation(epoch_key, ids_padded_dev)
        it = 0
        while it < steps_per_epoch:
            n = min(chunk, steps_per_epoch - it,
                    max(1, flags.max_total_steps + 1 - total_steps))
            t = time.time()
            params, opt_state, loss, logits, last_ids = run_chunk(
                params, opt_state, loop_key, features, train_adj,
                ids_perm, labels_table_dev, it, n,
            )

            # validate when [it, it+n) crosses a multiple of validate_iter
            if (it + n - 1) % flags.validate_iter < n:
                if flags.validate_batch_size == -1:
                    val_cost, vp, vl, _ = full_eval(batcher.val_nodes)
                    val_f1_mic, val_f1_mac = calc_f1(vl, vp, sigmoid)
                else:
                    vb = batcher.sample_val_batch(flags.validate_batch_size)
                    vloss, vpred = eval_step(
                        params, features, full_adj,
                        jnp.asarray(vb.ids), jnp.asarray(vb.labels),
                        jnp.asarray(vb.mask), eval_key,
                    )
                    val_cost = float(vloss)
                    k = int(vb.mask.sum())
                    val_f1_mic, val_f1_mac = calc_f1(
                        vb.labels[:k], np.asarray(vpred)[:k], sigmoid
                    )

            it += n
            total_steps += n
            timed_steps += n
            avg_time = (
                avg_time * (timed_steps - n) + time.time() - t
            ) / timed_steps

            # Host fetches only at chunk boundaries: each fetch is a full
            # tunnel round-trip (~40ms on remoted TPUs).
            if (total_steps - 1) % flags.print_every < n:
                from graphsage_tpu.parallel.distributed import host_array

                ids_np = host_array(last_ids)
                keep = ids_np != dummy
                preds = supervised_predict(jnp.asarray(host_array(logits)),
                                           config)
                f1_mic, f1_mac = calc_f1(
                    labels_table[ids_np[keep]], np.asarray(preds)[keep],
                    sigmoid,
                )
                train_loss = float(loss)
                print(
                    "Iter:", "%04d" % (it - 1),
                    "train_loss=", "{:.5f}".format(train_loss),
                    "train_f1_mic=", "{:.5f}".format(f1_mic),
                    "train_f1_mac=", "{:.5f}".format(f1_mac),
                    "val_loss=", "{:.5f}".format(val_cost),
                    "val_f1_mic=", "{:.5f}".format(val_f1_mic),
                    "val_f1_mac=", "{:.5f}".format(val_f1_mac),
                    "time=", "{:.5f}".format(avg_time),
                )
                logger.log(
                    total_steps - 1, train_loss=train_loss,
                    train_f1_mic=f1_mic, train_f1_mac=f1_mac,
                    val_loss=val_cost, val_f1_mic=val_f1_mic,
                    val_f1_mac=val_f1_mac, step_time=avg_time,
                )
                if flags.log_histograms:
                    logger.log_histograms(total_steps - 1, params)
                    logger.log_activations(
                        total_steps - 1,
                        acts_fn(params, features, train_adj, probe_ids,
                                eval_key),
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

    if flags.profile_dir:
        jax.profiler.stop_trace()

    print("Optimization Finished!")
    val_cost, vp, vl, duration = full_eval(batcher.val_nodes)
    val_f1_mic, val_f1_mac = calc_f1(vl, vp, sigmoid)
    print(
        "Full validation stats:",
        "loss=", "{:.5f}".format(val_cost),
        "f1_micro=", "{:.5f}".format(val_f1_mic),
        "f1_macro=", "{:.5f}".format(val_f1_mac),
        "time=", "{:.5f}".format(duration),
    )
    with open(log_dir + "/val_stats.txt", "w") as fp:
        fp.write(
            "loss={:.5f} f1_micro={:.5f} f1_macro={:.5f} time={:.5f}".format(
                val_cost, val_f1_mic, val_f1_mac, duration
            )
        )
    logger.log(total_steps, final_val_loss=val_cost,
               final_val_f1_mic=val_f1_mic, final_val_f1_mac=val_f1_mac)
    logger.close()

    print("Writing test set stats to file (don't peak!)")
    test_cost, tp, tl, _ = full_eval(batcher.test_nodes)
    test_f1_mic, test_f1_mac = calc_f1(tl, tp, sigmoid)
    with open(log_dir + "/test_stats.txt", "w") as fp:
        fp.write(
            "loss={:.5f} f1_micro={:.5f} f1_macro={:.5f}".format(
                test_cost, test_f1_mic, test_f1_mac
            )
        )

    if flags.checkpoint_dir:
        ckpt.save(flags.checkpoint_dir, params, opt_state, total_steps)

    return {
        "params": params,
        "val_loss": val_cost,
        "val_f1_mic": val_f1_mic,
        "val_f1_mac": val_f1_mac,
        "test_f1_mic": test_f1_mic,
        "test_f1_mac": test_f1_mac,
        "steps": total_steps,
    }


def _place_sharded_features(graph, D: int, mesh, feature_dtype: str,
                            layout: str = "strided",
                            lane_pad: bool = False):
    """Row-sharded placement of the dummy-padded feature table on the
    ("graph",) mesh.

    In-memory tables go through ``put_global`` (every process holds the
    full host array, contributes its addressable shards). Deferred tables
    (``load_data(load_features=False)``) instead go through
    ``put_global_rows`` + ``load_feature_shard``: each process reads ONLY
    its own shard's row range from the on-disk mmap, so no host ever
    materializes the full table — the multi-host story for feature
    tables larger than one host's RAM (SURVEY §7 stage 7). Deferred
    tables are always train-standardized (the trainers' load contract).

    ``lane_pad`` zero-pads the feature dim to the Pallas lane multiple
    (ops/gather.py::pad_feature_dim) so the fused gather+mean kernel can
    serve the innermost hop — the whole mean on single-shard meshes, the
    local fraction of the split mean at D>1 (graph_sharded.py
    fuse_inner); the sharded forward slices back to ``feature_dim``.
    The padding does inflate outer-hop all-to-all payloads by F_pad/F
    (602->640 at the Reddit shape, +6%) — a good trade against fusing
    the dominant inner gather.
    """
    from jax.sharding import PartitionSpec as P

    from graphsage_tpu.parallel.distributed import (
        put_global,
        put_global_rows,
    )
    from graphsage_tpu.parallel.graph_sharded import shard_rows

    if lane_pad:
        from graphsage_tpu.ops.gather import pad_feature_dim

    feats_np = graph.padded_features()
    if feats_np is not None:
        if lane_pad:
            feats_np = pad_feature_dim(feats_np)
        return put_global(
            shard_rows(feats_np.astype(feature_dtype), D, layout)[0],
            mesh, P("graph"),
        )
    if graph.feature_meta is None:
        return None

    from graphsage_tpu.data.io import feature_stats, load_feature_rows

    n_pad = graph.num_nodes + 1  # + dummy row
    shard_size = -(-n_pad // D)
    stats = feature_stats(graph)  # one chunked mmap pass per host
    F = graph.feature_dim
    F_dev = (pad_feature_dim(np.zeros((1, F), np.float32)).shape[1]
             if lane_pad else F)

    def loader(lo: int, hi: int):
        from graphsage_tpu.parallel.graph_sharded import (
            device_rows_to_node_ids,
        )

        node_ids = device_rows_to_node_ids(
            np.arange(lo, hi), D, shard_size, layout
        )
        rows = load_feature_rows(
            graph, node_ids, stats=stats, dtype=feature_dtype
        )
        if F_dev != F:
            rows = np.pad(rows, [(0, 0), (0, F_dev - F)])
        return rows

    return put_global_rows(
        (shard_size * D, F_dev), feature_dtype, mesh,
        P("graph"), loader,
    )


def _train_sharded(flags: TrainFlags, graph) -> dict:
    """--graph_shards N: row-shard feature/adjacency (and identity) tables
    across an N-device "graph" mesh with all-to-all halo exchange
    (parallel/graph_sharded.py). Host-driven per-batch loop; the batch is
    split along the same axis (data parallel)."""
    from jax.sharding import Mesh

    from jax.sharding import PartitionSpec as P

    from graphsage_tpu.parallel.distributed import (
        host_array,
        put_global,
        replicate_unsharded,
    )
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_eval,
        shard_rows,
        suggest_capacity_factor,
    )

    D = flags.graph_shards
    # Composed P1xP2 (--data_shards M with --graph_shards N): a 2-D
    # (data, graph) mesh — graph sharding within each slice, pure DP
    # across slices (parallel/distributed.py::data_graph_mesh shape).
    # Tables are graph-sharded/data-replicated (their P("graph") specs
    # are unchanged on the 2-D mesh); the train runner AND the full
    # val/test sweeps split the batch over both axes (data-major). Only
    # the per-batch validate_iter eval runs redundantly per data slice —
    # it is one batch, and keeping it graph-split keeps its val-batch
    # padding independent of data_shards.
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

    config = build_supervised_config(flags, graph)
    sigmoid = flags.sigmoid
    train_adj_np, deg, full_adj_np = build_both_adjs(
        graph, flags.max_degree, seed=flags.seed
    )
    batcher = NodeBatcher(graph, deg, flags.batch_size, seed=flags.seed)

    # put_global: every process passes the full table, contributes its
    # addressable row shards (multi-host safe; plain device_put otherwise).
    # Deferred tables instead stream ONLY this host's row range off disk
    # (put_global_rows + load_feature_shard — SURVEY §7 stage 7).
    layout = flags.shard_layout
    feat_sh = _place_sharded_features(graph, D, mesh, flags.feature_dtype,
                                      layout,
                                      lane_pad=flags.fused_gather)
    train_adj_sh = put_global(shard_rows(train_adj_np, D, layout)[0],
                              mesh, P("graph"))
    full_adj_sh = put_global(shard_rows(full_adj_np, D, layout)[0],
                             mesh, P("graph"))
    cap_factor = flags.capacity_factor or suggest_capacity_factor(
        full_adj_np, D, layout=layout
    )
    print(f"graph_shards={D} layout={layout} "
          f"capacity_factor={cap_factor:.2f}"
          + (" (auto)" if not flags.capacity_factor else ""))

    key = jax.random.key(flags.seed)
    key, init_key = jax.random.split(key)
    params = init_supervised_params(init_key, config)
    if config.sage.identity_dim > 0:
        params["embeds"] = put_global(
            shard_rows(np.asarray(params["embeds"]), D, layout)[0], mesh,
            P("graph"),
        )
    params = replicate_unsharded(params, mesh)
    optimizer = make_optimizer(flags.learning_rate)
    opt_state = replicate_unsharded(optimizer.init(params), mesh)

    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_chunk_runner,
    )

    run_chunk = make_sharded_supervised_chunk_runner(
        config, optimizer, mesh, flags.batch_size,
        capacity_factor=cap_factor,
        params_like=params, opt_state_like=opt_state,
        data_axis="data" if Dd > 1 else None,
    )
    eval_step = make_sharded_supervised_eval(
        config, mesh, capacity_factor=cap_factor, params_like=params
    )
    eval_key = jax.random.key(flags.seed + 1)
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

    # device-resident epoch stream (global ids; each shard slices its
    # split inside the runner)
    B = flags.batch_size
    dummy = graph.num_nodes
    train_nodes = batcher.train_nodes
    steps_per_epoch = max(1, -(-len(train_nodes) // B))
    ids_padded = np.full((steps_per_epoch * B,), dummy, dtype=np.int32)
    ids_padded[: len(train_nodes)] = train_nodes
    ids_padded_dev = jnp.asarray(ids_padded)
    labels_table = np.zeros(
        (graph.num_nodes + 1, graph.num_classes), dtype=np.float32
    )
    labels_table[: graph.num_nodes] = graph.labels
    labels_table_dev = jnp.asarray(labels_table)


    # Full val/test sweeps in ONE dispatch each (reference
    # incremental_evaluate, supervised_train.py:91-110): fori_loop inside
    # shard_map over a replicated padded id stream.
    from graphsage_tpu.parallel.graph_sharded import (
        make_sharded_supervised_eval_sweep,
        reassemble_sharded_rows,
    )

    eval_sweep = make_sharded_supervised_eval_sweep(
        config, mesh, flags.batch_size, capacity_factor=cap_factor,
        params_like=params, data_axis="data" if Dd > 1 else None,
    )

    def run_eval(nodes):
        # labels_table_dev (defined below) is bound at call time
        t0 = time.time()
        bs = flags.batch_size
        n_b = max(1, -(-len(nodes) // bs))
        ids_all = np.full((n_b * bs,), graph.num_nodes, dtype=np.int32)
        ids_all[: len(nodes)] = nodes
        losses, preds_sh, dropped = eval_sweep(
            params, feat_sh, full_adj_sh, jnp.asarray(ids_all),
            labels_table_dev, eval_key,
        )
        note_dropped(dropped, "eval sweep")
        preds = reassemble_sharded_rows(preds_sh, D * Dd, n_b)[: len(nodes)]
        labels = graph.labels[nodes]
        return (float(np.mean(np.asarray(losses))), preds, labels,
                time.time() - t0)

    log_dir = flags.log_dir("supervised")
    from graphsage_tpu.train.tblog import ScalarLogger

    logger = ScalarLogger(log_dir)
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
    val_cost = val_f1_mic = val_f1_mac = 0.0
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
        ids_perm = jax.random.permutation(epoch_key, ids_padded_dev)
        it = 0
        while it < steps_per_epoch:
            n = min(chunk, steps_per_epoch - it,
                    max(1, flags.max_total_steps + 1 - total_steps))
            t = time.time()
            params, opt_state, loss, preds, last_ids, dropped = run_chunk(
                params, opt_state, loop_key, feat_sh, train_adj_sh,
                ids_perm, labels_table_dev, it, n,
            )
            pending_dropped = pending_dropped + dropped
            if (it + n - 1) % flags.validate_iter < n:
                vbs = (max(flags.validate_batch_size, 1)
                       if flags.validate_batch_size != -1
                       else flags.batch_size)
                # shard_map splits the batch over the graph axis: pad to a
                # multiple of D (padded rows carry zero mask)
                vb = batcher.sample_val_batch(vbs, pad_to=-(-vbs // D) * D)
                vloss, vpred, vdropped = eval_step(
                    params, feat_sh, full_adj_sh, jnp.asarray(vb.ids),
                    jnp.asarray(vb.labels), jnp.asarray(vb.mask), eval_key,
                )
                note_dropped(vdropped, "validation")
                val_cost = float(vloss)
                k = int(vb.mask.sum())
                val_f1_mic, val_f1_mac = calc_f1(
                    vb.labels[:k], host_array(vpred)[:k], sigmoid
                )
            it += n
            total_steps += n
            timed_steps += n
            avg_time = (
                avg_time * (timed_steps - n) + time.time() - t
            ) / timed_steps
            if (total_steps - 1) % flags.print_every < n:
                note_dropped(pending_dropped, "train chunks")
                pending_dropped = jnp.zeros((), jnp.int32)
                ids_np = host_array(last_ids)
                keep = ids_np != dummy
                f1_mic, f1_mac = calc_f1(
                    labels_table[ids_np[keep]], host_array(preds)[keep],
                    sigmoid,
                )
                train_loss = float(loss)
                print(
                    "Iter:", "%04d" % (it - 1),
                    "train_loss=", "{:.5f}".format(train_loss),
                    "train_f1_mic=", "{:.5f}".format(f1_mic),
                    "val_loss=", "{:.5f}".format(val_cost),
                    "val_f1_mic=", "{:.5f}".format(val_f1_mic),
                    "time=", "{:.5f}".format(avg_time),
                )
                logger.log(
                    total_steps - 1, train_loss=train_loss,
                    train_f1_mic=f1_mic, val_loss=val_cost,
                    val_f1_mic=val_f1_mic, step_time=avg_time,
                )
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

    if flags.profile_dir:
        jax.profiler.stop_trace()
    note_dropped(pending_dropped, "train chunks")

    print("Optimization Finished!")
    val_cost, vp, vl, duration = run_eval(batcher.val_nodes)
    val_f1_mic, val_f1_mac = calc_f1(vl, vp, sigmoid)
    with open(log_dir + "/val_stats.txt", "w") as fp:
        fp.write(
            "loss={:.5f} f1_micro={:.5f} f1_macro={:.5f} time={:.5f}".format(
                val_cost, val_f1_mic, val_f1_mac, duration
            )
        )
    test_cost, tp, tl, _ = run_eval(batcher.test_nodes)
    test_f1_mic, test_f1_mac = calc_f1(tl, tp, sigmoid)
    with open(log_dir + "/test_stats.txt", "w") as fp:
        fp.write(
            "loss={:.5f} f1_micro={:.5f} f1_macro={:.5f}".format(
                test_cost, test_f1_mic, test_f1_mac
            )
        )
    if flags.checkpoint_dir:
        ckpt_save(total_steps)
    logger.log(total_steps, final_val_f1_mic=val_f1_mic,
               final_test_f1_mic=test_f1_mic)
    logger.close()
    return {
        "params": params,
        "val_loss": val_cost,
        "val_f1_mic": val_f1_mic,
        "val_f1_mac": val_f1_mac,
        "test_f1_mic": test_f1_mic,
        "test_f1_mac": test_f1_mac,
        "steps": total_steps,
    }
