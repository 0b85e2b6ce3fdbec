"""P2: graph sharding with all-to-all halo exchange (shard_map).

The reference's scale story is "subsample until one GPU suffices"
(/root/reference/README.md:21); this module is the new first-class
alternative for graphs whose features exceed one chip's HBM: the node
feature table and padded adjacency are row-sharded across a ``graph``
mesh axis, the minibatch is split across the same axis (data parallel),
and every frontier gather becomes a two-phase all-to-all:

  1. bucket the global row ids by owning shard (sort + rank, static
     capacity per destination), all_to_all the request ids;
  2. owners gather their local rows, all_to_all the rows back, unsort.

Bandwidth per gather is ~2 * requests * row_bytes over ICI — independent
of table size — versus a full-table pass for a ring all-gather. Gradients
for replicated params are psum-reduced over the axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

import optax

from graphsage_tpu.parallel.dp import _require_num_nodes
from graphsage_tpu.models.graphsage import (
    SAGEConfig,
    aggregate_pyramid,
)
from graphsage_tpu.nn.sampler import sample_from_rows


def _drop_elems(key, x, rate: float):
    """Element dropout for the sharded split-mean's pre-reduce masks —
    one shared definition of the TF-style semantics (nn/init.py)."""
    from graphsage_tpu.nn.init import dropout

    return dropout(key, x, rate, deterministic=False)


def shard_rows(table, n_shards: int, layout: str = "strided"):
    """Pad a [N, ...] table with zero rows to a multiple of n_shards and
    order rows for contiguous splitting along the mesh axis.

    Returns (device-layout table, shard_size). ``layout`` is the
    row-ownership map:

    - ``"strided"`` (default): shard d owns global rows ``d::n_shards``
      (owner = id % n_shards). Real datasets and the bench graph order
      ids by degree, so contiguous ownership parks every hub on shard 0
      and the halo exchange needs near-worst-case per-destination
      capacity; striding spreads hubs evenly, so capacity sizes to the
      balanced share (benchmarks/halo_probe.py) — the degree-skew load
      balancing the SURVEY flags as a P2 hard part.
    - ``"block"``: shard d owns rows [d*shard_size, (d+1)*shard_size) —
      row ranges stay contiguous on disk (A/B probes, range loaders).

    The returned array is ALWAYS split contiguously (P("graph")); for
    strided the rows are pre-permuted so that contiguous slice d holds
    rows d::n_shards. Use the matching ``layout`` in exchange_gather /
    SAGEConfig.shard_layout or gathers will read scrambled rows.
    """
    import numpy as np

    n = table.shape[0]
    shard_size = -(-n // n_shards)
    pad = shard_size * n_shards - n
    if pad:
        pad_widths = [(0, pad)] + [(0, 0)] * (table.ndim - 1)
        if isinstance(table, np.ndarray):
            table = np.pad(table, pad_widths)
        else:
            table = jnp.pad(table, pad_widths)
    if layout == "strided" and n_shards > 1:
        table = _row_perm_apply(table, n_shards, to_canonical=False)
    return table, shard_size


def _row_perm_apply(table, n_shards: int, to_canonical: bool):
    """Reorder a padded [D*ss, ...] table between the strided device
    layout (device[d*ss+r] = canonical[r*D+d]) and canonical id order."""
    ss = table.shape[0] // n_shards
    if to_canonical:
        # device (D, ss) -> canonical (ss, D)
        return table.reshape((n_shards, ss) + table.shape[1:]).swapaxes(
            0, 1).reshape(table.shape)
    return table.reshape((ss, n_shards) + table.shape[1:]).swapaxes(
        0, 1).reshape(table.shape)


def device_rows_to_node_ids(device_rows, n_shards: int, shard_size: int,
                            layout: str = "strided"):
    """Node ids held at the given DEVICE-layout row indices — the
    inverse of :func:`shard_rows`'s ordering, for loaders that read a
    device-row range straight off disk (e.g. per-host deferred feature
    loading). Strided: device row d*ss + r holds node r*D + d."""
    if layout == "strided" and n_shards > 1:
        return ((device_rows % shard_size) * n_shards
                + device_rows // shard_size)
    return device_rows


def _map_embeds_leaves(tree, fn):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: (
            fn(x) if "embeds" in jax.tree_util.keystr(path) else x
        ),
        tree,
    )


def embeds_to_canonical(tree, n_shards: int, layout: str):
    """Checkpoint canonicalization: reorder every 'embeds' leaf (the
    identity table and its optimizer moments) from the device layout to
    canonical id order. Checkpoints ALWAYS store canonical order, so a
    run may save under one --shard_layout/--graph_shards and resume
    under another (pad rows return to the tail, where the relaxed
    cross-shard-count restore pads/truncates them exactly)."""
    if layout != "strided" or n_shards <= 1:
        return tree
    return _map_embeds_leaves(
        tree, lambda x: _row_perm_apply(x, n_shards, True))


def embeds_to_device_layout(tree, n_shards: int, layout: str):
    """Inverse of :func:`embeds_to_canonical` (after a restore)."""
    if layout != "strided" or n_shards <= 1:
        return tree
    return _map_embeds_leaves(
        tree, lambda x: _row_perm_apply(x, n_shards, False))


def exchange_gather(local, idx, axis_name: str, capacity: int,
                    return_dropped: bool = False,
                    split_local: bool = True,
                    layout: str = "strided",
                    remote_only: bool = False):
    """Gather global rows from a row-sharded table via all-to-all.

    Args:
      local: [shard_size, ...] this device's rows (built by
        :func:`shard_rows` with the SAME ``layout``).
      idx: [m] int32 global row ids (may point at any shard).
      layout: row-ownership map — "strided" (owner = id % D, local row =
        id // D) or "block" (owner = id // shard_size, local row =
        id % shard_size). Must match how the table was sharded.
      capacity: static per-destination request budget. Requests beyond it
        are dropped and return zero rows — size it to the worst case for
        exactness (m covers everything).
      return_dropped: also return the number of THIS device's requests
        that overflowed the budget (int32 scalar) so callers can surface
        silent zero-row corruption instead of hiding it.
      split_local: serve requests whose rows this device already owns
        with a direct local gather instead of routing them through the
        two all-to-alls. Bit-identical output (the same rows either
        way), but (a) local requests stop consuming the per-destination
        capacity budget and can never drop, and (b) the local gather
        has no data dependency on the collectives, so XLA's scheduler
        overlaps it with the in-flight all-to-all — the single-gather
        piece of the SURVEY §5.8 compute/comm-overlap design. Pass
        False to reproduce the round-2 blocking formulation for A/B
        probes.
      remote_only: do NOT gather this device's own rows at all — local
        requests return ZERO rows (they still skip the capacity budget,
        as with split_local). For callers that serve the local fraction
        themselves and add the two partial results (the split-local
        fused inner hop, sharded_sage_embed).

    Returns [m, ...] rows (and the dropped count if requested).
    """
    D = jax.lax.axis_size(axis_name)
    shard_size = local.shape[0]
    m = idx.shape[0]
    bshape = (m,) + (1,) * (local.ndim - 1)
    split_local = split_local or remote_only

    if layout == "strided":
        owner = (idx % D).astype(jnp.int32)
        local_of = lambda i: (i // D).astype(jnp.int32)  # noqa: E731
    else:
        owner = (idx // shard_size).astype(jnp.int32)
        local_of = lambda i: (i % shard_size).astype(jnp.int32)  # noqa: E731

    if split_local and D == 1:
        if remote_only:
            rows = jnp.zeros((m,) + local.shape[1:], local.dtype)
        else:
            rows = jnp.take(local, local_of(idx), axis=0)
        if return_dropped:
            return rows, jnp.zeros((), jnp.int32)
        return rows

    if split_local:
        me = jax.lax.axis_index(axis_name)
        is_local = owner == me
        if not remote_only:
            local_rows = jnp.take(
                local, jnp.where(is_local, local_of(idx), 0), axis=0
            )
            local_rows = jnp.where(is_local.reshape(bshape), local_rows, 0)
        # Route local requests to sentinel segment D: they vanish from
        # the capacity accounting and from the send buffer (OOB scatter
        # rows drop), leaving the budget entirely to remote requests.
        owner = jnp.where(is_local, D, owner)

    order = jnp.argsort(owner, stable=True)
    sorted_idx = idx[order]
    sorted_owner = owner[order]

    counts = jax.ops.segment_sum(
        jnp.ones((m,), jnp.int32), owner, num_segments=D + 1
    )
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(m, dtype=jnp.int32) - starts[sorted_owner]
    remote = sorted_owner < D
    valid = (rank < capacity) & remote

    # [D, capacity] local offsets into the owner's shard; overflow ranks
    # and sentinel owners index out of bounds and drop in the scatter.
    send = jnp.zeros((D, capacity), jnp.int32).at[
        jnp.where(valid, sorted_owner, D), jnp.where(valid, rank, 0)
    ].set(local_of(sorted_idx), mode="drop")

    # requests to me, one row per source device
    recv = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
    rows = jnp.take(local, recv.reshape(-1), axis=0).reshape(
        (D, capacity) + local.shape[1:]
    )
    # rows[s] = rows requested by device s; send each back to s
    resp = jax.lax.all_to_all(rows, axis_name, 0, 0, tiled=True)
    # resp[d, r] = row for my r-th request to owner d
    gathered = resp[
        jnp.clip(sorted_owner, 0, D - 1), jnp.clip(rank, 0, capacity - 1)
    ]
    gathered = jnp.where(valid.reshape(bshape), gathered, 0)
    # invert the permutation with one O(m) scatter — a second argsort
    # would be another full device sort on the hot halo-exchange path
    inv = jnp.zeros((m,), jnp.int32).at[order].set(
        jnp.arange(m, dtype=jnp.int32)
    )
    out = gathered[inv]
    if split_local and not remote_only:
        out = jnp.where(is_local.reshape(bshape), local_rows, out)
    dropped = jnp.sum((~valid & remote).astype(jnp.int32))
    if return_dropped:
        return out, dropped
    return out


# Frontiers at or below this size use EXACT capacity (= m): the all-to-all
# send buffer is D*m rows, affordable for small gathers, and overflow
# becomes structurally impossible there.
EXACT_CAPACITY_MAX = 4096


def _capacity(m: int, n_shards: int, factor: float) -> int:
    """Static per-destination budget: balanced share x safety factor,
    clipped to m (which is always exact). Small frontiers are exact."""
    if m <= EXACT_CAPACITY_MAX:
        return m
    return int(min(m, max(1, -(-m // n_shards) * factor)))


def suggest_capacity_factor(adj, n_shards: int, margin: float = 1.5,
                            layout: str = "strided") -> float:
    """Auto-size the per-destination safety factor from the adjacency's
    shard-ownership histogram — the stationary distribution of one-hop
    frontier requests under uniform batch sampling. ``margin`` covers
    batch-to-batch fluctuation around that stationary skew; the runtime
    dropped-request counters (exchange_gather return_dropped) remain the
    ground truth. ``layout`` must match the tables' shard_rows layout
    (strided ownership flattens degree-rank skew, so its factor lands
    near 1; block ownership inherits the full hub skew).
    """
    import numpy as np

    adj = np.asarray(adj)
    flat = adj.ravel()
    if layout == "strided":
        counts = np.bincount(flat % n_shards, minlength=n_shards)
    else:
        n_rows = adj.shape[0]
        shard_size = -(-n_rows // n_shards)  # matches shard_rows padding
        counts = np.bincount(flat // shard_size, minlength=n_shards)
    mean = max(counts.mean(), 1.0)
    factor = float(counts.max()) / mean * margin
    return float(min(n_shards, max(1.0, factor)))


def _global_masked_mrr(mrr, mask, axis_name: str):
    """Exact global masked-mean MRR from per-shard masked means.

    ``mrr`` is mrr_and_ranks' per-shard sum(rr*mask)/max(sum(mask),1);
    a plain pmean would weight all shards equally, biasing the value low
    whenever a shard's contiguous slice of a dummy-padded tail batch is
    all padding (its mrr=0, cnt=0). Recover the masked sums and reduce
    psum(rr_sum)/psum(cnt) instead (the form parallel/dp.py uses).
    """
    cnt = jnp.sum(mask)
    return jax.lax.psum(mrr * cnt, axis_name) / jnp.maximum(
        jax.lax.psum(cnt, axis_name), 1.0
    )


def _embeds_spec_tree(tree, axis_name: str):
    """PartitionSpec pytree: P(axis) for 'embeds' leaves (row-sharded
    identity table), P() (replicated) elsewhere."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: (
            P(axis_name)
            if "embeds" in jax.tree_util.keystr(path) else P()
        ),
        tree,
    )


def _psum_except_embeds(grads, axis_name, data_axis: str | None = None):
    """psum replicated-param grads; the sharded identity-table grad is
    already the full cross-device scatter-add (all_to_all transpose)
    WITHIN a graph-axis group — under a composed ("data", "graph") mesh
    each data slice holds a partial batch, so 'embeds' grads still psum
    over the data axis (they are graph-sharded, data-replicated)."""
    red = (data_axis, axis_name) if data_axis else axis_name
    return jax.tree_util.tree_map_with_path(
        lambda path, g: (
            (jax.lax.psum(g, data_axis) if data_axis else g)
            if "embeds" in jax.tree_util.keystr(path)
            else jax.lax.psum(g, red)
        ),
        grads,
    )


def _fold_shard(rng, axis_name, data_axis: str | None = None):
    """Per-shard RNG stream: fold the (composed, data-major) device index
    so dropout masks and independent-sampler draws differ across shards —
    the dp.py convention; a replicated rng would repeat one mask pattern
    across every shard's batch slice. Deterministic paths (first_k
    sampler, dropout=0) never consume rng, preserving the P2 bit-parity
    invariant."""
    me, _ = _composed_me(axis_name, data_axis)
    return jax.random.fold_in(rng, me)


def _composed_me(axis_name, data_axis: str | None,
                 graph_major: bool = False):
    """(composed shard index, total shard count) on an optionally
    composed (data, graph) mesh — the ONE place the batch-slicing index
    composition lives, so an ordering fix cannot silently miss a site.

    Data-major (default, ``d * D_graph + g``) matches the device order
    of ``P((data, graph))`` row outputs — required wherever per-shard
    rows are stacked into a sharded output buffer. ``graph_major``
    (``g * D_data + d``) nests each graph shard's 1-D slice range
    across the data axis; the scalar-output unsup eval sweep uses it so
    every pair keeps the graph-shard owner (and negative set) it had on
    the 1-D mesh."""
    D = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    if data_axis:
        Dd = jax.lax.axis_size(data_axis)
        d = jax.lax.axis_index(data_axis)
        me = (me * Dd + d) if graph_major else (d * D + me)
        D = D * Dd
    return me, D


def _check_batch_divisible(mesh, batch_size: int, axis_name: str,
                           data_axis: str | None):
    """Builder-time guard for every runner/sweep that slices a
    replicated stream by ``batch_size // total_shards``: a
    non-divisible batch would silently evaluate only
    ``total * (batch_size // total)`` of each batch's rows and
    misalign stacked row outputs against the id stream."""
    total = mesh.shape[axis_name]
    if data_axis:
        total *= mesh.shape[data_axis]
    if batch_size % total != 0:
        raise ValueError(
            f"batch_size {batch_size} must be divisible by the total "
            f"shard count {total} ({axis_name}={mesh.shape[axis_name]}"
            + (f" x {data_axis}={mesh.shape[data_axis]}" if data_axis
               else "") + ")"
        )


def _sup_per_node_xent(sup_config, params, feat_local, adj_local, ids,
                       labels, rng, axis_name, capacity_factor,
                       deterministic):
    """Per-node masked-xent building block shared by every sharded
    supervised path (step, chunk runner, eval, eval sweep): embed →
    l2-normalize → dense head → per-node xent (sigmoid xents divided by
    num_classes, reference supervised_models.py loss). One body so a
    semantics fix cannot silently miss a copy.

    Returns (per_node [b], logits [b, C], dropped scalar)."""
    from graphsage_tpu.models.graphsage import l2_normalize
    from graphsage_tpu.models.supervised import (
        _sigmoid_xent,
        _softmax_xent,
    )
    from graphsage_tpu.nn.dense import apply_dense

    emb, dropped = sharded_sage_embed(
        params, feat_local, adj_local, ids, rng, sup_config.sage,
        axis_name, capacity_factor, deterministic=deterministic,
        return_stats=True,
    )
    emb = l2_normalize(emb, axis=1)
    # Head-input dropout, like the single-device path (models/
    # supervised.py supervised_logits; reference supervised_models.py
    # builds node_pred with dropout=placeholders['dropout']). Same
    # fold_in tag 7; rng here is already per-shard/per-step folded, so
    # shards realize independent masks.
    logits = apply_dense(
        params["head"], emb, act=None,
        dropout_rate=sup_config.sage.dropout,
        rng=jax.random.fold_in(rng, 7),
        deterministic=deterministic,
    )
    if sup_config.sigmoid_loss:
        per_node = _sigmoid_xent(logits, labels) / sup_config.num_classes
    else:
        per_node = _softmax_xent(logits, labels)
    return per_node, logits, dropped


def _decay_sum(params, sage_config, weight_decay, head: bool = False):
    """Undivided weight-decay sum — the exact term the single-device
    supervised_loss/unsupervised_loss add (models/supervised.py:112-117).
    Used directly by the sharded EVAL paths, whose xent is already
    psum'd (every shard holds the replicated global loss, so the full
    term adds once); the TRAINING losses use _decay_term, which divides
    this by the shard count so the later loss/grad psum reproduces the
    single-device value. ``head=True`` adds the supervised head (w, b)
    like the reference's supervised model."""
    if weight_decay <= 0.0:
        return 0.0
    from graphsage_tpu.models.graphsage import sage_decay_weights

    decayed = sage_decay_weights(params, sage_config)
    if head:
        decayed = decayed + [params["head"]["w"], params["head"]["b"]]
    return weight_decay * sum(0.5 * jnp.sum(w * w) for w in decayed)


def _decay_term(params, sage_config, weight_decay, axis_name,
                data_axis: str | None = None, head: bool = False):
    """Weight-decay loss term on the sharded TRAINING paths. The decay
    is replicated work, so it divides by the TOTAL shard count — the
    psum of shard losses/grads then reproduces the single-device
    value."""
    if weight_decay <= 0.0:
        return 0.0
    D = jax.lax.axis_size(axis_name)
    if data_axis:
        D = D * jax.lax.axis_size(data_axis)
    return _decay_sum(params, sage_config, weight_decay, head) / D


def _unsup_pair_metrics(out1, out2, neg, mask, unsup_config):
    """(raw skip-gram loss, per-shard masked-mean MRR) from the three
    l2-normalized towers — the body shared by the unsupervised sharded
    step, chunk runner, eval, and eval sweep."""
    from graphsage_tpu.nn import prediction

    raw = prediction.edge_pred_loss(
        out1, out2, neg, loss_fn=unsup_config.loss_fn, mask=mask,
        neg_sample_weights=unsup_config.neg_sample_weights,
    )
    aff = prediction.affinity(out1, out2)
    neg_aff = prediction.neg_cost(out1, neg)
    _, mrr = prediction.mrr_and_ranks(aff, neg_aff, mask)
    return raw, mrr


def sharded_sage_embed(
    params,
    feat_local,
    adj_local,
    ids,
    rng,
    config: SAGEConfig,
    axis_name: str,
    capacity_factor: float = 4.0,
    deterministic: bool = True,
    return_stats: bool = False,
    halo: str = "overlap",
):
    """sage_embed over row-sharded feat/adj: frontier expansion and all
    feature gathers ride exchange_gather; aggregation is fully local.
    With ``return_stats`` also returns the total count of this device's
    gather requests dropped by capacity overflow (zero-row corruption
    signal — callers psum and surface it).

    ``halo`` selects the exchange schedule (bit-identical outputs):

    - ``"overlap"`` (default, SURVEY §5.8): frontier k's FEATURE
      exchange is issued together with the hop-k+1 ADJACENCY exchange —
      the two have no data dependency, so XLA's async-collective
      scheduler can keep a feature all-to-all in flight while the next
      frontier expands; own-shard rows additionally bypass the
      collectives entirely (exchange_gather ``split_local``) and
      overlap as plain local gathers.
    - ``"blocking"`` reproduces the round-2 schedule (all expansions,
      then all feature gathers, every row through the all-to-all) for
      A/B probes. Note the fused inner hop is gated by
      ``config.fused_gather``, NOT by ``halo`` — with fused_gather=True
      at D>1 the innermost hop still serves local rows off the local
      shard under either schedule; pass fused_gather=False (the
      default, what benchmarks/halo_probe.py uses) for a faithful
      schedule-only A/B.

    With ``identity_dim > 0`` the trainable table lives row-sharded in
    ``params["embeds"]`` (local shard per device); its gather runs through
    the same all-to-all, and autodiff transposes that into a cross-device
    scatter-add of the gradient back to each owner shard — the "identity
    embeddings at scale" story (SURVEY.md §7 hard parts).
    """
    D = jax.lax.axis_size(axis_name)
    fanouts = config.fanouts
    n_layers = len(fanouts)
    split_local = halo == "overlap"
    layout = config.shard_layout
    # Fused fast path for the innermost hop: the Pallas fused gather+mean
    # (ops/gather.py) serves the dominant [B*prod(fanouts), F] gather
    # without materializing it (same eligibility as sage_embed:
    # mean-family aggregator; trainable identity
    # columns are split off onto the differentiable exchange below). At D=1 every row is local and the kernel serves the whole
    # mean (measured: took the sharded runner from 77% of the plain path
    # to 44.6M edges/s — benchmarks/KERNEL_NOTES.md). At D>1 the mean is
    # SPLIT: the local fraction is mean-reduced straight off the local
    # shard (XLA take+mask+mean — measured faster than any kernel
    # formulation here, KERNEL_NOTES round-3 locality facts) while only
    # the remote fraction rides the all-to-all (exchange_gather
    # remote_only); the two partial sums add. Local rows never enter
    # the collective payload, and the local compute has no data
    # dependency on it, so the two overlap.
    fuse_inner = (
        config.fused_gather
        and config.aggregator in ("mean", "gcn")
        and feat_local is not None
        and config.feature_dim > 0
    )
    # dropout > 0 keeps the fused path (round-5): the reference's
    # pre-mean element dropout (aggregators.py:52-53) is applied to the
    # innermost-hop rows here — in-kernel (Mosaic PRNG) on the D=1
    # whole-mean path, jax.random masks on the D>1 split partial sums —
    # and the in-aggregator neigh dropout is skipped for the
    # pre-reduced input (nn/aggregators.py). rng is already per-shard
    # folded by the callers, so shard masks are independent.
    inner_drop = (
        config.dropout if (not deterministic and config.dropout > 0.0)
        else 0.0
    )

    dropped = jnp.zeros((), jnp.int32)
    keys = jax.random.split(rng, n_layers + 1)

    def gather_level(s, dropped):
        """Identity + feature rows for one frontier's ids."""
        cap = _capacity(s.shape[0], D, capacity_factor)
        parts = []
        if config.identity_dim > 0:
            rows, d = exchange_gather(
                params["embeds"], s, axis_name, cap, return_dropped=True,
                split_local=split_local, layout=layout,
            )
            dropped += d
            parts.append(rows)
        if feat_local is not None and config.feature_dim > 0:
            feats, d = exchange_gather(
                feat_local, s, axis_name, cap, return_dropped=True,
                split_local=split_local, layout=layout,
            )
            dropped += d
            parts.append(feats[:, : config.feature_dim])
        return (
            parts[0] if len(parts) == 1
            else jnp.concatenate(parts, axis=1)
        ), dropped

    samples = [ids]
    hidden = []
    if halo == "overlap":
        # Interleaved: level k's feature exchange rides alongside the
        # hop-k+1 frontier expansion.
        h, dropped = gather_level(ids, dropped)
        hidden.append(h)
    for k in range(n_layers):
        t = n_layers - k - 1
        m = samples[k].shape[0]
        adj_rows, d = exchange_gather(
            adj_local, samples[k], axis_name,
            _capacity(m, D, capacity_factor), return_dropped=True,
            split_local=split_local, layout=layout,
        )
        dropped += d
        nxt = sample_from_rows(
            keys[k], adj_rows, fanouts[t], mode=config.sampler_mode
        )
        samples.append(nxt.reshape(-1))
        if halo == "overlap":
            if fuse_inner and k == n_layers - 1:
                hidden.append(None)  # served by last_hop_neigh_mean
            else:
                h, dropped = gather_level(samples[-1], dropped)
                hidden.append(h)

    if halo != "overlap":
        for i, s in enumerate(samples):
            if fuse_inner and i == len(samples) - 1:
                hidden.append(None)
            else:
                h, dropped = gather_level(s, dropped)
                hidden.append(h)

    last_mean = None
    if fuse_inner:
        from graphsage_tpu.ops.gather import fused_gather_mean

        S0 = fanouts[0]
        idx2 = samples[-1].reshape(-1, S0)
        if inner_drop > 0.0:
            from graphsage_tpu.models.graphsage import _KERNEL_DROP_TAG

            drop_key = jax.random.fold_in(keys[-1], _KERNEL_DROP_TAG)
        else:
            drop_key = None
        if D == 1:
            last_mean = fused_gather_mean(
                feat_local, idx2, dedup=config.dedup_gather,
                drop_rate=inner_drop, drop_key=drop_key,
            )
        else:
            # Split mean: local fraction via an XLA take+mask+mean
            # (measured FASTER than the Pallas kernel here — redirected
            # wasted DMA issues are not free and the compressed local-id
            # distribution erases the kernel's edge; KERNEL_NOTES
            # round-3 locality facts), remote fraction via the
            # all-to-all, partial sums added. (Not bit-identical to the
            # unsplit mean — reordered f32 sums — hence allclose, not
            # bitwise, parity tests for this path.)
            if layout == "strided":
                owner = (idx2 % D).astype(jnp.int32)
                local_idx = (idx2 // D).astype(jnp.int32)
            else:
                ss = feat_local.shape[0]
                owner = (idx2 // ss).astype(jnp.int32)
                local_idx = (idx2 % ss).astype(jnp.int32)
            is_local = owner == jax.lax.axis_index(axis_name)
            local_rows = jnp.take(
                feat_local, jnp.where(is_local, local_idx, 0), axis=0
            ).astype(jnp.float32)
            if inner_drop > 0.0:
                # pre-mean element dropout on the local fraction (the
                # remote fraction gets its own independent mask below;
                # dropout commutes per-element with the split sum)
                local_rows = _drop_elems(
                    jax.random.fold_in(drop_key, 0), local_rows,
                    inner_drop,
                )
            local_sum = jnp.sum(
                local_rows * is_local[:, :, None].astype(jnp.float32),
                axis=1,
            ) * (1.0 / S0)
            flat = samples[-1]
            remote_rows, d = exchange_gather(
                feat_local, flat, axis_name,
                _capacity(flat.shape[0], D, capacity_factor),
                return_dropped=True, layout=layout, remote_only=True,
            )
            dropped += d
            remote_rows = remote_rows.astype(jnp.float32)
            if inner_drop > 0.0:
                # local positions are zero rows here (remote_only), so
                # masking/scaling them is a no-op
                remote_rows = _drop_elems(
                    jax.random.fold_in(drop_key, 1), remote_rows,
                    inner_drop,
                )
            remote_sum = remote_rows.reshape(
                idx2.shape[0], S0, -1
            ).sum(axis=1) * (1.0 / S0)
            last_mean = local_sum + remote_sum
        if last_mean.shape[1] != config.feature_dim:
            last_mean = last_mean[:, : config.feature_dim]
        if config.identity_dim > 0:
            # rows are [identity | features]: the mean splits per column
            # group, so the trainable identity columns take the normal
            # (differentiable, grad-routing) exchange while the feature
            # columns used the fused/split path above.
            id_rows, d = exchange_gather(
                params["embeds"], samples[-1], axis_name,
                _capacity(samples[-1].shape[0], D, capacity_factor),
                return_dropped=True, split_local=split_local,
                layout=layout,
            )
            dropped += d
            id_rows = id_rows.reshape(idx2.shape[0], S0, -1)
            if inner_drop > 0.0:
                # same pre-mean element dropout as the feature columns
                id_rows = _drop_elems(
                    jax.random.fold_in(drop_key, 2), id_rows, inner_drop
                )
            id_mean = id_rows.mean(axis=1)
            last_mean = jnp.concatenate([id_mean, last_mean], axis=1)
    out = aggregate_pyramid(
        params, hidden, ids.shape[0], config,
        rng=None if deterministic else keys[-1],
        deterministic=deterministic,
        last_hop_neigh_mean=last_mean,
    )
    if return_stats:
        return out, dropped
    return out


def make_sharded_supervised_step(
    sup_config,
    optimizer,
    mesh,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    opt_state_like=None,
    data_axis: str | None = None,
):
    """Data-parallel + graph-sharded supervised train step via shard_map.

    Params/opt state are replicated; feat/adj row-sharded; the batch is
    split along the axis. Gradients psum over the axis. With
    ``identity_dim > 0`` pass ``params_like``/``opt_state_like`` (their
    structure drives the spec trees): the 'embeds' table and its
    optimizer moments are row-sharded along the axis and their grads skip
    the psum (exchange_gather's transpose already routed them home).

    ``data_axis``: composed P1xP2 over a 2-D (data, graph) mesh
    (distributed.py::data_graph_mesh — graph sharding rides ICI within a
    slice, pure DP across slices rides DCN): the batch additionally
    splits over ``data_axis``, tables stay graph-sharded/data-replicated,
    halo exchanges stay scoped to the graph axis of each slice, and
    loss/grad reductions run over both axes.
    """
    from graphsage_tpu.models.supervised import supervised_predict

    config = sup_config.sage

    def local_loss(params, feat_local, adj_local, ids, labels, mask, rng,
                   global_mask_sum):
        per_node, logits, dropped = _sup_per_node_xent(
            sup_config, params, feat_local, adj_local, ids, labels, rng,
            axis_name, capacity_factor,
            deterministic=config.dropout == 0.0,
        )
        loss = jnp.sum(per_node * mask) / global_mask_sum
        loss = loss + _decay_term(params, config, sup_config.weight_decay,
                                  axis_name, data_axis, head=True)
        return loss, (logits, dropped)

    red = (data_axis, axis_name) if data_axis else axis_name

    def step(params, opt_state, rng, feat_local, adj_local, ids, labels,
             mask):
        global_mask_sum = jnp.maximum(
            jax.lax.psum(jnp.sum(mask), red), 1.0
        )
        (loss, (logits, dropped)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, feat_local, adj_local, ids, labels, mask,
          _fold_shard(rng, axis_name, data_axis), global_mask_sum)
        loss = jax.lax.psum(loss, red)
        dropped = jax.lax.psum(dropped, red)
        grads = _psum_except_embeds(grads, axis_name, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        preds = supervised_predict(logits, sup_config)
        return params, opt_state, loss, preds, dropped

    rep = P()
    sh = P(red) if data_axis else P(axis_name)
    if config.identity_dim > 0:
        assert params_like is not None and opt_state_like is not None, (
            "identity_dim > 0: pass params_like/opt_state_like so the "
            "'embeds' leaves can be marked row-sharded"
        )
        p_spec = _embeds_spec_tree(params_like, axis_name)
        o_spec = _embeds_spec_tree(opt_state_like, axis_name)
    else:
        p_spec = o_spec = rep
    tbl = P(axis_name)  # graph-sharded, data-replicated
    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(p_spec, o_spec, rep, tbl, tbl, sh, sh, sh),
        out_specs=(p_spec, o_spec, rep, sh, rep),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def make_sharded_supervised_chunk_runner(
    sup_config,
    optimizer,
    mesh,
    batch_size: int,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    opt_state_like=None,
    data_axis: str | None = None,
):
    """Chunked multi-step dispatch for the graph-sharded path: a
    lax.fori_loop of sharded train steps runs INSIDE shard_map, so the
    per-hop all-to-alls and gradient psums happen every step while the
    host syncs only per chunk (see parallel/dp.py for the single-device
    analogue; n_steps is a traced bound).

    runner(params, opt_state, rng, feat_local, adj_local, ids_perm,
           labels_table, start_step, n_steps)
    -> (params, opt_state, last_loss, last_preds, last_ids,
        dropped_requests)  # total over the chunk, psum'd over shards

    ``ids_perm`` is the device-resident padded+shuffled epoch stream
    (global, same on every shard); each step slices its batch and splits
    it across the axis locally.

    ``data_axis``: composed P1xP2 over a 2-D (data, graph) mesh — see
    make_sharded_supervised_step. The batch splits over data x graph;
    exchanges stay within each slice's graph axis.
    """
    from graphsage_tpu.models.supervised import supervised_predict

    config = sup_config.sage
    num_nodes = config.num_nodes
    _require_num_nodes(num_nodes, "id stream")

    def local_loss(params, feat_local, adj_local, ids, labels, mask, rng,
                   global_mask_sum):
        per_node, logits, dropped = _sup_per_node_xent(
            sup_config, params, feat_local, adj_local, ids, labels, rng,
            axis_name, capacity_factor,
            deterministic=config.dropout == 0.0,
        )
        loss = jnp.sum(per_node * mask) / global_mask_sum
        loss = loss + _decay_term(params, config, sup_config.weight_decay,
                                  axis_name, data_axis, head=True)
        return loss, (logits, dropped)

    red = (data_axis, axis_name) if data_axis else axis_name
    _check_batch_divisible(mesh, batch_size, axis_name, data_axis)

    def mapped(params, opt_state, rng, feat_local, adj_local, ids_perm,
               labels_table, start_step, n_steps):
        me, D = _composed_me(axis_name, data_axis)
        local_b = batch_size // D

        def one_step(carry, step_idx):
            params, opt_state, dropped_tot = carry
            batch_ids = jax.lax.dynamic_slice(
                ids_perm,
                (step_idx * batch_size + me * local_b,),
                (local_b,),
            )
            labels = jnp.take(labels_table, batch_ids, axis=0)
            mask = (batch_ids != num_nodes).astype(jnp.float32)
            global_mask_sum = jnp.maximum(
                jax.lax.psum(jnp.sum(mask), red), 1.0
            )
            # fold step AND composed shard index (dp.py convention) so
            # shards do not repeat one dropout/sampler pattern
            step_rng = jax.random.fold_in(
                jax.random.fold_in(rng, step_idx), me
            )
            (loss, (logits, dropped)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, feat_local, adj_local, batch_ids, labels, mask,
              step_rng, global_mask_sum)
            loss = jax.lax.psum(loss, red)
            dropped_tot += jax.lax.psum(dropped, red)
            grads = _psum_except_embeds(grads, axis_name, data_axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            preds = supervised_predict(logits, sup_config)
            return (params, opt_state, dropped_tot), (loss, preds,
                                                      batch_ids)

        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j)

        dummy_out = (
            jnp.zeros(()),
            jnp.zeros((local_b, sup_config.num_classes)),
            jnp.zeros((local_b,), ids_perm.dtype),
        )
        init_carry = (params, opt_state, jnp.zeros((), jnp.int32))
        ((params, opt_state, dropped_tot),
         (loss, preds, ids)) = jax.lax.fori_loop(
            0, n_steps, body, (init_carry, dummy_out)
        )
        return params, opt_state, loss, preds, ids, dropped_tot

    rep = P()
    sh = P(red) if data_axis else P(axis_name)  # batch outputs
    tbl = P(axis_name)  # graph-sharded, data-replicated
    if config.identity_dim > 0:
        assert params_like is not None and opt_state_like is not None
        p_spec = _embeds_spec_tree(params_like, axis_name)
        o_spec = _embeds_spec_tree(opt_state_like, axis_name)
    else:
        p_spec = o_spec = rep
    return jax.jit(
        shard_map(
            mapped,
            mesh=mesh,
            in_specs=(p_spec, o_spec, rep, tbl, tbl, rep, rep, rep, rep),
            out_specs=(p_spec, o_spec, rep, sh, sh, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


def make_sharded_supervised_eval(
    sup_config,
    mesh,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
):
    """Sharded-table eval: (loss, preds) without an optimizer update —
    the counterpart of train/supervised.make_eval_step for --graph_shards
    runs where the full-graph tables are also row-sharded."""
    from graphsage_tpu.models.supervised import supervised_predict

    config = sup_config.sage

    def eval_fn(params, feat_local, adj_local, ids, labels, mask, rng):
        per_node, logits, dropped = _sup_per_node_xent(
            sup_config, params, feat_local, adj_local, ids, labels, rng,
            axis_name, capacity_factor, deterministic=True,
        )
        denom = jnp.maximum(jax.lax.psum(jnp.sum(mask), axis_name), 1.0)
        loss = jax.lax.psum(jnp.sum(per_node * mask), axis_name) / denom
        # decay term like the single-device eval (supervised_loss):
        # keeps val/test losses comparable across --graph_shards settings
        loss = loss + _decay_sum(params, config, sup_config.weight_decay,
                                 head=True)
        return (loss, supervised_predict(logits, sup_config),
                jax.lax.psum(dropped, axis_name))

    rep = P()
    sh = P(axis_name)
    p_spec = (
        _embeds_spec_tree(params_like, axis_name)
        if config.identity_dim > 0 and params_like is not None else rep
    )
    return jax.jit(shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(p_spec, sh, sh, sh, sh, sh, rep),
        out_specs=(rep, sh, rep),
        check_vma=False,
    ))


def make_sharded_unsupervised_chunk_runner(
    unsup_config,
    optimizer,
    mesh,
    batch_size: int,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    opt_state_like=None,
    data_axis: str | None = None,
):
    """Chunked multi-step graph-sharded unsupervised training (see
    make_sharded_supervised_chunk_runner). Carries the train-MRR EMA on
    device.

    runner(params, opt_state, shadow, rng, feat_local, adj_local,
           pairs_perm [P,2], neg_cdf, start_step, n_steps)
    -> (params, opt_state, shadow, last_loss, last_mrr,
        dropped_requests)  # total over the chunk, psum'd over shards

    ``data_axis``: composed P1xP2 over a 2-D (data, graph) mesh — see
    make_sharded_supervised_step.
    """
    from graphsage_tpu.models.graphsage import l2_normalize
    from graphsage_tpu.nn.negative import sample_negatives

    config = unsup_config.sage
    num_nodes = config.num_nodes
    _require_num_nodes(num_nodes, "pair stream")
    red = (data_axis, axis_name) if data_axis else axis_name
    _check_batch_divisible(mesh, batch_size, axis_name, data_axis)

    def mapped(params, opt_state, shadow, rng, feat_local, adj_local,
               pairs_perm, neg_cdf, start_step, n_steps):
        me, D = _composed_me(axis_name, data_axis)
        local_b = batch_size // D

        def local_loss(params, b1, b2, mask, step_rng, global_mask_sum):
            r_neg, r_fwd = jax.random.split(
                jax.random.fold_in(step_rng, me)
            )
            neg_ids = sample_negatives(
                r_neg, neg_cdf, unsup_config.neg_sample_size
            )
            all_ids = jnp.concatenate([b1, b2, neg_ids])
            out, dropped = sharded_sage_embed(
                params, feat_local, adj_local, all_ids, r_fwd, config,
                axis_name, capacity_factor,
                deterministic=config.dropout == 0.0, return_stats=True,
            )
            lb = b1.shape[0]
            o1 = l2_normalize(out[:lb], 1)
            o2 = l2_normalize(out[lb:2 * lb], 1)
            neg = l2_normalize(out[2 * lb:], 1)
            raw, mrr = _unsup_pair_metrics(o1, o2, neg, mask, unsup_config)
            loss = raw / global_mask_sum
            loss = loss + _decay_term(params, config,
                                      unsup_config.weight_decay,
                                      axis_name, data_axis)
            return loss, (mrr, dropped)

        def one_step(carry, step_idx):
            params, opt_state, shadow, dropped_tot = carry
            pair = jax.lax.dynamic_slice(
                pairs_perm,
                (step_idx * batch_size + me * local_b, 0),
                (local_b, 2),
            )
            b1, b2 = pair[:, 0], pair[:, 1]
            mask = (b1 != num_nodes).astype(jnp.float32)
            global_mask_sum = jnp.maximum(
                jax.lax.psum(jnp.sum(mask), red), 1.0
            )
            step_rng = jax.random.fold_in(rng, step_idx)
            (loss, (mrr, dropped)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, b1, b2, mask, step_rng, global_mask_sum)
            loss = jax.lax.psum(loss, red)
            dropped_tot += jax.lax.psum(dropped, red)
            mrr = _global_masked_mrr(mrr, mask, red)
            grads = _psum_except_embeds(grads, axis_name, data_axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            shadow = jnp.where(
                shadow < 0, mrr, shadow - (1 - 0.99) * (shadow - mrr)
            )
            return (params, opt_state, shadow, dropped_tot), (loss, mrr)

        def body(j, state):
            carry, _ = state
            return one_step(carry, start_step + j)

        init = ((params, opt_state, shadow, jnp.zeros((), jnp.int32)),
                (jnp.zeros(()), jnp.zeros(())))
        ((params, opt_state, shadow, dropped_tot),
         (loss, mrr)) = jax.lax.fori_loop(0, n_steps, body, init)
        return params, opt_state, shadow, loss, mrr, dropped_tot

    rep = P()
    tbl = P(axis_name)  # graph-sharded, data-replicated
    if config.identity_dim > 0:
        assert params_like is not None and opt_state_like is not None
        p_spec = _embeds_spec_tree(params_like, axis_name)
        o_spec = _embeds_spec_tree(opt_state_like, axis_name)
    else:
        p_spec = o_spec = rep
    return jax.jit(
        shard_map(
            mapped,
            mesh=mesh,
            in_specs=(p_spec, o_spec, rep, rep, tbl, tbl, rep, rep, rep,
                      rep),
            out_specs=(p_spec, o_spec, rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


def make_sharded_unsup_embed(
    unsup_config,
    mesh,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
):
    """Sharded-table deterministic forward: l2-normalized embeddings for
    export (counterpart of train/unsupervised.make_embed_step)."""
    from graphsage_tpu.models.graphsage import l2_normalize

    config = unsup_config.sage

    def embed_fn(params, feat_local, adj_local, ids, rng):
        out, dropped = sharded_sage_embed(
            params, feat_local, adj_local, ids, rng, config, axis_name,
            capacity_factor, deterministic=True, return_stats=True,
        )
        return l2_normalize(out, 1), jax.lax.psum(dropped, axis_name)

    rep = P()
    sh = P(axis_name)
    p_spec = (
        _embeds_spec_tree(params_like, axis_name)
        if config.identity_dim > 0 and params_like is not None else rep
    )
    return jax.jit(shard_map(
        embed_fn,
        mesh=mesh,
        in_specs=(p_spec, sh, sh, sh, rep),
        out_specs=(sh, rep),
        check_vma=False,
    ))


def make_sharded_unsupervised_eval(
    unsup_config,
    mesh,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
):
    """Sharded-table (loss, mrr) eval for validation batches."""
    from graphsage_tpu.models.graphsage import l2_normalize
    from graphsage_tpu.nn.negative import sample_negatives

    config = unsup_config.sage

    def eval_fn(params, feat_local, adj_local, b1, b2, mask, neg_cdf, rng):
        r_neg, r1, r2, r3 = jax.random.split(
            jax.random.fold_in(rng, jax.lax.axis_index(axis_name)), 4
        )
        neg_ids = sample_negatives(r_neg, neg_cdf,
                                   unsup_config.neg_sample_size)
        embed = functools.partial(
            sharded_sage_embed,
            params=params, feat_local=feat_local, adj_local=adj_local,
            config=config, axis_name=axis_name,
            capacity_factor=capacity_factor, deterministic=True,
            return_stats=True,
        )
        e1, d1 = embed(ids=b1, rng=r1)
        e2, d2 = embed(ids=b2, rng=r2)
        en, d3 = embed(ids=neg_ids, rng=r3)
        out1, out2, neg = (
            l2_normalize(e1, 1), l2_normalize(e2, 1), l2_normalize(en, 1)
        )
        dropped = jax.lax.psum(d1 + d2 + d3, axis_name)
        raw, mrr = _unsup_pair_metrics(out1, out2, neg, mask, unsup_config)
        denom = jnp.maximum(jax.lax.psum(jnp.sum(mask), axis_name), 1.0)
        loss = jax.lax.psum(raw, axis_name) / denom
        # decay term like the single-device eval (unsupervised_loss)
        loss = loss + _decay_sum(params, config, unsup_config.weight_decay)
        return loss, _global_masked_mrr(mrr, mask, axis_name), dropped

    rep = P()
    sh = P(axis_name)
    p_spec = (
        _embeds_spec_tree(params_like, axis_name)
        if config.identity_dim > 0 and params_like is not None else rep
    )
    return jax.jit(shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(p_spec, sh, sh, sh, sh, sh, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    ))


def make_sharded_unsupervised_step(
    unsup_config,
    optimizer,
    mesh,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    opt_state_like=None,
):
    """Graph-sharded three-tower skip-gram step.

    batch1/batch2 edge endpoints split along the axis; every device draws
    its own negative tower slice (neg_sample_size per device stays the
    reference value — negatives are per-shard like per-batch in the
    reference's semantics when batch is sharded).
    """
    from graphsage_tpu.models.graphsage import l2_normalize
    from graphsage_tpu.nn.negative import sample_negatives

    config = unsup_config.sage

    def local_loss(params, feat_local, adj_local, b1, b2, mask, neg_cdf,
                   rng, global_mask_sum):
        r_neg, r1, r2, r3 = jax.random.split(
            jax.random.fold_in(rng, jax.lax.axis_index(axis_name)), 4
        )
        neg_ids = sample_negatives(r_neg, neg_cdf,
                                   unsup_config.neg_sample_size)
        embed = functools.partial(
            sharded_sage_embed,
            params=params, feat_local=feat_local, adj_local=adj_local,
            config=config, axis_name=axis_name,
            capacity_factor=capacity_factor,
            deterministic=config.dropout == 0.0, return_stats=True,
        )
        e1, d1 = embed(ids=b1, rng=r1)
        e2, d2 = embed(ids=b2, rng=r2)
        en, d3 = embed(ids=neg_ids, rng=r3)
        out1, out2, neg = (
            l2_normalize(e1, 1), l2_normalize(e2, 1), l2_normalize(en, 1)
        )
        dropped = d1 + d2 + d3
        raw, mrr = _unsup_pair_metrics(out1, out2, neg, mask, unsup_config)
        loss = raw / global_mask_sum
        loss = loss + _decay_term(params, config,
                                  unsup_config.weight_decay, axis_name)
        return loss, (mrr, out1, dropped)

    def step(params, opt_state, rng, feat_local, adj_local, b1, b2, mask,
             neg_cdf):
        global_mask_sum = jnp.maximum(
            jax.lax.psum(jnp.sum(mask), axis_name), 1.0
        )
        (loss, (mrr, out1, dropped)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, feat_local, adj_local, b1, b2, mask, neg_cdf, rng,
          global_mask_sum)
        loss = jax.lax.psum(loss, axis_name)
        dropped = jax.lax.psum(dropped, axis_name)
        grads = _psum_except_embeds(grads, axis_name)
        mrr = _global_masked_mrr(mrr, mask, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mrr, out1, dropped

    rep = P()
    sh = P(axis_name)
    if config.identity_dim > 0:
        assert params_like is not None and opt_state_like is not None
        p_spec = _embeds_spec_tree(params_like, axis_name)
        o_spec = _embeds_spec_tree(opt_state_like, axis_name)
    else:
        p_spec = o_spec = rep
    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(p_spec, o_spec, rep, sh, sh, sh, sh, sh, rep),
        out_specs=(p_spec, o_spec, rep, rep, sh, rep),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))

# ------------------------------------------------- device-resident sweeps


def reassemble_sharded_rows(arr, n_shards: int, n_batches: int):
    """Reorder a P(axis)-concatenated per-shard sweep output (shard-major
    [D * n_b * local_rows, ...]) into the global step-major row order the
    id stream used ([n_b * D * local_rows, ...]). Cross-process shards
    are all-gathered first (multi-host)."""
    import numpy as np

    from graphsage_tpu.parallel.distributed import host_array

    arr = host_array(arr)
    local = arr.shape[0] // (n_shards * n_batches)
    shaped = arr.reshape((n_shards, n_batches, local) + arr.shape[1:])
    return np.ascontiguousarray(shaped.swapaxes(0, 1)).reshape(
        (n_batches * n_shards * local,) + arr.shape[1:]
    )


def make_sharded_supervised_eval_sweep(
    sup_config,
    mesh,
    batch_size: int,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    data_axis: str | None = None,
):
    """Whole val/test sweep in ONE dispatch on the graph-sharded path:
    fori_loop over a replicated dummy-padded id stream; each shard
    evaluates its batch split per step (counterpart of
    train/supervised.make_eval_sweep, reference incremental_evaluate at
    supervised_train.py:91-110).

    ``data_axis``: on a composed (data, graph) mesh the batch splits
    over BOTH axes (data-major, like the chunk runners) instead of
    every data slice redundantly evaluating identical batches — the
    total shard count must divide ``batch_size``.

    sweep(params, feat_local, adj_local, ids_all, labels_table, rng)
    -> (losses [n_b], preds [Dtot*n_b*local_b, C] shard-major
        (reassemble with reassemble_sharded_rows over the TOTAL shard
        count), dropped)
    """
    from graphsage_tpu.models.supervised import supervised_predict

    config = sup_config.sage
    num_nodes = config.num_nodes
    _require_num_nodes(num_nodes, "id stream")
    red = (data_axis, axis_name) if data_axis else axis_name
    _check_batch_divisible(mesh, batch_size, axis_name, data_axis)

    def mapped(params, feat_local, adj_local, ids_all, labels_table, rng):
        me, D = _composed_me(axis_name, data_axis)
        local_b = batch_size // D
        n_b = ids_all.shape[0] // batch_size

        def body(i, acc):
            losses, preds, dropped_tot = acc
            ids = jax.lax.dynamic_slice(
                ids_all, (i * batch_size + me * local_b,), (local_b,)
            )
            labels = jnp.take(labels_table, ids, axis=0)
            mask = (ids != num_nodes).astype(jnp.float32)
            per_node, logits, dropped = _sup_per_node_xent(
                sup_config, params, feat_local, adj_local, ids, labels,
                rng, axis_name, capacity_factor, deterministic=True,
            )
            denom = jnp.maximum(
                jax.lax.psum(jnp.sum(mask), red), 1.0
            )
            loss = jax.lax.psum(jnp.sum(per_node * mask), red) / denom
            # per-batch decay like the single-device sweep
            # (supervised_loss inside make_eval_sweep's body)
            loss = loss + _decay_sum(params, config,
                                     sup_config.weight_decay, head=True)
            p = supervised_predict(logits, sup_config)
            return (
                losses.at[i].set(loss),
                jax.lax.dynamic_update_slice(preds, p, (i * local_b, 0)),
                dropped_tot + jax.lax.psum(dropped, red),
            )

        init = (
            jnp.zeros((n_b,)),
            jnp.zeros((n_b * local_b, sup_config.num_classes)),
            jnp.zeros((), jnp.int32),
        )
        return jax.lax.fori_loop(0, n_b, body, init)

    rep = P()
    sh = P(axis_name)
    sh_out = P(red) if data_axis else sh  # rows stack data-major
    p_spec = (
        _embeds_spec_tree(params_like, axis_name)
        if config.identity_dim > 0 and params_like is not None else rep
    )
    return jax.jit(shard_map(
        mapped,
        mesh=mesh,
        in_specs=(p_spec, sh, sh, rep, rep, rep),
        out_specs=(rep, sh_out, rep),
        check_vma=False,
    ))


def make_sharded_unsup_eval_sweep(
    unsup_config,
    mesh,
    batch_size: int,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    data_axis: str | None = None,
):
    """Full val-edge-set (loss, mrr) on the graph-sharded path in ONE
    dispatch (validate_batch_size=-1 semantics; see
    train/unsupervised.make_unsup_eval_sweep). ``data_axis``: composed
    (data, graph) mesh — the pair stream splits over both axes instead
    of every data slice redundantly evaluating identical batches. The
    outputs are scalars, so the split nests GRAPH-major and the rng
    folds on the graph index alone: every pair keeps the graph-shard
    owner, rng stream, and negative set it had on the 1-D mesh, making
    the composed sweep's (loss, mrr) reproduce the 1-D values exactly
    under position-independent samplers (first_k / shared_perm) —
    val metrics do not shift when only --data_shards changes.

    sweep(params, feat_local, adj_local, pairs_all [P,2], neg_cdf, rng)
    -> (loss, mrr, dropped) — edge-weighted means over real pairs.
    """
    from graphsage_tpu.models.graphsage import l2_normalize
    from graphsage_tpu.nn.negative import sample_negatives

    config = unsup_config.sage
    num_nodes = config.num_nodes
    _require_num_nodes(num_nodes, "pair stream")
    red = (data_axis, axis_name) if data_axis else axis_name
    _check_batch_divisible(mesh, batch_size, axis_name, data_axis)

    def mapped(params, feat_local, adj_local, pairs_all, neg_cdf, rng):
        me, D = _composed_me(axis_name, data_axis, graph_major=True)
        local_b = batch_size // D
        n_b = pairs_all.shape[0] // batch_size

        def body(i, acc):
            loss_sum, mrr_sum, cnt, dropped_tot = acc
            pair = jax.lax.dynamic_slice(
                pairs_all, (i * batch_size + me * local_b, 0),
                (local_b, 2),
            )
            b1, b2 = pair[:, 0], pair[:, 1]
            mask = (b1 != num_nodes).astype(jnp.float32)
            r = jax.random.fold_in(rng, i)
            # fold on the GRAPH index alone (== me on a 1-D mesh): the
            # data-axis halves of one graph shard draw the identical
            # negatives/rng their pairs saw on the 1-D mesh
            r_neg, r1, r2, r3 = jax.random.split(
                jax.random.fold_in(r, jax.lax.axis_index(axis_name)), 4
            )
            neg_ids = sample_negatives(r_neg, neg_cdf,
                                       unsup_config.neg_sample_size)
            embed = functools.partial(
                sharded_sage_embed,
                params=params, feat_local=feat_local,
                adj_local=adj_local, config=config, axis_name=axis_name,
                capacity_factor=capacity_factor, deterministic=True,
                return_stats=True,
            )
            e1, d1 = embed(ids=b1, rng=r1)
            e2, d2 = embed(ids=b2, rng=r2)
            en, d3 = embed(ids=neg_ids, rng=r3)
            out1 = l2_normalize(e1, 1)
            out2 = l2_normalize(e2, 1)
            neg = l2_normalize(en, 1)
            raw, mrr = _unsup_pair_metrics(out1, out2, neg, mask,
                                           unsup_config)
            k = jax.lax.psum(jnp.sum(mask), red)
            loss = jax.lax.psum(raw, red)
            # per-batch decay, k-weighted like the single-device sweep
            # (unsupervised_loss's per-batch value accumulates as
            # loss * k; the final /cnt then reproduces decay exactly)
            loss = loss + _decay_sum(params, config,
                                     unsup_config.weight_decay) * k
            mrr = _global_masked_mrr(mrr, mask, red)
            dropped = jax.lax.psum(d1 + d2 + d3, red)
            return (loss_sum + loss, mrr_sum + mrr * k, cnt + k,
                    dropped_tot + dropped)

        loss_sum, mrr_sum, cnt, dropped = jax.lax.fori_loop(
            0, n_b, body,
            (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
             jnp.zeros((), jnp.int32)),
        )
        cnt = jnp.maximum(cnt, 1.0)
        return loss_sum / cnt, mrr_sum / cnt, dropped

    rep = P()
    sh = P(axis_name)
    p_spec = (
        _embeds_spec_tree(params_like, axis_name)
        if config.identity_dim > 0 and params_like is not None else rep
    )
    return jax.jit(shard_map(
        mapped,
        mesh=mesh,
        in_specs=(p_spec, sh, sh, rep, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    ))


def make_sharded_embed_sweep(
    unsup_config,
    mesh,
    batch_size: int,
    axis_name: str = "graph",
    capacity_factor: float = 4.0,
    params_like=None,
    data_axis: str | None = None,
):
    """Whole-graph embedding export in ONE dispatch on the graph-sharded
    path (counterpart of save_val_embeddings' per-batch loop, reference
    unsupervised_train.py:94-117). ``data_axis``: composed (data, graph)
    mesh — the id stream splits over both axes.

    sweep(params, feat_local, adj_local, ids_all, rng)
    -> (embeds [Dtot*n_b*local_b, dim] shard-major (reassemble with
        reassemble_sharded_rows over the TOTAL shard count), dropped)
    """
    from graphsage_tpu.models.graphsage import l2_normalize

    config = unsup_config.sage
    red = (data_axis, axis_name) if data_axis else axis_name
    _check_batch_divisible(mesh, batch_size, axis_name, data_axis)

    def mapped(params, feat_local, adj_local, ids_all, rng):
        me, D = _composed_me(axis_name, data_axis)
        local_b = batch_size // D
        n_b = ids_all.shape[0] // batch_size

        def body(i, acc):
            out_buf, dropped_tot = acc
            ids = jax.lax.dynamic_slice(
                ids_all, (i * batch_size + me * local_b,), (local_b,)
            )
            out, dropped = sharded_sage_embed(
                params, feat_local, adj_local, ids, rng, config,
                axis_name, capacity_factor, deterministic=True,
                return_stats=True,
            )
            out = l2_normalize(out, 1)
            return (
                jax.lax.dynamic_update_slice(out_buf, out,
                                             (i * local_b, 0)),
                dropped_tot + jax.lax.psum(dropped, red),
            )

        init = (
            jnp.zeros((n_b * local_b, config.output_dim)),
            jnp.zeros((), jnp.int32),
        )
        return jax.lax.fori_loop(0, n_b, body, init)

    rep = P()
    sh = P(axis_name)
    sh_out = P(red) if data_axis else sh  # rows stack data-major
    p_spec = (
        _embeds_spec_tree(params_like, axis_name)
        if config.identity_dim > 0 and params_like is not None else rep
    )
    return jax.jit(shard_map(
        mapped,
        mesh=mesh,
        in_specs=(p_spec, sh, sh, rep, rep),
        out_specs=(sh_out, rep),
        check_vma=False,
    ))
