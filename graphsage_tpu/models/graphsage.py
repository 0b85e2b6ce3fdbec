"""The GraphSAGE core: fanout sampling + the hop-pyramid aggregation fold.

TPU-native re-design of the reference's SampleAndAggregate.sample /
.aggregate (/root/reference/graphsage/models.py:254-330): the whole
frontier expansion and the layer-by-layer fold are pure functions of
(params, features, adj, ids, rng) with static shapes — one XLA program,
no host round-trips.

Frontier-order semantics (matching models.py:268-274): with layer_infos
[(S1, d1), (S2, d2)], the *first* expansion samples S2 neighbors of the
batch and the second samples S1 neighbors of those, so the flat frontier
arrays have sizes [B], [B*S2], [B*S2*S1]. The aggregation pyramid then
folds from the outside in, reusing one aggregator's parameters across all
hops of a layer (models.py:303-329).

Dimension bookkeeping (models.py:305, 322): with ``concat=True``, every
layer output is 2x its nominal output_dim and ``dim_mult = 2`` enters all
subsequent input dims; the last layer uses the identity activation
(models.py:307-310).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from graphsage_tpu.nn.aggregators import (
    apply_aggregator,
    decay_weights,
    init_aggregator,
)
from graphsage_tpu.nn.init import glorot
from graphsage_tpu.nn.sampler import uniform_sample


@dataclasses.dataclass(frozen=True)
class LayerInfo:
    """Per-layer fanout + output dim (reference SAGEInfo, models.py:180-185)."""

    num_samples: int
    output_dim: int


@dataclasses.dataclass(frozen=True)
class SAGEConfig:
    layers: tuple          # tuple[LayerInfo, ...]
    feature_dim: int       # raw feature dim (0 in featureless mode)
    aggregator: str = "mean"
    concat: bool = True
    model_size: str = "small"
    identity_dim: int = 0  # >0 adds a trainable [N+1, id_dim] table
    num_nodes: int = 0     # N (for the identity table; row N is the dummy)
    dropout: float = 0.0
    sampler_mode: str = "shared_perm"  # reference parity + fast; or "independent"
    fused_gather: bool = False  # Pallas gather+mean for the innermost hop
    dedup_gather: bool = False  # skip duplicate-sample DMAs in the kernel
    # opt-in experiment: materialize the innermost-hop rows via the
    # direct HBM->HBM row-DMA kernel instead of jnp.take. Measured at
    # PARITY with take in chunked training (maxpool 10.80 vs 10.75 ms,
    # seq 10.85 vs 10.27 — KERNEL_NOTES round-5), so off by default.
    rows_gather: bool = False
    # P2 row-ownership map: "strided" (node id % n_shards — spreads
    # degree-sorted hubs across shards, small exchange capacity) or
    # "block" (contiguous ranges). See parallel/graph_sharded.py.
    shard_layout: str = "strided"

    @property
    def input_dim(self) -> int:
        return self.feature_dim + self.identity_dim

    @property
    def dims(self) -> tuple:
        """[input_dim, d1, d2, ...] like the reference's self.dims."""
        return (self.input_dim,) + tuple(li.output_dim for li in self.layers)

    @property
    def fanouts(self) -> tuple:
        return tuple(li.num_samples for li in self.layers)

    @property
    def output_dim(self) -> int:
        mult = 2 if self.concat else 1
        return mult * self.layers[-1].output_dim

    def agg_input_dim(self, layer: int) -> int:
        mult = 2 if self.concat and layer != 0 else 1
        return mult * self.dims[layer]


def init_sage_params(key, config: SAGEConfig) -> dict:
    """Parameter pytree: {'aggs': [per-layer agg params], 'embeds'?: table}."""
    n_layers = len(config.layers)
    keys = jax.random.split(key, n_layers + 1)
    aggs = []
    for layer in range(n_layers):
        aggs.append(
            init_aggregator(
                config.aggregator,
                keys[layer],
                config.agg_input_dim(layer),
                config.dims[layer + 1],
                model_size=config.model_size,
            )
        )
    params = {"aggs": aggs}
    if config.identity_dim > 0:
        # tf.get_variable default init is glorot-uniform (models.py:229-230).
        params["embeds"] = glorot(
            keys[-1], (config.num_nodes + 1, config.identity_dim)
        )
    return params


def sample_frontier(
    rng,
    adj,
    ids,
    fanouts: Sequence[int],
    mode: str = "shared_perm",
):
    """Expand the fanout pyramid; returns flat index arrays
    [B], [B*S_k], [B*S_k*S_{k-1}], ... (reference sample(), models.py:254-275).
    """
    n_layers = len(fanouts)
    samples = [ids]
    keys = jax.random.split(rng, n_layers)
    for k in range(n_layers):
        t = n_layers - k - 1
        nxt = uniform_sample(keys[k], adj, samples[k], fanouts[t], mode=mode)
        samples.append(nxt.reshape(-1))
    return samples


def gather_features(params, features, idx, config: SAGEConfig):
    """Per-frontier feature gather, concatenating the trainable identity
    embedding when configured (reference models.py:229-240).

    ``features`` may carry extra zero lanes beyond ``feature_dim`` (the
    128-lane padding the Pallas gather kernel needs, ops/gather.py);
    gathered rows are sliced back to the logical dim.
    """
    parts = []
    if config.identity_dim > 0:
        parts.append(jnp.take(params["embeds"], idx, axis=0))
    if features is not None and config.feature_dim > 0:
        rows = jnp.take(features, idx, axis=0)
        if rows.shape[1] != config.feature_dim:
            rows = rows[:, : config.feature_dim]
        parts.append(rows)
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=1)


def aggregate_pyramid(
    params,
    hidden: list,
    batch_size: int,
    config: SAGEConfig,
    rng=None,
    deterministic: bool = True,
    last_hop_neigh_mean=None,
    capture: dict | None = None,
):
    """Fold the hop pyramid (reference aggregate(), models.py:278-330).

    ``capture``: optional dict; when given, each aggregator call's output
    is recorded under ``acts/layer_<L>/hop_<H>`` (plus the batch input
    row under ``acts/input``) — the functional analogue of the
    reference's per-layer input/output histograms (layers.py:59-70),
    consumed by ``--log_histograms``.

    ``hidden[h]`` is the feature matrix of frontier h; after layer L-1 only
    ``hidden[0]`` remains — the batch embeddings.

    ``last_hop_neigh_mean``: optional pre-reduced [B*support, F] neighbor
    mean for the innermost hop (layer 0's outermost agg call), produced by
    the fused Pallas gather-mean — ``hidden[-1]`` may then be None.
    """
    n_layers = len(config.layers)
    fanouts = config.fanouts
    dims = config.dims
    concat = config.concat

    support = [1]
    for k in range(n_layers):
        support.append(support[-1] * fanouts[n_layers - k - 1])

    if capture is not None and hidden[0] is not None:
        capture["acts/input"] = hidden[0]

    for layer in range(n_layers):
        agg_params = params["aggs"][layer]
        is_last = layer == n_layers - 1
        act = (lambda x: x) if is_last else jax.nn.relu
        dim_mult = 2 if concat and layer != 0 else 1
        next_hidden = []
        for hop in range(n_layers - layer):
            if rng is not None:
                hop_rng = jax.random.fold_in(
                    jax.random.fold_in(rng, layer), hop
                )
            else:
                hop_rng = None
            extra = {}
            if (layer == 0 and hop == n_layers - 1
                    and last_hop_neigh_mean is not None):
                neigh = last_hop_neigh_mean  # [B*support, F], pre-reduced
                if config.aggregator == "gcn":
                    # gcn recombines the pre-reduced neighbor mean with
                    # self: (S*mean + self)/(S+1) — needs S
                    extra = {"n_samples": fanouts[0]}
                elif config.aggregator == "meanpool":
                    # already mean(relu(mlp(x))) — [B*support, H] from
                    # the fused pool kernel; skip the in-aggregator MLP
                    # (maxpool never arrives pre-pooled: its fused
                    # variant measured slower and is not routed)
                    extra = {"pre_pooled": True}
            else:
                neigh = hidden[hop + 1].reshape(
                    batch_size * support[hop],
                    fanouts[n_layers - hop - 1],
                    dim_mult * dims[layer],
                )
            h = apply_aggregator(
                config.aggregator,
                agg_params,
                hidden[hop],
                neigh,
                act=act,
                concat=concat,
                dropout_rate=config.dropout,
                rng=hop_rng,
                deterministic=deterministic,
                **extra,
            )
            if capture is not None:
                capture[f"acts/layer_{layer}/hop_{hop}"] = h
            next_hidden.append(h)
        hidden = next_hidden
    return hidden[0]


# Distinct fold_in tags deriving the fused kernels' dropout streams
# from the step's drop_rng: the kernel masks the innermost-hop NEIGHBOR
# rows (the in-aggregator neigh dropout is skipped for pre-reduced
# inputs, nn/aggregators.py), the identity tag masks the XLA-side
# identity-embedding columns of the same rows.
_KERNEL_DROP_TAG = 0x5EED
_IDENTITY_DROP_TAG = 0x1D


def sage_embed(
    params,
    features,
    adj,
    ids,
    rng,
    config: SAGEConfig,
    deterministic: bool = True,
    capture: dict | None = None,
):
    """Full sample -> gather -> aggregate forward: [B] ids -> [B, out] raw
    (un-normalized) embeddings. ``capture`` records per-layer activations
    (see aggregate_pyramid)."""
    sample_rng, drop_rng = jax.random.split(rng)
    samples = sample_frontier(
        sample_rng, adj, ids, config.fanouts, mode=config.sampler_mode
    )

    # Fused fast path: the innermost-hop gather is the bandwidth hot
    # spot ([B*prod(fanouts), F]). For the mean aggregator its only use
    # is a mean, so the Pallas gather+mean kernel (ops/gather.py) never
    # materializes the gather — valid in training too, since features
    # carry no gradient. gcn's self-inclusive mean recombines from the
    # same reduced mean as (S*mean + self)/(S+1) (aggregators.py
    # apply_gcn), so it rides the same kernel. The pooled aggregators
    # ride their own fused gather+MLP+pool kernel (ops/pool.py) with a
    # custom VJP for training — resurrected after the round-5 chunked-
    # mode sweep showed the XLA pooled path collapsing 3-4x
    # (benchmarks/KERNEL_NOTES.md round-5).
    fusable = (
        config.fused_gather
        and config.aggregator in ("mean", "gcn")
        and features is not None
        and config.feature_dim > 0
    )
    # The meanpool analogue: gather -> per-neighbor MLP -> mean pool
    # fused in one kernel with a custom VJP (ops/pool.py) — measured
    # 12-24% faster than the XLA path in chunked mode. maxpool is NOT
    # routed here: its tie-mask backward re-reads the residual twice
    # and measured SLOWER than XLA (KERNEL_NOTES round-5); with the
    # OPT-IN rows_gather flag it can ride the row-gather kernel below,
    # otherwise it uses the plain XLA take. The MLP mixes feature columns,
    # so the identity-embedding column split used by the mean path
    # cannot apply — guarded to identity_dim == 0.
    pool_fusable = (
        config.fused_gather
        and config.aggregator == "meanpool"
        and features is not None
        and config.feature_dim > 0
        and config.identity_dim == 0
    )
    # dropout > 0 no longer disables fusion: the reference drops
    # individual neighbor rows BEFORE the reduce (aggregators.py:52-53,
    # :168-174), which the kernels reproduce per-element with the
    # on-chip Mosaic PRNG (ops/gather.py, ops/pool.py) — a different
    # (equally valid) mask stream than the XLA path's jax.random masks.
    use_fused = fusable
    use_fused_pool = pool_fusable
    training_drop = (not deterministic) and config.dropout > 0.0
    inner_drop = config.dropout if training_drop else 0.0
    # Opt-in (rows_gather): paths that need the individual innermost-hop
    # rows (maxpool/seq/twomaxpool) can gather them with the direct
    # HBM->HBM row-DMA kernel — a semantically exact jnp.take
    # replacement (ops/gather.py::fused_gather_rows). Measured at take
    # parity in chunked training (KERNEL_NOTES round-5), hence not the
    # default.
    use_rows = (
        config.rows_gather
        and features is not None
        and config.feature_dim > 0
        and not (use_fused or use_fused_pool)
    )
    last_mean = None
    if use_fused:
        from graphsage_tpu.ops.gather import fused_gather_mean

        inner_fanout = config.fanouts[0]
        idx2 = samples[-1].reshape(-1, inner_fanout)
        last_mean = fused_gather_mean(
            features, idx2, dedup=config.dedup_gather,
            drop_rate=inner_drop,
            drop_key=(jax.random.fold_in(drop_rng, _KERNEL_DROP_TAG)
                      if inner_drop > 0.0 else None),
        )
        if last_mean.shape[1] != config.feature_dim:
            last_mean = last_mean[:, : config.feature_dim]
        if config.identity_dim > 0:
            # The mean splits per column group (rows are [identity |
            # features]): the trainable identity columns stay on the
            # differentiable XLA take (the table needs gradients; the
            # kernel has no VJP), the feature columns ride the kernel.
            id_rows = jnp.take(params["embeds"], samples[-1], axis=0)
            id_rows = id_rows.reshape(
                -1, inner_fanout, config.identity_dim
            )
            if inner_drop > 0.0:
                # same pre-mean element dropout as the kernel applies
                # to the feature columns of these rows
                from graphsage_tpu.nn.init import dropout as _drop

                id_rows = _drop(
                    jax.random.fold_in(drop_rng, _IDENTITY_DROP_TAG),
                    id_rows, inner_drop, False,
                )
            id_mean = id_rows.mean(axis=1)
            last_mean = jnp.concatenate([id_mean, last_mean], axis=1)
        hidden = [
            gather_features(params, features, s, config)
            for s in samples[:-1]
        ] + [None]
    elif use_fused_pool:
        from graphsage_tpu.ops.gather import _key_words
        from graphsage_tpu.ops.pool import gather_mlp_pool_train

        inner_fanout = config.fanouts[0]
        idx2 = samples[-1].reshape(-1, inner_fanout)
        mlp0 = params["aggs"][0]["mlp"][0]
        # literal "mean": pool_fusable guarantees aggregator ==
        # "meanpool" (maxpool's fused variant measured SLOWER and is
        # NOT routed here — KERNEL_NOTES round-5)
        last_mean = gather_mlp_pool_train(
            "mean",
            inner_drop,
            features, idx2, mlp0["w"], mlp0["b"],
            (_key_words(jax.random.fold_in(drop_rng, _KERNEL_DROP_TAG))
             if inner_drop > 0.0 else None),
        )
        hidden = [
            gather_features(params, features, s, config)
            for s in samples[:-1]
        ] + [None]
    elif use_rows:
        from graphsage_tpu.ops.gather import fused_gather_rows

        inner_fanout = config.fanouts[0]
        idx2 = samples[-1].reshape(-1, inner_fanout)
        rows = fused_gather_rows(features, idx2)
        if rows.shape[1] != config.feature_dim:
            rows = rows[:, : config.feature_dim]
        if config.identity_dim > 0:
            # identity columns stay on the differentiable XLA take
            # (the table needs gradients; the kernel has no VJP)
            id_rows = jnp.take(params["embeds"], samples[-1], axis=0)
            rows = jnp.concatenate([id_rows, rows], axis=1)
        hidden = [
            gather_features(params, features, s, config)
            for s in samples[:-1]
        ] + [rows]
    else:
        hidden = [
            gather_features(params, features, s, config) for s in samples
        ]
    return aggregate_pyramid(
        params,
        hidden,
        ids.shape[0],
        config,
        rng=None if deterministic else drop_rng,
        deterministic=deterministic,
        last_hop_neigh_mean=last_mean,
        capture=capture,
    )


def make_activations_fn(config: SAGEConfig):
    """Jitted side probe for ``--log_histograms``: run the deterministic
    forward over a probe batch and return every layer's activations
    (the reference logs each layer's inputs/outputs when logging=True,
    layers.py:59-70). Compiled once; called only at print boundaries."""

    def acts(params, features, adj, ids, rng):
        cap: dict = {}
        sage_embed(params, features, adj, ids, rng, config,
                   deterministic=True, capture=cap)
        return cap

    return jax.jit(acts)


def sage_decay_weights(params, config: SAGEConfig):
    """Weights subject to weight decay: each aggregator's own projection
    vars (reference models.py:385-388)."""
    out = []
    for agg in params["aggs"]:
        out.extend(decay_weights(config.aggregator, agg))
    return out


def l2_normalize(x, axis=1, eps=1e-12):
    """tf.nn.l2_normalize semantics (models.py:368-370)."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))
    return x / norm
