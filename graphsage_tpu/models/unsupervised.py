"""Unsupervised GraphSAGE: three towers + skip-gram negative-sampling loss.

Reproduces the reference SampleAndAggregate._build/_loss/_accuracy
(/root/reference/graphsage/models.py:332-405): batch1/batch2 towers share
aggregator parameters, an in-graph unigram^0.75 negative tower of
``neg_sample_size`` nodes feeds a dense [B, n_neg] affinity matrix, all
outputs are l2-normalized, and the xent loss is divided by the batch size
(models.py:378).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from graphsage_tpu.models.graphsage import (
    SAGEConfig,
    init_sage_params,
    l2_normalize,
    sage_decay_weights,
    sage_embed,
)
from graphsage_tpu.nn import prediction
from graphsage_tpu.nn.negative import sample_negatives


@dataclasses.dataclass(frozen=True)
class UnsupervisedConfig:
    sage: SAGEConfig
    neg_sample_size: int = 20
    neg_sample_weights: float = 1.0
    loss_fn: str = "xent"
    weight_decay: float = 0.0


def init_unsupervised_params(key, config: UnsupervisedConfig) -> dict:
    return init_sage_params(key, config.sage)


def unsupervised_outputs(
    params,
    features,
    adj,
    batch1,
    batch2,
    neg_cdf,
    rng,
    config: UnsupervisedConfig,
    deterministic: bool = True,
):
    """(out1, out2, neg_out), each l2-normalized.

    The reference builds three towers (models.py:347-360); since every
    node's sample-and-aggregate is independent, all three run as ONE
    batched pyramid over the concatenated ids — one frontier expansion
    and one gather instead of three (the tiny negative tower otherwise
    pays full per-call overhead), identical math.
    """
    r_neg, r_fwd = jax.random.split(rng)
    neg_ids = sample_negatives(r_neg, neg_cdf, config.neg_sample_size)
    B = batch1.shape[0]
    all_ids = jnp.concatenate([batch1, batch2, neg_ids])
    out = sage_embed(params, features, adj, all_ids, r_fwd, config.sage,
                     deterministic)
    return (
        l2_normalize(out[:B], 1),
        l2_normalize(out[B:2 * B], 1),
        l2_normalize(out[2 * B:], 1),
    )


def unsupervised_loss(
    params,
    features,
    adj,
    batch1,
    batch2,
    mask,
    neg_cdf,
    rng,
    config: UnsupervisedConfig,
    deterministic: bool = False,
):
    """(loss, aux) where aux carries mrr/ranks/affinities for logging.

    Loss = link_pred_loss / batch_size (models.py:378, 385-391) with the
    batch size counted over real (unmasked) rows, plus weight decay over
    aggregator projections.
    """
    out1, out2, neg = unsupervised_outputs(
        params, features, adj, batch1, batch2, neg_cdf, rng, config,
        deterministic,
    )
    raw = prediction.edge_pred_loss(
        out1, out2, neg,
        loss_fn=config.loss_fn,
        mask=mask,
        neg_sample_weights=config.neg_sample_weights,
    )
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = raw / denom

    if config.weight_decay > 0.0:
        decayed = sage_decay_weights(params, config.sage)
        loss = loss + config.weight_decay * sum(
            0.5 * jnp.sum(w * w) for w in decayed
        )

    aff = prediction.affinity(out1, out2)
    neg_aff = prediction.neg_cost(out1, neg)
    ranks, mrr = prediction.mrr_and_ranks(aff, neg_aff, mask)
    aux = {"mrr": mrr, "ranks": ranks, "outputs1": out1}
    return loss, aux
