"""Supervised GraphSAGE: embed -> l2-normalize -> dense head -> loss.

Reproduces the reference SupervisedGraphsage
(/root/reference/graphsage/supervised_models.py:10-126): single-tower
sample-and-aggregate, l2-normalized embeddings, a bias-full Dense
classifier head, sigmoid (multilabel) or softmax loss, and weight decay
over aggregator projections + head weights. Batch reductions are
mask-weighted means, equal to the reference's mean over its (ragged)
actual batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from graphsage_tpu.models.graphsage import (
    SAGEConfig,
    init_sage_params,
    l2_normalize,
    sage_decay_weights,
    sage_embed,
)
from graphsage_tpu.nn.dense import apply_dense, init_dense


@dataclasses.dataclass(frozen=True)
class SupervisedConfig:
    sage: SAGEConfig
    num_classes: int
    sigmoid_loss: bool = False
    weight_decay: float = 0.0


def init_supervised_params(key, config: SupervisedConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = init_sage_params(k1, config.sage)
    params["head"] = init_dense(
        k2, config.sage.output_dim, config.num_classes, bias=True
    )
    return params


def supervised_logits(
    params,
    features,
    adj,
    ids,
    rng,
    config: SupervisedConfig,
    deterministic: bool = True,
):
    emb = sage_embed(
        params, features, adj, ids, rng, config.sage, deterministic
    )
    emb = l2_normalize(emb, axis=1)
    head_rng = jax.random.fold_in(rng, 7)
    return apply_dense(
        params["head"],
        emb,
        act=None,
        dropout_rate=config.sage.dropout,
        rng=head_rng,
        deterministic=deterministic,
    )


def _softmax_xent(logits, labels):
    return -jnp.sum(labels * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def _sigmoid_xent(logits, labels):
    return jnp.sum(
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits))),
        axis=-1,
    )


def supervised_loss(
    params,
    features,
    adj,
    ids,
    labels,
    mask,
    rng,
    config: SupervisedConfig,
    deterministic: bool = False,
):
    """Masked mean classification loss + weight decay.

    Reference semantics (supervised_models.py:102-118): sigmoid loss sums
    over classes per node (TF reduce_mean over a [B, C] matrix equals
    mean-over-B of per-node sums divided by C; we keep the same scalar by
    dividing by C), softmax reduces per node; both then average over the
    batch.
    """
    logits = supervised_logits(
        params, features, adj, ids, rng, config, deterministic
    )
    if config.sigmoid_loss:
        per_node = _sigmoid_xent(logits, labels) / config.num_classes
    else:
        per_node = _softmax_xent(logits, labels)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per_node * mask) / denom

    if config.weight_decay > 0.0:
        decayed = sage_decay_weights(params, config.sage)
        decayed += [params["head"]["w"], params["head"]["b"]]
        loss = loss + config.weight_decay * sum(
            0.5 * jnp.sum(w * w) for w in decayed
        )
    return loss, logits


def supervised_predict(logits, config: SupervisedConfig):
    """Probabilities (supervised_models.py:122-126)."""
    if config.sigmoid_loss:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)


def make_optimizer(learning_rate: float, clip: float = 5.0):
    """Adam with value-clipped gradients (supervised_models.py:95-99:
    clip_by_value(grad, -5, 5) then Adam; TF Adam eps=1e-8 matches optax)."""
    return optax.chain(
        optax.clip(clip),
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
    )
