"""Edge-prediction (skip-gram style) scoring and losses.

Functional equivalent of the reference BipartiteEdgePredLayer
(/root/reference/graphsage/prediction.py:12-128): dot-product or bilinear
affinity, dense negative affinity, and the xent / skipgram / hinge loss
family. Reductions are mask-weighted so padded batch rows contribute
nothing (the reference runs ragged final batches instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphsage_tpu.nn.init import glorot

MARGIN = 0.1  # hinge margin (prediction.py:32)


def init_bilinear(key, input_dim1: int, input_dim2: int):
    """Optional bilinear affinity weights u^T A v (prediction.py:46-53)."""
    return {"w": glorot(key, (input_dim1, input_dim2))}


def affinity(x1, x2, params=None):
    """[B] dot-product (or bilinear) affinity (prediction.py:68-80)."""
    if params is not None:
        x2 = jnp.dot(x2, params["w"].T, preferred_element_type=jnp.float32)
    return jnp.sum(x1 * x2, axis=1)


def neg_cost(x1, neg, params=None):
    """[B, num_neg] affinities to the shared negative set
    (prediction.py:82-92)."""
    if params is not None:
        x1 = jnp.dot(x1, params["w"], preferred_element_type=jnp.float32)
    return jnp.dot(x1, neg.T, preferred_element_type=jnp.float32)


def sigmoid_xent(labels, logits):
    # tf.nn.sigmoid_cross_entropy_with_logits
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def xent_loss(aff, neg_aff, mask=None, neg_sample_weights: float = 1.0):
    """sum(xent(pos,1)) + w * sum(xent(neg,0)) (prediction.py:102-110)."""
    true_xent = sigmoid_xent(jnp.ones_like(aff), aff)
    neg_xent = sigmoid_xent(jnp.zeros_like(neg_aff), neg_aff)
    if mask is not None:
        true_xent = true_xent * mask
        neg_xent = neg_xent * mask[:, None]
    return jnp.sum(true_xent) + neg_sample_weights * jnp.sum(neg_xent)


def skipgram_loss(aff, neg_aff, mask=None):
    """sum(aff - log sum exp(neg_aff)) (prediction.py:112-117)."""
    neg_cost_term = jax.nn.logsumexp(neg_aff, axis=1)
    per = aff - neg_cost_term
    if mask is not None:
        per = per * mask
    return jnp.sum(per)


def hinge_loss(aff, neg_aff, mask=None, margin: float = MARGIN):
    """sum(relu(neg_aff - aff + margin)) (prediction.py:119-125)."""
    diff = jax.nn.relu(neg_aff - (aff[:, None] - margin))
    if mask is not None:
        diff = diff * mask[:, None]
    return jnp.sum(diff)


LOSS_FNS = {
    "xent": xent_loss,
    "skipgram": skipgram_loss,
    "hinge": hinge_loss,
}


def edge_pred_loss(x1, x2, neg, *, loss_fn: str = "xent", params=None,
                   mask=None, neg_sample_weights: float = 1.0):
    aff = affinity(x1, x2, params)
    naff = neg_cost(x1, neg, params)
    if loss_fn == "xent":
        return xent_loss(aff, naff, mask, neg_sample_weights)
    return LOSS_FNS[loss_fn](aff, naff, mask)


def mrr_and_ranks(aff, neg_aff, mask=None):
    """Rank of the positive among the negatives and the batch MRR.

    Matches the reference's double-top_k construction (models.py:393-405):
    the positive is appended *after* the negatives, and TF's stable top_k
    breaks ties in favor of lower indices — so the positive ranks below any
    tied negative: rank = 1 + #{neg_aff >= aff}.
    """
    ranks = 1 + jnp.sum(neg_aff >= aff[:, None], axis=1)
    rr = 1.0 / ranks.astype(jnp.float32)
    if mask is None:
        return ranks, jnp.mean(rr)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return ranks, jnp.sum(rr * mask) / total
