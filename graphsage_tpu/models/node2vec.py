"""Node2Vec/DeepWalk baseline: embedding tables + skip-gram loss.

Reproduces the reference Node2VecModel
(/root/reference/graphsage/models.py:408-501): target/context embedding
tables (+context bias), unique unigram^0.75 negative sampling, sigmoid
cross-entropy loss summed then divided by batch size, SGD optimizer, and
the MRR construction shared with the GraphSAGE models.

The reference's post-hoc inductive retrain (unsupervised_train.py:324-372)
freezes the *train-node rows of the context table* with stop_gradient; here
that is a gradient mask (`context_update_mask`) multiplied into the context
gradient, which is the functional equivalent.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import optax

from graphsage_tpu.nn import prediction
from graphsage_tpu.nn.init import truncated_normal, zeros
from graphsage_tpu.nn.negative import sample_negatives_unique


@dataclasses.dataclass(frozen=True)
class Node2VecConfig:
    num_nodes: int          # dict_size: N+1 (the padded feature table size)
    dim: int = 256          # nodevec_dim; reference uses 2*dim_1
    neg_sample_size: int = 20
    learning_rate: float = 0.001


def init_node2vec_params(key, config: Node2VecConfig) -> dict:
    k1, k2 = jax.random.split(key)
    n, d = config.num_nodes, config.dim
    return {
        # target: uniform(-1, 1); context: trunc_normal(1/sqrt(d));
        # bias: zeros (models.py:431-440).
        "target": jax.random.uniform(k1, (n, d), minval=-1.0, maxval=1.0),
        "context": truncated_normal(k2, (n, d), 1.0 / math.sqrt(d)),
        "bias": zeros((n,)),
    }


def node2vec_outputs(params, batch1, batch2, neg_ids):
    out1 = jnp.take(params["target"], batch1, axis=0)
    out2 = jnp.take(params["context"], batch2, axis=0)
    out2_bias = jnp.take(params["bias"], batch2, axis=0)
    neg = jnp.take(params["context"], neg_ids, axis=0)
    neg_bias = jnp.take(params["bias"], neg_ids, axis=0)
    return out1, out2, out2_bias, neg, neg_bias


def node2vec_loss(
    params,
    batch1,
    batch2,
    mask,
    unigram_logits,
    rng,
    config: Node2VecConfig,
):
    """(loss, aux). Affinities include the context bias (models.py:478-487);
    negatives are sampled without replacement (unique=True, models.py:450-457).
    """
    neg_ids = sample_negatives_unique(rng, unigram_logits,
                                      config.neg_sample_size)
    out1, out2, out2_bias, neg, neg_bias = node2vec_outputs(
        params, batch1, batch2, neg_ids
    )
    aff = jnp.sum(out1 * out2, axis=1) + out2_bias
    neg_aff = (
        jnp.dot(out1, neg.T, preferred_element_type=jnp.float32) + neg_bias
    )
    true_xent = prediction.sigmoid_xent(jnp.ones_like(aff), aff)
    neg_xent = prediction.sigmoid_xent(jnp.zeros_like(neg_aff), neg_aff)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = (
        jnp.sum(true_xent * mask) + jnp.sum(neg_xent * mask[:, None])
    ) / denom

    # MRR uses the bias-free affinity path like the reference's
    # link_pred_layer (models.py:489-501).
    plain_aff = prediction.affinity(out1, out2)
    plain_neg = prediction.neg_cost(out1, neg)
    ranks, mrr = prediction.mrr_and_ranks(plain_aff, plain_neg, mask)
    return loss, {"mrr": mrr, "ranks": ranks, "outputs1": out1}


def make_optimizer(learning_rate: float):
    """Plain SGD (models.py:442)."""
    return optax.sgd(learning_rate)


def mask_context_gradients(grads, context_update_mask):
    """Zero context-table gradient rows where the mask is 0 — the
    stop_gradient freeze of already-trained rows
    (unsupervised_train.py:330-334)."""
    grads = dict(grads)
    grads["context"] = grads["context"] * context_update_mask[:, None]
    return grads
