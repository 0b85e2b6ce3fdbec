"""Masked losses/metrics (legacy tkipf/gcn helpers) + the MLP baseline.

Ports the reference graphsage/metrics.py:7-40 and the MLP model
(models.py:97-149) that is their only consumer. ``masked_l2`` in the
reference calls the nonexistent ``tf.nn.l2`` (metrics.py:26-31 — dead
code); here it is implemented with the obviously intended semantics
(0.5 * squared error per element, tf.nn.l2_loss convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphsage_tpu.nn.dense import apply_dense, init_dense


def _norm_mask(mask):
    mask = mask.astype(jnp.float32)
    return mask / jnp.maximum(jnp.sum(mask), 1.0)


def masked_logit_cross_entropy(preds, labels, mask):
    """Sigmoid xent summed over classes, mask-normalized (metrics.py:7-14)."""
    loss = jnp.sum(
        jnp.maximum(preds, 0) - preds * labels
        + jnp.log1p(jnp.exp(-jnp.abs(preds))),
        axis=1,
    )
    return jnp.mean(loss * _norm_mask(mask))


def masked_softmax_cross_entropy(preds, labels, mask):
    """Softmax xent, mask-normalized (metrics.py:16-22)."""
    loss = -jnp.sum(labels * jax.nn.log_softmax(preds, axis=-1), axis=-1)
    return jnp.mean(loss * _norm_mask(mask))


def masked_l2(preds, actuals, mask):
    """0.5*||preds-actuals||^2 per row, mask-normalized (metrics.py:26-31;
    broken in the reference — intended semantics implemented)."""
    loss = 0.5 * jnp.sum((preds - actuals) ** 2, axis=1)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)
    return jnp.mean(loss * m)


def masked_accuracy(preds, labels, mask):
    """Argmax accuracy, mask-normalized (metrics.py:33-40)."""
    correct = (
        jnp.argmax(preds, axis=1) == jnp.argmax(labels, axis=1)
    ).astype(jnp.float32)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)
    return jnp.mean(correct * m)


# ------------------------------------------------------------------ MLP


def init_mlp_params(key, dims):
    """Two-layer MLP params: dims = (input, hidden, output)
    (reference models.py:133-145)."""
    k1, k2 = jax.random.split(key)
    return {
        "l1": init_dense(k1, dims[0], dims[1], bias=True),
        "l2": init_dense(k2, dims[1], dims[2], bias=True),
    }


def mlp_forward(params, x, dropout_rate=0.0, rng=None, deterministic=True):
    rngs = (
        jax.random.split(rng, 2) if rng is not None else (None, None)
    )
    h = apply_dense(params["l1"], x, act=jax.nn.relu,
                    dropout_rate=dropout_rate, rng=rngs[0],
                    deterministic=deterministic)
    return apply_dense(params["l2"], h, act=None,
                       dropout_rate=dropout_rate, rng=rngs[1],
                       deterministic=deterministic)


def mlp_loss(params, x, labels, mask, weight_decay=0.0, categorical=True,
             dropout_rate=0.0, rng=None, deterministic=True):
    """Reference MLP._loss (models.py:115-127): weight decay over the
    FIRST layer's vars only + masked softmax xent (categorical) or the
    row-norm L2 (regression)."""
    out = mlp_forward(params, x, dropout_rate, rng, deterministic)
    loss = weight_decay * sum(
        0.5 * jnp.sum(w * w) for w in params["l1"].values()
    )
    if categorical:
        loss = loss + masked_softmax_cross_entropy(out, labels, mask)
    else:
        diff = labels - out
        loss = loss + jnp.sum(jnp.sqrt(jnp.sum(diff * diff, axis=1)))
    return loss, out
