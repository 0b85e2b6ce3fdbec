"""Masked metrics (tkipf/gcn legacy) + MLP baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from graphsage_tpu.nn.metrics import (
    init_mlp_params,
    masked_accuracy,
    masked_l2,
    masked_logit_cross_entropy,
    masked_softmax_cross_entropy,
    mlp_forward,
    mlp_loss,
)


def test_masked_softmax_xent_matches_numpy(np_rng):
    preds = np_rng.standard_normal((6, 4)).astype(np.float32)
    labels = np.eye(4, dtype=np.float32)[np_rng.integers(0, 4, 6)]
    mask = np.array([1, 1, 0, 1, 0, 1], dtype=np.float32)
    logp = np.log(scipy.special.softmax(preds, axis=1))
    per_row = -np.sum(labels * logp, axis=1)
    m = mask / mask.sum()
    expected = np.mean(per_row * m)
    got = masked_softmax_cross_entropy(
        jnp.asarray(preds), jnp.asarray(labels), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_masked_logit_xent_matches_numpy(np_rng):
    preds = np_rng.standard_normal((5, 3)).astype(np.float32)
    labels = (np_rng.random((5, 3)) > 0.5).astype(np.float32)
    mask = np.ones(5, dtype=np.float32)
    per = np.maximum(preds, 0) - preds * labels + np.log1p(np.exp(-np.abs(preds)))
    expected = np.mean(per.sum(1) * (mask / mask.sum()))
    got = masked_logit_cross_entropy(
        jnp.asarray(preds), jnp.asarray(labels), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_masked_accuracy_ignores_masked_rows():
    preds = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0]])
    labels = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    # row 0 correct, rows 1-2 wrong but row 2 masked out
    mask = jnp.asarray([1.0, 1.0, 0.0])
    np.testing.assert_allclose(float(masked_accuracy(preds, labels, mask)),
                               0.5, rtol=1e-6)


def test_masked_l2_zero_for_exact():
    x = jnp.ones((4, 3))
    assert float(masked_l2(x, x, jnp.ones(4))) == 0.0


def test_mlp_trains_on_separable_data(np_rng):
    import optax

    x = np.vstack([
        np_rng.normal(-2, 0.5, (40, 6)),
        np_rng.normal(2, 0.5, (40, 6)),
    ]).astype(np.float32)
    y = np.zeros((80, 2), dtype=np.float32)
    y[:40, 0] = 1
    y[40:, 1] = 1
    mask = jnp.ones(80)

    params = init_mlp_params(jax.random.key(0), (6, 16, 2))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(mlp_loss, has_aux=True)(
            params, jnp.asarray(x), jnp.asarray(y), mask
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    out = mlp_forward(params, jnp.asarray(x))
    acc = float(masked_accuracy(out, jnp.asarray(y), mask))
    assert acc > 0.95
