"""Unit tests for the functional nn layer: golden values vs NumPy math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.nn import prediction
from graphsage_tpu.nn.aggregators import (
    apply_aggregator,
    init_aggregator,
    AGGREGATORS,
)
from graphsage_tpu.nn.dense import apply_dense, init_dense
from graphsage_tpu.nn.init import glorot, dropout
from graphsage_tpu.nn.lstm import init_lstm, lstm_last_output, neighbor_lengths
from graphsage_tpu.nn.negative import (
    sample_negatives,
    sample_negatives_unique,
    unigram_cdf,
    unigram_logits,
)
from graphsage_tpu.nn.sampler import uniform_sample


def test_glorot_range():
    w = glorot(jax.random.key(0), (50, 30))
    limit = np.sqrt(6.0 / 80)
    assert np.abs(np.asarray(w)).max() <= limit
    assert np.asarray(w).std() > 0.2 * limit


def test_dense_matches_numpy():
    p = init_dense(jax.random.key(1), 4, 3)
    x = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    out = apply_dense(p, jnp.asarray(x), act=jax.nn.relu)
    expect = np.maximum(x @ np.asarray(p["w"]) + np.asarray(p["b"]), 0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_dropout_scales():
    x = jnp.ones((1000, 8))
    y = dropout(jax.random.key(0), x, 0.4, deterministic=False)
    arr = np.asarray(y)
    kept = arr != 0
    assert abs(kept.mean() - 0.6) < 0.05
    np.testing.assert_allclose(arr[kept], 1.0 / 0.6, rtol=1e-5)
    # deterministic -> identity
    np.testing.assert_array_equal(
        np.asarray(dropout(None, x, 0.4, deterministic=True)), np.asarray(x)
    )


def test_mean_aggregator_matches_numpy():
    rng = np.random.default_rng(1)
    self_v = rng.normal(size=(6, 4)).astype(np.float32)
    neigh_v = rng.normal(size=(6, 3, 4)).astype(np.float32)
    p = init_aggregator("mean", jax.random.key(0), 4, 5)
    out = apply_aggregator(
        "mean", p, jnp.asarray(self_v), jnp.asarray(neigh_v),
        act=lambda x: x, concat=True,
    )
    fs = self_v @ np.asarray(p["self_w"])
    fn = neigh_v.mean(1) @ np.asarray(p["neigh_w"])
    np.testing.assert_allclose(
        np.asarray(out), np.concatenate([fs, fn], 1), rtol=1e-4, atol=1e-5
    )
    # concat doubles dim; add mode keeps it
    out2 = apply_aggregator(
        "mean", p, jnp.asarray(self_v), jnp.asarray(neigh_v),
        act=jax.nn.relu, concat=False,
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.maximum(fs + fn, 0), rtol=1e-4, atol=1e-5
    )


def test_gcn_aggregator_matches_numpy():
    rng = np.random.default_rng(2)
    self_v = rng.normal(size=(4, 3)).astype(np.float32)
    neigh_v = rng.normal(size=(4, 5, 3)).astype(np.float32)
    p = init_aggregator("gcn", jax.random.key(0), 3, 2)
    out = apply_aggregator(
        "gcn", p, jnp.asarray(self_v), jnp.asarray(neigh_v),
        act=lambda x: x, concat=False,
    )
    means = np.concatenate([neigh_v, self_v[:, None]], axis=1).mean(1)
    np.testing.assert_allclose(
        np.asarray(out), means @ np.asarray(p["w"]), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("name,red", [("maxpool", np.max), ("meanpool", np.mean)])
def test_pool_aggregators_match_numpy(name, red):
    rng = np.random.default_rng(3)
    self_v = rng.normal(size=(3, 4)).astype(np.float32)
    neigh_v = rng.normal(size=(3, 6, 4)).astype(np.float32)
    p = init_aggregator(name, jax.random.key(0), 4, 5)
    out = apply_aggregator(
        name, p, jnp.asarray(self_v), jnp.asarray(neigh_v),
        act=lambda x: x, concat=True,
    )
    mlp_w = np.asarray(p["mlp"][0]["w"])
    mlp_b = np.asarray(p["mlp"][0]["b"])
    h = np.maximum(neigh_v.reshape(-1, 4) @ mlp_w + mlp_b, 0).reshape(3, 6, -1)
    fn = red(h, axis=1) @ np.asarray(p["neigh_w"])
    fs = self_v @ np.asarray(p["self_w"])
    np.testing.assert_allclose(
        np.asarray(out), np.concatenate([fs, fn], 1), rtol=1e-3, atol=1e-4
    )


def test_twomaxpool_shapes():
    p = init_aggregator("twomaxpool", jax.random.key(0), 4, 5)
    out = apply_aggregator(
        "twomaxpool", p, jnp.ones((2, 4)), jnp.ones((2, 3, 4)),
        act=lambda x: x, concat=True,
    )
    assert out.shape == (2, 10)
    assert len(p["mlp"]) == 2
    assert p["mlp"][0]["w"].shape == (4, 512)
    assert p["mlp"][1]["w"].shape == (512, 256)


def test_lstm_matches_numpy_reference():
    """Scan LSTM vs a NumPy BasicLSTMCell loop with sequence stopping."""
    rng = np.random.default_rng(4)
    n, s, d, h = 3, 5, 4, 6
    seq = rng.normal(size=(n, s, d)).astype(np.float32)
    lengths = np.array([5, 2, 3], dtype=np.int32)
    p = init_lstm(jax.random.key(0), d, h)
    out = lstm_last_output(p, jnp.asarray(seq), jnp.asarray(lengths))

    kernel = np.asarray(p["kernel"])
    bias = np.asarray(p["bias"])

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    expect = np.zeros((n, h), dtype=np.float32)
    for b in range(n):
        hh = np.zeros(h)
        cc = np.zeros(h)
        for t in range(lengths[b]):
            gates = np.concatenate([seq[b, t], hh]) @ kernel + bias
            i, j, f, o = np.split(gates, 4)
            cc = cc * sigmoid(f + 1.0) + sigmoid(i) * np.tanh(j)
            hh = np.tanh(cc) * sigmoid(o)
        expect[b] = hh
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_neighbor_lengths_zero_rows():
    x = np.ones((2, 4, 3), dtype=np.float32)
    x[0, 2:] = 0.0  # two zero rows -> length 2
    x[1, :] = 0.0   # all zero -> clamp to 1
    lengths = neighbor_lengths(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(lengths), [2, 1])


def test_seq_aggregator_runs():
    p = init_aggregator("seq", jax.random.key(0), 4, 5)
    out = apply_aggregator(
        "seq", p, jnp.ones((2, 4)), jnp.ones((2, 3, 4)),
        act=lambda x: x, concat=True,
    )
    assert out.shape == (2, 10)
    assert p["lstm"]["kernel"].shape == (4 + 128, 512)


def test_uniform_sampler_values_come_from_adj():
    adj = np.arange(50, dtype=np.int32).reshape(10, 5) % 10
    ids = jnp.asarray([0, 3, 7], dtype=jnp.int32)
    out = uniform_sample(jax.random.key(0), jnp.asarray(adj), ids, 4)
    assert out.shape == (3, 4)
    for row, nid in zip(np.asarray(out), [0, 3, 7]):
        assert set(row.tolist()) <= set(adj[nid].tolist())


def test_shared_perm_mode_shares_columns():
    adj = np.tile(np.arange(6, dtype=np.int32), (4, 1))
    out = uniform_sample(
        jax.random.key(1), jnp.asarray(adj), jnp.arange(4), 3,
        mode="shared_perm",
    )
    arr = np.asarray(out)
    # every node saw the same column permutation
    assert (arr == arr[0]).all()
    # slices are distinct columns (no replacement)
    assert len(set(arr[0].tolist())) == 3


def test_negative_sampler_distribution():
    degrees = np.array([0, 1, 16, 81, 0], dtype=np.float64)
    cdf = unigram_cdf(degrees)
    idx = np.asarray(sample_negatives(jax.random.key(0), jnp.asarray(cdf), 20000))
    counts = np.bincount(idx, minlength=5)
    assert counts[0] == 0 and counts[4] == 0  # zero-degree never sampled
    p = degrees ** 0.75
    p = p / p.sum()
    emp = counts / counts.sum()
    np.testing.assert_allclose(emp[1:4], p[1:4], atol=0.02)


def test_negative_sampler_unique():
    degrees = np.arange(1, 33, dtype=np.float64)
    logits = unigram_logits(jnp.asarray(degrees))
    idx = np.asarray(sample_negatives_unique(jax.random.key(0), logits, 10))
    assert len(set(idx.tolist())) == 10


def test_xent_loss_matches_numpy():
    rng = np.random.default_rng(5)
    x1 = rng.normal(size=(4, 3)).astype(np.float32)
    x2 = rng.normal(size=(4, 3)).astype(np.float32)
    neg = rng.normal(size=(7, 3)).astype(np.float32)
    loss = prediction.edge_pred_loss(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(neg)
    )
    aff = (x1 * x2).sum(1)
    naff = x1 @ neg.T

    def xent(labels, logits):
        return np.maximum(logits, 0) - logits * labels + np.log1p(
            np.exp(-np.abs(logits))
        )

    expect = xent(np.ones_like(aff), aff).sum() + xent(
        np.zeros_like(naff), naff
    ).sum()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_mask_zeroes_padded_rows():
    x1 = jnp.ones((3, 2))
    x2 = jnp.ones((3, 2))
    neg = jnp.ones((4, 2))
    mask = jnp.asarray([1.0, 1.0, 0.0])
    full = prediction.edge_pred_loss(x1[:2], x2[:2], neg)
    masked = prediction.edge_pred_loss(x1, x2, neg, mask=mask)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_mrr_rank_semantics_with_ties():
    aff = jnp.asarray([1.0, 0.5])
    neg_aff = jnp.asarray([[0.2, 1.0, 0.1], [0.6, 0.7, 0.8]])
    ranks, mrr = prediction.mrr_and_ranks(aff, neg_aff)
    # row 0: one tie -> positive ranks second; row 1: below all three
    np.testing.assert_array_equal(np.asarray(ranks), [2, 4])
    np.testing.assert_allclose(float(mrr), (0.5 + 0.25) / 2, rtol=1e-6)


def test_hinge_and_skipgram_losses():
    aff = jnp.asarray([1.0, 2.0])
    neg_aff = jnp.asarray([[1.5, 0.0], [0.5, 0.5]])
    h = prediction.hinge_loss(aff, neg_aff)
    # relu(neg - (aff - 0.1)): [0.6, 0] ; [0, 0]
    np.testing.assert_allclose(float(h), 0.6, rtol=1e-5)
    s = prediction.skipgram_loss(aff, neg_aff)
    expect = (1.0 - np.log(np.exp(1.5) + 1)) + (
        2.0 - np.log(2 * np.exp(0.5))
    )
    np.testing.assert_allclose(float(s), expect, rtol=1e-3)


def test_bilinear_affinity():
    key = jax.random.key(0)
    p = prediction.init_bilinear(key, 3, 3)
    x1 = jnp.ones((2, 3))
    x2 = jnp.ones((2, 3))
    aff = prediction.affinity(x1, x2, p)
    expect = (np.ones((2, 3)) * (np.ones((2, 3)) @ np.asarray(p["w"]).T)).sum(1)
    np.testing.assert_allclose(np.asarray(aff), expect, rtol=1e-5)


def test_all_aggregators_jit_and_grad():
    """Every aggregator compiles under jit and differentiates."""
    for name in AGGREGATORS:
        p = init_aggregator(name, jax.random.key(0), 4, 3)

        def loss(params):
            out = apply_aggregator(
                name, params, jnp.ones((2, 4)), jnp.ones((2, 5, 4)),
                act=jax.nn.relu, concat=False,
            )
            return jnp.sum(out ** 2)

        g = jax.jit(jax.grad(loss))(p)
        flat, _ = jax.tree.flatten(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat), name


def test_seq_aggregator_bfloat16_inputs(np_rng):
    """--feature_dtype bfloat16 feeds the aggregators bf16 neighbor
    rows; the LSTM's f32 carry must not trip the scan dtype check
    (regression: bf16 h0/c0 vs f32 gate outputs crashed the scan)."""
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.nn.aggregators import apply_seq, init_seq

    params = init_seq(jax.random.key(0), 16, 8)
    self_vecs = np_rng.standard_normal((4, 16)).astype(np.float32)
    neigh = np_rng.standard_normal((4, 5, 16)).astype(np.float32)
    out32 = apply_seq(params, jnp.asarray(self_vecs),
                      jnp.asarray(neigh), act=jax.nn.relu, concat=True)
    out16 = apply_seq(params, jnp.asarray(self_vecs),
                      jnp.asarray(neigh).astype(jnp.bfloat16),
                      act=jax.nn.relu, concat=True)
    assert np.isfinite(np.asarray(out16, dtype=np.float32)).all()
    np.testing.assert_allclose(np.asarray(out16, dtype=np.float32),
                               np.asarray(out32), rtol=5e-2, atol=5e-2)
