"""Fused gather->MLP->pool kernel: forward parity (interpret mode),
training-path gradient parity vs XLA autodiff (including max-tie and
dead-relu routing), and model-level fused-vs-unfused equality."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.ops.gather import pad_feature_dim
from graphsage_tpu.ops.pool import (
    fused_gather_mlp_pool,
    gather_mlp_pool_reference,
    gather_mlp_pool_train,
)

B, S, F_LOGICAL, H = 12, 5, 100, 128
N = 40


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((N, F_LOGICAL)).astype(np.float32)
    feats[7] = feats[3]  # duplicate rows -> max ties across neighbors
    feats[11] = -np.abs(feats[11]) - 1.0  # all-negative -> dead relu rows
    features = jnp.asarray(pad_feature_dim(feats))
    idx = rng.integers(0, N, (B, S)).astype(np.int32)
    idx[0, :] = 3  # every neighbor identical -> S-way max tie
    idx[1, :2] = [3, 7]  # duplicate-feature neighbors -> 2-way tie
    idx = jnp.asarray(idx)
    w = jnp.asarray(rng.standard_normal((F_LOGICAL, H)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    return features, idx, w, b


@pytest.mark.parametrize("reduce", ["max", "mean"])
def test_forward_interpret_matches_reference(setup, reduce):
    features, idx, w, b = setup
    ref = gather_mlp_pool_reference(features, idx, w, b, reduce)
    out = fused_gather_mlp_pool(features, idx, w, b, reduce,
                                interpret=True, tile_b=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", ["max", "mean"])
def test_train_grads_match_xla_autodiff(setup, reduce):
    """The custom VJP (recompute-from-saved-X backward) must equal XLA
    autodiff of the same composition — including jnp.max's even
    tie-splitting and relu' = 0 at z <= 0."""
    features, idx, w, b = setup
    cot = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, H)).astype(np.float32)
    )

    def ours(w, b):
        return jnp.sum(gather_mlp_pool_train(reduce, 0.0, features, idx, w, b)
                       * cot)

    def ref(w, b):
        return jnp.sum(gather_mlp_pool_reference(features, idx, w, b,
                                                 reduce) * cot)

    (gv_w, gv_b) = jax.grad(ours, argnums=(0, 1))(w, b)
    (rw, rb) = jax.grad(ref, argnums=(0, 1))(w, b)
    np.testing.assert_allclose(np.asarray(gv_w), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_b), np.asarray(rb),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduce", ["max", "mean"])
def test_train_forward_value(setup, reduce):
    features, idx, w, b = setup
    out = gather_mlp_pool_train(reduce, 0.0, features, idx, w, b)
    ref = gather_mlp_pool_reference(features, idx, w, b, reduce)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_residual_stream_matches_take(setup):
    """The training forward's second output (gathered rows X, the
    backward residual) must equal a plain take, interpret mode."""
    from graphsage_tpu.ops.pool import _pad_w, _pool_fwd_impl

    features, idx, w, b = setup
    wp = _pad_w(features, w)
    out, x = _pool_fwd_impl(features, idx, wp, b, "max", True, 4,
                            interpret=True)
    rows = jnp.take(features, idx.reshape(-1), axis=0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(rows),
                               rtol=1e-6, atol=1e-6)
    ref = gather_mlp_pool_reference(features, idx, w, b, "max")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("agg", ["maxpool", "meanpool"])
def test_model_fused_matches_unfused(agg):
    """sage_embed's fast-path routing is gradient-exact vs the plain
    path under the deterministic first_k sampler. meanpool engages the
    fused gather->MLP->pool route via fused_gather=True (XLA fallback
    branch of gather_mlp_pool_train on CPU — a distinct code path from
    the plain aggregator). maxpool has NO fused-pool route; it must opt
    in via rows_gather=True, exercised here with the row-gather kernel
    interpret-mocked so the routing really diverges from plain take
    (kernel dispatch itself is pinned in test_ops/test_model_kernel_
    dispatch_interpret)."""
    import unittest.mock

    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        init_sage_params,
        sage_embed,
    )
    from graphsage_tpu.ops import gather as gather_mod

    rng = np.random.default_rng(2)
    num_nodes = 30
    feats = np.vstack([
        rng.standard_normal((num_nodes, F_LOGICAL)).astype(np.float32),
        np.zeros((1, F_LOGICAL), np.float32),
    ])
    features = jnp.asarray(pad_feature_dim(feats))
    adj = jnp.asarray(rng.integers(
        0, num_nodes, (num_nodes + 1, 6), dtype=np.int32))
    ids = jnp.arange(8, dtype=jnp.int32)
    base = SAGEConfig(
        layers=(LayerInfo(4, 16), LayerInfo(3, 16)),
        feature_dim=F_LOGICAL, aggregator=agg, concat=True,
        num_nodes=num_nodes, sampler_mode="first_k",
    )
    params = init_sage_params(jax.random.key(0), base)
    key = jax.random.key(1)

    def emb_sum(p, cfg):
        return jnp.sum(sage_embed(p, features, adj, ids, key, cfg,
                                  deterministic=True) ** 2)

    import contextlib

    if agg == "meanpool":
        cfg_f = dataclasses.replace(base, fused_gather=True)
        patch = contextlib.nullcontext()
    else:
        cfg_f = dataclasses.replace(base, rows_gather=True)
        orig_rows = gather_mod.fused_gather_rows

        def interp_rows(*a, **kw):
            kw["interpret"] = True
            return orig_rows(*a, **kw)

        patch = unittest.mock.patch.object(
            gather_mod, "fused_gather_rows", side_effect=interp_rows
        )

    out_plain = sage_embed(params, features, adj, ids, key, base, True)
    with patch:
        out_fused = sage_embed(params, features, adj, ids, key, cfg_f,
                               True)
        g_fused = jax.grad(emb_sum)(params, cfg_f)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_plain),
                               rtol=1e-5, atol=1e-6)

    g_plain = jax.grad(emb_sum)(params, base)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, c in zip(flat_p, flat_f):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


# --------------------- in-kernel dropout (round 5) ---------------------

def test_train_dropout_fallback_matches_masked_replica(setup):
    """CPU fallback with drop_rate: the mask comes from the seed via
    jax.random, so an explicit replica with the same key must match the
    forward AND the (w, b) gradients exactly — this pins the dropped-
    residual backward (grads are exact for the realized mask)."""
    from graphsage_tpu.ops.gather import _key_words
    from graphsage_tpu.ops.pool import _pad_w

    features, idx, w, b = setup
    rate = 0.4
    seed = _key_words(jax.random.key(5))
    wp = _pad_w(features, w)

    def replica(w_, b_):
        x = jnp.take(features, idx.reshape(-1), axis=0).astype(jnp.float32)
        k = jax.random.wrap_key_data(
            jax.lax.bitcast_convert_type(seed, jnp.uint32)
        )
        mask = jax.random.bernoulli(k, 1.0 - rate, x.shape)
        x = jnp.where(mask, x * (1.0 / (1.0 - rate)), 0.0)
        wp_ = _pad_w(features, w_)
        h = jax.nn.relu(
            jnp.dot(x, wp_, preferred_element_type=jnp.float32) + b_
        ).reshape(B, S, -1)
        return jnp.mean(h, axis=1)

    out = gather_mlp_pool_train("mean", rate, features, idx, w, b, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(replica(w, b)),
                               rtol=1e-5, atol=1e-6)

    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, H)).astype(np.float32)
    )
    g_ours = jax.grad(
        lambda w_, b_: jnp.sum(
            gather_mlp_pool_train("mean", rate, features, idx, w_, b_,
                                  seed) * cot
        ),
        argnums=(0, 1),
    )(w, b)
    g_ref = jax.grad(
        lambda w_, b_: jnp.sum(replica(w_, b_) * cot), argnums=(0, 1)
    )(w, b)
    for a, c in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_chunk_seed_derivation_is_fold_in():
    """Per-chunk kernel seeds must come from jax.random.fold_in on the
    underlying key (the same mixing ops.gather's chunk path uses), NOT
    a raw +c on seed word 0 — adjacent hardware PRNG seeds are not
    guaranteed decorrelated."""
    from graphsage_tpu.ops.gather import _key_words
    from graphsage_tpu.ops.pool import _fold_seed_words

    key = jax.random.key(42)
    seed = _key_words(key)
    for c in (0, 1, 2, 7):
        got = np.asarray(_fold_seed_words(seed, c))
        want = np.asarray(_key_words(jax.random.fold_in(key, c)))
        np.testing.assert_array_equal(got, want)
    w0 = np.asarray(_fold_seed_words(seed, 0))
    w1 = np.asarray(_fold_seed_words(seed, 1))
    assert (w0 != w1).any()
    # regression pin: NOT the old raw word-0 offset
    assert not np.array_equal(
        w1, np.asarray(seed) + np.array([1, 0], np.int32)
    )


def test_model_kernel_dispatch_interpret(monkeypatch):
    """sage_embed's use_fused_pool branch driving the ACTUAL Pallas
    kernel (Mosaic interpreter on CPU via the _FORCE_INTERPRET hook):
    pins the model->kernel operand order, tile padding, and the custom
    VJP residual path — which otherwise run only on real TPU (the plain
    fused-vs-unfused tests compare the XLA fallback against itself on
    CPU). Shapes here are deliberately distinct from the other model
    tests: jit caches don't key on the hook."""
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        init_sage_params,
        sage_embed,
    )
    from graphsage_tpu.ops import pool as pool_mod

    rng = np.random.default_rng(6)
    num_nodes = 22
    f_dim = 72  # unique across the suite (see docstring)
    feats = np.vstack([
        rng.standard_normal((num_nodes, f_dim)).astype(np.float32),
        np.zeros((1, f_dim), np.float32),
    ])
    features = jnp.asarray(pad_feature_dim(feats))
    adj = jnp.asarray(rng.integers(
        0, num_nodes, (num_nodes + 1, 5), dtype=np.int32))
    ids = jnp.arange(6, dtype=jnp.int32)
    base = SAGEConfig(
        layers=(LayerInfo(3, 24), LayerInfo(2, 24)),
        feature_dim=f_dim, aggregator="meanpool", concat=True,
        num_nodes=num_nodes, sampler_mode="first_k",
    )
    params = init_sage_params(jax.random.key(3), base)
    key = jax.random.key(4)

    import dataclasses

    cfg_f = dataclasses.replace(base, fused_gather=True)

    def emb_sum(p, cfg):
        return jnp.sum(sage_embed(p, features, adj, ids, key, cfg,
                                  deterministic=True) ** 2)

    out_plain = sage_embed(params, features, adj, ids, key, base, True)
    g_plain = jax.grad(emb_sum)(params, base)

    monkeypatch.setattr(pool_mod, "_FORCE_INTERPRET", True)
    out_fused = sage_embed(params, features, adj, ids, key, cfg_f, True)
    g_fused = jax.grad(emb_sum)(params, cfg_f)

    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_plain),
                               rtol=1e-5, atol=1e-6)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, c in zip(flat_p, flat_f):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() in ("cpu", "gpu"),
                    reason="Mosaic PRNG statistics need real TPU")
def test_pool_chunk_dropout_decorrelation_tpu():
    """B > 1024 splits the pool kernel into per-chunk calls whose seeds
    are fold_in-derived: identical rows in different chunks must realize
    different dropout masks (the pool analogue of the gather kernel's
    chunk test; verified on hardware 2026-08-20)."""
    from graphsage_tpu.ops.gather import _key_words
    from graphsage_tpu.ops.pool import _pad_w, _pool_fwd_impl

    feats = jnp.asarray(pad_feature_dim(np.ones((64, 128), np.float32)))
    idx = jnp.zeros((2048, 1), jnp.int32)
    w = jnp.asarray(np.eye(128, dtype=np.float32))
    b = jnp.zeros((128,), jnp.float32)
    seed = _key_words(jax.random.key(21))
    wp = _pad_w(feats, w)
    _, x = _pool_fwd_impl(feats, idx, wp, b, "mean", True, 32,
                          drop_rate=0.4, seed=seed)
    x = np.asarray(x)  # the residual holds the DROPPED rows
    m0, m1 = (x[:1024] == 0), (x[1024:] == 0)
    assert (m0 != m1).any()
    zf = (x == 0).mean()
    assert abs(zf - 0.4) < 0.02, zf


@pytest.mark.parametrize("reduce", ["max", "mean"])
def test_train_dropout_interpret_residual_consistency(setup, reduce):
    """Kernel path (interpret) with dropout: whatever mask the PRNG
    realizes, the pooled output must equal pool(relu(residual @ w + b))
    — the mask-independent invariant that makes the backward exact."""
    from graphsage_tpu.ops.gather import _key_words
    from graphsage_tpu.ops.pool import _pad_w, _pool_fwd_impl

    features, idx, w, b = setup
    seed = _key_words(jax.random.key(9))
    wp = _pad_w(features, w)
    out, x = _pool_fwd_impl(features, idx, wp, b, reduce, True, 4,
                            interpret=True, drop_rate=0.3, seed=seed)
    h = jax.nn.relu(
        jnp.dot(x, wp, preferred_element_type=jnp.float32) + b
    ).reshape(B, S, -1)
    ref = jnp.max(h, axis=1) if reduce == "max" else jnp.mean(h, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
