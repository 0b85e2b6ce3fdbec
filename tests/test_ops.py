"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.ops.gather import fused_gather_mean, gather_mean_reference


@pytest.mark.parametrize("B,S,F", [(8, 5, 16), (13, 25, 32), (1, 1, 8)])
def test_fused_gather_mean_matches_reference(np_rng, B, S, F):
    feats = jnp.asarray(
        np_rng.standard_normal((40, F)).astype(np.float32)
    )
    idx = jnp.asarray(np_rng.integers(0, 40, (B, S), dtype=np.int32))
    ref = gather_mean_reference(feats, idx)
    out = fused_gather_mean(feats, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_pad_feature_dim_dtype_aware(np_rng):
    from graphsage_tpu.ops.gather import pad_feature_dim

    x = np_rng.standard_normal((4, 602)).astype(np.float32)
    assert pad_feature_dim(x).shape[1] == 640           # 128-mult for f32
    assert pad_feature_dim(x, jnp.bfloat16).shape[1] == 768  # 256 for bf16
    assert pad_feature_dim(np.zeros((2, 256)), jnp.bfloat16).shape[1] == 256


@pytest.mark.parametrize("model", ["graphsage_mean", "gcn",
                                   "graphsage_maxpool",
                                   "graphsage_meanpool", "graphsage_seq"])
def test_feature_dtype_bfloat16_trains(tmp_path, model):
    """--feature_dtype bfloat16 must train under EVERY aggregator
    (regression: the seq/LSTM path crashed on a bf16 scan carry)."""
    from graphsage_tpu.data.synthetic import make_synthetic_graph
    from graphsage_tpu.train.supervised import train
    from tests.test_train import tiny_flags

    g = make_synthetic_graph(num_nodes=80, num_classes=3, feat_dim=8, seed=3)
    flags = tiny_flags(tmp_path, feature_dtype="bfloat16", epochs=1,
                       max_total_steps=5, model=model)
    result = train(flags, graph=g)
    assert np.isfinite(result["val_loss"])


def test_fused_gather_mean_bf16_input(np_rng):
    feats = jnp.asarray(
        np_rng.standard_normal((32, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray(np_rng.integers(0, 32, (8, 4), dtype=np.int32))
    out = fused_gather_mean(feats, idx, interpret=True)
    ref = jnp.take(feats.astype(jnp.float32), idx, axis=0).mean(axis=1)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2)


@pytest.mark.parametrize("aggregator,identity_dim",
                         [("mean", 0), ("gcn", 0), ("mean", 4),
                          ("meanpool", 0),
                          ("seq", 0), ("maxpool", 4), ("twomaxpool", 0)])
def test_sage_embed_fused_matches_unfused(toy_graph, aggregator,
                                          identity_dim):
    """The model-level fast path is numerically identical to the default
    path when sampling indices agree (same rng, dropout=0). gcn rides
    the same kernel via the (S*mean + self)/(S+1) recombination;
    identity_dim splits the trainable identity columns onto the
    differentiable XLA take; meanpool rides the fused gather->MLP->pool
    kernel (ops/pool.py); seq/maxpool/twomaxpool exercise the opt-in
    row-gather kernel (rows_gather=True)."""
    import dataclasses

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        init_sage_params,
        sage_embed,
    )

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = jnp.asarray(g.padded_features())
    adj = jnp.asarray(adj)
    config = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator=aggregator,
        concat=aggregator != "gcn",
        identity_dim=identity_dim,
        num_nodes=g.num_nodes,
    )
    params = init_sage_params(jax.random.key(0), config)
    ids = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.key(1)

    out_plain = sage_embed(params, feats, adj, ids, key, config)

    fused_cfg = dataclasses.replace(config, fused_gather=True,
                                    rows_gather=True)
    # interpret mode so the Pallas kernels run on CPU
    import unittest.mock

    from graphsage_tpu.ops import gather as gather_mod

    orig_mean = gather_mod.fused_gather_mean
    orig_rows = gather_mod.fused_gather_rows

    def interp_mean(*a, **kw):
        kw["interpret"] = True
        return orig_mean(*a, **kw)

    def interp_rows(*a, **kw):
        kw["interpret"] = True
        return orig_rows(*a, **kw)

    with unittest.mock.patch.object(
        gather_mod, "fused_gather_mean", side_effect=interp_mean
    ), unittest.mock.patch.object(
        gather_mod, "fused_gather_rows", side_effect=interp_rows
    ):
        out_fused = sage_embed(params, feats, adj, ids, key, fused_cfg)

    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), rtol=1e-4, atol=1e-5
    )


def test_dedup_compact_semantics(np_rng):
    from graphsage_tpu.ops.gather import dedup_compact

    idx = jnp.asarray([[3, 1, 3, 3, 7], [2, 2, 2, 2, 2]], dtype=jnp.int32)
    idx_u, n_u, w = dedup_compact(idx)
    np.testing.assert_array_equal(np.asarray(n_u), [3, 1])
    np.testing.assert_array_equal(np.asarray(idx_u)[0, :3], [1, 3, 7])
    np.testing.assert_array_equal(np.asarray(idx_u)[1, :1], [2])
    np.testing.assert_allclose(
        np.asarray(w),
        [[0.2, 0.6, 0.2, 0.0, 0.0], [1.0, 0, 0, 0, 0]],
    )


@pytest.mark.parametrize("B,S,F", [(8, 5, 16), (13, 25, 32)])
def test_fused_gather_mean_dedup_matches_reference(np_rng, B, S, F):
    feats = jnp.asarray(np_rng.standard_normal((10, F)).astype(np.float32))
    # small table -> many duplicate draws
    idx = jnp.asarray(np_rng.integers(0, 10, (B, S), dtype=np.int32))
    ref = gather_mean_reference(feats, idx)
    out = fused_gather_mean(feats, idx, interpret=True, dedup=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


# --------------------- in-kernel dropout (round 5) ---------------------

def test_gather_mean_dropout_fallback_semantics(np_rng):
    """XLA fallback of fused_gather_mean with drop_rate: per-element
    pre-mean dropout (the reference's placement, aggregators.py:52-53).
    With S=1 and an all-ones table, each output element is 0 w.p. rate,
    else 1/keep — checkable exactly."""
    feats = jnp.ones((64, 16), jnp.float32)
    idx = jnp.asarray(np_rng.integers(0, 64, (256, 1), dtype=np.int32))
    key = jax.random.key(7)
    out = np.asarray(
        fused_gather_mean(feats, idx, drop_rate=0.4, drop_key=key)
    )
    zero_frac = (out == 0).mean()
    assert abs(zero_frac - 0.4) < 0.05, zero_frac
    np.testing.assert_allclose(out[out != 0], 1.0 / 0.6, rtol=1e-6)
    # deterministic per key; different key -> different mask
    out2 = np.asarray(
        fused_gather_mean(feats, idx, drop_rate=0.4, drop_key=key)
    )
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(fused_gather_mean(
        feats, idx, drop_rate=0.4, drop_key=jax.random.key(8)
    ))
    assert (out3 != out).any()


def test_gather_mean_dropout_zero_rate_matches_reference(np_rng):
    feats = jnp.asarray(np_rng.standard_normal((40, 16)).astype(np.float32))
    idx = jnp.asarray(np_rng.integers(0, 40, (8, 5), dtype=np.int32))
    out = fused_gather_mean(feats, idx, drop_rate=0.0,
                            drop_key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(gather_mean_reference(feats, idx)),
                               rtol=1e-6)


def test_gather_mean_dropout_interpret_scale_path(np_rng):
    """Kernel path with dropout in interpret mode: validates the seed
    scalar-prefetch plumbing and scale path. Interpret mode stubs the
    PRNG to zero bits = all-keep, so the output must be exactly the
    reference mean scaled by 1/keep; mask statistics are asserted by
    the TPU-gated test below."""
    feats = jnp.asarray(np_rng.standard_normal((40, 128)).astype(np.float32))
    idx = jnp.asarray(np_rng.integers(0, 40, (16, 5), dtype=np.int32))
    out = fused_gather_mean(feats, idx, interpret=True, drop_rate=0.25,
                            drop_key=jax.random.key(3))
    ref = gather_mean_reference(feats, idx)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref) / 0.75,
                               rtol=1e-5, atol=1e-6)


def test_gather_mean_dropout_requires_key():
    with pytest.raises(ValueError):
        fused_gather_mean(jnp.ones((4, 8)), jnp.zeros((2, 2), jnp.int32),
                          drop_rate=0.5)


@pytest.mark.skipif(jax.default_backend() in ("cpu", "gpu"),
                    reason="Mosaic PRNG needs a real TPU")
def test_kernel_dropout_statistics_tpu(np_rng):
    """On hardware: the in-kernel mask's zero fraction tracks the rate
    and kept elements carry the 1/keep scale (S=1, all-ones table)."""
    from graphsage_tpu.ops.gather import pad_feature_dim

    feats = jnp.asarray(pad_feature_dim(np.ones((512, 128), np.float32)))
    idx = jnp.asarray(np_rng.integers(0, 512, (512, 1), dtype=np.int32))
    out = np.asarray(fused_gather_mean(
        feats, idx, drop_rate=0.4, drop_key=jax.random.key(11)
    ))
    zero_frac = (out == 0).mean()
    assert abs(zero_frac - 0.4) < 0.02, zero_frac
    np.testing.assert_allclose(out[out != 0], 1.0 / 0.6, rtol=1e-5)
    # determinism + key sensitivity on the device PRNG
    out2 = np.asarray(fused_gather_mean(
        feats, idx, drop_rate=0.4, drop_key=jax.random.key(11)
    ))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(fused_gather_mean(
        feats, idx, drop_rate=0.4, drop_key=jax.random.key(12)
    ))
    assert (out3 != out).any()
    # B > 1024 splits into per-chunk kernel calls whose keys are
    # fold_in-decorrelated: identical rows in different chunks must
    # realize different masks (verified on hardware 2026-08-19:
    # zero-fracs 0.3994/0.4015, masks differ)
    big_idx = jnp.zeros((2048, 1), jnp.int32)
    big = np.asarray(fused_gather_mean(
        feats[:64], big_idx, drop_rate=0.4, drop_key=jax.random.key(5)
    ))
    assert (((big[:1024] == 0) != (big[1024:] == 0))).any()


def test_gather_mean_dedup_with_dropout_falls_back_to_plain(np_rng):
    """dedup cannot express per-duplicate masks, so dedup=True with
    drop_rate > 0 routes through the plain path with dropout intact
    (fallback on CPU): matches the non-dedup call with the same key."""
    feats = jnp.asarray(np_rng.standard_normal((20, 16)).astype(np.float32))
    idx = jnp.asarray(np_rng.integers(0, 20, (8, 5), dtype=np.int32))
    key = jax.random.key(4)
    a = fused_gather_mean(feats, idx, dedup=True, drop_rate=0.3,
                          drop_key=key)
    b = fused_gather_mean(feats, idx, dedup=False, drop_rate=0.3,
                          drop_key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("aggregator,identity_dim",
                         [("mean", 0), ("gcn", 0), ("meanpool", 0),
                          ("mean", 4)])
def test_sage_embed_fused_dropout_trains(toy_graph, aggregator,
                                         identity_dim):
    """dropout > 0 keeps the fused path engaged (round-5: in-kernel
    dropout): the training forward is finite and stochastic-per-key,
    parameter grads flow, and eval (deterministic=True) is unaffected
    by the dropout setting."""
    import dataclasses

    from graphsage_tpu.data.adjacency import build_both_adjs
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        init_sage_params,
        sage_embed,
    )

    g = toy_graph
    adj, _, _ = build_both_adjs(g, max_degree=8)
    feats = jnp.asarray(g.padded_features())
    adj = jnp.asarray(adj)
    config = SAGEConfig(
        layers=(LayerInfo(4, 8), LayerInfo(3, 8)),
        feature_dim=feats.shape[1],
        aggregator=aggregator,
        concat=aggregator != "gcn",
        identity_dim=identity_dim,
        num_nodes=g.num_nodes,
        dropout=0.3,
        fused_gather=True,
    )
    params = init_sage_params(jax.random.key(0), config)
    ids = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.key(1)

    out_train = sage_embed(params, feats, adj, ids, key, config,
                           deterministic=False)
    assert np.isfinite(np.asarray(out_train)).all()
    # stochastic per key, deterministic for a fixed key
    again = sage_embed(params, feats, adj, ids, key, config,
                       deterministic=False)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(again))

    def loss(p):
        return jnp.sum(sage_embed(p, feats, adj, ids, key, config,
                                  deterministic=False) ** 2)

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    assert any(float(jnp.abs(a).max()) > 0 for a in flat)

    # eval path ignores dropout entirely
    out_eval = sage_embed(params, feats, adj, ids, key, config,
                          deterministic=True)
    cfg0 = dataclasses.replace(config, dropout=0.0)
    out_eval0 = sage_embed(params, feats, adj, ids, key, cfg0,
                           deterministic=True)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval0),
                               rtol=1e-6)
