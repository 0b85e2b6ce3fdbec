"""Decompose the supervised train step's time on hardware.

Measures, at the bench shape (zipf adjacency), chained-dispatch times
for: the full train step, forward-only loss, the sample+gather pyramid
alone, and the innermost fused gather alone — so the optimization
budget outside the saturated gather kernel is visible.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     timeout 3000 python benchmarks/step_profile.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import graphsage_tpu.train  # noqa: F401  (persistent compile cache)
from bench import (
    BATCH,
    DIMS,
    FANOUTS,
    FEAT_DIM,
    MAX_DEGREE,
    NUM_CLASSES,
    NUM_NODES,
    zipf_adjacency,
)

INNER = 20
ITERS = 5


def main():
    from graphsage_tpu.models.graphsage import (
        LayerInfo,
        SAGEConfig,
        sage_embed,
    )
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
        supervised_loss,
    )
    from graphsage_tpu.nn.sampler import uniform_sample
    from graphsage_tpu.ops.gather import fused_gather_mean, pad_feature_dim

    sage = SAGEConfig(
        layers=(LayerInfo(FANOUTS[0], DIMS[0]),
                LayerInfo(FANOUTS[1], DIMS[1])),
        feature_dim=FEAT_DIM, aggregator="mean", concat=True,
        fused_gather=True,
    )
    config = SupervisedConfig(sage=sage, num_classes=NUM_CLASSES)
    rng_np = np.random.default_rng(0)
    features = jnp.asarray(pad_feature_dim(np.vstack([
        rng_np.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
        np.zeros((1, FEAT_DIM), np.float32),
    ])))
    adj = jnp.asarray(zipf_adjacency(rng_np))
    labels = jnp.asarray(np.eye(NUM_CLASSES, dtype=np.float32)[
        rng_np.integers(0, NUM_CLASSES, (BATCH,))
    ])
    mask = jnp.ones((BATCH,), jnp.float32)
    ids0 = jnp.asarray(
        rng_np.integers(0, NUM_NODES, (BATCH,), dtype=np.int32)
    )
    params = init_supervised_params(jax.random.key(0), config)
    optimizer = make_optimizer(1e-2)
    opt_state0 = optimizer.init(params)

    import optax

    def chained(fn, n_outputs_feedback):
        """INNER sequenced invocations inside one jit; fn must return a
        f32 scalar-reducible output used to perturb the next input."""

        def many(params, opt_state, features, adj, ids):
            def body(i, carry):
                params, opt_state, acc = carry
                r = jax.random.fold_in(jax.random.key(3), i)
                ids_i = (ids + acc.astype(jnp.int32)) % NUM_NODES
                params, opt_state, out = fn(params, opt_state, r,
                                            features, adj, ids_i)
                return (params, opt_state, out * 0.0)

            return jax.lax.fori_loop(
                0, INNER, body, (params, opt_state, jnp.zeros(()))
            )[2]

        return jax.jit(many)

    def full_step(params, opt_state, r, features, adj, ids):
        (loss, _), grads = jax.value_and_grad(
            supervised_loss, has_aux=True
        )(params, features, adj, ids, labels, mask, r, config,
          deterministic=False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def fwd_only(params, opt_state, r, features, adj, ids):
        loss, _ = supervised_loss(params, features, adj, ids, labels,
                                  mask, r, config, deterministic=False)
        return params, opt_state, loss

    def embed_only(params, opt_state, r, features, adj, ids):
        out = sage_embed(params, features, adj, ids, r, sage,
                         deterministic=True)
        return params, opt_state, jnp.sum(out)

    def gathers_only(params, opt_state, r, features, adj, ids):
        # the sample pyramid + the two feature gathers, no aggregation
        r1, r2 = jax.random.split(r)
        s2 = uniform_sample(r1, adj, ids, FANOUTS[1]).reshape(-1)
        s3 = uniform_sample(r2, adj, s2, FANOUTS[0])
        h3 = fused_gather_mean(features, s3)
        h2 = jnp.take(features, s2, axis=0)
        return params, opt_state, jnp.sum(h3) + jnp.sum(h2)

    def inner_gather_only(params, opt_state, r, features, adj, ids):
        r1, r2 = jax.random.split(r)
        s2 = uniform_sample(r1, adj, ids, FANOUTS[1]).reshape(-1)
        s3 = uniform_sample(r2, adj, s2, FANOUTS[0])
        return params, opt_state, jnp.sum(fused_gather_mean(features, s3))

    cases = [
        ("full_step(fwd+bwd+adam)", full_step),
        ("forward_loss_only", fwd_only),
        ("sage_embed_only", embed_only),
        ("sample+gathers_only", gathers_only),
        ("sample+inner_gather", inner_gather_only),
    ]
    for name, fn in cases:
        try:
            many = chained(fn, 1)
            out = many(params, opt_state0, features, adj, ids0)
            float(out)
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                out = many(params, opt_state0, features, adj, ids0)
                float(out)
                best = min(best, time.perf_counter() - t0)
            print(f"{name:26s} {best/INNER*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
