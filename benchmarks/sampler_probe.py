"""Measure the XLA sampling path's cost per sampler mode on hardware.

Round-3 step profile (KERNEL_NOTES.md) attributes ~1.1 ms of the
4.90 ms step to sampling: two adjacency row-gathers plus
``take_along_axis`` column picks (the [5120, 25] pick is 128k
element-level XLA gathers). The reference's own sampler draws ONE
shared column permutation per call (neigh_samplers.py:24-29 — our
``shared_perm`` mode), which replaces the element gathers with a
shared column slice. This probe times, chained-dispatch at the bench
shape:

  - sampling-only (both hops, no feature gather) per mode
  - sample + fused inner gather per mode
  - full supervised train step per mode

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     timeout 3000 python benchmarks/sampler_probe.py
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
    NUM_CLASSES,
    NUM_NODES,
    zipf_adjacency,
)

INNER = 20
ITERS = 5
MODES = ("independent", "shared_perm", "first_k")


def main():
    import optax

    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
        supervised_loss,
    )
    from graphsage_tpu.nn.sampler import uniform_sample
    from graphsage_tpu.ops.gather import fused_gather_mean, pad_feature_dim

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

    def chained(fn):
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

    def time_case(name, fn, params, opt_state):
        many = chained(fn)
        out = many(params, opt_state, features, adj, ids0)
        float(out)
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = many(params, opt_state, features, adj, ids0)
            float(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:38s} {best / INNER * 1e3:8.3f} ms", flush=True)

    for mode in MODES:
        sage = SAGEConfig(
            layers=(LayerInfo(FANOUTS[0], DIMS[0]),
                    LayerInfo(FANOUTS[1], DIMS[1])),
            feature_dim=FEAT_DIM, aggregator="mean", concat=True,
            fused_gather=True, sampler_mode=mode,
        )
        config = SupervisedConfig(sage=sage, num_classes=NUM_CLASSES)
        params = init_supervised_params(jax.random.key(0), config)
        optimizer = make_optimizer(1e-2)
        opt_state0 = optimizer.init(params)

        def sampling_only(params, opt_state, r, features, adj, ids,
                          mode=mode):
            r1, r2 = jax.random.split(r)
            s2 = uniform_sample(r1, adj, ids, FANOUTS[1],
                                mode=mode).reshape(-1)
            s3 = uniform_sample(r2, adj, s2, FANOUTS[0], mode=mode)
            return params, opt_state, jnp.sum(s3) * 1e-9 + jnp.sum(s2)

        def sample_gather(params, opt_state, r, features, adj, ids,
                          mode=mode):
            r1, r2 = jax.random.split(r)
            s2 = uniform_sample(r1, adj, ids, FANOUTS[1],
                                mode=mode).reshape(-1)
            s3 = uniform_sample(r2, adj, s2, FANOUTS[0], mode=mode)
            return params, opt_state, jnp.sum(fused_gather_mean(features, s3))

        def full_step(params, opt_state, r, features, adj, ids,
                      config=config, optimizer=optimizer):
            (loss, _), grads = jax.value_and_grad(
                supervised_loss, has_aux=True
            )(params, features, adj, ids, labels, mask, r, config,
              deterministic=False)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        time_case(f"[{mode}] sampling_only", sampling_only,
                  params, opt_state0)
        time_case(f"[{mode}] sample+inner_gather", sample_gather,
                  params, opt_state0)
        time_case(f"[{mode}] full_step", full_step, params, opt_state0)


if __name__ == "__main__":
    main()
