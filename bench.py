"""Headline benchmark: supervised GraphSAGE-mean train-step throughput.

Reddit-shaped workload at the reference's default perf contract
(/root/reference/graphsage/supervised_train.py:32-57): batch 512,
fanout 25/10, dims 128/128, max_degree 128, 602-dim features, 41
classes, softmax head. The metric is sampled-edges aggregated per
second: batch * (S2 + S2*S1) neighbor gathers per step.

The adjacency draws neighbor ids from a zipf(1.05) distribution over
degree-ordered ids — real Reddit/PPI frontiers are hub-dominated and a
uniform-random graph hides exactly the skew (hub reuse, capacity
pressure) that matters; pass --dist uniform for the uniform variant.

Sampling uses the library default ``shared_perm`` — the reference's
own one-permutation-per-call semantics (neigh_samplers.py:24-29),
which is also ~22% faster per step than per-node independent draws
(benchmarks/sampler_probe.py).

``vs_baseline`` divides by a MEASURED reference number:
benchmarks/BASELINE_MEASURED.json, produced by
benchmarks/reference_actual_baseline.py — the REFERENCE CODE ITSELF
(/root/reference's SupervisedGraphsage under tf.compat.v1, same shape,
per-step feed_dict) timed on this machine's CPU (the reference pins
TF1.8-GPU, unavailable here). ``vs_reenactment`` divides by the leaner
re-enactment of the same step (benchmarks/reference_baseline.py), a
conservative secondary denominator.
``roofline_frac`` reports step bytes-moved against the v5e ~819 GB/s
HBM peak; ``wall_frac`` reports the fused inner-hop gather's achieved
row-DMAs/s against the measured ~36M/s scalar-issue wall
(benchmarks/KERNEL_NOTES.md facts 2-4) — the binding constraint of the
step program in isolation. Values >1 are real: the headline timing
runs the trainers' chunked fori_loop mode, where step k+1's
params-independent sampling + gather DMA issues overlap step k's
backward/Adam tail, hiding part of the wall across step boundaries
(``sec_per_step_dispatch`` shows the unoverlapped per-dispatch mode).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_NODES = 100_000
FEAT_DIM = 602
NUM_CLASSES = 41
MAX_DEGREE = 128
BATCH = 512
FANOUTS = (25, 10)
DIMS = (128, 128)
WARMUP = 5
ITERS = 100
HBM_PEAK_BYTES_PER_S = 819e9  # TPU v5e (lite) HBM bandwidth
# measured scalar-issue wall for single-row DMAs on this chip
# (benchmarks/KERNEL_NOTES.md round-2 measurements)
ROW_DMA_WALL_PER_S = 36.1e6


def zipf_adjacency(rng, alpha: float = 1.05):
    """[N+1, max_degree] neighbor ids drawn zipf over degree-ordered ids:
    id 0 is the biggest hub. Matches power-law frontier skew."""
    ranks = np.arange(1, NUM_NODES + 1, dtype=np.float64)
    p = ranks ** -alpha
    p /= p.sum()
    flat = rng.choice(NUM_NODES, size=(NUM_NODES + 1) * MAX_DEGREE, p=p)
    return flat.reshape(NUM_NODES + 1, MAX_DEGREE).astype(np.int32)


def build(fused: bool = True, dist: str = "zipf"):
    from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
    from graphsage_tpu.models.supervised import (
        SupervisedConfig,
        init_supervised_params,
        make_optimizer,
        supervised_loss,
    )
    from graphsage_tpu.ops.gather import pad_feature_dim

    sage = SAGEConfig(
        layers=(LayerInfo(FANOUTS[0], DIMS[0]), LayerInfo(FANOUTS[1], DIMS[1])),
        feature_dim=FEAT_DIM,
        aggregator="mean",
        concat=True,
        fused_gather=fused,
        num_nodes=NUM_NODES,
    )
    config = SupervisedConfig(sage=sage, num_classes=NUM_CLASSES,
                              sigmoid_loss=False, weight_decay=0.0)

    rng = np.random.default_rng(0)
    features = jnp.asarray(pad_feature_dim(
        np.vstack([
            rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
            np.zeros((1, FEAT_DIM), dtype=np.float32),
        ])
    ))
    if dist == "zipf":
        adj = jnp.asarray(zipf_adjacency(rng))
    else:
        adj = jnp.asarray(rng.integers(
            0, NUM_NODES, (NUM_NODES + 1, MAX_DEGREE), dtype=np.int32
        ))
    labels_idx = rng.integers(0, NUM_CLASSES, (BATCH,))
    labels = jnp.asarray(np.eye(NUM_CLASSES, dtype=np.float32)[labels_idx])
    mask = jnp.ones((BATCH,), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, NUM_NODES, (BATCH,), dtype=np.int32))

    params = init_supervised_params(jax.random.key(0), config)
    optimizer = make_optimizer(1e-2)
    opt_state = optimizer.init(params)

    import optax

    # features/adj are step ARGUMENTS, not closure captures: captured
    # concrete arrays would be baked into the HLO as 240MB of constants
    # (and reject under remote-compile payload limits).
    def step(params, opt_state, rng_key, features, adj, ids, labels, mask):
        (loss, logits), grads = jax.value_and_grad(
            supervised_loss, has_aux=True
        )(params, features, adj, ids, labels, mask, rng_key, config,
          deterministic=False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return (jax.jit(step, donate_argnums=(0, 1)), params, opt_state,
            features, adj, ids, labels, mask, config)


def measured_baseline():
    """(reference rate, provenance, re-enactment rate or None).

    The primary denominator is the ACTUAL reference code's measured rate
    (benchmarks/reference_actual_baseline.py runs /root/reference's own
    SupervisedGraphsage under tf.compat.v1); the leaner tf re-enactment
    (benchmarks/reference_baseline.py) is kept alongside as a
    conservative secondary denominator."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "BASELINE_MEASURED.json")
    try:
        with open(path) as fp:
            data = json.load(fp)
        reenact = data.get("reenactment_edges_per_sec")
        return (
            float(data["reference_edges_per_sec"]),
            data.get("provenance", "measured, see " + path),
            float(reenact) if reenact else None,
        )
    except (OSError, KeyError, ValueError):
        return 2.0e6, "ESTIMATED TF1-GPU rate (measured file missing)", None


def preflight(timeout_s: float = 150.0):
    """Fail fast if the TPU grant is wedged (or the tunnel errors).

    Killing a TPU-attached process mid-execution holds the device grant
    for ~15-25 min (CLAUDE.md hazard); every device op then hangs until
    the lease expires. benchmarks/tpu_probe.py::guarded_probe runs one
    trivial op under a watchdog so a wedge surfaces as an immediate
    diagnostic instead of a silent hang that eats the caller's whole
    timeout budget; a RAISED op is reported as a tunnel error, not a
    wedge (no lease wait needed). The watchdog must sit ABOVE the
    60-100s cold remote-compile latency (the probe imports
    graphsage_tpu.train first to enable the persistent compile cache,
    so a warm probe is ~1s); the error JSON goes to STDOUT — the
    documented invocation discards stderr, and the one-JSON-line
    contract should hold on the failure path too. The failure payload
    embeds the last committed measurement (benchmarks/BENCH_LAST.json,
    written on every successful run) so a transient wedge at
    measurement time is distinguishable from a perf regression."""
    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    from benchmarks.tpu_probe import guarded_probe

    res = guarded_probe(timeout_s)
    if res["status"] == "ok":
        return
    if res["status"] == "wedged":
        err = (f"preflight device op hung >{timeout_s:.0f}s: TPU grant "
               "likely wedged by a previously killed process; retry "
               "after the ~15-25 min lease expires")
    else:
        err = f"preflight device op raised (not a wedge): {res['error']}"
    payload = {
        "metric": "supervised_train_edges_per_sec",
        "value": 0.0,
        "unit": "edges/s/chip",
        "error": err,
    }
    try:
        with open(os.path.join(here, "benchmarks",
                               "BENCH_LAST.json")) as fp:
            payload["last_measured"] = json.load(fp)
    except (OSError, ValueError):
        pass
    print(json.dumps(payload), flush=True)
    os._exit(3 if res["status"] == "wedged" else 4)


def measure_secondaries(deadline_s: float = 1e9):
    """Short chunked-mode measurements of the non-headline paths so the
    BENCH_r* record catches regressions beyond supervised-mean-zipf
    (round-4 VERDICT item 4): gcn, identity_dim, uniform ids, the
    unsupervised three-tower step, the fused meanpool path, the
    mean+in-kernel-dropout path, and the serving embed sweep. Reuses benchmarks/agg_sweep.py's builders
    verbatim so executables hit the persistent compile cache shared
    with the sweep artifacts (AGG_SWEEP.jsonl). Any single failure is
    recorded as an error string, never fatal to the headline."""
    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    out = {}
    try:
        from benchmarks import agg_sweep
    except Exception as exc:  # pragma: no cover
        return {"error": f"agg_sweep import failed: {exc}"}
    t0 = time.perf_counter()
    for name in ("gcn", "identity64", "mean_uniform", "unsup_mean",
                 "meanpool_fused", "mean_drop"):
        if time.perf_counter() - t0 > deadline_s:
            out[name + "_skipped"] = "time budget exhausted (cold cache?)"
            continue
        agg, size, fused, sdist, idd, unsup, *extra = agg_sweep.CONFIGS[name]
        drop = extra[0] if extra else 0.0
        fn = (agg_sweep.run_unsupervised if unsup
              else agg_sweep.run_supervised)
        try:
            sec, edges = fn(name, agg, size, fused, sdist, idd, drop)
            out[name + "_edges_per_sec"] = round(edges / sec, 1)
        except Exception as exc:
            out[name + "_error"] = str(exc)[:200]
    # Serving: the whole-graph embed sweep (infer.py's hot path), same
    # shapes as benchmarks/serving_bench.py for compile-cache reuse.
    if time.perf_counter() - t0 > deadline_s:
        out["serving_skipped"] = "time budget exhausted (cold cache?)"
        return out
    try:
        from graphsage_tpu.models.graphsage import LayerInfo, SAGEConfig
        from graphsage_tpu.models.unsupervised import (
            UnsupervisedConfig,
            init_unsupervised_params,
        )
        from graphsage_tpu.ops.gather import pad_feature_dim
        from graphsage_tpu.train.unsupervised import make_embed_sweep

        sage = SAGEConfig(
            layers=(LayerInfo(FANOUTS[0], DIMS[0]),
                    LayerInfo(FANOUTS[1], DIMS[1])),
            feature_dim=FEAT_DIM, aggregator="mean", concat=True,
            fused_gather=True, num_nodes=NUM_NODES,
        )
        rng = np.random.default_rng(0)
        features = jnp.asarray(pad_feature_dim(np.vstack([
            rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32),
            np.zeros((1, FEAT_DIM), dtype=np.float32),
        ])))
        adj = jnp.asarray(zipf_adjacency(rng))
        n_b = -(-NUM_NODES // BATCH)
        ids_np = np.full((n_b * BATCH,), NUM_NODES, dtype=np.int32)
        ids_np[:NUM_NODES] = np.arange(NUM_NODES)
        ids_all = jnp.asarray(ids_np)
        uconf = UnsupervisedConfig(sage=sage)
        uparams = init_unsupervised_params(jax.random.key(0), uconf)
        sweep = make_embed_sweep(uconf, BATCH, NUM_NODES)
        key = jax.random.key(7)
        rows = sweep(uparams, features, adj, ids_all, key)
        float(rows[0, 0])
        best = float("inf")
        for _ in range(2):
            # NOT t0 — that is the function-wide deadline epoch; shadowing
            # it here would corrupt any budget check placed after this loop
            t_trial = time.perf_counter()
            rows = sweep(uparams, features, adj, ids_all, key)
            float(rows[0, 0])
            best = min(best, time.perf_counter() - t_trial)
        out["serving_embed_nodes_per_sec"] = round(n_b * BATCH / best, 1)
    except Exception as exc:
        out["serving_error"] = str(exc)[:200]
    return out


def main():
    t_main0 = time.perf_counter()
    dist = "uniform" if "--dist=uniform" in sys.argv or (
        "uniform" in sys.argv
    ) else "zipf"
    headline_only = "--headline-only" in sys.argv
    preflight()
    (step, params, opt_state, features, adj, ids, labels, mask,
     sup) = build(dist=dist)
    key = jax.random.key(1)

    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, features, adj,
                                       ids, labels, mask)
    # A device->host transfer is the only reliable completion barrier on
    # the tunneled runtime: block_until_ready returns before execution
    # finishes there, under-measuring by >10x. One fetch after a long
    # chained run amortizes the ~40ms tunnel round-trip.
    float(loss)

    # Secondary diagnostic: per-step dispatch (one jit call per step).
    # best of 3 trials: the shared tunnel adds ±7% run-to-run noise and
    # occasional multi-ms stalls; min-time is the honest device capability
    best_dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub, features,
                                           adj, ids, labels, mask)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    sec_per_step_dispatch = best_dt / ITERS

    # HEADLINE: the trainers' actual execution mode — device-resident
    # chunked epochs (lax.fori_loop inside one dispatch, rng folded
    # in-device; parallel/dp.py::make_supervised_chunk_runner). Beyond
    # killing per-step dispatch overhead, the loop lets the runtime
    # overlap step k+1's params-independent sampling+gather DMA issues
    # with step k's backward/Adam tail — measured ~20% faster than
    # per-step dispatch of the identical step program.
    from graphsage_tpu.models.supervised import (
        init_supervised_params,
        make_optimizer,
    )
    from graphsage_tpu.parallel.dp import make_supervised_chunk_runner

    # same `sup` config as the dispatch-mode section (returned by
    # build()) — the two timed sections must measure the same program
    rng_np = np.random.default_rng(3)
    cparams = init_supervised_params(jax.random.key(0), sup)
    optimizer = make_optimizer(1e-2)
    copt = optimizer.init(cparams)
    # jit exactly as the trainer does (train/supervised.py) — the raw
    # runner would eagerly re-dispatch every chunk
    runner = jax.jit(
        make_supervised_chunk_runner(sup, optimizer, BATCH),
        donate_argnums=(0, 1),
    )
    labels_table = np.zeros((NUM_NODES + 1, NUM_CLASSES), np.float32)
    labels_table[np.arange(NUM_NODES),
                 rng_np.integers(0, NUM_CLASSES, NUM_NODES)] = 1.0
    labels_dev = jnp.asarray(labels_table)
    n_total = (2 + 3) * ITERS  # 2 warmup + 3 timed chunks of ITERS steps
    ids_perm = jnp.asarray(rng_np.integers(
        0, NUM_NODES, (n_total * BATCH,), dtype=np.int32))
    ckey = jax.random.key(11)
    start = 0
    for _ in range(2):
        cparams, copt, loss, *_ = runner(
            cparams, copt, ckey, features, adj, ids_perm, labels_dev,
            start, ITERS,
        )
        start += ITERS
    float(loss)
    best_dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        cparams, copt, loss, *_ = runner(
            cparams, copt, ckey, features, adj, ids_perm, labels_dev,
            start, ITERS,
        )
        assert np.isfinite(float(loss))
        best_dt = min(best_dt, time.perf_counter() - t0)
        start += ITERS

    sec_per_step = best_dt / ITERS
    edges_per_step = BATCH * (FANOUTS[1] + FANOUTS[1] * FANOUTS[0])
    edges_per_sec = edges_per_step * ITERS / best_dt
    ref_rate, provenance, reenact_rate = measured_baseline()

    # dominant traffic: feature rows touched per step (fwd gathers) +
    # adjacency rows + output writes; f32 table
    rows = BATCH * (1 + FANOUTS[1] + FANOUTS[1] * FANOUTS[0])
    feat_bytes = rows * features.shape[1] * features.dtype.itemsize
    adj_bytes = (BATCH * (1 + FANOUTS[1])) * MAX_DEGREE * 4
    bytes_per_step = feat_bytes + adj_bytes
    roofline_frac = bytes_per_step / sec_per_step / HBM_PEAK_BYTES_PER_S
    # the fused inner-hop gather is the step's dominant, issue-bound
    # component; its achieved rows/s vs the measured wall is the honest
    # utilization number for this workload
    inner_rows = BATCH * FANOUTS[1] * FANOUTS[0]
    wall_frac = inner_rows / sec_per_step / ROW_DMA_WALL_PER_S

    result = {
        "metric": "supervised_train_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(edges_per_sec / ref_rate, 3),
        "baseline_provenance": provenance,
        "baseline_edges_per_sec": ref_rate,
        # conservative secondary denominator: a leaner tf.compat.v1
        # re-enactment of the same step (benchmarks/reference_baseline.py)
        # that skips the reference's own layer/sampler overheads
        **({"vs_reenactment": round(edges_per_sec / reenact_rate, 3)}
           if reenact_rate else {}),
        "graph_dist": dist,
        "sec_per_step": round(sec_per_step, 6),
        "sec_per_step_dispatch": round(sec_per_step_dispatch, 6),
        "roofline_frac": round(roofline_frac, 4),
        "wall_frac": round(wall_frac, 4),
    }
    if not headline_only:
        # Deadline: on a COLD compile cache every secondary costs its
        # own 60-100s remote compile; without a budget the documented
        # `timeout 590 python bench.py` could be killed before the
        # headline line prints (and a killed TPU process wedges the
        # grant ~25 min -- CLAUDE.md). Remaining configs are recorded
        # as skipped, never silently dropped.
        result["secondary"] = measure_secondaries(
            deadline_s=480.0 - (time.perf_counter() - t_main0)
        )
    print(json.dumps(result))
    if dist == "zipf":  # the headline config; keep the committed record
        try:
            with open(os.path.join(os.path.dirname(__file__) or ".",
                                   "benchmarks", "BENCH_LAST.json"),
                      "w") as fp:
                json.dump({**result,
                           "recorded_utc": time.strftime(
                               "%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
                          fp, indent=1)
                fp.write("\n")
        except OSError:
            pass


if __name__ == "__main__":
    main()
