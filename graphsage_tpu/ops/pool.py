"""Fused gather -> per-neighbor MLP -> segment max/mean Pallas kernel.

The pooling aggregators (reference aggregators.py:119-273) run a Dense
layer on every sampled neighbor and reduce over the fanout. The XLA
path materializes both the [B*S, F] gather and the [B*S, H] MLP output
in HBM; this kernel keeps everything in VMEM: row DMAs land in a
double-buffered scratch, the MLP matmul runs on the MXU against
VMEM-resident weights, and only the pooled [B, H] leaves the chip.

Same DMA scaffold as ops/gather.py (see that module for the Mosaic row
alignment rules); valid when no dropout is applied inside the MLP
(the reference's inference path, or training with dropout=0 — gated at
the call site).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphsage_tpu.ops.gather import _row_sublanes

# Larger tiles than the plain gather kernel: the in-kernel MLP matmul
# wants (tile*S, F) operands big enough to feed the MXU (measured on
# v5e at the Reddit pool shape: tile 8 -> 5.1ms, 16 -> 6.8, 32 -> 4.7;
# XLA reference 4.6ms).
TILE_B = 32


def gather_mlp_pool_reference(features, idx, w, b, reduce: str = "max"):
    """XLA reference: reduce_s relu(features[idx] @ w + b) -> [B, H]."""
    rows = jnp.take(features, idx, axis=0).astype(jnp.float32)
    h = jax.nn.relu(
        jnp.einsum("bsf,fh->bsh", rows, w,
                   preferred_element_type=jnp.float32) + b
    )
    return jnp.max(h, axis=1) if reduce == "max" else jnp.mean(h, axis=1)


def _kernel(idx_ref, feat_ref, w_ref, b_ref, out_ref, scratch, sems,
            *, S, F, H, tile_b, reduce):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    # one DMA semaphore per ROW (shared by its S same-sized copies):
    # the sflag space caps total semaphores at ~512, which 2*tile_b*S
    # per-copy semaphores would blow past tile_b=10
    def issue(tile, slot):
        def body(r, _):
            for s in range(S):
                pltpu.make_async_copy(
                    feat_ref.at[idx_ref[tile * tile_b + r, s]],
                    scratch.at[slot, r * S + s],
                    sems.at[slot, r],
                ).start()
            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    def wait(slot):
        def body(r, _):
            for s in range(S):
                pltpu.make_async_copy(
                    feat_ref.at[0], scratch.at[slot, r * S + s],
                    sems.at[slot, r],
                ).wait()
            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        issue(0, 0)

    @pl.when(t + 1 < n_tiles)
    def _():
        issue(t + 1, jax.lax.rem(t + 1, 2))

    wait(slot)
    x = scratch[slot].astype(jnp.float32).reshape(tile_b * S, F)
    h = jax.nn.relu(
        jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    ).reshape(tile_b, S, H)
    if reduce == "max":
        out_ref[:, :] = jnp.max(h, axis=1)
    else:
        out_ref[:, :] = jnp.sum(h, axis=1) * (1.0 / S)


@functools.partial(jax.jit,
                   static_argnames=("reduce", "interpret", "tile_b"))
def fused_gather_mlp_pool(features, idx, w, b, reduce: str = "max",
                          interpret: bool = False, tile_b: int = TILE_B):
    """[B, H] = reduce_s relu(features[idx[b,s]] @ w + b).

    features: [N, F] (F lane-aligned per dtype, see pad_feature_dim);
    w: [F, H] float32 with H a multiple of 128; b: [H].
    """
    B, S = idx.shape
    N, F = features.shape
    H = w.shape[1]
    R = _row_sublanes(features.dtype)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    use_kernel = (
        interpret
        or (on_tpu and F % (128 * R) == 0 and H % 128 == 0
            and jnp.dtype(features.dtype).itemsize == 4)
    )
    if not use_kernel:
        return gather_mlp_pool_reference(features, idx, w, b, reduce)

    CHUNK = 1024
    if B > CHUNK:
        outs = [
            fused_gather_mlp_pool(features, idx[i:i + CHUNK], w, b,
                                  reduce=reduce, interpret=interpret,
                                  tile_b=tile_b)
            for i in range(0, B, CHUNK)
        ]
        return jnp.concatenate(outs, axis=0)

    pad = (-B) % tile_b
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((pad, S), dtype=idx.dtype)], axis=0
        )
    Bp = B + pad
    n_tiles = Bp // tile_b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, H), lambda t, idx_ref: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_b * S, R, F // R), features.dtype),
            pltpu.SemaphoreType.DMA((2, tile_b)),
        ],
    )
    kernel = functools.partial(
        _kernel, S=S, F=F, H=H, tile_b=tile_b, reduce=reduce
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * S * F * H,
            bytes_accessed=(Bp * S * F * features.dtype.itemsize
                            + F * H * 4 + Bp * H * 4),
            transcendentals=0,
        ),
    )(idx, features.reshape(N, R, F // R), w, b)
    return out[:B] if pad else out
