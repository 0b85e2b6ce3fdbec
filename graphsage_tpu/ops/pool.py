"""Fused gather -> per-neighbor MLP -> max/mean pool, with a training path.

The pooling aggregators (reference aggregators.py:119-273) run a Dense
layer on every sampled neighbor and reduce over the fanout. The XLA
path materializes the [B*S, F] gather AND the [B*S, H] MLP activations
in HBM in both directions; measured in the trainers' chunked mode this
collapses the pooled step 3-4x vs the fused mean path
(benchmarks/KERNEL_NOTES.md round-5 sweep: maxpool 10.75 ms vs mean
2.74 at the headline shape).

This module resurrects the round-3 fused kernel (removed at
per-dispatch "speed parity", which the chunked-mode A/B later showed
was the wrong execution mode to decide in) and adds what it lacked —
a TRAINING path:

- ``fused_gather_mlp_pool``: forward-only kernel. Row DMAs land in a
  double-buffered VMEM scratch, the MLP matmul runs on the MXU against
  VMEM-resident weights, the pool reduces on-chip; only [B, H] leaves
  the chip. For inference/eval sweeps.
- ``gather_mlp_pool_train``: ``jax.custom_vjp`` wrapper. The forward
  kernel additionally streams the gathered rows X to HBM as a residual
  (a sequential write that rides under the issue-bound DMA gather);
  the backward is pure XLA from the saved X — one recomputed MLP
  matmul for the relu/argmax masks plus the grad matmuls — and never
  re-gathers. Gradient semantics match the XLA path exactly, including
  jnp.max's even tie-splitting (verified by tests/test_pool.py).

Training with ``dropout > 0`` rides the kernel too: the reference
drops the MLP's input rows (aggregators.py:168-174), which the kernel
reproduces per-element with the on-chip Mosaic PRNG before the matmul;
the DROPPED rows stream out as the residual, so the backward stays
mask-free and exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphsage_tpu.ops.gather import (
    _inkernel_dropout,
    _key_words,
    _pipelined_block,
    _row_sublanes,
    pad_feature_dim,
)

# Larger tiles than the plain gather kernel: the in-kernel MLP matmul
# wants (tile*S, F) operands big enough to feed the MXU (measured on
# v5e at the Reddit pool shape: tile 8 -> 5.1ms, 16 -> 6.8, 32 -> 4.7).
TILE_B = 32

# Test hook: when True, _kernel_ok accepts any input and the pallas_call
# runs in the Mosaic interpreter, so CPU tests exercise the KERNEL
# dispatch (seed plumbing, chunking, tile padding) through the model
# path instead of silently comparing the XLA fallback against itself.
# Never set in production; tests monkeypatch it (and should use distinct
# shapes per flag value — jit caches don't key on this global).
_FORCE_INTERPRET = False


def gather_mlp_pool_reference(features, idx, w, b, reduce: str = "max"):
    """XLA reference: reduce_s relu(features[idx] @ w + b) -> [B, H]."""
    rows = jnp.take(features, idx, axis=0).astype(jnp.float32)
    if rows.shape[-1] != w.shape[0]:
        rows = rows[..., : w.shape[0]]
    h = jax.nn.relu(
        jnp.einsum("bsf,fh->bsh", rows, w,
                   preferred_element_type=jnp.float32) + b
    )
    return jnp.max(h, axis=1) if reduce == "max" else jnp.mean(h, axis=1)


def _kernel(idx_ref, *rest, S, F, H, tile_b, reduce, want_x,
            drop_rate=0.0, stub_prng=False):
    # operand order: [seed_ref if dropping,] feat, w, b | outputs
    # (out_ref[, x_ref]) | scratch (scratch, sems)
    if drop_rate > 0.0:
        seed_ref, rest = rest[0], rest[1:]
    else:
        seed_ref = None
    feat_ref, w_ref, b_ref, out_ref, *rest = rest
    if want_x:
        x_ref, scratch, sems = rest
    else:
        x_ref, (scratch, sems) = None, rest
    # ops.gather's shared double-buffered row-DMA pipeline (one DMA
    # semaphore per ROW keeps the ~512-sflag budget safe at tile_b=32)
    x = _pipelined_block(idx_ref, feat_ref, scratch, sems,
                         S=S, F=F, tile_b=tile_b, n_buf=2
                         ).reshape(tile_b * S, F)
    if drop_rate > 0.0:
        # Per-element dropout on the MLP's input rows (the reference's
        # placement: Dense drops its input, aggregators.py:168-174).
        # The DROPPED rows are what streams out as the residual, so the
        # XLA backward recomputes the exact same z without needing the
        # mask.
        x = _inkernel_dropout(x, seed_ref, drop_rate, stub_prng)
    if want_x:
        x_ref[:, :] = x
    h = jax.nn.relu(
        jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    ).reshape(tile_b, S, H)
    if reduce == "max":
        out_ref[:, :] = jnp.max(h, axis=1)
    else:
        out_ref[:, :] = jnp.sum(h, axis=1) * (1.0 / S)


def _kernel_ok(features, w):
    if _FORCE_INTERPRET:
        return True
    N, F = features.shape
    H = w.shape[1]
    R = _row_sublanes(features.dtype)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return (on_tpu and F % (128 * R) == 0 and H % 128 == 0
            and jnp.dtype(features.dtype).itemsize == 4)


def _pad_w(features, w):
    """Zero-pad w's input rows to the feature table's (lane-aligned)
    width; padded feature lanes are zero, so the product is exact."""
    F = features.shape[1]
    if w.shape[0] == F:
        return w
    return jnp.concatenate(
        [w, jnp.zeros((F - w.shape[0], w.shape[1]), w.dtype)], axis=0
    )


def _pallas_pool(features, idx, w, b, reduce, want_x, tile_b,
                 interpret=False, drop_rate=0.0, seed=None):
    """Core pallas_call; idx [B, S] with B % tile_b == 0 (caller pads).
    Returns (pooled [B, H], x [B*S, F] or None). ``drop_rate`` > 0
    (with ``seed``, two int32 words) drops MLP-input elements in-kernel;
    the residual then holds the DROPPED rows."""
    B, S = idx.shape
    N, F = features.shape
    H = w.shape[1]
    R = _row_sublanes(features.dtype)
    n_tiles = B // tile_b
    dropping = drop_rate > 0.0
    n_prefetch = 2 if dropping else 1

    def _imap(t, *_refs):
        return (t, 0)

    out_specs = [
        pl.BlockSpec((tile_b, H), _imap, memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, H), jnp.float32)]
    if want_x:
        # the residual stream: one contiguous VMEM->HBM block write per
        # tile, riding under the (issue-bound) row-DMA gather
        out_specs.append(pl.BlockSpec(
            (tile_b * S, F), _imap, memory_space=pltpu.VMEM,
        ))
        out_shape.append(jax.ShapeDtypeStruct((B * S, F), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, tile_b * S, R, F // R), features.dtype),
            pltpu.SemaphoreType.DMA((2, tile_b)),
        ],
    )
    kernel = functools.partial(
        _kernel, S=S, F=F, H=H, tile_b=tile_b, reduce=reduce,
        want_x=want_x, drop_rate=drop_rate,
        stub_prng=bool(interpret),
    )
    x_bytes = B * S * F * 4 if want_x else 0
    operands = (idx, seed) if dropping else (idx,)
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * F * H,
            bytes_accessed=(B * S * F * features.dtype.itemsize
                            + F * H * 4 + B * H * 4 + x_bytes),
            transcendentals=0,
        ),
    )(*operands, features.reshape(N, R, F // R), w, b)
    return (res[0], res[1]) if want_x else (res[0], None)


def _fold_seed_words(seed, chunk):
    """fold_in on the key behind two int32 seed words -> new words.

    ``seed`` is jax key data bitcast to int32 (ops.gather._key_words);
    round-trip it to a typed key so the per-chunk derivation is the
    same threefry fold ops.gather's chunked dropout path uses."""
    key = jax.random.wrap_key_data(
        jax.lax.bitcast_convert_type(seed, jnp.uint32)
    )
    return _key_words(jax.random.fold_in(key, chunk))


def _pool_fwd_impl(features, idx, w, b, reduce, want_x, tile_b,
                   interpret=False, drop_rate=0.0, seed=None):
    """Shape plumbing around _pallas_pool: chunking + tile padding.
    Returns (pooled [B, H], x [B*S, F] float32 or None)."""
    B, S = idx.shape
    CHUNK = 1024
    if B > CHUNK:
        outs = [
            _pool_fwd_impl(
                features, idx[i:i + CHUNK], w, b, reduce, want_x,
                tile_b, interpret, drop_rate,
                # distinct per-chunk streams: tile t of chunk c must not
                # reuse tile t of chunk 0's (s0, s1, t) seed triple.
                # Derive chunk c's words by fold_in on the key the words
                # came from (same mixing as ops.gather's chunk path) —
                # NOT a raw +c on word 0, which would bet on adjacent
                # hardware seeds being decorrelated.
                (_fold_seed_words(seed, i // CHUNK)
                 if drop_rate > 0.0 else None),
            )
            for i in range(0, B, CHUNK)
        ]
        pooled = jnp.concatenate([o[0] for o in outs], axis=0)
        x = (jnp.concatenate([o[1] for o in outs], axis=0)
             if want_x else None)
        return pooled, x

    pad = (-B) % tile_b
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((pad, S), dtype=idx.dtype)], axis=0
        )
    out, x = _pallas_pool(features, idx, w, b, reduce, want_x, tile_b,
                          interpret, drop_rate, seed)
    if pad:
        out = out[:B]
        if want_x:
            x = x[: B * S]
    return out, x


@functools.partial(jax.jit,
                   static_argnames=("reduce", "interpret", "tile_b"))
def fused_gather_mlp_pool(features, idx, w, b, reduce: str = "max",
                          interpret: bool = False, tile_b: int = TILE_B):
    """Forward-only [B, H] = reduce_s relu(features[idx[b,s]] @ w + b).

    features: [N, F]; if F exceeds w's input dim the extra lanes must
    be the zero padding of ops.gather.pad_feature_dim (w is zero-padded
    to match). Kernel path requires F lane-aligned, H % 128 == 0, and a
    4-byte dtype; anything else falls back to the XLA reference.
    """
    interpret = bool(interpret or _FORCE_INTERPRET)
    if not (interpret or _kernel_ok(features, w)):
        return gather_mlp_pool_reference(features, idx, w, b, reduce)
    wp = _pad_w(features, w)
    out, _ = _pool_fwd_impl(features, idx, wp, b, reduce, False, tile_b,
                            interpret)
    return out


# ------------------------------------------------------- training path

def _route_pool_grad(dy, x, w, b, reduce, S):
    """Cotangents (grad_w, grad_b) of reduce_s relu(x @ w + b) from the
    saved gathered rows x [B*S, F] — pure XLA, no re-gather. Matches
    jnp.max's VJP exactly: even split among ties, relu' zero at z <= 0.

    The max tie mask compares h against a max RECOMPUTED from the same
    z, never against the forward's saved y: the kernel forward's MXU
    accumulation order can differ from this XLA dot by an ulp, and an
    exact-equality compare against y would then silently zero the
    routing for that element."""
    B = dy.shape[0]
    H = w.shape[1]
    z = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    if reduce == "max":
        h = jax.nn.relu(z).reshape(B, S, H)
        m = (h == jnp.max(h, axis=1, keepdims=True)).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        dh = (dy[:, None, :] * m / cnt).reshape(B * S, H)
    else:
        dh = jnp.broadcast_to(
            dy[:, None, :] / S, (B, S, H)
        ).reshape(B * S, H)
    dz = jnp.where(z > 0, dh, 0.0)
    grad_w = jnp.dot(x.T, dz, preferred_element_type=jnp.float32)
    grad_b = jnp.sum(dz, axis=0)
    return grad_w, grad_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gather_mlp_pool_train(reduce, drop_rate, features, idx, w, b,
                          seed=None):
    """Differentiable (w, b) fused pool for TRAINING steps.

    Forward runs the Pallas kernel (streaming the gathered rows to HBM
    as the backward residual); backward is XLA-only from that residual.
    ``features`` and ``idx`` get zero cotangents (the feature table is
    a non-trained input everywhere this is engaged — models/graphsage.py
    guards identity_dim == 0).

    ``drop_rate`` > 0 (with ``seed``, two int32 words from
    ops.gather._key_words) applies the reference's MLP-input dropout
    (aggregators.py:168-174) to the gathered rows — in-kernel via the
    Mosaic PRNG on the kernel path, jax.random on the fallback. The
    residual holds the DROPPED rows, so the backward needs no mask and
    the (w, b) gradients are exact for the realized mask.
    """
    # Primal body (runs only when NOT differentiated, e.g. eval sweeps):
    # skip the residual stream.
    if drop_rate == 0.0:
        return fused_gather_mlp_pool(features, idx, w, b, reduce=reduce)
    if seed is None:
        # same guard as _train_fwd: without it the kernel branch would
        # pass a None operand into pallas_call and fail opaquely
        raise ValueError("drop_rate > 0 requires seed")
    if _kernel_ok(features, w):
        wp = _pad_w(features, w)
        y, _ = _pool_fwd_impl(features, idx, wp, b, reduce, False,
                              TILE_B, interpret=_FORCE_INTERPRET,
                              drop_rate=drop_rate, seed=seed)
        return y
    y, _ = _train_fwd(reduce, drop_rate, features, idx, w, b, seed)
    return y


def _train_fwd(reduce, drop_rate, features, idx, w, b, seed=None):
    if drop_rate > 0.0 and seed is None:
        raise ValueError("drop_rate > 0 requires seed")
    if _kernel_ok(features, w):
        wp = _pad_w(features, w)
        y, x = _pool_fwd_impl(features, idx, wp, b, reduce, True, TILE_B,
                              interpret=_FORCE_INTERPRET,
                              drop_rate=drop_rate, seed=seed)
    else:
        x = jnp.take(features, idx.reshape(-1), axis=0).astype(jnp.float32)
        if drop_rate > 0.0:
            key = jax.random.wrap_key_data(
                jax.lax.bitcast_convert_type(seed, jnp.uint32)
            )
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(key, keep, x.shape)
            x = jnp.where(mask, x * (1.0 / keep), 0.0)
        wp = _pad_w(features, w)
        B, S = idx.shape
        h = jax.nn.relu(
            jnp.dot(x, wp, preferred_element_type=jnp.float32) + b
        ).reshape(B, S, -1)
        y = jnp.max(h, axis=1) if reduce == "max" else jnp.mean(h, axis=1)
    return y, (x, w, b, idx, features, seed)


def _train_bwd(reduce, drop_rate, res, dy):
    x, w, b, idx, features, seed = res
    S = idx.shape[1]
    wp = _pad_w(features, w)
    grad_wp, grad_b = _route_pool_grad(dy, x, wp, b, reduce, S)
    grad_w = grad_wp[: w.shape[0]]
    # features/idx carry no gradient where this is engaged; the zero
    # feature cotangent is DCE'd by XLA (never consumed), and the int
    # idx/seed cotangents must be float0 per the custom_vjp contract.
    return (
        jnp.zeros_like(features),
        np.zeros(idx.shape, dtype=jax.dtypes.float0),
        grad_w,
        grad_b,
        (np.zeros(seed.shape, dtype=jax.dtypes.float0)
         if seed is not None else None),
    )


gather_mlp_pool_train.defvjp(_train_fwd, _train_bwd)

__all__ = [
    "fused_gather_mlp_pool",
    "gather_mlp_pool_reference",
    "gather_mlp_pool_train",
    "pad_feature_dim",
]
