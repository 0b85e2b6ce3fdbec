"""Fused embedding-gather + neighbor-mean Pallas kernel.

Replaces the XLA pattern ``features[idx].reshape(B, S, F).mean(1)`` —
which writes a [B*S, F] gather to HBM and immediately re-reads it — with
one kernel that DMAs each sampled feature row HBM→VMEM and accumulates
the mean on-chip. HBM write traffic for the innermost hop drops from
B*S*F to B*F (the reference's TF equivalent is the embedding_lookup at
/root/reference/graphsage/models.py:299 feeding reduce_mean at
aggregators.py:53).

Design (pallas_guide.md: PrefetchScalarGridSpec + double buffering):
  * grid over row-tiles of the output [B, F]
  * neighbor indices are scalar-prefetched into SMEM so the kernel can
    issue feature-row DMAs before compute
  * per output row, S row-DMAs land in a [S, F] VMEM scratch; two such
    scratch buffers pipeline row i+1's DMAs against row i's reduction
  * backward = scatter-add of grad/S — left to XLA (only the trainable
    identity-embedding table ever needs it)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_mean_reference(features, idx, drop_rate: float = 0.0,
                          drop_key=None):
    """XLA reference: mean of features[idx] over the sample axis.

    features: [N, F]; idx: [B, S] int32 -> [B, F] float32. The upcast
    happens on the gathered rows, never on the whole table (a pre-gather
    astype would materialize a full-table copy every step).

    With ``drop_rate`` > 0, per-ELEMENT dropout is applied to the
    gathered rows before the mean — the reference's placement
    (tf.nn.dropout on neigh_vecs pre-reduce, aggregators.py:52-53).
    """
    rows = jnp.take(features, idx, axis=0).astype(jnp.float32)
    if drop_rate > 0.0:
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(drop_key, keep, rows.shape)
        rows = jnp.where(mask, rows * (1.0 / keep), 0.0)
    return rows.mean(axis=1)


def _dropout_threshold(drop_rate: float):
    """uint32 threshold t such that P(bits < t) = 1 - drop_rate for
    uniform 32-bit ``bits`` (kernel-side mask: keep where bits < t)."""
    keep = 1.0 - drop_rate
    return jnp.uint32(min(int(keep * 4294967296.0), 4294967295))


def _key_words(key):
    """A jax PRNG key (typed or raw uint32 [2]) as two int32 scalar-
    prefetch words for pltpu.prng_seed."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return jax.lax.bitcast_convert_type(key.reshape(-1)[:2], jnp.int32)


TILE_B = 8  # output rows per grid step (Pallas sublane minimum for f32)


def _issue_tile(idx_ref, feat_ref, scratch, sems, tile, slot, *, S, tile_b):
    """Issue the S row DMAs of each of a tile's rows into scratch[slot].

    Hybrid unroll: fori_loop over the tile's rows (keeps Mosaic code
    size ~S DMA pairs — a full tile_b*S unroll stalls the compiler),
    with the S per-row DMAs unrolled inline (a full fori_loop serializes
    issue and halves throughput). One DMA semaphore per ROW (shared by
    its S same-size copies) keeps the sflag budget small.
    """
    def body(r, _):
        for s in range(S):
            pltpu.make_async_copy(
                feat_ref.at[idx_ref[tile * tile_b + r, s]],
                scratch.at[slot, r * S + s],
                sems.at[slot, r],
            ).start()
        return 0

    jax.lax.fori_loop(0, tile_b, body, 0)


def _wait_tile(feat_ref, scratch, sems, slot, *, S, tile_b):
    """Consume the semaphore signals of one tile's row DMAs."""
    def body(r, _):
        for s in range(S):
            pltpu.make_async_copy(
                feat_ref.at[0], scratch.at[slot, r * S + s],
                sems.at[slot, r],
            ).wait()
        return 0

    jax.lax.fori_loop(0, tile_b, body, 0)


def _pipelined_block(idx_ref, feat_ref, scratch, sems, *, S, F, tile_b,
                     n_buf):
    """Shared DMA pipeline of the gather kernels: issue up to n_buf-1
    future tiles' row DMAs behind the current tile's reduce, wait this
    tile's slot, and return its [tile_b, S, F] f32 block.

    feat_ref is viewed as [N, R, F/R] and scratch as
    [n_buf, tile_b*S, R, F/R] (R = sublane packing of the dtype) so every
    DMA moves a block that exactly spans the last two dims — single-row
    slices of a [N, F] array violate Mosaic's sublane tiling.
    """
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    issue = functools.partial(
        _issue_tile, idx_ref, feat_ref, scratch, sems, S=S, tile_b=tile_b
    )
    slot = jax.lax.rem(t, n_buf)

    @pl.when(t == 0)
    def _():
        for k in range(n_buf - 1):
            @pl.when(k < n_tiles)
            def _():
                issue(k, k)

    @pl.when(t + n_buf - 1 < n_tiles)
    def _():
        issue(t + n_buf - 1, jax.lax.rem(t + n_buf - 1, n_buf))

    _wait_tile(feat_ref, scratch, sems, slot, S=S, tile_b=tile_b)
    return scratch[slot].astype(jnp.float32).reshape(tile_b, S, F)


def _inkernel_dropout(x, seed_ref, drop_rate, stub_prng):
    """Per-element dropout over a 2-D [rows, F] f32 block with the
    on-chip Mosaic PRNG, shared by the mean and pool kernels.

    Each grid step reseeds with (seed0, seed1 + t * golden-ratio-odd)
    — Mosaic caps prng_seed at two words, and the mix keeps adjacent
    tiles' streams far apart (int32 wrap-around is fine; only
    distinctness within a call matters for tile-mask independence).
    ``stub_prng`` (interpret mode — no prng_seed lowering there)
    replaces the bits with zeros = all-keep, matching the Mosaic
    interpreter's own PRNG stub; the 1/keep scale path still runs.
    """
    if stub_prng:
        bits = jnp.zeros(x.shape, jnp.uint32)
    else:
        pltpu.prng_seed(
            seed_ref[0],
            seed_ref[1] + pl.program_id(0) * (-1640531527),
        )
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    return jnp.where(bits < _dropout_threshold(drop_rate),
                     x * (1.0 / (1.0 - drop_rate)), 0.0)


def _gather_mean_kernel(idx_ref, *rest, S, F, tile_b, n_buf,
                        drop_rate=0.0, stub_prng=False):
    """One grid step computes tile_b output MEAN rows [tile_b, F].

    With ``drop_rate`` > 0 a second scalar-prefetch operand carries the
    PRNG seed (two words of a jax key) and per-element dropout runs
    on-chip over the gathered [tile_b*S, F] block before the mean — the
    rows never exist in HBM, so neither does the mask. Each grid step
    reseeds with (seed0, seed1, program_id) for a deterministic
    per-tile stream independent of grid execution order.

    ``stub_prng`` (interpret mode — the HLO interpreter has no
    prng_seed lowering) replaces the bits with zeros = all-keep, the
    same behavior as the Mosaic interpreter's own PRNG stub; the scale
    path is still exercised (output = mean / keep).
    """
    if drop_rate > 0.0:
        seed_ref, feat_ref, out_ref, scratch, sems = rest
    else:
        feat_ref, out_ref, scratch, sems = rest
    block = _pipelined_block(idx_ref, feat_ref, scratch, sems,
                             S=S, F=F, tile_b=tile_b, n_buf=n_buf)
    if drop_rate > 0.0:
        block = _inkernel_dropout(
            block.reshape(tile_b * S, F), seed_ref, drop_rate, stub_prng
        ).reshape(tile_b, S, F)
    out_ref[:, :] = jnp.sum(block, axis=1) * (1.0 / S)


# NOTE: two PARTIAL-mean kernel designs (a masked sample subset of the
# row mean, for the local fraction of the split-sharded inner hop) were
# built and hardware-falsified in round 3 — an in-kernel weight multiply
# (~45% throughput loss) and plain-kernel-redirect + XLA rank-1
# correction (wasted issues are NOT free: same-row reads contend, and
# the compressed local-id distribution erases the kernel's edge; loses
# to a plain XLA take+mask+mean 1.58 vs 1.33 ms at the D=8 zipf mix).
# parallel/graph_sharded.py therefore computes that fraction XLA-side;
# see benchmarks/KERNEL_NOTES.md "Round-3 locality facts".


def _gather_mean_dedup_kernel(idx_ref, nuniq_ref, feat_ref, w_ref, out_ref,
                              scratch, sems, *, S, F, tile_b, n_buf):
    """Dedup variant: ``idx`` holds each row's UNIQUE sample values
    compacted to the left (duplicate tail padded), ``nuniq`` their count,
    and ``w`` multiplicity/S aligned to the compacted positions (0 in the
    tail). The per-row DMA loop runs only ``nuniq`` iterations.

    STATUS: correct but measured SLOWER than the plain kernel on v5e
    (uniform 8.0ms / deg-8 5.1ms vs plain 3.9ms at the Reddit hop shape):
    dynamic-trip-count scalar loops cost more per iteration than the
    skipped DMA issues — the plain kernel's unrolled issue loop is
    already at the scalar-issue optimum. Kept as an opt-in experiment;
    a future approach needs dedup granularity ABOVE the row level (e.g.
    hot-row caching) rather than in the issue loop."""
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def issue(tile, slot):
        def body(r, _):
            row = tile * tile_b + r

            def dma(u, _):
                pltpu.make_async_copy(
                    feat_ref.at[idx_ref[row, u]],
                    scratch.at[slot, r * S + u],
                    sems.at[slot, r],
                ).start()
                return 0

            jax.lax.fori_loop(0, nuniq_ref[row], dma, 0)
            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    def wait(slot, tile):
        def body(r, _):
            row = tile * tile_b + r

            def one(u, _):
                pltpu.make_async_copy(
                    feat_ref.at[0], scratch.at[slot, r * S + u],
                    sems.at[slot, r],
                ).wait()
                return 0

            jax.lax.fori_loop(0, nuniq_ref[row], one, 0)
            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    slot = jax.lax.rem(t, n_buf)

    @pl.when(t == 0)
    def _():
        for k in range(n_buf - 1):
            @pl.when(k < n_tiles)
            def _():
                issue(k, k)

    @pl.when(t + n_buf - 1 < n_tiles)
    def _():
        issue(t + n_buf - 1, jax.lax.rem(t + n_buf - 1, n_buf))

    wait(slot, t)
    block = scratch[slot].astype(jnp.float32).reshape(tile_b, S, F)
    # tail slots hold stale/uninitialized data (NaN in interpret mode) —
    # select them to zero BEFORE the weighted sum (0*NaN = NaN)
    wb = w_ref[:, :][:, :, None]
    block = jnp.where(wb > 0, block, 0.0)
    # elementwise multiply + sum (Mosaic can't lower a mid-dim-contracting
    # einsum); pure VPU work
    out_ref[:, :] = jnp.sum(block * wb, axis=1)


def dedup_compact(idx):
    """(idx_unique [B,S], n_unique [B], w [B,S]) for the dedup kernel:
    per-row sort, unique values compacted left (tail padded with the
    first value), multiplicity/S weights aligned to compacted positions
    (0 in the tail). XLA-side, O(B*S^2) compares — trivial next to the
    gather itself."""
    idx_sorted = jnp.sort(idx, axis=1)
    B, S = idx.shape
    eq = idx_sorted[:, :, None] == idx_sorted[:, None, :]
    counts = eq.sum(-1).astype(jnp.float32)
    first = jnp.concatenate(
        [
            jnp.ones_like(idx_sorted[:, :1], dtype=bool),
            idx_sorted[:, 1:] != idx_sorted[:, :-1],
        ],
        axis=1,
    )
    pos = jnp.cumsum(first, axis=1) - 1          # compacted position
    n_unique = (pos[:, -1] + 1).astype(jnp.int32)
    rows = jnp.arange(B)[:, None]
    idx_unique = jnp.zeros_like(idx_sorted).at[rows, pos].set(idx_sorted)
    w = jnp.zeros((B, S), jnp.float32).at[rows, pos].add(
        jnp.where(first, counts / S, 0.0)
    )
    return idx_unique, n_unique, w


def _row_sublanes(dtype) -> int:
    """Sublane granularity of a single-row DMA view: f32 rows DMA as
    (1, F) blocks; bf16 packs 2 values per sublane word, so rows must be
    viewed as (2, F/2) to satisfy Mosaic's alignment."""
    return 2 if jnp.dtype(dtype) == jnp.bfloat16 else 1


def pad_feature_dim(features, dtype=None):
    """Zero-pad the trailing (feature) axis so fused_gather_mean can DMA
    whole rows: multiple of 128 lanes for f32, 256 for bf16.

    Do this ONCE at setup (host or device) and slice gathered rows back
    to the logical dim — per-step padding would copy the whole table.
    """
    import numpy as np

    mult = 128 * _row_sublanes(dtype if dtype is not None else features.dtype)
    F = features.shape[-1]
    pad = (-F) % mult
    if pad == 0:
        return features
    if isinstance(features, np.ndarray):
        return np.pad(features, ((0, 0), (0, pad)))
    return jnp.pad(features, ((0, 0), (0, pad)))


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "tile_b", "n_buf", "dedup", "drop_rate"),
)
def fused_gather_mean(features, idx, interpret: bool = False,
                      tile_b: int = TILE_B, n_buf: int = 2,
                      dedup: bool = False, drop_rate: float = 0.0,
                      drop_key=None):
    """[B, F] = mean_s features[idx[b, s]] without materializing [B*S, F].

    features: [N, F] float32/bfloat16 (HBM-resident), idx: [B, S] int32.
    Output is float32. B is padded to a multiple of tile_b internally.
    On TPU, F must be a multiple of 128 (see pad_feature_dim); otherwise
    the XLA reference path is used. ``n_buf`` scratch buffers pipeline
    the row DMAs of n_buf-1 tiles ahead.

    ``drop_rate`` > 0 (with ``drop_key``, a jax PRNG key) applies
    per-element dropout to the gathered rows BEFORE the mean — the
    reference's training placement (aggregators.py:52-53) — via the
    on-chip Mosaic PRNG, so training with dropout keeps the fused
    bandwidth profile. The XLA fallback applies the same semantics with
    jax.random (a different, equally valid mask stream). ``dedup``
    cannot express per-duplicate masks and is ignored when dropping.
    """
    if drop_rate > 0.0 and drop_key is None:
        raise ValueError("drop_rate > 0 requires drop_key")
    if not 0.0 <= drop_rate < 1.0:
        raise ValueError(f"drop_rate must be in [0, 1), got {drop_rate}")
    B, S = idx.shape
    N, F = features.shape
    R = _row_sublanes(features.dtype)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    use_kernel = (
        interpret
        or (on_tpu and F % (128 * R) == 0
            # The kernel is DMA-issue-bound (~1 row DMA per sample), so it
            # only beats XLA's gather for 4-byte rows; sub-f32 dtypes halve
            # XLA's bandwidth cost but not the kernel's DMA count —
            # measured: pallas f32 3.9ms vs xla f32 4.5ms, but xla bf16
            # 3.4ms vs pallas bf16 4.6ms at the Reddit innermost-hop shape.
            and jnp.dtype(features.dtype).itemsize == 4)
    )
    if not use_kernel:
        return gather_mean_reference(features, idx, drop_rate, drop_key)
    if drop_rate > 0.0:
        dedup = False  # per-duplicate masks are inexpressible post-dedup

    # Scalar-prefetched idx lives in SMEM lane-padded to [B, 128]; chunk
    # the call so each kernel stays well under the 1MB SMEM budget.
    CHUNK = 1024
    if B > CHUNK:
        outs = [
            fused_gather_mean(
                features, idx[i:i + CHUNK], interpret=interpret,
                tile_b=tile_b, n_buf=n_buf, dedup=dedup,
                drop_rate=drop_rate,
                # distinct per-chunk streams: tile t of chunk c must not
                # reuse tile t of chunk 0's seed triple
                drop_key=(jax.random.fold_in(drop_key, i // CHUNK)
                          if drop_rate > 0.0 else None),
            )
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

    scratch_shapes = [
        pltpu.VMEM((n_buf, tile_b * S, R, F // R), features.dtype),
        pltpu.SemaphoreType.DMA((n_buf, tile_b)),
    ]
    out_shape = jax.ShapeDtypeStruct((Bp, F), jnp.float32)
    out_spec = pl.BlockSpec(
        (tile_b, F), lambda t, idx_ref: (t, 0), memory_space=pltpu.VMEM
    )
    params = dict(
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * S * F,
            bytes_accessed=Bp * S * F * features.dtype.itemsize + Bp * F * 4,
            transcendentals=0,
        ),
    )
    feats_view = features.reshape(N, R, F // R)

    if dedup:
        idx_unique, n_unique, w = dedup_compact(idx)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (tile_b, S), lambda t, i_ref, n_ref: (t, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_b, F), lambda t, i_ref, n_ref: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch_shapes,
        )
        kernel = functools.partial(
            _gather_mean_dedup_kernel, S=S, F=F, tile_b=tile_b, n_buf=n_buf
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, **params
        )(idx_unique, n_unique, feats_view, w)
    elif drop_rate > 0.0:
        seed = _key_words(drop_key)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (tile_b, F), lambda t, i_ref, s_ref: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch_shapes,
        )
        kernel = functools.partial(
            _gather_mean_kernel, S=S, F=F, tile_b=tile_b, n_buf=n_buf,
            drop_rate=drop_rate, stub_prng=interpret,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, **params
        )(idx, seed, feats_view)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
        )
        kernel = functools.partial(
            _gather_mean_kernel, S=S, F=F, tile_b=tile_b, n_buf=n_buf
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, **params
        )(idx, feats_view)
    return out[:B] if pad else out


# ------------------------------------------------- direct row gather

def _gather_rows_kernel(idx_ref, feat_ref, out_ref, sems,
                        *, S, tile_b, n_buf):
    """Materializing gather via direct HBM->HBM row DMAs: no VMEM
    staging, no per-tile output block copies — each sampled row is one
    async copy from the feature table to its output slot. The grid only
    paces issue/wait so at most n_buf tiles of DMAs are in flight."""
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def issue(tile, slot):
        def body(r, _):
            row = tile * tile_b + r
            for s in range(S):
                pltpu.make_async_copy(
                    feat_ref.at[idx_ref[row, s]],
                    out_ref.at[row * S + s],
                    sems.at[slot, r],
                ).start()
            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    def wait(tile, slot):
        def body(r, _):
            row = tile * tile_b + r
            for s in range(S):
                pltpu.make_async_copy(
                    feat_ref.at[0], out_ref.at[row * S + s],
                    sems.at[slot, r],
                ).wait()
            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    slot = jax.lax.rem(t, n_buf)

    @pl.when(t == 0)
    def _():
        for k in range(n_buf - 1):
            @pl.when(k < n_tiles)
            def _():
                issue(k, k)

    @pl.when(t + n_buf - 1 < n_tiles)
    def _():
        issue(t + n_buf - 1, jax.lax.rem(t + n_buf - 1, n_buf))

    wait(t, slot)


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_b", "n_buf")
)
def fused_gather_rows(features, idx, interpret: bool = False,
                      tile_b: int = 32, n_buf: int = 2):
    """[B*S, F] = features[idx.reshape(-1)] — a drop-in jnp.take
    replacement for the innermost-hop frontier, for consumers that need
    the individual rows (pooled MLPs, the LSTM sequence, per-row
    dropout). Same alignment gates as fused_gather_mean; falls back to
    jnp.take otherwise. Output dtype = features dtype; no VJP is needed
    (the feature table is a non-trained leaf at every call site)."""
    B, S = idx.shape
    N, F = features.shape
    R = _row_sublanes(features.dtype)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    use_kernel = (
        interpret
        or (on_tpu and F % (128 * R) == 0
            and jnp.dtype(features.dtype).itemsize == 4)
    )
    if not use_kernel:
        return jnp.take(features, idx.reshape(-1), axis=0)

    CHUNK = 1024
    if B > CHUNK:
        return jnp.concatenate([
            fused_gather_rows(features, idx[i:i + CHUNK],
                              interpret=interpret, tile_b=tile_b,
                              n_buf=n_buf)
            for i in range(0, B, CHUNK)
        ], axis=0)

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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_buf, tile_b))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, S=S, tile_b=tile_b,
                          n_buf=n_buf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp * S, R, F // R),
                                       features.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * S,
            bytes_accessed=2 * Bp * S * F * features.dtype.itemsize,
            transcendentals=0,
        ),
    )(idx, features.reshape(N, R, F // R))
    out = out.reshape(Bp * S, F)
    return out[: B * S] if pad else out
