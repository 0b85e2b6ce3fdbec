"""Orbax checkpoint/resume.

The reference defines tf.train.Saver save/load helpers but never calls
them (models.py:81-94 — dead code; SURVEY.md §5.4). Here checkpointing
is actually wired into the training loops: params + optimizer state +
step are saved atomically and restorable on to the same pytree
structure.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _ckpt_path(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"step_{step:010d}")


def save(root: str, params, opt_state, step: int) -> None:
    with ocp.StandardCheckpointer() as saver:
        saver.save(
            _ckpt_path(root, step),
            {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )


def latest_step(root: str) -> int | None:
    root = os.path.abspath(root)
    if not os.path.isdir(root):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(root)
        if d.startswith("step_") and not d.endswith(".orbax-checkpoint-tmp")
    ]
    return max(steps) if steps else None


def restore(root: str, params_like, opt_state_like):
    """-> (params, opt_state, step) from the newest checkpoint, or None.

    Falls back to a pad/truncate restore when only array *row padding*
    differs: the row-sharded identity table is zero-padded to a multiple
    of graph_shards (parallel/graph_sharded.py::shard_rows), so the same
    logical table has shard-count-dependent global shapes. The pad rows
    are zeros past row N and are never indexed, so truncating/zero-
    padding them on restore is exact — this is what lets a checkpoint
    written under one --graph_shards resume under another.
    """
    step = latest_step(root)
    if step is None:
        return None
    target = {
        "params": jax.tree.map(lambda x: x, params_like),
        "opt_state": opt_state_like,
        "step": step,
    }
    path = _ckpt_path(root, step)
    try:
        with ocp.StandardCheckpointer() as saver:
            restored = saver.restore(path, target)
    except ValueError:
        # The relaxed pad/truncate fallback is ONLY exact for the
        # row-padded tables (the identity 'embeds' table and its optimizer
        # moments, zero-padded to a multiple of graph_shards). Any other
        # shape mismatch means the model genuinely changed (dim_1,
        # num_classes, feature_dim, ...) — re-raise instead of silently
        # loading zero-padded/truncated weights.
        mismatches = _shape_mismatches(path, target)
        if not mismatches:
            raise
        bad = [
            m for m in mismatches
            if "embeds" not in m[0] or m[1][1:] != m[2][1:]
        ]
        if bad:
            raise ValueError(
                "checkpoint is shape-incompatible with the current model "
                "(only leading-row padding of the identity 'embeds' table "
                f"may differ); mismatched leaves: {bad}"
            ) from None
        restored = _restore_relaxed(path, target)
    return restored["params"], restored["opt_state"], int(restored["step"])


def _shape_mismatches(path: str, target):
    """[(keypath, stored_shape, target_shape)] for every array leaf whose
    stored shape differs from the restore target's."""
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        meta = ckptr.metadata(path).item_metadata
    stored = {
        jax.tree_util.keystr(kp): getattr(x, "shape", None)
        for kp, x in jax.tree_util.tree_flatten_with_path(meta)[0]
    }
    out = []
    for kp, x in jax.tree_util.tree_flatten_with_path(target)[0]:
        ks = jax.tree_util.keystr(kp)
        tgt = getattr(x, "shape", None)
        st = stored.get(ks)
        if st is not None and tgt is not None and tuple(st) != tuple(tgt):
            out.append((ks, tuple(st), tuple(tgt)))
    return out


def _restore_relaxed(path: str, target):
    """PyTree restore with strict=False ArrayRestoreArgs: stored arrays
    are truncated / zero-padded along existing dims to the target shape.
    Only reachable after restore() has verified every mismatch is a
    leading-row resize of the 'embeds' tables (zero pad rows past row N,
    never indexed — truncating/zero-padding them is exact)."""

    def args_for(x):
        if hasattr(x, "sharding"):
            return ocp.ArrayRestoreArgs(
                sharding=x.sharding, global_shape=x.shape,
                dtype=x.dtype, strict=False,
            )
        return ocp.RestoreArgs()

    restore_args = jax.tree.map(args_for, target)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=target, restore_args=restore_args
            ),
        )
