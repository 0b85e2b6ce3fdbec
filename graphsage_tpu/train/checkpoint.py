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
    """-> (params, opt_state, step) from the newest checkpoint, or None."""
    step = latest_step(root)
    if step is None:
        return None
    target = {
        "params": jax.tree.map(lambda x: x, params_like),
        "opt_state": opt_state_like,
        "step": step,
    }
    with ocp.StandardCheckpointer() as saver:
        restored = saver.restore(_ckpt_path(root, step), target)
    return restored["params"], restored["opt_state"], int(restored["step"])
