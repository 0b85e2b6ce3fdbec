"""Training observability: scalar logging to JSONL + TensorBoard.

The reference merges tf.summary scalars/histograms every print step
(supervised_train.py:248-249, 288-289; layers.py:59-70). Here scalars go
to a machine-readable ``metrics.jsonl`` in the log dir and, when the
tensorboard writer is importable, to TB event files as well.
"""

from __future__ import annotations

import json
import os
import time


class ScalarLogger:
    def __init__(self, log_dir: str, enable_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._fp = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def log_histograms(self, step: int, params, prefix: str = "params"):
        """Per-tensor histograms of a param pytree (reference layers.py:59-70
        logs per-layer var histograms when logging=True)."""
        if self._tb is None:
            return
        import jax
        import numpy as np

        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = prefix + jax.tree_util.keystr(path)
            self._tb.add_histogram(name, np.asarray(leaf), step)

    def log_activations(self, step: int, acts: dict):
        """Per-layer activation histograms from a models.graphsage
        ``make_activations_fn`` probe (reference layers.py:59-70). The
        graph-sharded loops log param histograms only — the probe runs
        the single-device forward."""
        if self._tb is None:
            return
        import numpy as np

        for name, v in acts.items():
            self._tb.add_histogram(name, np.asarray(v), step)

    def log(self, step: int, **scalars):
        rec = {"step": step, "ts": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), step)
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()

    def close(self):
        self._fp.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
