"""Pallas TPU kernels for the hot ops.

The reference leans on stock TF kernels (SURVEY.md §2: embedding gather,
neighbor subsample, segment reductions). Here the bandwidth-dominant op —
the innermost-hop feature gather feeding a mean reduction — gets a fused
Pallas kernel that never materializes the [B*S, F] gathered frontier in
HBM.
"""

from graphsage_tpu.ops.gather import (  # noqa: F401
    fused_gather_mean,
    gather_mean_reference,
    pad_feature_dim,
)
