"""Model families: sample-and-aggregate orchestration as pure jit fns."""

from graphsage_tpu.models.graphsage import (
    LayerInfo,
    SAGEConfig,
    init_sage_params,
    sample_frontier,
    sage_embed,
)
from graphsage_tpu.models.supervised import (
    SupervisedConfig,
    init_supervised_params,
    supervised_logits,
    supervised_loss,
    supervised_predict,
)
from graphsage_tpu.models.unsupervised import (
    UnsupervisedConfig,
    init_unsupervised_params,
    unsupervised_outputs,
    unsupervised_loss,
)
from graphsage_tpu.models.node2vec import (
    Node2VecConfig,
    init_node2vec_params,
    node2vec_outputs,
    node2vec_loss,
)

__all__ = [
    "LayerInfo",
    "SAGEConfig",
    "init_sage_params",
    "sample_frontier",
    "sage_embed",
    "SupervisedConfig",
    "init_supervised_params",
    "supervised_logits",
    "supervised_loss",
    "supervised_predict",
    "UnsupervisedConfig",
    "init_unsupervised_params",
    "unsupervised_outputs",
    "unsupervised_loss",
    "Node2VecConfig",
    "init_node2vec_params",
    "node2vec_outputs",
    "node2vec_loss",
]
