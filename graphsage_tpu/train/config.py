"""Typed training configuration mirroring the reference flag surface.

One dataclass covers both trainers' tf.app.flags
(/root/reference/graphsage/supervised_train.py:28-57,
unsupervised_train.py:25-55) 1:1 as the CLI contract, plus the
TPU-native additions (mesh shape, dtype, checkpointing) the reference
lacks.
"""

from __future__ import annotations

import dataclasses
import os

# model names accepted by the reference dispatchers
SUPERVISED_MODELS = (
    "graphsage_mean", "gcn", "graphsage_seq", "graphsage_maxpool",
    "graphsage_meanpool",
)
UNSUPERVISED_MODELS = SUPERVISED_MODELS + ("n2v",)

# model name -> (aggregator, concat) (supervised_train.py:150-239)
MODEL_AGGREGATORS = {
    "graphsage_mean": ("mean", True),
    "gcn": ("gcn", False),
    "graphsage_seq": ("seq", True),
    "graphsage_maxpool": ("maxpool", True),
    "graphsage_meanpool": ("meanpool", True),
}


@dataclasses.dataclass
class TrainFlags:
    # core params
    model: str = "graphsage_mean"
    learning_rate: float = 0.01
    model_size: str = "small"
    train_prefix: str = ""

    # defaults in main experiments
    epochs: int = 10
    dropout: float = 0.0
    weight_decay: float = 0.0
    max_degree: int = 128
    samples_1: int = 25
    samples_2: int = 10
    samples_3: int = 0          # 3rd layer, graphsage_mean only (supervised)
    dim_1: int = 128
    dim_2: int = 128
    random_context: bool = True
    neg_sample_size: int = 20   # unsupervised only
    batch_size: int = 512
    n2v_test_epochs: int = 1    # unsupervised n2v retrain
    sigmoid: bool = False       # supervised only
    identity_dim: int = 0

    # logging / validation
    save_embeddings: bool = True  # unsupervised only
    base_log_dir: str = "."
    validate_iter: int = 5000
    validate_batch_size: int = 256
    print_every: int = 5
    max_total_steps: int = 10**10

    # TPU-native additions (no reference equivalent)
    sampler_mode: str = "shared_perm"  # reference semantics; or "independent"
                                       # reproduces the reference's
                                       # one-permutation-per-call quirk
                                       # (neigh_samplers.py:26-28);
                                       # "first_k" is deterministic
    fused_gather: bool = True   # Pallas gather+mean for the innermost hop
    dedup_gather: bool = False  # skip duplicate-sample DMAs (low-degree win)
    rows_gather: bool = False   # row-DMA kernel for pooled/seq row gathers
    feature_dtype: str = "float32"  # "bfloat16" halves gather bandwidth
    graph_shards: int = 1       # row-shard tables over N devices (P2)
    data_shards: int = 1        # pure data parallelism over N devices (P1)
    capacity_factor: float = 0.0  # P2 all-to-all budget; 0 = auto-size
    shard_layout: str = "strided"  # P2 row ownership: "strided" spreads
                                   # degree-sorted hubs across shards
                                   # (small exchange capacity); "block"
                                   # keeps contiguous on-disk ranges
    defer_features: bool = False  # mmap the feature table; each host
                                  # materializes only its --graph_shards
                                  # row range (SURVEY §7 stage 7)
    degree_relabel: bool = False  # re-order internal node ids by
                                  # descending degree at ingest (hub
                                  # rows dense/low for gather locality;
                                  # original ids round-trip everywhere)
    seed: int = 123
    n_model_shards: int = 1     # feature-dim TP over a ("data","model")
                                # mesh (supervised; composes with
                                # data_shards; forces fused_gather off)
    checkpoint_dir: str = ""    # orbax checkpoint root ("" = disabled)
    checkpoint_every: int = 0   # steps; 0 = only at end
    resume: bool = False
    profile_dir: str = ""       # jax.profiler trace output
    log_histograms: bool = False  # param histograms to TensorBoard (ref layers.py:59-70)

    def log_dir(self, task: str) -> str:
        """Reference layout: <base>/<sup|unsup>-<data>/<model>_<size>_<lr>/
        with the dataset name taken from the prefix's PARENT directory
        (``train_prefix.split("/")[-2]``, supervised_train.py:82,
        unsupervised_train.py:61) and the lr formatted 0.4f (sup) vs 0.6f
        (unsup) as in the reference."""
        parts = self.train_prefix.split("/")
        name = parts[-2] if len(parts) >= 2 else parts[-1]
        sub, lr_fmt = (
            ("sup", "{:0.4f}") if task == "supervised"
            else ("unsup", "{:0.6f}")
        )
        d = os.path.join(
            self.base_log_dir,
            f"{sub}-{name}",
            f"{self.model:s}_{self.model_size:s}_"
            + lr_fmt.format(self.learning_rate),
        )
        os.makedirs(d, exist_ok=True)
        return d


def build_layer_infos(flags: TrainFlags, supervised: bool):
    """The fanout/dim stack for the model-zoo dispatch.

    Supervised graphsage_mean supports a variable depth
    (supervised_train.py:153-161): ``samples_3 > 0`` adds a third layer
    (dim_2 again); ``samples_2 == 0`` drops to a single layer. The gcn
    variant doubles dims with concat=False so output widths match concat
    models (supervised_train.py:172-188).
    """
    from graphsage_tpu.models.graphsage import LayerInfo

    if flags.model not in MODEL_AGGREGATORS:
        raise ValueError(f"unknown model: {flags.model}")
    agg, concat = MODEL_AGGREGATORS[flags.model]
    mult = 1 if concat else 2
    layers = [LayerInfo(flags.samples_1, mult * flags.dim_1)]
    variable_depth = supervised and flags.model == "graphsage_mean"
    if flags.samples_2 > 0 or not variable_depth:
        layers.append(LayerInfo(flags.samples_2, mult * flags.dim_2))
    if variable_depth and flags.samples_3 > 0:
        layers.append(LayerInfo(flags.samples_3, mult * flags.dim_2))
    return agg, concat, tuple(layers)
