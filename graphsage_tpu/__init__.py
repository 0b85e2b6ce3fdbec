"""graphsage_tpu — a TPU-native GraphSAGE framework.

A from-scratch re-design of the capabilities of williamleif/GraphSAGE
(TF1, single GPU) for TPU hardware: the full sample-and-aggregate compute
path is a single jit-compiled XLA program (sampling, feature gather,
aggregation, loss, and optimizer update all on device), scaled over device
meshes with `jax.sharding`, with Pallas kernels for the hot
gather->aggregate ops.

Layout (mirrors the reference's implicit layering, SURVEY.md section 1):
  data/      host-side ingest: dataset contract, padded adjacency, batching
  nn/        functional layers: aggregators, samplers, losses, inits
  models/    sample-and-aggregate orchestration (supervised/unsupervised/n2v)
  train/     configs, jitted train steps, trainers, checkpointing, export
  parallel/  mesh construction, data-parallel + graph-sharded training
  ops/       XLA/Pallas kernels for the hot paths
  evaluation downstream linear-probe evaluation of embeddings
  infer      standalone serving: checkpoint -> embeddings / predictions
  cli        `graphsage supervised|unsupervised|embed|predict|eval|walks`
"""

__version__ = "0.1.0"
