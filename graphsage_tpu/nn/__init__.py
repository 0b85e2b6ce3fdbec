"""Functional neural-net building blocks.

Everything here is a pure function over explicit parameter pytrees and
`jax.random` keys — no layer objects, no global state. Parameter shapes
and math reproduce the reference layers (graphsage/aggregators.py,
layers.py, prediction.py, inits.py) exactly; the call convention is
jit-native.
"""

from graphsage_tpu.nn import init
from graphsage_tpu.nn.dense import init_dense, apply_dense
from graphsage_tpu.nn.sampler import uniform_sample
from graphsage_tpu.nn.aggregators import AGGREGATORS, init_aggregator, apply_aggregator
from graphsage_tpu.nn import prediction
from graphsage_tpu.nn import negative
from graphsage_tpu.nn import metrics

__all__ = [
    "metrics",
    "init",
    "init_dense",
    "apply_dense",
    "uniform_sample",
    "AGGREGATORS",
    "init_aggregator",
    "apply_aggregator",
    "prediction",
    "negative",
]
