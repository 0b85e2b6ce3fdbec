"""CPU repro of the proxy-ppi maxpool/seq supervised F1 collapse."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np

from graphsage_tpu.data.synthetic import make_powerlaw_graph
from graphsage_tpu.train.config import TrainFlags
from graphsage_tpu.train.supervised import train as train_sup

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
models = (sys.argv[2].split(",") if len(sys.argv) > 2
          else ["graphsage_mean", "graphsage_maxpool", "graphsage_seq"])
lr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01
epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 10

g = make_powerlaw_graph(
    num_nodes=N, num_classes=121, feat_dim=50, avg_degree=29,
    alpha=1.0, multilabel=True, feature_snr=0.5, seed=11,
)
print("labels density:", g.labels.mean(), "train nodes:",
      int((~g.is_val & ~g.is_test).sum()), flush=True)

for model in models:
    flags = TrainFlags(
        train_prefix="/tmp/proxy-ppi-small/x",
        base_log_dir="/tmp/repro_logs",
        epochs=epochs, batch_size=512, samples_1=25, samples_2=10,
        dim_1=128, dim_2=128, max_degree=128,
        validate_iter=5000, validate_batch_size=256,
        print_every=5, learning_rate=lr, seed=123,
        model=model, sigmoid=True, fused_gather=False,
    )
    res = train_sup(flags, graph=g)
    print(f"==> {model} lr={lr}: test micro-F1 {res['test_f1_mic']:.4f} "
          f"macro {res['test_f1_mac']:.4f}", flush=True)
