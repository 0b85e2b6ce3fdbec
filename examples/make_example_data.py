"""Generate the example dataset used by the example_*.sh smoke scripts.

The reference ships toy-PPI files in example_data/ (absent from this
mount, /root/reference/.MISSING_LARGE_BLOBS); we generate a synthetic
community graph in the identical on-disk contract, plus a walks file.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset
from graphsage_tpu.data.walks import run_random_walks, write_walks


def main(out_dir="example_data", num_nodes=1000):
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.join(out_dir, "toy-ppi")
    graph = make_synthetic_graph(
        num_nodes=num_nodes, num_classes=8, feat_dim=50,
        intra_p=min(1.0, 20.0 / num_nodes), inter_p=min(1.0, 2.0 / num_nodes),
        multilabel=True, seed=123,
    )
    write_dataset(graph, prefix)

    is_train = graph.is_train
    nodes = np.flatnonzero(is_train)
    sub_neighbors = [
        nbrs[is_train[nbrs]] if is_train[i] else nbrs[:0]
        for i, nbrs in enumerate(graph.neighbors)
    ]
    pairs = run_random_walks(
        sub_neighbors, nodes, rng=np.random.default_rng(123)
    )
    write_walks(prefix + "-walks.txt", pairs, graph.node_ids)
    print(f"wrote {prefix}-{{G.json,id_map.json,class_map.json,feats.npy,"
          f"walks.txt}} ({graph.num_nodes} nodes, {len(graph.edges)} edges, "
          f"{len(pairs)} walk pairs)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
