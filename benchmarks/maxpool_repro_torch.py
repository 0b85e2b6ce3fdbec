"""Reference-semantics torch replica of supervised GraphSAGE-maxpool/mean
training on the proxy-ppi graph — decides bug-vs-data for the F1 collapse."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import torch

from graphsage_tpu.data.adjacency import build_both_adjs
from graphsage_tpu.data.minibatch import NodeBatcher
from graphsage_tpu.data.synthetic import make_powerlaw_graph

torch.manual_seed(123)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
MODEL = sys.argv[2] if len(sys.argv) > 2 else "maxpool"
LR = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01
EPOCHS = int(sys.argv[4]) if len(sys.argv) > 4 else 10

g = make_powerlaw_graph(num_nodes=N, num_classes=121, feat_dim=50,
                        avg_degree=29, alpha=1.0, multilabel=True,
                        feature_snr=0.5, seed=11)
train_adj, deg, full_adj = build_both_adjs(g, 128, seed=123)
batcher = NodeBatcher(g, deg, 512, seed=123)
feats = np.vstack([g.features, np.zeros((1, 50), np.float32)])
feats_t = torch.from_numpy(feats)
labels_t = torch.from_numpy(g.labels.astype(np.float32))
adj_t = torch.from_numpy(train_adj.astype(np.int64))
full_adj_t = torch.from_numpy(full_adj.astype(np.int64))

S1, S2 = 25, 10
D1 = D2 = 128
C = 121
F = 50
HID = 512


def glorot(shape):
    w = torch.empty(*shape)
    torch.nn.init.xavier_uniform_(w)
    return torch.nn.Parameter(w)


class Agg(torch.nn.Module):
    def __init__(self, input_dim, output_dim, kind):
        super().__init__()
        self.kind = kind
        if kind == "maxpool":
            self.mlp_w = glorot((input_dim, HID))
            self.mlp_b = torch.nn.Parameter(torch.zeros(HID))
            self.neigh_w = glorot((HID, output_dim))
        else:
            self.neigh_w = glorot((input_dim, output_dim))
        self.self_w = glorot((input_dim, output_dim))

    def forward(self, self_vecs, neigh_vecs, act):
        if self.kind == "maxpool":
            b, s, d = neigh_vecs.shape
            h = torch.relu(neigh_vecs.reshape(b * s, d) @ self.mlp_w
                           + self.mlp_b)
            nh = h.reshape(b, s, HID).max(dim=1).values
        else:
            nh = neigh_vecs.mean(dim=1)
        out = torch.cat([self_vecs @ self.self_w, nh @ self.neigh_w], dim=1)
        return act(out)


class Net(torch.nn.Module):
    def __init__(self, kind):
        super().__init__()
        self.agg0 = Agg(F, D1, kind)       # layer 0 (hop feats)
        self.agg1 = Agg(2 * D1, D2, kind)  # layer 1
        self.head_w = glorot((2 * D2, C))
        self.head_b = torch.nn.Parameter(torch.zeros(C))

    def forward(self, ids, adj, rng):
        # sample pyramid: hop1 = S2 per node, hop2 = S1 per hop1 node
        def sample(nodes, k):
            rows = adj[nodes]  # [n, max_degree]
            cols = torch.from_numpy(
                rng.integers(0, rows.shape[1], (rows.shape[0], k)))
            return torch.gather(rows, 1, cols)

        b = ids.shape[0]
        hop1 = sample(ids, S2).reshape(-1)
        hop2 = sample(hop1, S1).reshape(-1)
        h0, h1, h2 = feats_t[ids], feats_t[hop1], feats_t[hop2]
        # layer 0: aggregate hop2 into hop1, hop1 into hop0
        relu = torch.relu
        ident = lambda x: x
        h1_new = self.agg0(h1, h2.reshape(b * S2, S1, F), relu)
        h0_new = self.agg0(h0, h1.reshape(b, S2, F), relu)
        # layer 1: aggregate hop1 into hop0 (last layer: identity act)
        out = self.agg1(h0_new, h1_new.reshape(b, S2, 2 * D1), ident)
        out = torch.nn.functional.normalize(out, dim=1)
        return out @ self.head_w + self.head_b


net = Net(MODEL)
opt = torch.optim.Adam(net.parameters(), lr=LR, eps=1e-8)
rng = np.random.default_rng(0)
train_nodes = batcher.train_nodes
steps_per_epoch = max(1, -(-len(train_nodes) // 512))


def f1_micro(y, p):
    pred = (p > 0.5).astype(np.float32)
    tp = (pred * y).sum()
    return 2 * tp / max(pred.sum() + y.sum(), 1e-9)


for epoch in range(EPOCHS):
    perm = rng.permutation(train_nodes)
    for i in range(steps_per_epoch):
        ids = torch.from_numpy(
            perm[i * 512:(i + 1) * 512].astype(np.int64))
        if len(ids) == 0:
            continue
        logits = net(ids, adj_t, rng)
        y = labels_t[ids]
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, y, reduction="mean")
        opt.zero_grad()
        loss.backward()
        for p in net.parameters():
            p.grad.clamp_(-5, 5)
        opt.step()
    with torch.no_grad():
        ids = torch.from_numpy(
            np.asarray(batcher.val_nodes[:512], dtype=np.int64))
        logits = net(ids, full_adj_t, rng)
        y = labels_t[ids].numpy()
        p = torch.sigmoid(logits).numpy()
        print(f"epoch {epoch+1}: loss {loss.item():.5f} "
              f"val f1_mic {f1_micro(y, p):.4f} "
              f"frac>0.5 {float((p > 0.5).mean()):.4f}", flush=True)
