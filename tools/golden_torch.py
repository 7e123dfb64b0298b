"""Golden-parity oracle: a from-scratch PyTorch training run with the
reference trainer's exact semantics, producing the regression baseline the
JAX trainer must match within 0.5 pt PR-AUC (BASELINE.md north star).

The reference's own raw CSVs are git-lfs stubs in this environment and PyG
is absent, so the reference itself cannot be executed; this oracle
re-implements its training semantics in plain torch (no PyG) against the
documented behavior of /root/reference/src/train_gnn.py:
  - SAGEResBNNet: SAGE mean-aggregation convs (gnn.py:35-53 semantics,
    zero-degree rows -> 0), BatchNorm1d hidden layers, ReLU, dropout,
    identity/linear residual projections, sinusoidal time embedding
    concat (gnn.py:82-194);
  - inverse-frequency class weights (train_gnn.py:116-123), weighted CE on
    the train mask, Adam with L2 weight decay, grad-norm clip
    (train_gnn.py:354-359,187-209);
  - early stop on val PR-AUC with patience + best-state snapshot
    (train_gnn.py:375-413); max-F1 threshold on val (466-474); test
    metrics (477-519).

Trains on the SAME processed graph.npz (deterministic synthetic build via
`python -m elliptic_gnn_tpu.graph.build_graph --config configs/split.yaml`)
and the same preprocessing code (rolling window, symmetrize) as the JAX
trainer, and evaluates with the same metric functions, so any difference
is the training math itself.

Usage:
  python tools/golden_torch.py --config configs/rec_k8.yaml \
      --out goldens/golden_rec_k8_torch.json
"""
from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elliptic_gnn_tpu.utils import metrics as M  # noqa: E402


def sage_conv(x, ei, w_l, b_l, w_r):
    """PyG SAGEConv semantics: mean over incoming edges (src->dst) of raw
    features -> lin_l, plus root lin_r (no bias); zero-degree rows -> 0."""
    n = x.shape[0]
    agg = torch.zeros_like(x)
    cnt = torch.zeros(n, device=x.device)
    agg.index_add_(0, ei[1], x[ei[0]])
    cnt.index_add_(0, ei[1], torch.ones(ei.shape[1], device=x.device))
    agg = agg / cnt.clamp(min=1.0).unsqueeze(1)
    return agg @ w_l + b_l + x @ w_r


class SageResBN(torch.nn.Module):
    """SAGE-ResBN with sinusoidal time embeddings (gnn.py:82-194)."""

    def __init__(self, in_dim, hidden, layers, dropout, time_dim, max_t):
        super().__init__()
        self.time_dim, self.max_t = time_dim, max_t
        eff_in = in_dim + time_dim
        dims = [eff_in] + [hidden] * (layers - 1) + [2]
        self.w_l = torch.nn.ParameterList()
        self.b_l = torch.nn.ParameterList()
        self.w_r = torch.nn.ParameterList()
        for i in range(layers):
            lim = math.sqrt(6.0 / (dims[i] + dims[i + 1]))
            self.w_l.append(torch.nn.Parameter(
                torch.empty(dims[i], dims[i + 1]).uniform_(-lim, lim)))
            self.b_l.append(torch.nn.Parameter(torch.zeros(dims[i + 1])))
            self.w_r.append(torch.nn.Parameter(
                torch.empty(dims[i], dims[i + 1]).uniform_(-lim, lim)))
        self.bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(hidden, momentum=0.1, eps=1e-5)
             for _ in range(layers - 1)]
        )
        res_in = [eff_in] + [hidden] * (layers - 2)
        self.res = torch.nn.ParameterList()
        self.res_identity = []
        for d_in in res_in:
            if d_in == hidden:
                self.res.append(torch.nn.Parameter(torch.zeros(1)))  # unused
                self.res_identity.append(True)
            else:
                lim = math.sqrt(6.0 / (d_in + hidden))
                self.res.append(torch.nn.Parameter(
                    torch.empty(d_in, hidden).uniform_(-lim, lim)))
                self.res_identity.append(False)
        self.dropout = torch.nn.Dropout(dropout)

    def _time(self, t_idx):
        """Exact reference sinusoid (gnn.py:146-166)."""
        t = torch.clamp(t_idx.float() - 1.0, 0.0, float(self.max_t - 1))
        t = t / max(float(self.max_t - 1), 1.0)
        half = self.time_dim // 2
        freqs = torch.arange(1, half + 1).float() * (2.0 * math.pi)
        ang = t.unsqueeze(1) * freqs.unsqueeze(0)
        feat = torch.cat([torch.sin(ang), torch.cos(ang)], dim=1)
        if feat.shape[1] < self.time_dim:
            feat = torch.cat(
                [feat, torch.zeros(feat.shape[0],
                                   self.time_dim - feat.shape[1])], dim=1)
        return feat

    def forward(self, x, ei, t_idx):
        h = torch.cat([x, self._time(t_idx)], dim=1) if self.time_dim else x
        n_layers = len(self.w_l)
        for li in range(n_layers - 1):
            h_in = h
            h = sage_conv(h, ei, self.w_l[li], self.b_l[li], self.w_r[li])
            h = self.bns[li](h)
            h = torch.relu(h)
            h = self.dropout(h)
            h = h + (h_in if self.res_identity[li] else h_in @ self.res[li])
        return sage_conv(h, ei, self.w_l[-1], self.b_l[-1], self.w_r[-1])


def prepare(cfg):
    """Same data pipeline as the JAX trainer (graph lib shared)."""
    from elliptic_gnn_tpu.graph import load_processed, make_temporal_masks
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges

    data = load_processed(cfg["processed_dir"])
    if data.train_mask is None:
        raise RuntimeError("Build the graph first (graph.build_graph CLI)")
    k = cfg.get("train_window_k")
    if k is not None:
        data = make_temporal_masks(
            data, int(data.timestep[data.train_mask].max()),
            int(data.timestep[data.val_mask].max()), int(k))
    if cfg.get("symmetrize_edges", False):
        data = symmetrize_edges(data)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="goldens/golden_rec_k8_torch.json")
    ap.add_argument("--max_epochs", type=int, default=None,
                    help="override for quick runs")
    args = ap.parse_args()
    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    if args.max_epochs:
        cfg["max_epochs"] = args.max_epochs

    seed = int(cfg.get("seed", 42))
    torch.manual_seed(seed)
    np.random.seed(seed)

    data = prepare(cfg)
    fingerprint = hashlib.sha256(
        np.ascontiguousarray(data.x).tobytes()
        + np.ascontiguousarray(data.edge_index).tobytes()
    ).hexdigest()[:16]
    print(f"[GOLDEN] graph {data.num_nodes} nodes / {data.num_edges} edges "
          f"fingerprint {fingerprint}")

    x = torch.from_numpy(np.ascontiguousarray(data.x))
    ei = torch.from_numpy(np.ascontiguousarray(data.edge_index).astype(np.int64))
    t_idx = torch.from_numpy(data.timestep.astype(np.int64))
    y = data.y
    y_t = torch.from_numpy(np.maximum(y, 0).astype(np.int64))
    train_mask = torch.from_numpy(data.train_mask)
    val_mask = data.val_mask
    y_val_bin = (y[val_mask] == 1).astype(int)

    # inverse-frequency class weights (train_gnn.py:116-123)
    tr_y = y[data.train_mask]
    pos, neg = int((tr_y == 1).sum()), int((tr_y == 0).sum())
    tot = pos + neg
    cw = torch.tensor([tot / (2.0 * neg), tot / (2.0 * pos)])

    model = SageResBN(
        data.num_features, int(cfg["hidden_dim"]), int(cfg["layers"]),
        float(cfg.get("dropout", 0.0)), int(cfg.get("time_embed_dim", 0)),
        int(cfg.get("max_timestep", 49)),
    )
    opt = torch.optim.Adam(model.parameters(), lr=float(cfg["lr"]),
                           weight_decay=float(cfg.get("weight_decay", 0.0)))
    loss_fn = torch.nn.CrossEntropyLoss(weight=cw)
    clip = float(cfg.get("grad_clip", 0) or 0)

    best_val, bad, best_state = -1.0, 0, None
    patience = int(cfg.get("patience", 20))
    t0 = time.time()
    epochs_run = 0
    for epoch in range(1, int(cfg["max_epochs"]) + 1):
        model.train()
        opt.zero_grad()
        logits = model(x, ei, t_idx)
        loss = loss_fn(logits[train_mask], y_t[train_mask])
        loss.backward()
        if clip > 0:
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()

        model.eval()
        with torch.no_grad():
            probs = torch.softmax(model(x, ei, t_idx), dim=1)[:, 1].numpy()
        pr_val = M.pr_auc_illicit(y_val_bin, probs[val_mask])
        epochs_run += 1
        if pr_val > best_val:
            best_val, bad = pr_val, 0
            best_state = {k: v.detach().clone()
                          for k, v in model.state_dict().items()}
        else:
            bad += 1
        if epoch % 10 == 0 or epoch == 1:
            print(f"[GOLDEN] epoch {epoch:4d} loss {float(loss):.4f} "
                  f"val PR-AUC {pr_val:.4f} (best {best_val:.4f})")
        if bad >= patience:
            print("[GOLDEN] early stop")
            break

    model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        probs = torch.softmax(model(x, ei, t_idx), dim=1)[:, 1].numpy()

    p_val, p_te = probs[val_mask], probs[data.test_mask]
    y_te = y[data.test_mask]
    thr, _ = M.pick_threshold_max_f1(y_val_bin, p_val)
    y_bin = (y_te == 1).astype(int)
    test_ts = data.timestep[data.test_mask]
    _, pr_by_t = M.per_timestep_pr_auc(y_bin, p_te, test_ts)
    metrics = dict(
        pr_auc_illicit=M.pr_auc_illicit(y_bin, p_te),
        roc_auc=M.roc_auc_illicit(y_bin, p_te),
        f1_illicit_at_thr=M.f1_at_threshold(y_bin, p_te, thr),
        threshold=float(thr),
        precision_at_k=M.precision_at_k(y_bin, p_te, int(cfg.get("topk", 100))),
        ece=M.expected_calibration_error(y_bin, p_te),
        best_val_pr_auc=float(best_val),
        pr_auc_last1=float(pr_by_t[-1]) if pr_by_t else None,
        n_test=int(len(y_bin)),
        epochs_run=epochs_run,
        train_seconds=time.time() - t0,
    )
    metrics.update(M.tail_means(pr_by_t, ks=(3, 5)))

    out = {
        "oracle": "torch_from_scratch",
        "config": args.config,
        "seed": seed,
        "graph_fingerprint": fingerprint,
        "num_nodes": data.num_nodes,
        "num_edges": data.num_edges,
        "metrics": metrics,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[GOLDEN] wrote {args.out}")
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
