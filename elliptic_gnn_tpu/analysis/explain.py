"""Explainability: feature attributions for baselines + GNNExplainer-style
edge/feature masks for GNN runs.

Counterpart of /root/reference/src/analysis/explain.py (836 LoC):
  - `xgb` subcommand (explain.py:171-260): loads the baseline run's
    model.pkl and attributes features on <=200 random test rows. Tree
    models get EXACT TreeSHAP values (the reference runs
    shap.TreeExplainer; the shap package is absent here, so
    analysis/treeshap.py implements the exact algorithm from scratch —
    additivity verified to float precision); the LR pipeline falls back
    to model-agnostic permutation importance. Artifacts keep the
    reference names: shap_summary.png + xgb_top_features.json.
  - `gnn` subcommand (explain.py:264-731): rebuilds the model from
    config_used.yaml, auto-picks the node to explain (highest-scored TP,
    else FP, else top score, threshold from metrics.json), and learns
    sigmoid edge + feature masks by gradient descent on the k-hop
    subgraph — the GNNExplainer objective (prediction fidelity + L1 +
    entropy sparsity), expressed natively as masked ELL weights. Artifacts:
    gnn_explainer_node_<id>.png + gnn_explainer_importance.json.

CLI:
  python -m elliptic_gnn_tpu.analysis.explain xgb --run_dir outputs/baselines/<run> \
      --processed_dir data/processed
  python -m elliptic_gnn_tpu.analysis.explain gnn --run_dir outputs/gnn/<run> \
      [--node_idx N] [--steps 300]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
from typing import Tuple

import numpy as np

from ..utils.common import save_json
from .common import load_run_arrays, load_run_metrics, rebuild_model_and_data


# ---------------------------------------------------------------- xgb ----

def run_xgb(run_dir: str, processed_dir: str, n_samples: int = 200,
            top_k: int = 20, seed: int = 42) -> None:
    from ..graph import load_processed
    from ..train.train_baselines import get_split_arrays

    with open(os.path.join(run_dir, "model.pkl"), "rb") as f:
        model = pickle.load(f)
    data = load_processed(processed_dir)
    _, _, test = get_split_arrays(data)
    x_te, y_te = data.x[test], data.y[test]

    rng = np.random.default_rng(seed)
    n = min(n_samples, len(y_te))
    sel = rng.choice(len(y_te), size=n, replace=False)

    # tree models get exact SHAP values (the reference runs
    # shap.TreeExplainer, explain.py:236-244 — here via the from-scratch
    # exact TreeSHAP in analysis/treeshap.py, with adapters for BOTH
    # gradient-boosting engines: XGBoost booster dumps and sklearn
    # HistGB node arrays); non-tree models (the LR pipeline) fall back
    # to model-agnostic permutation importance
    from sklearn.ensemble import HistGradientBoostingClassifier

    extra = {}
    if type(model).__name__ == "XGBClassifier":
        from .treeshap import xgb_shap_values

        phi, expected = xgb_shap_values(model, x_te[sel])
        imp = np.abs(phi).mean(axis=0)
        method = "tree_shap_exact_xgboost"
        extra = {"expected_value": float(expected), "space": "log_odds"}
        xlabel = "mean |SHAP value| (log-odds)"
    elif isinstance(model, HistGradientBoostingClassifier):
        from .treeshap import hist_gb_shap_values

        phi, expected = hist_gb_shap_values(model, x_te[sel])
        imp = np.abs(phi).mean(axis=0)
        method = "tree_shap_exact"
        extra = {"expected_value": float(expected), "space": "log_odds"}
        xlabel = "mean |SHAP value| (log-odds)"
    else:
        from sklearn.inspection import permutation_importance

        result = permutation_importance(
            model, x_te[sel], (y_te[sel] == 1).astype(int),
            n_repeats=5, random_state=seed, scoring="average_precision",
        )
        imp = result.importances_mean
        method = "permutation_importance"
        xlabel = "permutation importance (AP drop)"
    order = np.argsort(-imp)[:top_k]
    top = [
        {"feature": f"f{int(i)}", "importance": float(imp[i])} for i in order
    ]
    save_json(os.path.join(run_dir, "xgb_top_features.json"), {
        "method": method,
        "n_samples": n,
        "top_features": top,
        **extra,
    })

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(7, 6))
    names = [t["feature"] for t in top][::-1]
    vals = [t["importance"] for t in top][::-1]
    plt.barh(names, vals)
    plt.xlabel(xlabel)
    plt.title(f"Top-{top_k} features ({n} test rows)")
    plt.tight_layout()
    plt.savefig(os.path.join(run_dir, "shap_summary.png"), dpi=200)
    plt.close()
    print(f"[EXPLAIN/xgb] wrote xgb_top_features.json + shap_summary.png")


# ---------------------------------------------------------------- gnn ----

def _pick_node(run_dir: str) -> Tuple[int, str]:
    """Highest-scored TP, else FP, else top score (explain.py:370-429)."""
    metrics = load_run_metrics(run_dir)
    thr = float(metrics["threshold"])
    arr = load_run_arrays(run_dir, "test")
    s, y, idx = arr["scores"], arr["y"], arr["node_idx"]
    order = np.argsort(-s)
    for kind, cond in (
        ("true_positive", (y == 1) & (s >= thr)),
        ("false_positive", (y == 0) & (s >= thr)),
    ):
        cand = order[cond[order]]
        if cand.size:
            return int(idx[cand[0]]), kind
    return int(idx[order[0]]), "top_score"


def _k_hop_in_edges(edge_index: np.ndarray, target: int, k: int):
    """Edges on incoming paths of length <= k into `target`."""
    src, dst = edge_index
    frontier = {int(target)}
    nodes = {int(target)}
    keep = np.zeros(edge_index.shape[1], dtype=bool)
    for _ in range(k):
        m = np.isin(dst, list(frontier))
        keep |= m
        new_nodes = set(src[m].tolist())
        frontier = new_nodes - nodes
        nodes |= new_nodes
        if not frontier:
            break
    return np.where(keep)[0], np.array(sorted(nodes), dtype=np.int64)


def run_gnn(run_dir: str, node_idx: int | None = None, steps: int = 300,
            lr: float = 0.05, l1_edge: float = 0.005, l1_feat: float = 0.1,
            top_k: int = 20, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import MODEL_GRAPH_KIND, prepare_graph_ops

    cfg, data, gops, model, params, state = rebuild_model_and_data(run_dir)
    if node_idx is None:
        node_idx, picked = _pick_node(run_dir)
    else:
        picked = "user"
    print(f"[EXPLAIN/gnn] node {node_idx} ({picked})")

    k = int(cfg.get("layers", 3))
    edge_ids, sub_nodes = _k_hop_in_edges(data.edge_index, node_idx, k)
    if edge_ids.size == 0:
        print("[EXPLAIN/gnn] isolated node; nothing to explain")
        sub_nodes = np.array([node_idx])
    lut = {int(g): i for i, g in enumerate(sub_nodes)}
    sub_ei = np.stack([
        np.array([lut[int(s)] for s in data.edge_index[0, edge_ids]]),
        np.array([lut[int(d)] for d in data.edge_index[1, edge_ids]]),
    ]).astype(np.int32) if edge_ids.size else np.zeros((2, 0), np.int32)
    target_local = lut[int(node_idx)]

    kind = MODEL_GRAPH_KIND[cfg["arch"]]
    gops_sub = prepare_graph_ops(sub_ei, len(sub_nodes), kind)
    x_sub = jnp.asarray(data.x[sub_nodes])
    t_sub = (
        jnp.asarray(data.timestep[sub_nodes].astype(np.int32))
        if model.uses_time_embed else None
    )

    # predicted class at the target (explanation fidelity target)
    logits0, _ = model.apply(params, state, x_sub, gops_sub, t_sub, training=False)
    cls = int(jnp.argmax(logits0[target_local]))

    # learnable masks: one logit per ELL weight slot + one per feature
    m_edges0 = tuple(jnp.full(w.shape, 2.0) for w in gops_sub.weights)
    m_feat0 = jnp.full((data.num_features,), 2.0)

    def loss_fn(masks):
        m_edges, m_feat = masks
        sig_e = tuple(jax.nn.sigmoid(m) for m in m_edges)
        gops_m = dataclasses.replace(
            gops_sub,
            weights=tuple(w * s for w, s in zip(gops_sub.weights, sig_e)),
        )
        sig_f = jax.nn.sigmoid(m_feat)
        logits, _ = model.apply(
            params, state, x_sub * sig_f[None, :], gops_m, t_sub, training=False
        )
        logp = jax.nn.log_softmax(logits[target_local])
        fidelity = -logp[cls]
        valid_sum = sum((w > 0).sum() for w in gops_sub.weights)
        l1_e = sum(
            (s * (w > 0)).sum() for s, w in zip(sig_e, gops_sub.weights)
        ) / jnp.maximum(valid_sum, 1)
        ent_e = sum(
            (-(s * jnp.log(s + 1e-9) + (1 - s) * jnp.log(1 - s + 1e-9)) * (w > 0)).sum()
            for s, w in zip(sig_e, gops_sub.weights)
        ) / jnp.maximum(valid_sum, 1)
        l1_f = sig_f.mean()
        return fidelity + l1_edge * l1_e + 0.1 * ent_e + l1_feat * l1_f

    tx = optax.adam(lr)
    masks = (m_edges0, m_feat0)
    opt_state = tx.init(masks)

    @jax.jit
    def step(masks, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(masks)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(masks, updates), opt_state, loss

    for i in range(steps):
        masks, opt_state, loss = step(masks, opt_state)
    m_edges, m_feat = masks
    print(f"[EXPLAIN/gnn] mask optimization done (loss={float(loss):.4f})")

    # extract per-edge importances from ELL slots (valid slots only)
    edge_imp = []
    for nbr, w, rows, m in zip(
        gops_sub.nbrs, gops_sub.weights, gops_sub.rows, m_edges
    ):
        sig = np.asarray(jax.nn.sigmoid(m))
        nbr_np, w_np, rows_np = np.asarray(nbr), np.asarray(w), np.asarray(rows)
        r_idx, s_idx = np.where(w_np > 0)
        for r, s in zip(r_idx, s_idx):
            src_l, dst_l = int(nbr_np[r, s]), int(rows_np[r])
            if src_l == dst_l:
                continue  # skip self-loops in the report
            edge_imp.append((
                int(sub_nodes[src_l]), int(sub_nodes[dst_l]), float(sig[r, s])
            ))
    edge_imp.sort(key=lambda e: -e[2])
    feat_sig = np.asarray(jax.nn.sigmoid(m_feat))
    feat_order = np.argsort(-feat_sig)[:top_k]

    save_json(os.path.join(run_dir, "gnn_explainer_importance.json"), {
        "node_idx": int(node_idx),
        "picked": picked,
        "predicted_class": cls,
        "top_edges": [
            {"src": s, "dst": d, "importance": v} for s, d, v in edge_imp[:top_k]
        ],
        "top_features": [
            {"feature": f"f{int(i)}", "importance": float(feat_sig[i])}
            for i in feat_order
        ],
    })

    # k-hop subgraph rendering
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    g = nx.DiGraph()
    for s, d, v in edge_imp[:200]:
        g.add_edge(s, d, weight=v)
    g.add_node(int(node_idx))
    pos = nx.spring_layout(g, seed=seed)
    widths = [2.5 * g[u][v]["weight"] + 0.2 for u, v in g.edges]
    colors = ["crimson" if n == int(node_idx) else "steelblue" for n in g.nodes]
    plt.figure(figsize=(8, 6))
    nx.draw_networkx(
        g, pos, node_size=120, node_color=colors, width=widths,
        with_labels=len(g) <= 40, font_size=7, arrows=True,
    )
    plt.title(f"GNNExplainer masks around node {node_idx} (class {cls})")
    plt.axis("off")
    plt.tight_layout()
    out_png = os.path.join(run_dir, f"gnn_explainer_node_{node_idx}.png")
    plt.savefig(out_png, dpi=200)
    plt.close()
    print(f"[EXPLAIN/gnn] wrote gnn_explainer_importance.json + {out_png}")


def main() -> None:
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_x = sub.add_parser("xgb")
    p_x.add_argument("--run_dir", type=str, required=True)
    p_x.add_argument("--processed_dir", type=str, default="data/processed")
    p_x.add_argument("--n_samples", type=int, default=200)

    p_g = sub.add_parser("gnn")
    p_g.add_argument("--run_dir", type=str, required=True)
    p_g.add_argument("--node_idx", type=int, default=None)
    p_g.add_argument("--steps", type=int, default=300)

    args = parser.parse_args()
    if args.cmd == "xgb":
        run_xgb(args.run_dir, args.processed_dir, args.n_samples)
    else:
        run_gnn(args.run_dir, args.node_idx, args.steps)


if __name__ == "__main__":
    main()
