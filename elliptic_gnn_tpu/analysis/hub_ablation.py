"""Standalone hub ablation: drop all edges touching the top-degree nodes,
re-evaluate the trained model, write metrics_hub_removed_<frac>.json.

Counterpart of /root/reference/src/analysis/hub_ablation.py:56-205 —
degree = in + out over the used edge set; the trained threshold and
temperature are reused. One conscious deviation (SURVEY.md §7.3 quirk list):
the reference's standalone tool forgets to pass `t_idx` and zero-pads
features for time-embedding models (hub_ablation.py:88-115,155); here the
time embedding is passed properly, matching the trainer's *inline* ablation
(train_gnn.py:526-558) which is the better-specified behavior.

CLI: python -m elliptic_gnn_tpu.analysis.hub_ablation --run_dir <dir>
         [--frac 0.01] [--processed_dir <dir>]
"""
from __future__ import annotations

import argparse
import os

from ..graph.transform import remove_hub_edges
from ..utils import metrics as M
from ..utils.common import save_json
from .common import (
    load_run_metrics,
    model_probs,
    rebuild_model_and_data,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_dir", type=str, required=True)
    parser.add_argument("--frac", type=float, default=0.01)
    parser.add_argument("--processed_dir", type=str, default=None)
    args = parser.parse_args()

    run_metrics = load_run_metrics(args.run_dir)
    thr = float(run_metrics["threshold"])
    temp = float(run_metrics.get("temperature", 1.0))

    cfg, data, _, model, params, state = rebuild_model_and_data(
        args.run_dir, processed_dir=args.processed_dir
    )
    ei_abl, num_hubs = remove_hub_edges(data.edge_index, data.num_nodes, args.frac)

    from ..models import MODEL_GRAPH_KIND, prepare_graph_ops

    gops_abl = prepare_graph_ops(
        ei_abl, data.num_nodes, MODEL_GRAPH_KIND[cfg["arch"]]
    )
    probs = model_probs(cfg, data, gops_abl, model, params, state, temperature=temp)

    y_te = data.y[data.test_mask]
    p_te = probs[data.test_mask]
    y_bin = (y_te == 1).astype(int)
    out = dict(
        pr_auc_illicit=M.pr_auc_illicit(y_bin, p_te),
        roc_auc=M.roc_auc_illicit(y_bin, p_te),
        f1_illicit_at_thr=M.f1_at_threshold(y_bin, p_te, thr),
        threshold=thr,
        precision_at_k=M.precision_at_k(y_bin, p_te, int(cfg.get("topk", 100))),
        recall_at_precision=M.recall_at_precision(
            y_bin, p_te, float(cfg.get("precision_target", 0.90) or 0.90)
        ),
        ece=M.expected_calibration_error(y_bin, p_te),
        n_test=int(len(y_te)),
        n_hubs=int(num_hubs),
        hub_fraction=float(args.frac),
        n_edges_remaining=int(ei_abl.shape[1]),
    )
    frac_str = str(args.frac).replace(".", "p")
    path = os.path.join(args.run_dir, f"metrics_hub_removed_{frac_str}.json")
    save_json(path, out)
    print(f"[HUB] frac={args.frac} hubs={num_hubs} "
          f"edges {data.num_edges} -> {ei_abl.shape[1]}; wrote {path}")
    print({k: round(v, 4) if isinstance(v, float) else v for k, v in out.items()})


if __name__ == "__main__":
    main()
