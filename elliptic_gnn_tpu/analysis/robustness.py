"""Robustness evaluation: random edge drops + Gaussian feature noise, then
re-evaluate at the originally-trained threshold.

Counterpart of /root/reference/src/analysis/robustness.py:65-235:
  - drop `drop_frac` of the (prepared, post-symmetrize) edges uniformly;
  - add N(0, noise_std^2) to features;
  - re-fit the temperature on the perturbed val logits (the reference does,
    robustness.py:93-117);
  - metrics at the *original* trained threshold from metrics.json;
  - output robustness_drop<frac>_noise<std>.json in the run dir.

On TPU the perturbed edge set is re-packed host-side into fresh ELL tables
(one retrace per perturbation config) instead of slicing edge_index —
see kernels/ell.py for why scatter-free static shapes win.

CLI: python -m elliptic_gnn_tpu.analysis.robustness --run_dir <dir>
         [--drop_frac 0.1] [--noise_std 0.0] [--seed 42]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..graph.transform import drop_edges
from ..train import calibrate
from ..utils import metrics as M
from ..utils.common import save_json
from .common import load_run_metrics, rebuild_model_and_data


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_dir", type=str, required=True)
    parser.add_argument("--drop_frac", type=float, default=0.1)
    parser.add_argument("--noise_std", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--processed_dir", type=str, default=None)
    args = parser.parse_args()

    run_metrics = load_run_metrics(args.run_dir)
    if "threshold" not in run_metrics:
        raise KeyError("metrics.json does not contain 'threshold'")
    thr = float(run_metrics["threshold"])

    cfg, data, _, model, params, state = rebuild_model_and_data(
        args.run_dir, processed_dir=args.processed_dir
    )

    ei = drop_edges(data.edge_index, args.drop_frac, seed=args.seed)
    if args.noise_std > 0:
        rng = np.random.default_rng(args.seed)
        data = data.replace(
            x=data.x + rng.normal(0, args.noise_std, data.x.shape).astype(np.float32)
        )

    from ..models import MODEL_GRAPH_KIND, prepare_graph_ops

    gops = prepare_graph_ops(ei, data.num_nodes, MODEL_GRAPH_KIND[cfg["arch"]])

    import jax
    import jax.numpy as jnp

    x = jnp.asarray(data.x)
    t = jnp.asarray(data.timestep.astype(np.int32)) if model.uses_time_embed else None
    logits, _ = jax.jit(
        lambda p, s: model.apply(p, s, x, gops, t, training=False)
    )(params, state)
    logits = np.asarray(logits)

    temp = 1.0
    if bool(cfg.get("calibrate_temperature", True)):
        y_val_bin = (data.y[data.val_mask] == 1).astype(int)
        temp = calibrate.fit_temperature(logits[data.val_mask], y_val_bin)

    z = logits / temp
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    probs = (e / e.sum(axis=1, keepdims=True))[:, 1]

    y_te = data.y[data.test_mask]
    p_te = probs[data.test_mask]
    y_bin = (y_te == 1).astype(int)
    out = dict(
        drop_frac=float(args.drop_frac),
        noise_std=float(args.noise_std),
        n_edges_original=int(data.num_edges),
        n_edges_remaining=int(ei.shape[1]),
        temperature=float(temp),
        threshold=thr,
        pr_auc_illicit=M.pr_auc_illicit(y_bin, p_te),
        roc_auc=M.roc_auc_illicit(y_bin, p_te),
        f1_illicit_at_thr=M.f1_at_threshold(y_bin, p_te, thr),
        precision_at_k=M.precision_at_k(y_bin, p_te, int(cfg.get("topk", 100))),
        recall_at_precision=M.recall_at_precision(
            y_bin, p_te, float(cfg.get("precision_target", 0.90) or 0.90)
        ),
        ece=M.expected_calibration_error(y_bin, p_te),
        n_test=int(len(y_te)),
    )
    name = f"robustness_drop{args.drop_frac}_noise{args.noise_std}.json"
    path = os.path.join(args.run_dir, name)
    save_json(path, out)
    print(f"[ROBUST] wrote {path}")
    print({k: round(v, 4) if isinstance(v, float) else v for k, v in out.items()})


if __name__ == "__main__":
    main()
