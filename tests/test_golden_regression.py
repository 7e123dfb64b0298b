"""Golden regression: a fixed-seed training run must land inside a recorded
metric band. Guards against silent numeric drift across refactors/rounds
(SURVEY.md §4: end-to-end PR-AUC regression vs the baseline table)."""
import numpy as np

from elliptic_gnn_tpu.graph import build_graph
from elliptic_gnn_tpu.train import train_gnn

# Band recorded on 2026-08-17 (round 1) on the CPU backend; the run is
# deterministic up to BLAS reduction order, so the band is deliberately
# wider than observed run-to-run variation (< 0.005).
GOLDEN = {
    "pr_auc_illicit": (0.60, 0.95),
    "roc_auc": (0.85, 1.0),
    "best_val_pr_auc": (0.55, 0.95),
}


def test_fixed_seed_training_band(tmp_path):
    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 123, "t_train_end": 10, "t_val_end": 13, "t_max": 16,
        "synthetic": True, "synthetic_nodes": 4000,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    metrics = train_gnn.main({
        "run_name": "golden", "seed": 123, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 32, "layers": 3, "dropout": 0.2, "lr": 5e-3,
        "weight_decay": 5e-5, "max_epochs": 40, "patience": 40,
        "grad_clip": 1.0, "time_embed_dim": 2, "time_embed_type": "sin",
        "max_timestep": 16, "symmetrize_edges": True, "train_window_k": 8,
        "calibrate_temperature": True,
    })
    for key, (lo, hi) in GOLDEN.items():
        assert lo <= metrics[key] <= hi, (key, metrics[key])
    # temperature fit produced a sane positive temperature
    assert 0.2 < metrics["temperature"] < 20.0
