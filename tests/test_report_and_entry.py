"""Dashboard report + driver-entry smoke tests."""
import os

import jax
import numpy as np

from elliptic_gnn_tpu.graph import build_graph
from elliptic_gnn_tpu.train import train_gnn


def test_static_report(tmp_path):
    processed = str(tmp_path / "processed")
    build_graph.main({
        "seed": 5, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 800,
        "processed_dir": processed, "data_dir": str(tmp_path / "raw"),
    })
    out_root = str(tmp_path / "outputs")
    train_gnn.main({
        "run_name": "r1", "seed": 0, "processed_dir": processed,
        "output_root": out_root, "arch": "gcn", "hidden_dim": 16,
        "layers": 2, "dropout": 0.1, "lr": 0.01, "weight_decay": 0,
        "max_epochs": 3, "patience": 3,
    })
    from pathlib import Path

    from elliptic_gnn_tpu.analysis import eval_by_time, report

    eval_by_time.main(os.path.join(out_root, "gnn", "r1"))
    out_html = Path(out_root) / "report.html"
    report.render(Path(out_root), out_html)
    text = out_html.read_text()
    assert "gnn/r1" in text
    assert "pr_auc_illicit" in text
    assert "data:image/png;base64" in text  # inlined curve image


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_streamlit_app_importable_pieces():
    """The streamlit app's discovery/metric-mapping helpers work without
    streamlit installed (UI entry gated behind main())."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "streamlit_app",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "app",
                     "streamlit_app.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.discover_runs)
    row = mod.metric_row({"pr_auc": 0.5, "roc_auc": 0.9})
    assert row["pr_auc_illicit"] == 0.5 and row["roc_auc"] == 0.9
    return mod


def test_streamlit_compare_helpers(tmp_path):
    """Compare-tab Δ-table + candidate path ordering + threshold helpers
    (reference streamlit_app.py:259-332,385-429 feature checklist)."""
    mod = test_streamlit_app_importable_pieces()
    from pathlib import Path

    # candidate priority: own file, comparison's file, cross-named copies
    ra, rb = Path("/o/gnn/run_a"), Path("/o/gnn/run_b")
    cands = mod.compare_candidates(ra, rb)
    assert cands == [
        ra / "bootstrap_compare.json",
        rb / "bootstrap_compare.json",
        ra / "bootstrap_compare_run_b.json",
        rb / "bootstrap_compare_run_a.json",
    ]
    assert mod.compare_candidates(ra, None) == [ra / "bootstrap_compare.json"]

    # Δ extraction from our bootstrap_compare schema (mean/ci_low/ci_high)
    data = {
        "run_a": "run_a", "run_b": "run_b", "n_boot": 500,
        "delta_pr_auc": {"mean": 0.002, "ci_low": -0.001, "ci_high": 0.005,
                         "p_gt_0": 0.9},
        "delta_p_at_k": {"mean": 0.0, "ci_low": -0.02, "ci_high": 0.02,
                         "p_gt_0": 0.5},
    }
    df = mod.delta_table(data)
    assert list(df.index) == ["ΔPR-AUC", "ΔP@K"]
    assert df.loc["ΔPR-AUC", "Δ"] == 0.002
    assert df.loc["ΔPR-AUC", "CI high"] == 0.005
    # reference-style alternate spellings still extract
    alt = mod.extract_delta({"pr_auc": {"delta": 0.1, "lower": 0.0,
                                        "upper": 0.2}},
                            ["delta_pr_auc", "pr_auc"])
    assert alt[:3] == (0.1, 0.0, 0.2)
    assert mod.delta_table({"unrelated": 1}) is None

    # threshold source resolution + per-timestep what-if recompute
    assert mod.effective_threshold({"threshold": 0.7}, "Use run threshold",
                                   0.3) == 0.7
    assert mod.effective_threshold({"threshold": 0.7}, "Use slider",
                                   0.3) == 0.3
    scores = np.array([0.9, 0.8, 0.2, 0.6, 0.1, 0.95])
    y = np.array([1, 0, 0, 1, 0, 1])
    t = np.array([1, 1, 1, 2, 2, 2])
    ddf = mod.drift_at_threshold(scores, y, t, 0.5)
    assert list(ddf["timestep"]) == [1, 2]
    assert list(ddf["flagged"]) == [2, 2]
    assert ddf.loc[0, "precision"] == 0.5  # t=1: flags scores .9(y1), .8(y0)
    assert ddf.loc[1, "precision"] == 1.0  # t=2: flags .6(y1), .95(y1)
    w = mod.threshold_whatif(scores, y, 0.5)
    assert w["flagged"] == 4 and w["recall"] == 1.0
