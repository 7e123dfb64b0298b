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
