"""Interactive run dashboard (Streamlit).

Counterpart of /root/reference/app/streamlit_app.py (471 LoC): discovers
every directory containing a metrics.json under outputs/, buckets runs into
baselines / gnn / other, and offers the same seven views — Overview,
Curves, Drift, Calibration, Workload, Compare, Artifacts — plus a sidebar
run picker and threshold slider. Charts use Streamlit's built-ins +
matplotlib (this environment has no plotly).

Run:  streamlit run app/streamlit_app.py
For a no-server alternative: python -m elliptic_gnn_tpu.analysis.report
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTPUTS = Path(os.environ.get("EGNN_OUTPUTS", "outputs"))

# alias-tolerant metric key map (streamlit_app.py:82-117)
KEY_ALIASES = {
    "pr_auc_illicit": ["pr_auc_illicit", "pr_auc", "ap"],
    "roc_auc": ["roc_auc", "auroc"],
    "f1_illicit_at_thr": ["f1_illicit_at_thr", "f1"],
    "threshold": ["threshold", "thr"],
    "precision_at_k": ["precision_at_k", "p_at_k"],
    "recall_at_precision": ["recall_at_precision", "r_at_p"],
    "ece": ["ece"],
    "n_test": ["n_test"],
    "pr_auc_last3": ["pr_auc_last3"],
}


def discover_runs():
    runs = {}
    if not OUTPUTS.exists():
        return runs
    for mpath in OUTPUTS.rglob("metrics.json"):
        rd = mpath.parent
        kind = "other"
        parts = rd.parts
        if "baselines" in parts:
            kind = "baselines"
        elif "gnn" in parts:
            kind = "gnn"
        try:
            with open(mpath) as f:
                metrics = json.load(f)
        except Exception:
            continue
        runs[str(rd)] = {"kind": kind, "metrics": metrics, "dir": rd}
    return runs


def metric_row(metrics: dict) -> dict:
    row = {}
    for canon, aliases in KEY_ALIASES.items():
        for a in aliases:
            if a in metrics:
                row[canon] = metrics[a]
                break
    return row


def main():
    import streamlit as st

    st.set_page_config(page_title="elliptic-gnn-tpu runs", layout="wide")
    st.title("Elliptic GNN (TPU) — run explorer")

    runs = discover_runs()
    if not runs:
        st.warning(f"No runs with metrics.json under {OUTPUTS}/")
        return

    names = sorted(runs)
    with st.sidebar:
        st.header("Runs")
        sel = st.selectbox("Run", names, format_func=lambda p: os.path.relpath(p, OUTPUTS))
        cmp_sel = st.selectbox(
            "Compare against", ["(none)"] + [n for n in names if n != sel]
        )
        thr_override = st.slider("Threshold (what-if)", 0.0, 1.0,
                                 float(runs[sel]["metrics"].get("threshold", 0.5)))

    run = runs[sel]
    rd = run["dir"]
    tabs = st.tabs([
        "Overview", "Curves", "Drift", "Calibration", "Workload", "Compare",
        "Artifacts",
    ])

    with tabs[0]:
        st.subheader("All runs")
        table = {
            os.path.relpath(n, OUTPUTS): metric_row(r["metrics"])
            for n, r in sorted(runs.items())
        }
        st.dataframe(pd.DataFrame(table).T)
        hub_files = list(rd.glob("metrics_hub_removed*.json"))
        if hub_files:
            st.subheader("Hub ablation")
            rows = {}
            for hf in hub_files:
                with open(hf) as f:
                    rows[hf.name] = metric_row(json.load(f))
            st.dataframe(pd.DataFrame(rows).T)
        # threshold what-if on stored scores
        s_path, y_path = rd / "scores_test.npy", rd / "y_test.npy"
        if s_path.exists():
            from elliptic_gnn_tpu.utils import metrics as M

            s, y = np.load(s_path), np.load(y_path)
            y_bin = (y == 1).astype(int)
            st.subheader(f"Metrics at threshold {thr_override:.3f}")
            st.json({
                "f1": M.f1_at_threshold(y_bin, s, thr_override),
                "flagged": int((s >= thr_override).sum()),
                "precision": float(
                    y_bin[s >= thr_override].mean() if (s >= thr_override).any() else 0.0
                ),
            })

    with tabs[1]:
        for png in ("by_time_pr_auc.png", "calibration_curve.png",
                    "workload_curve.png"):
            p = rd / png
            if p.exists():
                st.image(str(p), caption=png)

    with tabs[2]:
        p = rd / "by_time.csv"
        if p.exists():
            df = pd.read_csv(p)
            st.line_chart(df.set_index("timestep")["pr_auc"])
            st.dataframe(df)
        else:
            st.info("Run analysis.eval_by_time to generate by_time.csv")

    with tabs[3]:
        p = rd / "calibration_curve.png"
        if p.exists():
            st.image(str(p))
        else:
            st.info("Run analysis.calibration_plots first")

    with tabs[4]:
        p = rd / "workload_curve.csv"
        if p.exists():
            df = pd.read_csv(p)
            st.line_chart(df.set_index("k")["precision_at_k"])
        png = rd / "workload_curve.png"
        if png.exists():
            st.image(str(png))

    with tabs[5]:
        found = list(rd.glob("bootstrap_compare*.json"))
        if found:
            for bf in found:
                with open(bf) as f:
                    res = json.load(f)
                st.subheader(bf.name)
                st.json(res)
        elif cmp_sel != "(none)":
            st.info("Run analysis.bootstrap_compare for a paired comparison")

    with tabs[6]:
        priority = [
            "metrics.json", "config_used.yaml", "best.ckpt", "model.pkl",
            "scores_test.npy", "y_test.npy", "node_idx_test.npy",
            "timestep_test.npy", "scores_val.npy", "training_log.csv",
        ]
        files = [rd / p for p in priority if (rd / p).exists()]
        files += [p for p in sorted(rd.iterdir())
                  if p.is_file() and p not in files]
        for p in files:
            with open(p, "rb") as f:
                st.download_button(p.name, f.read(), file_name=p.name)


if __name__ == "__main__":
    main()
