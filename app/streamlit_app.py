"""Interactive run dashboard (Streamlit).

Counterpart of /root/reference/app/streamlit_app.py (471 LoC): discovers
every directory containing a metrics.json under outputs/, buckets runs into
baselines / gnn / all, and offers the same seven views — Overview, Curves,
Drift, Calibration, Workload, Compare, Artifacts — plus the sidebar controls
(run-type picker, comparison-run picker, threshold source radio + slider,
per-tab show toggles; reference streamlit_app.py:385-429). The Compare tab
renders the paired-bootstrap Δ metrics with 95% CI as a table (reference
streamlit_app.py:259-332), searching the same candidate paths (run dir,
comparison dir, and the cross-named bootstrap_compare_<other>.json copies).

Beyond the reference: the decision-threshold slider applies across tabs —
Overview (what-if metric block), Drift (per-timestep F1/precision at the
effective threshold, recomputed from the stored score/label/timestep
arrays), and Workload (flagged-count marker on the precision curve).

Charts use Streamlit's built-ins + matplotlib (no plotly in this env).
All data-shaping helpers are pure functions so they are unit-testable
without streamlit installed (tests/test_report_and_entry.py).

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

RUN_TYPES = ["baselines", "gnn", "all"]

# alias-tolerant metric key map (reference streamlit_app.py:82-117)
KEY_ALIASES = {
    "pr_auc_illicit": ["pr_auc_illicit", "pr_auc", "ap"],
    "roc_auc": ["roc_auc", "auroc"],
    "f1_illicit_at_thr": ["f1_illicit_at_thr", "f1_at_threshold", "f1"],
    "threshold": ["threshold", "thr", "decision_threshold"],
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


def compare_candidates(run_dir: Path, comparison_dir: Path | None):
    """Candidate bootstrap-JSON paths in the reference's priority order
    (streamlit_app.py:291-296): the run's own file first, then the
    comparison run's, then the cross-named symmetric copies that
    analysis.bootstrap_compare writes into both dirs."""
    cands = [run_dir / "bootstrap_compare.json"]
    if comparison_dir is not None:
        cands += [
            comparison_dir / "bootstrap_compare.json",
            run_dir / f"bootstrap_compare_{comparison_dir.name}.json",
            comparison_dir / f"bootstrap_compare_{run_dir.name}.json",
        ]
    return cands


def extract_delta(data: dict, keys) -> tuple | None:
    """(delta, ci_low, ci_high, p_gt_0) from a bootstrap JSON entry, tolerant
    to key spellings (reference streamlit_app.py:259-289 + our p_gt_0)."""
    for key in keys:
        if key not in data:
            continue
        entry = data[key]
        if isinstance(entry, dict):
            delta = next(
                (entry[k] for k in ("delta", "estimate", "mean", "value")
                 if entry.get(k) is not None), None)
            lo = next((entry[k] for k in ("ci_low", "lower", "low")
                       if entry.get(k) is not None), None)
            hi = next((entry[k] for k in ("ci_high", "upper", "high")
                       if entry.get(k) is not None), None)
            if delta is not None:
                return (float(delta),
                        None if lo is None else float(lo),
                        None if hi is None else float(hi),
                        entry.get("p_gt_0"))
        elif isinstance(entry, (int, float)):
            return float(entry), None, None, None
    return None


def delta_table(compare_data: dict) -> pd.DataFrame | None:
    """Δ-metric table with 95% CI, or None when no recognizable Δ keys."""
    rows = []
    pr = extract_delta(compare_data, ["delta_pr_auc", "pr_auc", "pr-auc"])
    if pr:
        rows.append(("ΔPR-AUC",) + pr)
    pk = extract_delta(compare_data,
                       ["delta_p_at_k", "p_at_k", "precision_at_k"])
    if pk:
        rows.append(("ΔP@K",) + pk)
    if not rows:
        return None
    df = pd.DataFrame(
        rows, columns=["Metric", "Δ", "CI low", "CI high", "P(Δ>0)"])
    return df.set_index("Metric")


def load_test_arrays(run_dir: Path):
    """(scores, y_binary, timestep|None) test arrays, or None if absent."""
    s_path, y_path = run_dir / "scores_test.npy", run_dir / "y_test.npy"
    if not (s_path.exists() and y_path.exists()):
        return None
    s, y = np.load(s_path), np.load(y_path)
    t_path = run_dir / "timestep_test.npy"
    t = np.load(t_path) if t_path.exists() else None
    return s, (y == 1).astype(int), t


def threshold_whatif(scores, y_bin, thr: float) -> dict:
    from elliptic_gnn_tpu.utils import metrics as M

    flagged = scores >= thr
    return {
        "f1": M.f1_at_threshold(y_bin, scores, thr),
        "flagged": int(flagged.sum()),
        "precision": float(y_bin[flagged].mean() if flagged.any() else 0.0),
        "recall": float(
            y_bin[flagged].sum() / max(1, y_bin.sum())),
    }


def drift_at_threshold(scores, y_bin, timestep, thr: float) -> pd.DataFrame:
    """Per-timestep F1/precision/flagged at the effective threshold —
    recomputed live from the stored arrays so the slider what-if extends to
    the Drift tab (beyond the reference, which only re-reads by_time.csv)."""
    from elliptic_gnn_tpu.utils import metrics as M

    rows = []
    for t in np.unique(timestep):
        m = timestep == t
        s, y = scores[m], y_bin[m]
        flagged = s >= thr
        rows.append({
            "timestep": int(t),
            "n": int(m.sum()),
            "positives": int(y.sum()),
            "flagged": int(flagged.sum()),
            "precision": float(y[flagged].mean() if flagged.any() else 0.0),
            "f1": M.f1_at_threshold(y, s, thr),
        })
    return pd.DataFrame(rows)


def effective_threshold(run_metrics: dict, source: str, custom: float) -> float:
    if source == "Use slider":
        return float(custom)
    return float(metric_row(run_metrics).get("threshold", 0.5))


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
        st.header("Run selection")
        run_type = st.selectbox("Run type", RUN_TYPES,
                                index=RUN_TYPES.index("all"))
        options = [n for n in names
                   if run_type == "all" or runs[n]["kind"] == run_type]
        if not options:
            st.warning("No runs found for the selected run type.")
            return
        sel = st.selectbox("Run", options,
                           format_func=lambda p: os.path.relpath(p, OUTPUTS))
        cmp_sel = st.selectbox(
            "Comparison run (optional)",
            ["(none)"] + [n for n in names if n != sel],
            format_func=lambda p: (p if p == "(none)"
                                   else os.path.relpath(p, OUTPUTS)),
        )
        thr_source = st.radio(
            "Threshold source", ["Use run threshold", "Use slider"], index=0)
        thr_custom = st.slider(
            "Custom threshold", 0.0, 1.0, 0.5, 0.01,
            disabled=thr_source != "Use slider")
        show_by_timestep = st.checkbox("Show by timestep", value=True)
        show_calibration = st.checkbox("Show calibration", value=True)
        show_workload = st.checkbox("Show workload", value=True)

    run = runs[sel]
    rd = run["dir"]
    cmp_dir = None if cmp_sel == "(none)" else runs[cmp_sel]["dir"]
    thr = effective_threshold(run["metrics"], thr_source, thr_custom)

    tabs = st.tabs([
        "Overview", "Curves", "Drift", "Calibration", "Workload", "Compare",
        "Artifacts",
    ])

    with tabs[0]:
        st.subheader("All runs")
        table = {
            os.path.relpath(n, OUTPUTS): metric_row(runs[n]["metrics"])
            for n in options
        }
        st.dataframe(pd.DataFrame(table).T)
        if thr_source == "Use slider":
            st.caption(f"Using custom decision threshold: {thr:.3f}")
        else:
            st.caption(f"Run decision threshold: {thr:.3f}")
        hub_files = list(rd.glob("metrics_hub_removed*.json"))
        if hub_files:
            st.subheader("Hub ablation")
            rows = {}
            for hf in hub_files:
                with open(hf) as f:
                    rows[hf.name] = metric_row(json.load(f))
            st.dataframe(pd.DataFrame(rows).T)
        arrays = load_test_arrays(rd)
        if arrays:
            s, y_bin, _ = arrays
            st.subheader(f"Metrics at threshold {thr:.3f}")
            st.json(threshold_whatif(s, y_bin, thr))

    with tabs[1]:
        for png in ("by_time_pr_auc.png", "calibration_curve.png",
                    "workload_curve.png"):
            p = rd / png
            if p.exists():
                st.image(str(p), caption=png)

    with tabs[2]:
        if not show_by_timestep:
            st.info("Enable 'Show by timestep' in the sidebar.")
        else:
            p = rd / "by_time.csv"
            if p.exists():
                df = pd.read_csv(p)
                st.line_chart(df.set_index("timestep")["pr_auc"])
                st.dataframe(df)
            else:
                st.info("Run analysis.eval_by_time to generate by_time.csv")
            arrays = load_test_arrays(rd)
            if arrays and arrays[2] is not None:
                s, y_bin, t = arrays
                st.subheader(f"Per-timestep metrics at threshold {thr:.3f}")
                ddf = drift_at_threshold(s, y_bin, t, thr)
                st.line_chart(ddf.set_index("timestep")[["precision", "f1"]])
                st.dataframe(ddf)

    with tabs[3]:
        if not show_calibration:
            st.info("Enable 'Show calibration' in the sidebar.")
        else:
            p = rd / "calibration_curve.png"
            if p.exists():
                st.image(str(p), caption="Calibration curve")
            else:
                st.info("Run analysis.calibration_plots first")

    with tabs[4]:
        if not show_workload:
            st.info("Enable 'Show workload' in the sidebar.")
        else:
            p = rd / "workload_curve.csv"
            if p.exists():
                df = pd.read_csv(p)
                st.line_chart(df.set_index("k")["precision_at_k"])
            png = rd / "workload_curve.png"
            if png.exists():
                st.image(str(png), caption="Workload curve")
            arrays = load_test_arrays(rd)
            if arrays:
                s, y_bin, _ = arrays
                w = threshold_whatif(s, y_bin, thr)
                st.caption(
                    f"At threshold {thr:.3f}: K = {w['flagged']} flagged, "
                    f"precision {w['precision']:.3f}, "
                    f"recall {w['recall']:.3f}")

    with tabs[5]:
        compare_data, chosen = None, None
        for cand in compare_candidates(rd, cmp_dir):
            if cand.exists():
                try:
                    with open(cand) as f:
                        compare_data = json.load(f)
                except Exception:
                    continue
                chosen = cand
                if compare_data:
                    break
        if not compare_data:
            st.info("No bootstrap comparison data for the selected runs — "
                    "run analysis.bootstrap_compare first.")
        else:
            st.caption(f"Loaded comparison from {chosen}")
            df = delta_table(compare_data)
            if df is None:
                st.warning("Bootstrap JSON has no recognizable ΔPR-AUC / "
                           "ΔP@K entries; raw contents below.")
                st.json(compare_data)
            else:
                st.table(df)
                if {"run_a", "run_b"} <= set(compare_data):
                    st.caption(
                        f"Δ = {compare_data['run_b']} − "
                        f"{compare_data['run_a']} (paired bootstrap, "
                        f"n={compare_data.get('n_boot', '?')} resamples)")

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
