"""Analysis-tool integration tests: each tool runs on real run dirs produced
by the trainer and emits the reference's artifact names."""
import json
import os
import sys

import numpy as np
import pytest

from elliptic_gnn_tpu.graph import build_graph
from elliptic_gnn_tpu.train import train_gnn, train_baselines


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("analysis")
    processed = str(root / "processed")
    build_graph.main({
        "seed": 3, "t_train_end": 10, "t_val_end": 13, "t_max": 16,
        "synthetic": True, "synthetic_nodes": 2500,
        "processed_dir": processed, "data_dir": str(root / "raw"),
    })
    out_root = str(root / "outputs")
    base = {
        "seed": 3, "processed_dir": processed, "output_root": out_root,
        "arch": "sage", "hidden_dim": 32, "layers": 2, "dropout": 0.1,
        "lr": 0.01, "weight_decay": 1e-4, "max_epochs": 15, "patience": 15,
        "grad_clip": 1.0, "topk": 50, "calibrate_temperature": True,
    }
    train_gnn.main(dict(base, run_name="runA"))
    train_gnn.main(dict(base, run_name="runB", seed=4, hidden_dim=24))
    return {
        "processed": processed,
        "out_root": out_root,
        "runA": os.path.join(out_root, "gnn", "runA"),
        "runB": os.path.join(out_root, "gnn", "runB"),
    }


def _run_cli(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def test_eval_by_time(env):
    from elliptic_gnn_tpu.analysis import eval_by_time

    eval_by_time.main(env["runA"])
    assert os.path.exists(os.path.join(env["runA"], "by_time.csv"))
    assert os.path.exists(os.path.join(env["runA"], "by_time_pr_auc.png"))
    with open(os.path.join(env["runA"], "by_time.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("timestep,")
    assert len(lines) > 1


def test_calibration_plots(env):
    from elliptic_gnn_tpu.analysis import calibration_plots

    calibration_plots.main(env["runA"])
    assert os.path.exists(os.path.join(env["runA"], "calibration_curve.png"))


def test_workload_curves(env):
    from elliptic_gnn_tpu.analysis import workload_curves

    workload_curves.main(env["runA"], k_max=200)
    csv_path = os.path.join(env["runA"], "workload_curve.csv")
    assert os.path.exists(csv_path)
    assert os.path.exists(os.path.join(env["runA"], "workload_curve.png"))


def test_bootstrap_compare(env):
    from elliptic_gnn_tpu.analysis import bootstrap_compare

    _run_cli(bootstrap_compare.main, [
        "x", "--run_a", env["runA"], "--run_b", env["runB"],
        "--n_boot", "50", "--topk", "20",
    ])
    with open(os.path.join(env["runB"], "bootstrap_compare.json")) as f:
        res = json.load(f)
    assert "delta_pr_auc" in res and "ci_low" in res["delta_pr_auc"]
    assert os.path.exists(
        os.path.join(env["runA"], "bootstrap_compare_runB.json")
    )


def test_hub_ablation_standalone(env):
    from elliptic_gnn_tpu.analysis import hub_ablation

    _run_cli(hub_ablation.main, [
        "x", "--run_dir", env["runA"], "--frac", "0.02",
        "--processed_dir", env["processed"],
    ])
    path = os.path.join(env["runA"], "metrics_hub_removed_0p02.json")
    with open(path) as f:
        res = json.load(f)
    assert res["hub_fraction"] == 0.02
    assert res["n_edges_remaining"] >= 0


def test_robustness(env):
    from elliptic_gnn_tpu.analysis import robustness

    _run_cli(robustness.main, [
        "x", "--run_dir", env["runA"], "--drop_frac", "0.2",
        "--noise_std", "0.1", "--processed_dir", env["processed"],
    ])
    path = os.path.join(env["runA"], "robustness_drop0.2_noise0.1.json")
    with open(path) as f:
        res = json.load(f)
    assert res["n_edges_remaining"] < res["n_edges_original"]
    assert 0 <= res["pr_auc_illicit"] <= 1


def test_ensemble(env):
    from elliptic_gnn_tpu.analysis import evaluate_ensemble

    out = os.path.join(env["out_root"], "gnn", "ens_ab")
    _run_cli(evaluate_ensemble.main, [
        "x", "--run_a", env["runA"], "--run_b", env["runB"],
        "--out_dir", out, "--mode", "logit", "--topk", "20",
    ])
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert "pr_auc_illicit" in m and m["ensemble_mode"] == "logit"
    for a in ("scores_test.npy", "y_test.npy", "node_idx_test.npy"):
        assert os.path.exists(os.path.join(out, a))


def test_explain_gnn(env):
    from elliptic_gnn_tpu.analysis import explain

    # speed: few optimization steps
    explain.run_gnn(env["runA"], steps=20)
    with open(os.path.join(env["runA"], "gnn_explainer_importance.json")) as f:
        res = json.load(f)
    assert "top_edges" in res and "top_features" in res
    pngs = [p for p in os.listdir(env["runA"]) if p.startswith("gnn_explainer_node_")]
    assert pngs


def test_eda(env, capsys):
    from elliptic_gnn_tpu.analysis import eda

    out_dir = os.path.join(env["out_root"], "eda")
    _run_cli(eda.main, [
        "x", "--processed_dir", env["processed"], "--out_dir", out_dir,
        "--assert_no_cross_time_edges",
    ])
    assert os.path.exists(os.path.join(out_dir, "degree_hist.csv"))
    assert os.path.exists(os.path.join(out_dir, "labels_by_time.csv"))
    assert "no cross-timestep edges" in capsys.readouterr().out


def test_baselines_lr_and_gbdt(env):
    cfg = {
        "run_name": "lr_t", "seed": 0, "processed_dir": env["processed"],
        "output_root": env["out_root"], "model": "logistic_regression",
        "calibration": "isotonic", "C": 1.0, "max_iter": 500,
        "class_weight": "balanced", "topk": 50,
    }
    m = train_baselines.main(cfg)
    assert m["engine"] == "sklearn_logreg"
    assert 0 <= m["pr_auc_illicit"] <= 1
    rd = os.path.join(env["out_root"], "baselines", "lr_t")
    assert os.path.exists(os.path.join(rd, "model.pkl"))
    assert os.path.exists(os.path.join(rd, "scores_test.npy"))

    cfg2 = dict(cfg, run_name="xgb_t", model="xgboost", n_estimators=50,
                calibration="platt")
    m2 = train_baselines.main(cfg2)
    assert m2["engine"] in ("xgboost", "sklearn_histgb")
    assert 0 <= m2["pr_auc_illicit"] <= 1


def test_explain_xgb(env):
    from elliptic_gnn_tpu.analysis import explain

    # LR pipeline -> model-agnostic permutation importance
    rd = os.path.join(env["out_root"], "baselines", "lr_t")
    explain.run_xgb(rd, env["processed"], n_samples=100)
    with open(os.path.join(rd, "xgb_top_features.json")) as f:
        res = json.load(f)
    assert res["method"] == "permutation_importance"
    assert len(res["top_features"]) > 0
    assert os.path.exists(os.path.join(rd, "shap_summary.png"))

    # tree model -> exact TreeSHAP (reference explain.py:236-244 semantics)
    rd2 = os.path.join(env["out_root"], "baselines", "xgb_t")
    explain.run_xgb(rd2, env["processed"], n_samples=60)
    with open(os.path.join(rd2, "xgb_top_features.json")) as f:
        res2 = json.load(f)
    assert res2["method"] == "tree_shap_exact"
    assert "expected_value" in res2
    assert os.path.exists(os.path.join(rd2, "shap_summary.png"))


def test_treeshap_additivity():
    """Exact TreeSHAP local accuracy: sum(phi) + E[f] == decision_function
    to float precision, on depth-limited and unlimited HistGB models."""
    import numpy as np
    from sklearn.ensemble import HistGradientBoostingClassifier
    from elliptic_gnn_tpu.analysis.treeshap import hist_gb_shap_values

    rng = np.random.default_rng(0)
    x = rng.standard_normal((400, 9))
    y = ((x[:, 0] + 0.5 * x[:, 3] - 0.3 * x[:, 7]
          + 0.2 * rng.standard_normal(400)) > 0).astype(int)
    for kw in ({"max_iter": 30, "max_depth": 4}, {"max_iter": 15}):
        m = HistGradientBoostingClassifier(**kw).fit(x, y)
        phi, ev = hist_gb_shap_values(m, x[:64])
        np.testing.assert_allclose(
            phi.sum(axis=1) + ev, m.decision_function(x[:64]),
            rtol=0, atol=1e-9,
        )


def test_sweep_gnn(env, monkeypatch, tmp_path):
    from elliptic_gnn_tpu.sweeps import sweep_gnn

    monkeypatch.chdir(tmp_path)
    base = {
        "seed": 3, "processed_dir": env["processed"],
        "arch": "sage", "hidden_dim": 16, "layers": 2, "dropout": 0.1,
        "lr": 0.01, "weight_decay": 1e-4, "max_epochs": 3, "patience": 3,
        "topk": 20, "calibrate_temperature": False,
    }
    grid = {"hidden_dim": [16, 24], "lr": [0.01]}
    out_root = str(tmp_path / "outputs")
    rows = sweep_gnn.run_sweep(base, grid, rank_key="pr_auc_illicit",
                               output_root=out_root)
    assert len(rows) == 2
    assert os.path.exists(os.path.join(out_root, "sweeps", "leaderboard.tsv"))
    best = os.path.join(out_root, "gnn", "best")
    assert os.path.islink(best) or os.path.exists(os.path.join(best, "POINTER.txt"))
    # resume: second invocation skips everything
    rows2 = sweep_gnn.run_sweep(base, grid, rank_key="pr_auc_illicit",
                                output_root=out_root)
    assert all(r["dt_seconds"] == 0.0 for r in rows2)


def test_sweep_gnn_parallel(env, monkeypatch, tmp_path):
    """--workers N trains combos in a process pool; ranking and metrics
    must match the sequential sweep exactly (only wall-clock differs)."""
    from elliptic_gnn_tpu.sweeps import sweep_gnn

    monkeypatch.chdir(tmp_path)
    base = {
        "seed": 3, "processed_dir": env["processed"],
        "arch": "sage", "hidden_dim": 16, "layers": 2, "dropout": 0.0,
        "lr": 0.01, "weight_decay": 1e-4, "max_epochs": 3, "patience": 3,
        "topk": 20, "calibrate_temperature": False,
    }
    grid = {"hidden_dim": [16, 24], "lr": [0.01]}

    def leaderboard_sans_time(root):
        with open(os.path.join(root, "sweeps", "leaderboard.tsv")) as f:
            return [l.rsplit("\t", 1)[0] for l in f.read().splitlines()]

    seq_root = str(tmp_path / "out_seq")
    par_root = str(tmp_path / "out_par")
    sweep_gnn.run_sweep(base, grid, rank_key="pr_auc_illicit",
                        output_root=seq_root)
    rows = sweep_gnn.run_sweep(base, grid, rank_key="pr_auc_illicit",
                               output_root=par_root, workers=2)
    assert len(rows) == 2
    assert all(isinstance(r.get("pr_auc_illicit"), float) for r in rows)
    assert leaderboard_sans_time(par_root) == leaderboard_sans_time(seq_root)
    # resume semantics survive the parallel path
    rows2 = sweep_gnn.run_sweep(base, grid, rank_key="pr_auc_illicit",
                                output_root=par_root, workers=2)
    assert all(r["dt_seconds"] == 0.0 for r in rows2)


def test_predict_cli(env):
    from elliptic_gnn_tpu.train import predict as P

    _run_cli(P.main, [
        "x", "--run_dir", env["runA"], "--processed_dir", env["processed"],
        "--splits", "test",
    ])
    import csv

    path = os.path.join(env["runA"], "predictions.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert rows and {"node_idx", "score_illicit", "flagged"} == set(rows[0])
    scores = np.array([float(r["score_illicit"]) for r in rows])
    assert (scores >= 0).all() and (scores <= 1).all()
    # consistency with the stored test artifacts
    stored_idx = np.load(os.path.join(env["runA"], "node_idx_test.npy"))
    got_idx = np.array([int(r["node_idx"]) for r in rows])
    np.testing.assert_array_equal(np.sort(got_idx), np.sort(stored_idx))


def test_treeshap_matches_bruteforce_shapley():
    """Exactness against first principles: on a small-feature model,
    enumerate every feature subset, evaluate the tree-conditional
    expectation game v(S) (follow x on features in S, coverage-weighted
    average otherwise), and compare the Shapley formula directly with
    hist_gb_shap_values. This is sufficient (not just additivity)."""
    import math

    import numpy as np
    from sklearn.ensemble import HistGradientBoostingClassifier
    from elliptic_gnn_tpu.analysis.treeshap import hist_gb_shap_values

    rng = np.random.default_rng(4)
    n_feat = 5
    x = rng.standard_normal((300, n_feat))
    y = ((x[:, 0] - 0.8 * x[:, 2] + 0.4 * x[:, 4]
          + 0.3 * rng.standard_normal(300)) > 0).astype(int)
    model = HistGradientBoostingClassifier(max_iter=5, max_depth=3).fit(x, y)

    def cond_exp(nodes, xv, in_s):
        def rec(j):
            nd = nodes[j]
            if nd["is_leaf"]:
                return float(nd["value"])
            f = int(nd["feature_idx"])
            left, right = int(nd["left"]), int(nd["right"])
            if in_s[f]:
                return rec(left if xv[f] <= nd["num_threshold"] else right)
            cl = float(nodes[left]["count"])
            cr = float(nodes[right]["count"])
            return (cl * rec(left) + cr * rec(right)) / (cl + cr)
        return rec(0)

    def v(xv, subset):
        in_s = [f in subset for f in range(n_feat)]
        total = float(np.ravel(model._baseline_prediction)[0])
        for row in model._predictors:
            total += cond_exp(row[0].nodes, xv, in_s)
        return total

    xs = x[:4]
    phi, ev = hist_gb_shap_values(model, xs)
    fact = math.factorial
    for i in range(xs.shape[0]):
        for k in range(n_feat):
            others = [f for f in range(n_feat) if f != k]
            val = 0.0
            for mask in range(1 << len(others)):
                s = frozenset(
                    others[b] for b in range(len(others)) if mask >> b & 1
                )
                w = fact(len(s)) * fact(n_feat - len(s) - 1) / fact(n_feat)
                val += w * (v(xs[i], s | {k}) - v(xs[i], s))
            np.testing.assert_allclose(phi[i, k], val, rtol=1e-9, atol=1e-10)


# Hand-built XGBoost JSON dumps (the exact shape of
# booster.get_dump(dump_format="json", with_stats=True)): non-uniform
# covers, a missing-goes-right node, and an asymmetric tree — enough to
# catch any semantic slip (strict `<`, missing routing, cover weighting).
_XGB_DUMPS = [
    json.dumps({
        "nodeid": 0, "split": "f0", "split_condition": 0.5,
        "yes": 1, "no": 2, "missing": 2, "cover": 100.0,
        "children": [
            {"nodeid": 1, "split": "f1", "split_condition": -0.2,
             "yes": 3, "no": 4, "missing": 3, "cover": 60.0,
             "children": [
                 {"nodeid": 3, "leaf": 0.7, "cover": 25.0},
                 {"nodeid": 4, "leaf": -0.3, "cover": 35.0},
             ]},
            {"nodeid": 2, "leaf": 1.1, "cover": 40.0},
        ],
    }),
    json.dumps({
        "nodeid": 0, "split": "f2", "split_condition": 1.25,
        "yes": 1, "no": 2, "missing": 1, "cover": 100.0,
        "children": [
            {"nodeid": 1, "leaf": -0.45, "cover": 80.0},
            {"nodeid": 2, "split": "f0", "split_condition": 2.0,
             "yes": 3, "no": 4, "missing": 4, "cover": 20.0,
             "children": [
                 {"nodeid": 3, "leaf": 0.9, "cover": 8.0},
                 {"nodeid": 4, "leaf": 0.1, "cover": 12.0},
             ]},
        ],
    }),
]


def _xgb_margin(dumps, xv):
    """Reference margin prediction straight off the dumps (XGBoost
    semantics: strict x < cond goes to `yes`, NaN to `missing`)."""
    total = 0.0
    for d in dumps:
        nd = json.loads(d)
        while "leaf" not in nd:
            f = int(nd["split"][1:])
            if np.isnan(xv[f]):
                nxt = nd["missing"]
            else:
                nxt = nd["yes"] if xv[f] < nd["split_condition"] else nd["no"]
            nd = next(c for c in nd["children"] if c["nodeid"] == nxt)
        total += float(nd["leaf"])
    return total


def test_xgb_treeshap_matches_bruteforce_shapley():
    """Exactness of the XGBoost-dump adapter against first principles —
    same subset-enumeration game as the HistGB test but with XGBoost split
    semantics (strict `<`, explicit missing branch, cover weights). Runs
    without xgboost installed: the dumps are the testable boundary."""
    import math

    from elliptic_gnn_tpu.analysis.treeshap import xgb_json_shap_values

    n_feat = 3
    base = -0.15

    def cond_exp(nd, xv, in_s):
        if "leaf" in nd:
            return float(nd["leaf"])
        f = int(nd["split"][1:])
        ch = {c["nodeid"]: c for c in nd["children"]}
        if in_s[f]:
            if np.isnan(xv[f]):
                return cond_exp(ch[nd["missing"]], xv, in_s)
            nxt = nd["yes"] if xv[f] < nd["split_condition"] else nd["no"]
            return cond_exp(ch[nxt], xv, in_s)
        l, r = ch[nd["yes"]], ch[nd["no"]]
        cl, cr = float(l["cover"]), float(r["cover"])
        return (cl * cond_exp(l, xv, in_s)
                + cr * cond_exp(r, xv, in_s)) / (cl + cr)

    def v(xv, subset):
        in_s = [f in subset for f in range(n_feat)]
        return base + sum(
            cond_exp(json.loads(d), xv, in_s) for d in _XGB_DUMPS
        )

    # include the boundary value (x == threshold goes right under strict <)
    # and a NaN (routed by the missing branch)
    xs = np.array([
        [0.5, -0.2, 1.0],
        [-1.0, 0.3, 2.5],
        [2.0, -1.0, np.nan],
        [0.49, -0.21, 1.24],
    ])
    phi, ev = xgb_json_shap_values(_XGB_DUMPS, xs, base)
    fact = math.factorial
    for i in range(xs.shape[0]):
        # additivity in margin space
        np.testing.assert_allclose(
            phi[i].sum() + ev, base + _xgb_margin(_XGB_DUMPS, xs[i]),
            rtol=1e-12,
        )
        for k in range(n_feat):
            others = [f for f in range(n_feat) if f != k]
            val = 0.0
            for mask in range(1 << len(others)):
                s = frozenset(
                    others[b] for b in range(len(others)) if mask >> b & 1
                )
                w = fact(len(s)) * fact(n_feat - len(s) - 1) / fact(n_feat)
                val += w * (v(xs[i], s | {k}) - v(xs[i], s))
            np.testing.assert_allclose(phi[i, k], val, rtol=1e-9, atol=1e-12)


def test_xgb_treeshap_real_booster():
    """With xgboost installed (the reference's actual engine,
    /root/reference/src/analysis/explain.py:236-244): exact SHAP off the
    real booster satisfies additivity against predict(output_margin=True)
    for every sample."""
    xgboost = pytest.importorskip("xgboost")

    from elliptic_gnn_tpu.analysis.treeshap import xgb_shap_values

    rng = np.random.default_rng(7)
    x = rng.standard_normal((400, 6))
    x[rng.random(x.shape) < 0.05] = np.nan  # exercise missing routing
    y = (np.nan_to_num(x[:, 0]) - 0.6 * np.nan_to_num(x[:, 3]) > 0).astype(int)
    model = xgboost.XGBClassifier(
        n_estimators=10, max_depth=4, learning_rate=0.3, base_score=0.4,
    ).fit(x, y)
    xs = x[:32]
    phi, ev = xgb_shap_values(model, xs)
    margin = model.predict(xs, output_margin=True)
    np.testing.assert_allclose(phi.sum(axis=1) + ev, margin, rtol=1e-5)
