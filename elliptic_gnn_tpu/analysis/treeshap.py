"""Exact TreeSHAP for sklearn HistGradientBoosting models.

The reference's explain tool runs shap.TreeExplainer over its XGBoost
baseline (/root/reference/src/analysis/explain.py:236-244). Neither the
`shap` package nor `xgboost` exist in this environment, so this module
implements the exact TreeSHAP algorithm (Lundberg et al. 2018, "Consistent
Individualized Feature Attribution for Tree Ensembles", Algorithm 2) from
scratch over the trees of the sklearn HistGradientBoostingClassifier that
train_baselines.py uses as its gradient-boosting engine.

Properties (verified in tests/test_analysis.py):
  - local accuracy / additivity: sum(phi) + expected_value equals the
    model's raw decision value for every sample, to float precision;
  - exact conditional-expectation semantics per tree (not a sampling or
    permutation approximation).

Attributions are in raw log-odds space, matching shap.TreeExplainer's
default for binary classifiers.
"""
from __future__ import annotations

import numpy as np


class _Path:
    """Decision-path state for TreeSHAP: parallel arrays of feature index,
    zero fraction, one fraction, and Shapley path weight."""

    __slots__ = ("d", "z", "o", "w", "n")

    def __init__(self, cap: int):
        self.d = np.empty(cap, np.int64)
        self.z = np.empty(cap, np.float64)
        self.o = np.empty(cap, np.float64)
        self.w = np.empty(cap, np.float64)
        self.n = 0

    def copy(self) -> "_Path":
        p = _Path(self.d.shape[0])
        n = self.n
        p.d[:n] = self.d[:n]
        p.z[:n] = self.z[:n]
        p.o[:n] = self.o[:n]
        p.w[:n] = self.w[:n]
        p.n = n
        return p


def _extend(m: _Path, pz: float, po: float, pi: int) -> None:
    l = m.n
    m.d[l] = pi
    m.z[l] = pz
    m.o[l] = po
    m.w[l] = 1.0 if l == 0 else 0.0
    m.n = l + 1
    for i in range(l - 1, -1, -1):
        m.w[i + 1] += po * m.w[i] * (i + 1) / (l + 1)
        m.w[i] = pz * m.w[i] * (l - i) / (l + 1)


def _unwind(m: _Path, i: int) -> None:
    l = m.n - 1
    o_i, z_i = m.o[i], m.z[i]
    nxt = m.w[l]
    if o_i != 0.0:
        for j in range(l - 1, -1, -1):
            t = nxt * (l + 1) / ((j + 1) * o_i)
            nxt = m.w[j] - t * z_i * (l - j) / (l + 1)
            m.w[j] = t
    else:
        for j in range(l - 1, -1, -1):
            m.w[j] = m.w[j] * (l + 1) / (z_i * (l - j))
    for j in range(i, l):
        m.d[j] = m.d[j + 1]
        m.z[j] = m.z[j + 1]
        m.o[j] = m.o[j + 1]
    m.n = l


def _unwound_sum(m: _Path, i: int) -> float:
    """Sum of path weights after hypothetically unwinding element i."""
    l = m.n - 1
    o_i, z_i = m.o[i], m.z[i]
    total = 0.0
    nxt = m.w[l]
    if o_i != 0.0:
        for j in range(l - 1, -1, -1):
            t = nxt * (l + 1) / ((j + 1) * o_i)
            total += t
            nxt = m.w[j] - t * z_i * (l - j) / (l + 1)
    else:
        for j in range(l - 1, -1, -1):
            total += m.w[j] * (l + 1) / (z_i * (l - j))
    return total


def _tree_shap(nodes: np.ndarray, x: np.ndarray, phi: np.ndarray) -> None:
    """Accumulate exact SHAP values of one HistGB tree for sample x."""
    max_depth = int(nodes["depth"].max()) + 2

    def recurse(j: int, m: _Path, pz: float, po: float, pi: int) -> None:
        m = m.copy()
        _extend(m, pz, po, pi)
        nd = nodes[j]
        if nd["is_leaf"]:
            v = float(nd["value"])
            for i in range(1, m.n):
                w = _unwound_sum(m, i)
                phi[m.d[i]] += w * (m.o[i] - m.z[i]) * v
            return
        f = int(nd["feature_idx"])
        xv = x[f]
        if np.isnan(xv):
            goes_left = bool(nd["missing_go_to_left"])
        else:
            goes_left = xv <= nd["num_threshold"]
        hot, cold = (
            (int(nd["left"]), int(nd["right"]))
            if goes_left
            else (int(nd["right"]), int(nd["left"]))
        )
        iz = io = 1.0
        k = -1
        for i in range(1, m.n):
            if m.d[i] == f:
                k = i
                break
        if k >= 0:
            iz, io = float(m.z[k]), float(m.o[k])
            _unwind(m, k)
        r_j = float(nodes[j]["count"])
        recurse(hot, m, iz * nodes[hot]["count"] / r_j, io, f)
        recurse(cold, m, iz * nodes[cold]["count"] / r_j, 0.0, f)

    recurse(0, _Path(max_depth + 2), 1.0, 1.0, -1)


def hist_gb_shap_values(model, X: np.ndarray):
    """Exact TreeSHAP values for a fitted HistGradientBoostingClassifier.

    Returns (phi [n, F] float64 in raw log-odds space, expected_value
    float). Additivity: phi.sum(1) + expected_value == decision_function(X).
    """
    predictors = model._predictors
    if any(
        p.nodes["is_categorical"].any() for row in predictors for p in row
    ):
        raise ValueError("categorical splits unsupported")
    if len(predictors[0]) != 1:
        raise ValueError("binary classification expected (1 tree per iter)")
    X = np.asarray(X, np.float64)
    n, f = X.shape
    phi = np.zeros((n, f), np.float64)
    expected = float(np.ravel(model._baseline_prediction)[0])
    for row in predictors:
        nodes = row[0].nodes
        # E[f] = baseline + each tree's coverage-weighted leaf mean
        leaf = nodes["is_leaf"].astype(bool)
        expected += float(
            (nodes["value"][leaf] * nodes["count"][leaf]).sum()
            / nodes["count"][0]
        )
        for i in range(n):
            _tree_shap(nodes, X[i], phi[i])
    return phi, expected
