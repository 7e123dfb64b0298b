"""Golden tests: our pure-numpy metrics must match sklearn exactly,
including tied scores and degenerate inputs (reference metric semantics,
/root/reference/src/utils/metrics.py:11-66)."""
import numpy as np
import pytest
from sklearn.metrics import (
    average_precision_score,
    f1_score,
    precision_recall_curve as sk_prc,
    roc_auc_score,
)

from elliptic_gnn_tpu.utils import metrics as M


def _cases():
    rng = np.random.default_rng(0)
    cases = []
    for n in (8, 100, 2000):
        y = (rng.random(n) < 0.1).astype(int)
        if y.sum() == 0:
            y[0] = 1
        s = rng.random(n)
        cases.append((y, s))
    # heavy ties
    y = (rng.random(500) < 0.2).astype(int)
    s = rng.integers(0, 5, 500).astype(float) / 4.0
    cases.append((y, s))
    # all scores equal
    y = np.array([0, 1, 0, 1, 1, 0])
    s = np.full(6, 0.5)
    cases.append((y, s))
    # reference's toy case (tests/test_masks_and_metrics.py:21-28)
    y = np.array([0, 0, 1, 0, 1, 1, 0, 1])
    s = np.array([0.1, 0.2, 0.9, 0.3, 0.8, 0.7, 0.4, 0.6])
    cases.append((y, s))
    return cases


@pytest.mark.parametrize("y,s", _cases())
def test_pr_auc_matches_sklearn(y, s):
    assert M.pr_auc_illicit(y, s) == pytest.approx(
        average_precision_score(y, s), abs=1e-12
    )


@pytest.mark.parametrize("y,s", _cases())
def test_roc_auc_matches_sklearn(y, s):
    assert M.roc_auc_illicit(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-12)


@pytest.mark.parametrize("y,s", _cases())
def test_pr_curve_matches_sklearn(y, s):
    p, r, t = M.precision_recall_curve(y, s)
    sp, sr, st = sk_prc(y, s)
    np.testing.assert_allclose(p, sp, atol=1e-12)
    np.testing.assert_allclose(r, sr, atol=1e-12)
    np.testing.assert_allclose(t, st, atol=1e-12)


@pytest.mark.parametrize("y,s", _cases())
def test_f1_and_thresholds(y, s):
    thr, f1 = M.pick_threshold_max_f1(y, s)
    assert 0.0 <= thr <= 1.0 + 1e-9
    pred = (s >= thr).astype(int)
    assert M.f1_at_threshold(y, s, thr) == pytest.approx(
        f1_score(y, pred, zero_division=0), abs=1e-12
    )
    # threshold-for-precision falls in valid range and meets target or
    # falls back to max-F1
    thr_p = M.pick_threshold_for_precision(y, s, 0.8)
    assert np.isfinite(thr_p)


def test_precision_at_k_and_recall_at_precision():
    y = np.array([0, 0, 1, 0, 1, 1, 0, 1])
    s = np.array([0.1, 0.2, 0.9, 0.3, 0.8, 0.7, 0.4, 0.6])
    assert M.precision_at_k(y, s, 4) == 1.0
    assert M.precision_at_k(y, s, 8) == 0.5
    assert M.recall_at_precision(y, s, 1.0) == 1.0  # top-4 are all positive
    assert M.recall_at_precision(y, s, 2.0) == 0.0  # unattainable -> 0


def test_ece_range_and_perfect_calibration():
    rng = np.random.default_rng(1)
    p = rng.random(20000)
    y = (rng.random(20000) < p).astype(int)
    e = M.expected_calibration_error(y, p)
    assert 0.0 <= e < 0.03  # near-perfect calibration
    y_bad = 1 - y
    assert M.expected_calibration_error(y_bad, p) > e


def test_per_timestep_and_tails():
    y = np.array([1, 0, 1, 0, 1, 0])
    s = np.array([0.9, 0.1, 0.8, 0.3, 0.2, 0.7])
    ts = np.array([1, 1, 2, 2, 3, 3])
    uniq, vals = M.per_timestep_pr_auc(y, s, ts)
    assert uniq == [1, 2, 3]
    assert len(vals) == 3
    tails = M.tail_means(vals)
    assert tails["pr_auc_last1"] == pytest.approx(vals[-1])
    assert tails["pr_auc_last3"] == pytest.approx(sum(vals) / 3)
    assert "pr_auc_last5" not in tails
