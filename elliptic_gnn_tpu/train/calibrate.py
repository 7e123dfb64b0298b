"""Probability calibration: temperature scaling (jax), isotonic, Platt.

The reference fits a single temperature with torch LBFGS on validation NLL
(/root/reference/src/utils/calibrate.py:8-30). Temperature fitting is a 1-D
convex problem, so here it is a guarded Newton iteration on log T — fully
deterministic, jit-compiled, no optimizer loop on the host. Isotonic/Platt
calibrators (used by the baseline path, train_baselines.py:52-62) wrap
sklearn when available.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nll(log_t, logits, labels):
    z = logits / jnp.exp(log_t)
    logp = jax.nn.log_softmax(z, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return -ll.mean()


@jax.jit
def _fit_log_t(logits, labels):
    g = jax.grad(_nll)
    h = jax.grad(lambda lt, lo, la: g(lt, lo, la))

    def step(lt, _):
        grad = g(lt, logits, labels)
        hess = h(lt, logits, labels)
        delta = jnp.where(jnp.abs(hess) > 1e-12, grad / hess, 0.0)
        delta = jnp.clip(delta, -1.0, 1.0)  # guard Newton step
        return lt - delta, None

    lt, _ = jax.lax.scan(step, jnp.zeros(()), None, length=50)
    return lt


def fit_temperature(logits_val: np.ndarray, labels_val: np.ndarray) -> float:
    """Return T minimizing validation NLL of softmax(logits / T)."""
    logits = jnp.asarray(logits_val, dtype=jnp.float32)
    labels = jnp.asarray(labels_val, dtype=jnp.int32)
    log_t = _fit_log_t(logits, labels)
    return float(np.exp(np.asarray(log_t)))


def apply_temperature(logits: np.ndarray, t: float) -> np.ndarray:
    return np.asarray(logits) / float(t)


def calibrate_isotonic(y_score_val, y_true_val):
    from sklearn.isotonic import IsotonicRegression

    ir = IsotonicRegression(out_of_bounds="clip")
    ir.fit(np.asarray(y_score_val), np.asarray(y_true_val))
    return ir


def calibrate_platt(y_score_val, y_true_val):
    from sklearn.linear_model import LogisticRegression

    lr = LogisticRegression(solver="lbfgs", max_iter=1000)
    lr.fit(np.asarray(y_score_val).reshape(-1, 1), np.asarray(y_true_val))
    return lr


def apply_sklearn_calibrator(cal, y_score: np.ndarray) -> np.ndarray:
    if hasattr(cal, "predict_proba"):
        return cal.predict_proba(np.asarray(y_score).reshape(-1, 1))[:, 1]
    return cal.transform(np.asarray(y_score))
