"""Shared analysis helpers: run-dir loading and the model-reload pattern.

Every post-hoc tool follows the reference's de-facto inference API
(SURVEY.md §3.5): read `config_used.yaml` from the run dir, reproduce the
data prep (window / scalar-time / symmetrize), rebuild the model, load
`best.ckpt`, evaluate, write artifacts back into the run dir.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import yaml

from ..utils.common import load_json


def load_run_config(run_dir: str) -> dict:
    with open(os.path.join(run_dir, "config_used.yaml")) as f:
        return yaml.safe_load(f)


def load_run_metrics(run_dir: str) -> dict:
    return load_json(os.path.join(run_dir, "metrics.json"))


def load_run_arrays(run_dir: str, split: str = "test") -> Dict[str, np.ndarray]:
    """Load the npy artifact set for a split: scores, y, node_idx, timestep."""
    out = {}
    for name in ("scores", "y", "node_idx", "timestep"):
        path = os.path.join(run_dir, f"{name}_{split}.npy")
        out[name] = np.load(path)
    return out


def rebuild_model_and_data(run_dir: str, edge_index_override: Optional[np.ndarray] = None,
                           processed_dir: Optional[str] = None) -> Tuple:
    """Reload pattern: config -> prepared data -> model -> best.ckpt params.

    Returns (cfg, data, gops, model, params, state). Passing
    `edge_index_override` rebuilds the aggregation tables on a perturbed
    edge set (hub ablation / robustness) — a host-side re-pack instead of
    the reference's in-place edge_index slicing (hub_ablation.py:56-71).
    """
    import jax

    from ..models import MODEL_GRAPH_KIND, build_model, prepare_graph_ops
    from ..train import checkpoint
    from ..train.train_gnn import prepare_data

    cfg = load_run_config(run_dir)
    if processed_dir:
        cfg = dict(cfg, processed_dir=processed_dir)
    data = prepare_data(cfg)

    ei = data.edge_index if edge_index_override is None else edge_index_override
    gops = prepare_graph_ops(ei, data.num_nodes, MODEL_GRAPH_KIND[cfg["arch"]])

    model = build_model(cfg["arch"], data.num_features, cfg)
    p0, s0 = model.init(jax.random.key(0))
    params, state = checkpoint.load_best(run_dir, p0, s0)
    return cfg, data, gops, model, params, state


def model_probs(cfg, data, gops, model, params, state,
                temperature: Optional[float] = None) -> np.ndarray:
    """Full-graph calibrated P(illicit), reproducing the trainer's
    `get_probs` (train_gnn.py:431-445)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(data.x)
    t = jnp.asarray(data.timestep.astype(np.int32)) if model.uses_time_embed else None
    logits, _ = jax.jit(
        lambda p, s: model.apply(p, s, x, gops, t, training=False)
    )(params, state)
    lg = np.asarray(logits)
    if temperature is not None and temperature > 0:
        lg = lg / float(temperature)
    z = lg - lg.max(axis=1, keepdims=True)
    e = np.exp(z)
    return (e / e.sum(axis=1, keepdims=True))[:, 1]
