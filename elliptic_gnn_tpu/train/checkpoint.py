"""Checkpointing: params/state snapshots + full mid-training resume.

Two artifact kinds:
  - `best.ckpt` — flat-npz snapshot of (params, bn state), the analogue of
    the reference's torch state_dict (train_gnn.py:522), loaded by every
    analysis tool. Language-neutral npz, keys are '/'-joined pytree paths.
  - `resume.ckpt` — params + optimizer state + epoch + best-val, enabling
    the mid-training resume the reference lacks (SURVEY.md §5: "No
    mid-training resume ... TPU build: checkpoint params+opt-state+epoch").
"""
from __future__ import annotations

import io
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree, extra_scalars: Dict[str, Any] | None = None) -> None:
    flat = _flatten(tree)
    if extra_scalars:
        for k, v in extra_scalars.items():
            flat[f"__scalar__/{k}"] = np.asarray(v)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_into_pytree(path: str, template) -> Tuple[Any, Dict[str, Any]]:
    """Restore arrays into `template`'s structure (from a fresh model.init).

    Returns (tree, extra_scalars)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    scalars = {}
    for k in list(flat):
        if k.startswith("__scalar__/"):
            scalars[k[len("__scalar__/"):]] = flat.pop(k)

    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
        if key not in flat:
            raise KeyError(f"checkpoint {path!r} missing key {key}")
        arr = flat[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.asarray(leaf).shape}"
            )
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), scalars


def save_best(outdir: str, params, state) -> None:
    save_pytree(os.path.join(outdir, "best.ckpt"), {"params": params, "state": state})


def load_best(outdir: str, params_template, state_template):
    tree, _ = load_into_pytree(
        os.path.join(outdir, "best.ckpt"),
        {"params": params_template, "state": state_template},
    )
    return tree["params"], tree["state"]


def save_resume(outdir: str, params, state, opt_state, epoch: int, best_val: float,
                bad_epochs: int, best_params=None, best_state=None) -> None:
    """Persist current + best model so a resumed run whose post-resume epochs
    never beat the stored best_val still finalizes the true best model
    (without these, best.ckpt/metrics.json would silently disagree)."""
    tree = {"params": params, "state": state, "opt_state": opt_state}
    if best_params is not None:
        tree["best_params"] = best_params
        tree["best_state"] = best_state
    save_pytree(
        os.path.join(outdir, "resume.ckpt"), tree,
        extra_scalars={"epoch": epoch, "best_val": best_val, "bad": bad_epochs},
    )


def load_resume(outdir: str, params_t, state_t, opt_state_t):
    """Returns (params, state, opt_state, epoch, best_val, bad,
    best_params, best_state). Checkpoints written before best-model
    tracking restore with best=current and best_val reset to -1 so the
    best is re-established rather than silently mismatched."""
    path = os.path.join(outdir, "resume.ckpt")
    template = {"params": params_t, "state": state_t, "opt_state": opt_state_t,
                "best_params": params_t, "best_state": state_t}
    try:
        tree, scal = load_into_pytree(path, template)
        best_params, best_state = tree["best_params"], tree["best_state"]
        best_val = float(scal["best_val"])
    except KeyError:
        tree, scal = load_into_pytree(
            path, {"params": params_t, "state": state_t, "opt_state": opt_state_t}
        )
        best_params, best_state = tree["params"], tree["state"]
        best_val = -1.0
    return (
        tree["params"],
        tree["state"],
        tree["opt_state"],
        int(scal["epoch"]),
        best_val,
        int(scal["bad"]),
        best_params,
        best_state,
    )


def has_resume(outdir: str) -> bool:
    return os.path.exists(os.path.join(outdir, "resume.ckpt"))
