"""Common utilities: seeding, filesystem helpers, device info.

TPU-native counterpart of the reference's src/utils/common.py
(/root/reference/src/utils/common.py:11-44). Instead of torch/cuDNN seeding we
seed numpy + a jax PRNG key chain; instead of `gpu_available` we report the
JAX backend and device inventory.
"""
from __future__ import annotations

import json
import os
import random
from typing import Any

import numpy as np


def set_seed(seed: int = 42) -> None:
    """Seed host-side RNGs. Device randomness uses explicit jax PRNG keys."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def _to_jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    return obj


def save_json(path: str, obj: Any) -> None:
    ensure_dir(os.path.dirname(path) or ".")
    with open(path, "w") as f:
        json.dump(_to_jsonable(obj), f, indent=2)


def load_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def tpu_available() -> bool:
    import jax

    try:
        return any(d.platform not in ("cpu",) for d in jax.devices())
    except Exception:
        return False


def log_device_info() -> None:
    import jax

    devs = jax.devices()
    print(f"[DEV] backend={jax.default_backend()} n_devices={len(devs)}")
    for d in devs:
        print(f"[DEV]   {d}")
