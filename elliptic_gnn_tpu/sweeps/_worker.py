"""Process-pool worker for parallel sweeps (sweeps/sweep_gnn.py --workers N).

Kept deliberately tiny and import-light: under the "spawn" start method the
child unpickles ``init_worker``/``run_one`` by importing THIS module (which
pulls in the ``elliptic_gnn_tpu`` package, but nothing heavy — JAX's backend
stays uninitialized until first use). ``init_worker`` then pins the worker's
platform/device BEFORE ``run_one`` lazily imports the trainer and touches a
device.

Sweep-level data parallelism is the one parallelism axis the reference runs
strictly sequentially (/root/reference/src/sweeps/sweep_gnn.py:175-232); on
TPU it maps to "one config per chip" (SURVEY.md §2.3 DP row).
"""
from __future__ import annotations

import multiprocessing
import os
import time


def init_worker(env_fmt: dict) -> None:
    """Pool initializer: pin this worker's platform/device via env vars.

    Values may contain ``{slot}``, replaced with the worker's 0-based index
    (stable per process for the pool's lifetime) — e.g.
    ``TPU_VISIBLE_DEVICES={slot}`` pins one chip per worker on a multi-chip
    host, while the default ``EGNN_PLATFORM=cpu`` lets N workers share a
    single-chip host without fighting over the TPU.
    """
    ident = multiprocessing.current_process()._identity
    slot = (ident[0] - 1) if ident else 0
    for k, v in env_fmt.items():
        os.environ[k] = str(v).format(slot=slot)
    # The package's EGNN_PLATFORM hook already ran (this module's unpickling
    # imported elliptic_gnn_tpu before the initializer was called), so apply
    # the platform to jax.config directly — legal while the backend is still
    # uninitialized, which it is in a fresh spawn.
    if os.environ.get("EGNN_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["EGNN_PLATFORM"])


def run_one(cfg: dict):
    """Train one combo in this worker; returns (error_or_None, dt_seconds).

    Metrics land on disk via the trainer's normal artifact contract, so the
    parent re-reads them with the same ``read_metrics`` path the sequential
    sweep uses — results are byte-equivalent apart from wall-clock columns.
    """
    t0 = time.time()
    try:
        from ..train.train_gnn import main as train_main

        train_main(cfg)
        err = None
    except Exception as e:  # keep sweeping past failed combos
        err = f"{type(e).__name__}: {e}"
    return err, round(time.time() - t0, 2)
