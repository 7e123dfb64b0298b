"""Multi-controller (multi-host) support: DCN-spanning meshes, host-0 IO.

The reference is single-process (SURVEY.md §2.3: no torch.distributed /
NCCL anywhere). The TPU framework scales past one host with JAX's
multi-controller model: one Python process per host, each seeing only its
local chips, coordinated through `jax.distributed`; `jit` + GSPMD then
compile collectives that ride ICI within a host's slice and DCN across
hosts (SURVEY.md §5 "Distributed communication backend").

Conventions (mirrors the plan in SURVEY.md §2.3):
  - every process loads the same processed graph npz (shared filesystem or
    per-host copy) and runs the training loop in lockstep — epoch results
    are replicated to all hosts, so early-stopping decisions agree without
    any explicit control-channel;
  - artifact IO (run dir, metrics.json, npy dumps, checkpoints, logs) is
    host-0-only (`is_primary()`);
  - `jax.devices()` orders devices process-major, so a 1-D `nodes` mesh
    gives each host a contiguous block of node rows: neighbor/halo traffic
    between chunks of the banded BSDA encoding stays on ICI, and only
    block-boundary exchange crosses DCN.

Activation: set EGNN_COORDINATOR / EGNN_NUM_PROCESSES / EGNN_PROCESS_ID
(or the corresponding config keys `coordinator_address`, `num_processes`,
`process_id`) and run one process per host. On CPU (tests, dry runs) the
gloo collectives backend is selected automatically, which is how
tests/test_multihost.py runs a REAL 2-process mesh without TPU hardware.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def maybe_initialize(cfg: Optional[dict] = None) -> bool:
    """Initialize jax.distributed from config keys or EGNN_* env vars.

    Returns True when running multi-process (after initialization), False
    for the ordinary single-process setup. Idempotent.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    cfg = cfg or {}
    coord = cfg.get("coordinator_address") or os.environ.get("EGNN_COORDINATOR")
    if not coord:
        return False
    nproc = int(
        cfg.get("num_processes") or os.environ.get("EGNN_NUM_PROCESSES", "1")
    )
    pid = int(cfg.get("process_id") or os.environ.get("EGNN_PROCESS_ID", "0"))
    if nproc <= 1:
        return False
    # CPU backend: cross-process collectives need the gloo implementation
    # (TPU backends use the ICI/DCN fabric natively). Check both the env var
    # and the jax config — some environments can only retarget the platform
    # via jax.config.update (see tests/conftest.py).
    platforms = os.environ.get("JAX_PLATFORMS", "") or str(
        getattr(jax.config, "jax_platforms", None) or ""
    )
    if platforms.startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    _initialized = True
    return True


def is_primary() -> bool:
    """True on the host that owns artifact IO (host 0)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


_replicator = None


def replicate_to_all_hosts(tree):
    """Make a (possibly sharded) pytree fully replicated so every host can
    read it with np.asarray — the per-epoch fused (val-probs, loss) vector
    goes through this so all hosts take identical early-stop decisions."""
    if jax.process_count() == 1:
        return tree
    global _replicator
    if _replicator is None:  # build once: a fresh lambda would retrace/epoch
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        import numpy as np

        mesh = Mesh(np.asarray(jax.devices()), ("_rep",))
        _replicator = jax.jit(
            lambda t: t, out_shardings=NamedSharding(mesh, P())
        )
    return _replicator(tree)


def barrier(name: str = "egnn") -> None:
    """Cross-host synchronization point (e.g. before host 0 declares a run
    complete while others may still be writing profiles)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
