"""elliptic_gnn_tpu — a TPU-native GNN framework for temporal fraud detection.

A from-scratch JAX / XLA / Pallas re-architecture with the capabilities of the
reference `Adredes-weslee/elliptic-gnn-project` (PyTorch + PyG, see
/root/reference): Elliptic Bitcoin graph ingest with leakage-safe temporal
splits, GCN / GraphSAGE / GAT / SAGE-ResBN model families, full-batch and
windowed-temporal training, calibration, a standardized run-artifact contract,
post-hoc analysis tools, sweeps and a dashboard.

Layer map (SURVEY.md §7.1):
    kernels/   Pallas + XLA sparse aggregation primitives (SpMM, SDDMM,
               segment-softmax) over TPU-friendly ELL/CSR graph encodings
    graph/     CSV ingest, graph build, temporal masks, partitioning
    models/    functional pytree models (GCN, SAGE, GAT, SAGEResBN) + losses
    train/     jitted training engines, calibration, checkpointing
    parallel/  mesh/sharding utilities, multi-chip sharded training step
    utils/     metrics (numpy, sklearn-compatible), logging, config
    analysis/  post-hoc evaluation tools (drift, calibration, robustness, ...)
    sweeps/    grid sweeps with leaderboards and resume
"""

__version__ = "0.1.0"

# Platform override that works even when a sitecustomize pre-imports jax
# and registers an accelerator plugin (env JAX_PLATFORMS is read before our
# process can set it; jax.config still honors updates until first backend
# use). Example: EGNN_PLATFORM=cpu for the 8-virtual-device CPU mesh.
import os as _os

if _os.environ.get("EGNN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["EGNN_PLATFORM"])
