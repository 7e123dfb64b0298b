"""Edge-list segment primitives (XLA reference implementations).

These are the correctness oracles for the framework's three sparse
primitives — gather/scatter SpMM, SDDMM and segment-softmax — which in the
reference live inside PyG's compiled torch_scatter/pyg_lib kernels
(reference models/gnn.py:8 via GCNConv/SAGEConv/GATConv). The optimized
TPU paths (kernels/ell.py, kernels/bsda.py, kernels/pallas_bsda.py) are
tested against these.

Convention: messages flow src -> dst; `dst` are the segment ids.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, indices_are_sorted=False):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(data, segment_ids, num_segments: int, indices_are_sorted=False):
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    cnt = segment_sum(
        jnp.ones(data.shape[:1], dtype=data.dtype),
        segment_ids,
        num_segments,
        indices_are_sorted,
    )
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data, segment_ids, num_segments: int, indices_are_sorted=False):
    return jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_softmax(scores, segment_ids, num_segments: int):
    """Numerically-stable softmax over segments (per-destination attention
    normalization, the role of PyG's `softmax(alpha, index)` inside GATConv).

    scores: [E, ...] with segment dim leading.
    """
    seg_max = segment_max(scores, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    denom = segment_sum(ex, segment_ids, num_segments)
    return ex / jnp.maximum(denom[segment_ids], 1e-16)


def spmm_edge_list(
    x,
    src,
    dst,
    num_nodes: int,
    weights: Optional[jnp.ndarray] = None,
    mean: bool = False,
):
    """out[d] = sum/mean over incoming edges (s -> d) of w_e * x[s].

    The edge-parallel formulation of SpMM: dense gather along src, then a
    segment reduction keyed by dst.
    """
    msg = x[src]
    if weights is not None:
        msg = msg * weights[:, None]
    if mean:
        return segment_mean(msg, dst, num_nodes)
    return segment_sum(msg, dst, num_nodes)
