"""ELL degree-bucketed graph encoding — the TPU-native sparse format.

Why not CSR scatter/gather like the reference's CUDA path? TPUs want static
shapes and dense, tileable memory access; XLA scatter-add serializes. The
design here re-expresses neighborhood aggregation as a handful of dense
gathers + masked row reductions:

  1. Sort edges by destination (CSR).
  2. Group destination rows into degree buckets of power-of-two widths; pad
     each row's neighbor list to the bucket width (padding weight 0).
  3. Aggregation per bucket b: out_b = reduce_w( w_b[:, :, None] * x[nbr_b] )
     — a dense gather + a weighted row-sum; no scatter anywhere.
  4. Rows across buckets are a permutation of the node set; the final result
     is re-ordered with a single *gather* by the precomputed inverse
     permutation (never a scatter).

This also turns GAT's per-destination segment softmax into a *masked row
softmax* over the bucket width — each destination's incoming edges occupy
exactly one row — eliminating segment ops from the attention path entirely.

Replaces the role of torch_scatter / pyg_lib segment kernels and
torch_sparse's COO/CSR bookkeeping in the reference (SURVEY.md §2.2).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(v: int) -> int:
    return 1 if v <= 1 else 1 << (int(v) - 1).bit_length()


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nbrs", "weights", "rows", "inv_perm", "row_scale"],
    meta_fields=["num_nodes", "widths", "n_zero_deg"],
)
@dataclasses.dataclass
class EllGraph:
    """Degree-bucketed adjacency, jit-traceable (arrays are pytree leaves).

    nbrs:      tuple of [R_b, W_b] int32 — source ids per destination row
    weights:   tuple of [R_b, W_b] float32 — edge weights; 0 marks padding
    rows:      tuple of [R_b] int32 — destination node id of each row
    inv_perm:  [N] int32 — node id -> position in the concatenated row order;
               None means identity (graph renumbered via renumber_for_ell),
               letting the aggregation skip its final reorder gather
    row_scale: tuple of [R_b] float32 — per-row post-scale (1/deg for mean)
    num_nodes: int (static)
    widths:    tuple of int (static) bucket widths
    n_zero_deg: int (static) number of zero-degree nodes (appended as zeros)
    """

    nbrs: Tuple[jnp.ndarray, ...]
    weights: Tuple[jnp.ndarray, ...]
    rows: Tuple[jnp.ndarray, ...]
    inv_perm: jnp.ndarray
    row_scale: Tuple[jnp.ndarray, ...]
    num_nodes: int
    widths: Tuple[int, ...]
    n_zero_deg: int

    @property
    def num_edges(self) -> int:
        return int(sum(int((np.asarray(w) > 0).sum()) for w in self.weights))

    @property
    def padded_slots(self) -> int:
        return int(sum(n.shape[0] * n.shape[1] for n in self.nbrs))


def build_csr(src: np.ndarray, dst: np.ndarray, num_nodes: int):
    """Sort edges by destination. Returns (indptr [N+1], col [E], order [E])
    where `order` maps CSR position -> original edge id. Uses the native
    counting-sort (native/egnn_native.cpp) when built."""
    try:
        from ..native import build_csr as native_csr, is_available

        if is_available():
            indptr, col, order = native_csr(src, dst, num_nodes)
            return indptr, col.astype(np.int32), order
    except ImportError:
        pass
    order = np.argsort(dst, kind="stable")
    col = src[order].astype(np.int32)
    counts = np.bincount(dst, minlength=num_nodes)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, col, order


def build_ell_graph(
    edge_index: np.ndarray,
    num_nodes: int,
    edge_weights: Optional[np.ndarray] = None,
    mean: bool = False,
    max_width: int = 1 << 14,
    min_width: int = 1,
) -> EllGraph:
    """Host-side one-time pack of a directed edge list into EllGraph.

    edge_weights: per-edge weights in edge_index order (e.g. GCN sym-norm);
                  default 1.0.
    mean:         if True, row_scale = 1/deg (masked mean aggregation).
    min_width:    floor bucket width (fewer kernels, more padding).
    """
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    e = src.size
    if edge_weights is None:
        w_all = np.ones(e, dtype=np.float32)
    else:
        w_all = np.asarray(edge_weights, dtype=np.float32)

    indptr, col, order = build_csr(src, dst, num_nodes)
    w_csr = w_all[order]
    deg = np.diff(indptr)

    widths_per_node = np.zeros_like(deg)
    nz = deg > 0
    widths_per_node[nz] = 1 << np.ceil(
        np.log2(np.maximum(deg[nz], 1))
    ).astype(np.int64)
    if min_width > 1:
        widths_per_node[nz] = np.maximum(widths_per_node[nz], min_width)
    uniq_widths = sorted(set(int(w) for w in widths_per_node if w > 0))
    for w in uniq_widths:
        if w > max_width:
            raise ValueError(f"node degree bucket {w} exceeds max_width={max_width}")

    nbrs, weights, rows_list, row_scales = [], [], [], []
    perm_parts = []
    for w in uniq_widths:
        rows = np.where(widths_per_node == w)[0]
        rb = rows.size
        nbr = np.zeros((rb, w), dtype=np.int32)
        wgt = np.zeros((rb, w), dtype=np.float32)
        # vectorized fill: flatten every CSR segment of this bucket and
        # compute each edge's (row, slot) target position directly
        d_rows = deg[rows]
        total = int(d_rows.sum())
        if total:
            seg_starts = np.repeat(indptr[rows], d_rows)
            within = np.arange(total) - np.repeat(
                np.cumsum(np.r_[0, d_rows[:-1]]), d_rows
            )
            src_pos = seg_starts + within
            row_pos = np.repeat(np.arange(rb), d_rows)
            nbr[row_pos, within] = col[src_pos]
            wgt[row_pos, within] = w_csr[src_pos]
        scale = (
            (1.0 / np.maximum(deg[rows], 1)).astype(np.float32)
            if mean
            else np.ones(rb, dtype=np.float32)
        )
        nbrs.append(jnp.asarray(nbr))
        weights.append(jnp.asarray(wgt))
        rows_list.append(jnp.asarray(rows.astype(np.int32)))
        row_scales.append(jnp.asarray(scale))
        perm_parts.append(rows)

    zero_rows = np.where(deg == 0)[0]
    perm_parts.append(zero_rows)
    perm = np.concatenate(perm_parts) if perm_parts else np.arange(num_nodes)
    inv_perm = np.empty(num_nodes, dtype=np.int32)
    inv_perm[perm] = np.arange(num_nodes, dtype=np.int32)

    return EllGraph(
        nbrs=tuple(nbrs),
        weights=tuple(weights),
        rows=tuple(rows_list),
        inv_perm=jnp.asarray(inv_perm),
        row_scale=tuple(row_scales),
        num_nodes=int(num_nodes),
        widths=tuple(uniq_widths),
        n_zero_deg=int(zero_rows.size),
    )


def ell_spmm(g: EllGraph, x: jnp.ndarray,
             compute_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """out[d] = row_scale[d] * sum_e w_e * x[src_e] for incoming edges of d.

    Covers SAGE mean aggregation (mean=True at build) and GCN normalized
    aggregation (edge_weights = sym-norm at build). Pure dense gathers +
    row reductions; the output permutation is resolved with one gather —
    or skipped entirely on a renumbered graph (inv_perm None).

    compute_dtype: optional lower-precision dtype (bf16) for the gathered
    operand; the reduction accumulates in f32 (the TPU analogue of the
    reference's AMP, train_gnn.py:36-47). NOTE measured on v5e: the row
    gather is transaction-limited (~4.4 ns/row regardless of row bytes),
    so bf16 saves no gather time and the conversion costs ~12% (2.19 ms
    f32 / 2.46 ms bf16 / 2.64 ms post-gather cast at Elliptic scale) —
    callers on the fallback path should prefer compute_dtype=None; the
    argument is honored for numerics parity with the BSDA amp path.
    """
    out_dtype = x.dtype
    xg = x.astype(compute_dtype) if compute_dtype is not None else x
    feat = x.shape[-1]
    outs = []
    for nbr, w, scale in zip(g.nbrs, g.weights, g.row_scale):
        gathered = xg[nbr]  # [R, W, F]
        agg = jnp.einsum(
            "rw,rwf->rf", w.astype(gathered.dtype), gathered,
            preferred_element_type=jnp.float32,
        )
        outs.append((agg * scale[:, None]).astype(out_dtype))
    if g.n_zero_deg:
        outs.append(jnp.zeros((g.n_zero_deg, feat), dtype=out_dtype))
    permuted = jnp.concatenate(outs, axis=0) if outs else jnp.zeros_like(x)
    if g.inv_perm is None:
        return permuted
    return permuted[g.inv_perm]


def ell_gat_aggregate(
    g: EllGraph,
    x_proj: jnp.ndarray,
    alpha_src: jnp.ndarray,
    alpha_dst: jnp.ndarray,
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Fused SDDMM + segment-softmax + weighted SpMM for GAT attention.

    x_proj:    [N, H, C] per-head projected features
    alpha_src: [N, H] source attention logits  (a_src . W x)
    alpha_dst: [N, H] destination attention logits
    Returns [N, H, C]: per-destination softmax-weighted neighbor sum.

    Per bucket, each destination's incoming edges fill one padded row, so the
    per-destination softmax (PyG `softmax(alpha, index)`) is a masked softmax
    over the row width — no segment primitives needed.
    """
    n, h, c = x_proj.shape
    x_flat = x_proj.reshape(n, h * c)  # 2-D operand: XLA's fast row-gather case
    outs = []
    for nbr, w, rows in zip(g.nbrs, g.weights, g.rows):
        valid = w > 0  # [R, W]
        scores = alpha_src[nbr] + alpha_dst[rows][:, None, :]  # [R, W, H]
        scores = jax.nn.leaky_relu(scores, negative_slope)
        scores = jnp.where(valid[..., None], scores, -jnp.inf)
        smax = jnp.max(scores, axis=1, keepdims=True)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        ex = jnp.exp(scores - smax) * valid[..., None]
        denom = jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-16)
        att = ex / denom  # [R, W, H]
        gathered = x_flat[nbr].reshape(nbr.shape[0], nbr.shape[1], h, c)
        outs.append(jnp.einsum("rwh,rwhc->rhc", att, gathered))
    if g.n_zero_deg:
        outs.append(jnp.zeros((g.n_zero_deg, h, c), dtype=x_proj.dtype))
    permuted = jnp.concatenate(outs, axis=0)
    if g.inv_perm is None:
        return permuted
    return permuted[g.inv_perm]


def renumber_for_ell(g: EllGraph):
    """Relabel nodes so the concatenated bucket-row order IS the node order.

    Returns (g_renumbered, rank) where rank[old_id] = new_id. Aggregation on
    the renumbered graph needs no final reorder gather (inv_perm None) —
    on Elliptic-scale graphs that gather is ~30% of SpMM time. Apply `rank`
    to every per-node array (features, labels, masks, timesteps) and keep
    `argsort(rank)` to translate node indices back for artifacts.
    """
    if g.inv_perm is None:
        return g, np.arange(g.num_nodes, dtype=np.int32)
    rank = np.asarray(g.inv_perm).astype(np.int64)
    nbrs = tuple(jnp.asarray(rank[np.asarray(n)].astype(np.int32)) for n in g.nbrs)
    rows = tuple(jnp.asarray(rank[np.asarray(r)].astype(np.int32)) for r in g.rows)
    g2 = EllGraph(
        nbrs=nbrs,
        weights=g.weights,
        rows=rows,
        inv_perm=None,
        row_scale=g.row_scale,
        num_nodes=g.num_nodes,
        widths=g.widths,
        n_zero_deg=g.n_zero_deg,
    )
    return g2, rank.astype(np.int32)


def gcn_norm_weights(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Symmetric GCN normalization weights per edge, PyG gcn_norm convention:
    degrees counted from the destination column over edges incl. self-loops
    (caller must have appended self-loops first); w_e = d[src]^-1/2 d[dst]^-1/2.
    """
    dst = edge_index[1]
    deg = np.bincount(dst, minlength=num_nodes).astype(np.float64)
    dinv = np.zeros_like(deg)
    nz = deg > 0
    dinv[nz] = deg[nz] ** -0.5
    return (dinv[edge_index[0]] * dinv[dst]).astype(np.float32)
