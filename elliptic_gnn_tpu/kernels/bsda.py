"""BSDA — Block-Sparse Dense Aggregation, the MXU-native SpMM.

TPU gathers are slow (XLA's row gather runs at ~1/7 of HBM bandwidth) and
Mosaic's in-kernel dynamic_gather is limited to 8-sublane tiles, so instead
of gathering rows this encoding makes aggregation a *batched dense matmul*:

  1. Within each timestep block (all Elliptic edges are intra-timestep,
     dataset_elliptic.py:236-243), order nodes by BFS over the undirected
     subgraph — connected components become contiguous index ranges.
  2. Cut the node order into chunks of C=128 (the MXU tile size). Because
     the graph is sparse and tree-ish (mean degree ~2.3), most edges land
     inside a chunk or between a handful of chunk pairs.
  3. For each destination chunk keep its top-D source chunks as dense
     C x C weight blocks:   out[b] = sum_d  A[b,d] @ x[src_chunk[b,d]]
     — one `jnp.take` at 64 KB chunk granularity plus one einsum
     ('bdij,bdjf->bif'): all MXU work, no row gathers, no scatters.
  4. Edges outside the top-D chunk pairs spill to a small residual ELL
     (kernels/ell.py) whose output is added; weighted sums compose because
     mean normalization is folded into the per-edge weights.

The encoding works identically on CPU (tests) and TPU, shards over the
`nodes` axis (chunks split evenly), and differentiates through autodiff
(take -> chunk-granular scatter-add in the backward).

Replaces torch_scatter/pyg_lib CUDA segment kernels (reference
models/gnn.py:8) as the primary aggregation path.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ell import EllGraph, build_ell_graph, ell_spmm

CHUNK = 128


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "src_chunk", "residual", "residual_rows", "transpose",
                 "dst_scale", "src_scale", "a_packed", "slot_occ"],
    meta_fields=["num_nodes", "num_chunks", "depth", "n_pad", "a_dtype_name",
                 "chunk", "use_pallas_kernel", "max_chunk_dist", "a_pack"],
)
@dataclasses.dataclass
class BsdaGraph:
    """a: [B, D, C, C] dense weight blocks — a[b, d, i, j] is the weight of
    edge (src_chunk[b,d]*C + j) -> (b*C + i); zero blocks padded.
    src_chunk: [B, D] int32 source-chunk ids (self-pointing for padding).
    residual: EllGraph over *compacted* destination rows (spill edges beyond
    the top-D chunk pairs); residual_rows maps compact row -> node id, and
    the spill output is combined with one index-add (no O(N) reorder).
    """

    a: jnp.ndarray
    src_chunk: jnp.ndarray
    residual: Optional[EllGraph]
    residual_rows: Optional[jnp.ndarray]
    num_nodes: int
    num_chunks: int
    depth: int
    n_pad: int
    a_dtype_name: str
    chunk: int = CHUNK
    # route through the Pallas block-accumulate kernel (pallas_bsda.py)
    # instead of the XLA einsum — currently slower on the v5e (see
    # docs/PERF_NOTES.md) but kept selectable as the tuning target
    use_pallas_kernel: bool = False
    # optional A^T encoding: when present, bsda_spmm routes gradients
    # through a *forward* pass on the transpose (custom VJP) instead of
    # autodiff's chunk scatter-add — ~2x faster backward
    transpose: Optional["BsdaGraph"] = None
    # max |src_chunk - dst_chunk| over kept slots: BFS clustering keeps this
    # tiny (<= 2 at Elliptic scale), which the banded Pallas kernel
    # (pallas_bsda.py) exploits — source chunks come from a prev/cur/next
    # window of auto-pipelined blocks instead of gathers or per-chunk DMAs
    max_chunk_dist: int = 0
    # factored-scale encoding (a_dtype int8): `a` holds integer edge
    # multiplicities and the true edge weight is
    #   w_e = dst_scale[dst] * src_scale[src] * mult_e
    # (either scale may be None = ones). Shrinks the A-table 4x vs f32 —
    # the dominant HBM stream — while the tiny [B*C] scale vectors live
    # wholly in VMEM. SAGE mean: dst_scale = 1/deg; GCN: both = deg^-1/2.
    dst_scale: Optional[jnp.ndarray] = None
    src_scale: Optional[jnp.ndarray] = None
    # bit-packed A-table for the banded Pallas kernel: a_pack depth slots
    # per byte ([B, ceil(D/a_pack), C, C] uint8; slot d lives in plane
    # d // a_pack at bit offset (8 // a_pack) * (d % a_pack)). The int8
    # multiplicity table is the dominant HBM stream of the aggregation
    # (78 MB of a 182 MB pass at Elliptic scale); multiplicities are tiny
    # ({1, 2} on symmetrized simple graphs), so crumb/nibble packing cuts
    # that stream 4x/2x. Kernel-only: the XLA einsum path keeps `a`.
    a_packed: Optional[jnp.ndarray] = None
    a_pack: int = 1
    # per-destination-chunk slot cover: occ[b] = 1 + last nonzero slot (0
    # when the chunk has no dense edges). Kernels that are MXU-pass-bound
    # (the GAT backward sweeps) skip slots >= occ[b] entirely — the
    # transpose tables pad every chunk to the max in-reference count; on
    # the canonical bench graph (synthetic Elliptic-scale, symmetrized,
    # seed 0, depth 3) that is DT=5 with mean occ 2.89, i.e. ~42% empty
    # slots (the exact mean varies a few % with graph/seed). None = not
    # computed (treat as fully occupied).
    slot_occ: Optional[jnp.ndarray] = None


def pack_a_planes(a_np: np.ndarray, pack: int) -> np.ndarray:
    """[B, D, C, C] small non-negative ints -> [B, ceil(D/pack), C, C]
    uint8 bit-planes; slot d is stored in plane d // pack at bit offset
    (8 // pack) * (d % pack). Requires every value < 2 ** (8 // pack)."""
    b, d, c, c2 = a_np.shape
    bits = 8 // pack
    planes = -(-d // pack)
    padded = np.zeros((b, planes * pack, c, c2), np.uint8)
    padded[:, :d] = a_np.astype(np.uint8)
    padded = padded.reshape(b, planes, pack, c, c2)
    out = np.zeros((b, planes, c, c2), np.uint8)
    for s in range(pack):
        out |= padded[:, :, s] << np.uint8(bits * s)
    return out


def _auto_pack(a_np: np.ndarray, depth: int) -> int:
    """Pick the densest lossless packing for an integer multiplicity
    table: 4 slots/byte when every value < 4, 2 when < 16, else 1."""
    if depth < 2:
        return 1
    mx = int(a_np.max()) if a_np.size else 0
    if mx < 4:
        return 4
    if mx < 16:
        return 2
    return 1


def bfs_order(edge_index: np.ndarray, num_nodes: int,
              block_ids: np.ndarray) -> np.ndarray:
    """rank[old_id] = new_id: BFS order over the undirected graph within
    each block (components contiguous), blocks kept in order.

    Both the native and Python BFS seed start nodes in node-id order, so
    when node ids are not already sorted by block we relabel into
    (block, id) order first and compose — otherwise chunks would
    interleave blocks and BSDA spill would silently grow on inputs not
    pre-sorted by timestep.

    Uses the native C++ BFS (native/egnn_native.cpp) when built — ~20x
    faster at Elliptic scale; the Python fallback below may order a
    component's interior differently (neighbor tie-breaking) but both are
    deterministic and valid clusterings."""
    block_ids = np.asarray(block_ids)
    if block_ids.size == num_nodes and np.any(np.diff(block_ids) < 0):
        # relabel[old] = position in (block, id) order
        relabel = np.argsort(
            np.argsort(block_ids, kind="stable"), kind="stable"
        ).astype(np.int64)
        ei_rel = relabel[np.asarray(edge_index, np.int64)]
        rank_rel = bfs_order(ei_rel, num_nodes, block_ids[np.argsort(relabel)])
        return rank_rel[relabel].astype(np.int32)

    from ..native import bfs_order as native_bfs

    rank_c = native_bfs(edge_index[0], edge_index[1], num_nodes)
    if rank_c is not None:
        return rank_c
    from collections import deque

    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    # undirected adjacency in CSR form
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    order_e = np.argsort(u, kind="stable")
    u_s, v_s = u[order_e], v[order_e]
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(np.bincount(u_s, minlength=num_nodes), out=indptr[1:])

    rank = np.full(num_nodes, -1, np.int64)
    nxt = 0
    visited = np.zeros(num_nodes, bool)
    # iterate nodes in (block, id) order; BFS stays within the block since
    # all edges are intra-block
    for start in range(num_nodes):
        if visited[start]:
            continue
        visited[start] = True
        q = deque([start])
        while q:
            n = q.popleft()
            rank[n] = nxt
            nxt += 1
            for p in range(indptr[n], indptr[n + 1]):
                m = v_s[p]
                if not visited[m]:
                    visited[m] = True
                    q.append(m)
    return rank.astype(np.int32)


def build_bsda(
    edge_index: np.ndarray,
    num_nodes: int,
    edge_weights: Optional[np.ndarray] = None,
    mean: bool = False,
    depth: int = 2,
    a_dtype: str = "float32",
    chunk: int = CHUNK,
    residual_weights: Optional[np.ndarray] = None,
    dst_scale: Optional[np.ndarray] = None,
    src_scale: Optional[np.ndarray] = None,
) -> BsdaGraph:
    """Pack a (BFS-renumbered) graph into dense chunk blocks + residual.

    Call AFTER renumbering nodes with bfs_order (the builder does not
    reorder; it reports spill stats for the given ordering).

    Factored-scale form (a_dtype "int8"): pass integer `edge_weights`
    (multiplicities) plus `dst_scale`/`src_scale` [num_nodes] vectors and
    the TRUE float weights as `residual_weights` — spill edges bypass the
    scale factoring (they are computed at full weights in the XLA residual
    and added after the dense part is scaled).
    """
    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    e = src.size
    w_all = (
        np.ones(e, np.float32)
        if edge_weights is None
        else np.asarray(edge_weights, np.float32)
    )
    if mean:
        deg = np.bincount(dst, minlength=num_nodes)
        w_all = w_all / np.maximum(deg[dst], 1).astype(np.float32)
    w_res = (
        w_all if residual_weights is None
        else np.asarray(residual_weights, np.float32)
    )

    b = (num_nodes + chunk - 1) // chunk
    n_padded = b * chunk
    bsrc = src // chunk
    bdst = dst // chunk

    # per-destination-chunk: count edges per source chunk, keep top-D
    pair_key = bdst * b + bsrc
    uniq_pairs, pair_inv, pair_cnt = np.unique(
        pair_key, return_inverse=True, return_counts=True
    )
    p_dst = (uniq_pairs // b).astype(np.int64)
    p_src = (uniq_pairs % b).astype(np.int64)

    src_chunk = np.tile(np.arange(b, dtype=np.int64)[:, None], (1, depth))
    # rank pairs by count within each dst chunk, always keep the diagonal
    order_p = np.lexsort((-pair_cnt, p_dst))
    fill = np.zeros(b, np.int64)
    keep_pair = np.zeros(uniq_pairs.size, bool)
    for pi in order_p:
        d = p_dst[pi]
        if p_src[pi] == d:
            keep_pair[pi] = True  # diagonal always dense (slot reserved)
    for pi in order_p:
        d = p_dst[pi]
        if keep_pair[pi]:
            continue
        # slot 0 reserved for diagonal even if empty
        if fill[d] < depth - 1:
            keep_pair[pi] = True
            fill[d] += 1

    # assign slots
    slot_of_pair = np.full(uniq_pairs.size, -1, np.int64)
    next_slot = np.ones(b, np.int64)  # slot 0 = diagonal
    for pi in order_p:
        if not keep_pair[pi]:
            continue
        d = p_dst[pi]
        if p_src[pi] == d:
            slot_of_pair[pi] = 0
        else:
            slot_of_pair[pi] = next_slot[d]
            src_chunk[d, next_slot[d]] = p_src[pi]
            next_slot[d] += 1

    a = np.zeros((b, depth, chunk, chunk), np.float32)
    e_slot = slot_of_pair[pair_inv]
    in_dense = e_slot >= 0
    np.add.at(
        a,
        (
            bdst[in_dense],
            e_slot[in_dense],
            (dst[in_dense] % chunk),
            (src[in_dense] % chunk),
        ),
        w_all[in_dense],
    )

    residual = None
    residual_rows = None
    n_spill = int((~in_dense).sum())
    if n_spill:
        r_src = src[~in_dense]
        r_dst = dst[~in_dense]
        rows, r_dst_compact = np.unique(r_dst, return_inverse=True)
        r_ei = np.stack([r_src, r_dst_compact])
        residual = build_ell_graph(
            r_ei, rows.size, edge_weights=w_res[~in_dense], mean=False
        )
        residual_rows = jnp.asarray(rows.astype(np.int32))
    print(
        f"[BSDA] chunks={b} depth={depth} dense_edges={int(in_dense.sum())} "
        f"spill_edges={n_spill} ({n_spill / max(e,1):.1%})"
    )

    def pad_scale(s):
        if s is None:
            return None
        out = np.zeros(n_padded, np.float32)
        out[:num_nodes] = np.asarray(s, np.float32)
        return jnp.asarray(out)

    # bit-packed planes for the Pallas kernel (int8 multiplicity tables
    # with tiny values only — lossless by construction)
    a_pack = 1
    a_packed = None
    if a_dtype == "int8":
        a_int = a.astype(np.int64)
        a_pack = _auto_pack(a_int, depth)
        if a_pack > 1:
            a_packed = jnp.asarray(pack_a_planes(a_int, a_pack))

    # slot cover (1 + last nonzero slot per chunk) for occupancy-gated
    # kernels; slot 0 is reserved for the diagonal even when empty, so the
    # cover — not the count — is the safe skip bound
    nz_slots = a.reshape(b, depth, -1).any(axis=-1)
    slot_occ = np.max(
        np.where(nz_slots, np.arange(1, depth + 1, dtype=np.int64)[None, :], 0),
        axis=1,
    ).astype(np.int32)

    return BsdaGraph(
        a=jnp.asarray(a.astype(np.dtype(a_dtype))),
        a_packed=a_packed,
        a_pack=a_pack,
        src_chunk=jnp.asarray(src_chunk.astype(np.int32)),
        residual=residual,
        residual_rows=residual_rows,
        num_nodes=num_nodes,
        num_chunks=b,
        depth=depth,
        n_pad=n_padded - num_nodes,
        a_dtype_name=a_dtype,
        chunk=chunk,
        max_chunk_dist=int(
            np.abs(src_chunk - np.arange(b, dtype=np.int64)[:, None]).max()
        ) if b else 0,
        dst_scale=pad_scale(dst_scale),
        src_scale=pad_scale(src_scale),
        slot_occ=jnp.asarray(slot_occ),
    )


def pad_bsda_chunks(g: BsdaGraph, multiple: int) -> BsdaGraph:
    """Pad the destination-chunk axis to a multiple (zero A-blocks,
    self-pointing sources, zero scales) so the encoding tiles a device
    mesh. num_nodes is unchanged; callers pad node arrays to the new
    num_chunks * chunk grid."""
    b = g.num_chunks
    pad = (-b) % multiple
    if pad == 0:
        return g
    a = jnp.concatenate(
        [g.a, jnp.zeros((pad,) + g.a.shape[1:], g.a.dtype)], axis=0
    )
    new_ids = jnp.arange(b, b + pad, dtype=g.src_chunk.dtype)
    src = jnp.concatenate(
        [g.src_chunk, jnp.tile(new_ids[:, None], (1, g.depth))], axis=0
    )

    def pad_scale(s):
        if s is None:
            return None
        return jnp.concatenate(
            [s, jnp.zeros(pad * g.chunk, s.dtype)], axis=0
        )

    return dataclasses.replace(
        g,
        a=a,
        a_packed=(
            None if g.a_packed is None else jnp.concatenate(
                [g.a_packed,
                 jnp.zeros((pad,) + g.a_packed.shape[1:], g.a_packed.dtype)],
                axis=0,
            )
        ),
        src_chunk=src,
        num_chunks=b + pad,
        n_pad=g.n_pad + pad * g.chunk,
        dst_scale=pad_scale(g.dst_scale),
        src_scale=pad_scale(g.src_scale),
        slot_occ=(
            None if g.slot_occ is None else jnp.concatenate(
                [g.slot_occ, jnp.zeros(pad, g.slot_occ.dtype)], axis=0
            )
        ),
        transpose=(
            pad_bsda_chunks(g.transpose, multiple)
            if g.transpose is not None else None
        ),
    )


def bsda_spmm(g: BsdaGraph, x: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    """out[d] = sum_e w_e x[src_e]: batched dense chunk matmuls + residual.

    With g.transpose set, gradients flow through a forward pass on the
    transpose encoding (d/dx of a weighted sum over edges = the same sum
    over reversed edges with identical weights)."""
    if g.transpose is not None:

        @jax.custom_vjp
        def f(x):
            return _bsda_spmm_impl(g, x, compute_dtype)

        def f_fwd(x):
            return _bsda_spmm_impl(g, x, compute_dtype), None

        def f_bwd(_res, ct):
            return (_bsda_spmm_impl(g.transpose, ct, compute_dtype),)

        f.defvjp(f_fwd, f_bwd)
        return f(x)
    return _bsda_spmm_impl(g, x, compute_dtype)


def _bsda_spmm_impl(g: BsdaGraph, x: jnp.ndarray,
                    compute_dtype=None) -> jnp.ndarray:
    n0, f = x.shape
    out_dtype = x.dtype
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    chunk = g.chunk
    n_target = g.num_chunks * chunk
    pad = n_target - n0
    assert pad >= 0, (n0, n_target)
    if g.src_scale is not None:
        # column scale of the factored encoding; fuses into the chunk gather
        xc = xc * g.src_scale[:n0, None].astype(xc.dtype)
    if pad:
        xc = jnp.concatenate(
            [xc, jnp.zeros((pad, f), xc.dtype)], axis=0
        )
    x3 = xc.reshape(g.num_chunks, chunk, f)
    # NB: a slot-split variant (diagonal term without the chunk gather) was
    # measured SLOWER on the v5e (1.25 vs 1.03 ms) — XLA fuses the batched
    # gather+einsum better than hand-split terms; keep the single einsum.
    gathered = x3[g.src_chunk]  # [B, D, C, F] chunk-granular gather
    a = g.a.astype(xc.dtype)
    out = jnp.einsum(
        "bdij,bdjf->bif", a, gathered, preferred_element_type=jnp.float32
    )
    out = out.reshape(g.num_chunks * chunk, f)
    if g.dst_scale is not None:
        out = out * g.dst_scale[:, None]
    out = out[:n0].astype(out_dtype)
    if g.residual is not None:
        # residual ELL gathers sources from the FULL node set but reduces
        # into compact rows; one unique-index add folds it back in
        spill = _residual_spmm(g.residual, x, compute_dtype)
        out = out.at[g.residual_rows].add(
            spill.astype(out_dtype), unique_indices=True,
            indices_are_sorted=True,
        )
    return out


def _residual_spmm(res: EllGraph, x: jnp.ndarray, compute_dtype):
    """ell_spmm against a compact-row ELL whose nbr ids index the full x."""
    xg = x.astype(compute_dtype) if compute_dtype is not None else x
    feat = x.shape[-1]
    outs = []
    for nbr, w, scale in zip(res.nbrs, res.weights, res.row_scale):
        gathered = xg[nbr]
        agg = jnp.einsum(
            "rw,rwf->rf", w.astype(gathered.dtype), gathered,
            preferred_element_type=jnp.float32,
        )
        outs.append(agg * scale[:, None])
    if res.n_zero_deg:
        outs.append(jnp.zeros((res.n_zero_deg, feat), jnp.float32))
    permuted = jnp.concatenate(outs, axis=0)
    if res.inv_perm is None:
        return permuted
    return permuted[res.inv_perm]


def with_transpose(g: BsdaGraph, edge_index: np.ndarray, num_nodes: int,
                   edge_weights: Optional[np.ndarray], mean: bool) -> BsdaGraph:
    """Attach the A^T encoding (reversed edges, identical folded weights)."""
    w_all = (
        np.ones(edge_index.shape[1], np.float32)
        if edge_weights is None
        else np.asarray(edge_weights, np.float32)
    )
    if mean:
        deg = np.bincount(edge_index[1], minlength=num_nodes)
        w_all = w_all / np.maximum(deg[edge_index[1]], 1).astype(np.float32)
    rev = np.stack([edge_index[1], edge_index[0]])
    g_t = build_bsda(rev, num_nodes, edge_weights=w_all, mean=False,
                     depth=g.depth, a_dtype=g.a_dtype_name, chunk=g.chunk)
    return dataclasses.replace(g, transpose=g_t)


def _with_transpose_factored(g: BsdaGraph, edge_index: np.ndarray,
                             num_nodes: int, mult: np.ndarray,
                             true_w: np.ndarray, dst_scale, src_scale,
                             ) -> BsdaGraph:
    """A^T of a factored encoding: reversed edges, multiplicities unchanged,
    row/column scales swap roles (w_e = rs[dst]*cs[src]*m is symmetric in
    the factor product)."""
    rev = np.stack([edge_index[1], edge_index[0]])
    g_t = build_bsda(
        rev, num_nodes, edge_weights=mult, mean=False, depth=g.depth,
        a_dtype=g.a_dtype_name, chunk=g.chunk, residual_weights=true_w,
        dst_scale=src_scale, src_scale=dst_scale,
    )
    return dataclasses.replace(g, transpose=g_t)


def build_bsda_for_kind(edge_index: np.ndarray, num_nodes: int, kind: str,
                        depth: int = 2, a_dtype: str = "float32",
                        transpose: bool = True) -> BsdaGraph:
    """Model-kind wrapper matching prepare_graph_ops semantics.

    a_dtype "int8" selects the factored-scale encoding (integer edge
    multiplicities in `a` + per-node scale vectors): 4x less A-table
    traffic, mathematically identical weights for sage/gcn whose edge
    weights factor as dst_scale*src_scale (1/deg and deg^-1/2 resp.).
    """
    from ..graph.transform import add_self_loops
    from .ell import gcn_norm_weights

    factored = a_dtype == "int8"
    if kind == "sage":
        if factored:
            dst = np.asarray(edge_index[1], np.int64)
            deg = np.bincount(dst, minlength=num_nodes)
            ds = 1.0 / np.maximum(deg, 1).astype(np.float32)
            mult = np.ones(edge_index.shape[1], np.float32)
            true_w = ds[dst]
            g = build_bsda(edge_index, num_nodes, edge_weights=mult,
                           mean=False, depth=depth, a_dtype=a_dtype,
                           residual_weights=true_w, dst_scale=ds)
            if transpose:
                g = _with_transpose_factored(
                    g, edge_index, num_nodes, mult, true_w, ds, None)
            return g
        g = build_bsda(edge_index, num_nodes, mean=True, depth=depth,
                       a_dtype=a_dtype)
        if transpose:
            g = with_transpose(g, edge_index, num_nodes, None, mean=True)
        return g
    if kind == "gcn":
        ei = add_self_loops(edge_index, num_nodes)
        w = gcn_norm_weights(ei, num_nodes)
        if factored:
            # w_e = deg^-1/2[dst] * deg^-1/2[src] exactly (ell.py
            # gcn_norm_weights); recover the per-node factor from degrees
            deg = np.bincount(np.asarray(ei[1], np.int64),
                              minlength=num_nodes).astype(np.float64)
            s = np.zeros_like(deg)
            nz = deg > 0
            s[nz] = deg[nz] ** -0.5
            s = s.astype(np.float32)
            mult = np.ones(ei.shape[1], np.float32)
            g = build_bsda(ei, num_nodes, edge_weights=mult, mean=False,
                           depth=depth, a_dtype=a_dtype, residual_weights=w,
                           dst_scale=s, src_scale=s)
            if transpose:
                g = _with_transpose_factored(g, ei, num_nodes, mult, w, s, s)
            return g
        g = build_bsda(ei, num_nodes, edge_weights=w, mean=False,
                       depth=depth, a_dtype=a_dtype)
        if transpose:
            g = with_transpose(g, ei, num_nodes, w, mean=False)
        return g
    if kind == "gat":
        # self-loops + unit weights: `a` holds edge multiplicities for the
        # dense-attention path (kernels/bsda_gat.py) — always int8 (exact;
        # 4x less HBM traffic on the two score passes). With transpose=True
        # the EXACT block-transpose of the dense tables is attached so the
        # fused attention VJP (kernels/pallas_gat_bwd.py) partitions edges
        # identically to the forward (an independently built transpose
        # would assign some edges to different dense/spill sides and break
        # gradient exactness).
        ei = add_self_loops(edge_index, num_nodes)
        g = build_bsda(ei, num_nodes, mean=False, depth=depth,
                       a_dtype="int8")
        if transpose:
            g = dataclasses.replace(g, transpose=gat_block_transpose(g))
        return g
    raise ValueError(f"BSDA supports sage/gcn/gat, not {kind!r}")


def gat_block_transpose(g: BsdaGraph) -> BsdaGraph:
    """Exact block-transpose of g's dense tables (no residual).

    For every kept dense pair (dest chunk I, slot d) with source chunk
    J = src_chunk[I, d], the transpose holds aT[J, slot'] = a[I, d] —
    UNtransposed, [dest-row, src-col] orientation, which is what the
    source-oriented backward sweep consumes directly — with
    srcT[J, slot'] = I. The transpose depth is the max in-reference count
    (banded ordering keeps it ~2*max_chunk_dist+1); padding slots point a
    chunk at itself with zero multiplicities."""
    a = np.asarray(g.a)
    src = np.asarray(g.src_chunk)
    b, d, c, _ = a.shape
    nonzero = a.any(axis=(2, 3))
    refs: list = [[] for _ in range(b)]
    for i_chunk in range(b):
        for slot in range(d):
            if nonzero[i_chunk, slot]:
                refs[int(src[i_chunk, slot])].append((i_chunk, slot))
    dt = max(1, max(len(r) for r in refs))
    a_t = np.zeros((b, dt, c, c), a.dtype)
    src_t = np.empty((b, dt), np.int32)
    for j_chunk in range(b):
        for slot, (i_chunk, d_i) in enumerate(refs[j_chunk]):
            a_t[j_chunk, slot] = a[i_chunk, d_i]
            src_t[j_chunk, slot] = i_chunk
        for slot in range(len(refs[j_chunk]), dt):
            src_t[j_chunk, slot] = j_chunk
    dist = int(np.abs(src_t - np.arange(b)[:, None]).max()) if b else 0
    occ_t = np.array([len(r) for r in refs], np.int32)
    return BsdaGraph(
        a=jnp.asarray(a_t),
        src_chunk=jnp.asarray(src_t),
        slot_occ=jnp.asarray(occ_t),
        residual=None,
        residual_rows=None,
        num_nodes=g.num_nodes,
        num_chunks=b,
        depth=dt,
        n_pad=g.n_pad,
        a_dtype_name=g.a_dtype_name,
        chunk=c,
        max_chunk_dist=dist,
    )
