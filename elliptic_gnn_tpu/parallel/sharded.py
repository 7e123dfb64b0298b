"""Multi-chip sharded full-batch training (GSPMD named shardings).

Strategy (SURVEY.md §2.3, BASELINE.json north_star): edge-partitioned graph
sharding —
  - node rows (features, labels, masks, ELL destination-row tables) are
    sharded across the `nodes` mesh axis; because nodes are ordered by
    timestep and all Elliptic edges are intra-timestep, contiguous row
    shards give a near-zero edge cut;
  - dense-layer parameters are replicated; gradient reduction and global
    BatchNorm statistics ride XLA `psum` collectives over ICI;
  - neighbor-feature exchange: the ELL gathers read source rows that may
    live on other chips; under GSPMD the compiler materializes the needed
    all-gather automatically. (An explicit shard_map + halo-exchange path
    is the planned optimization for large meshes.)

This module prepares sharded device arrays; the jitted step functions in
train/train_gnn.py work unchanged — XLA propagates shardings and inserts
collectives (jit is the multi-chip programming model; no NCCL analogue
needed).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.ell import EllGraph
from .mesh import NODE_AXIS


def pad_to_multiple(arr: np.ndarray, m: int, axis: int = 0, fill=0) -> np.ndarray:
    n = arr.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def shard_ell_graph(g: EllGraph, mesh: Mesh) -> EllGraph:
    """Shard destination-row tables across the node axis (leading dim);
    pads each bucket's row count to the mesh size."""
    n_dev = mesh.devices.size
    row_sh = NamedSharding(mesh, P(NODE_AXIS))

    def put_rows(a):
        a = pad_to_multiple(np.asarray(a), n_dev, axis=0)
        return jax.device_put(jnp.asarray(a), row_sh)

    nbrs, weights, rows, scales = [], [], [], []
    for nbr, w, r, s in zip(g.nbrs, g.weights, g.rows, g.row_scale):
        nbrs.append(put_rows(nbr))
        weights.append(put_rows(w))
        # padded rows point at node 0 with zero weight -> contribute nothing,
        # and are never referenced by inv_perm
        rows.append(put_rows(r))
        scales.append(put_rows(s))

    # inv_perm indexes into the *concatenated* permuted output; padding rows
    # shift bucket offsets, so remap old positions to padded positions.
    old_sizes = [int(np.asarray(n).shape[0]) for n in g.nbrs]
    # shape only — np.asarray would fetch, which multi-host global arrays
    # spanning non-addressable devices forbid
    new_sizes = [int(n.shape[0]) for n in nbrs]
    zero_block_old = g.n_zero_deg
    zero_block_new = ((-zero_block_old) % n_dev) + zero_block_old if zero_block_old else 0

    old_offsets = np.cumsum([0] + old_sizes)
    new_offsets = np.cumsum([0] + new_sizes)
    inv = (
        np.arange(g.num_nodes, dtype=np.int64)
        if g.inv_perm is None
        else np.asarray(g.inv_perm).astype(np.int64)
    )
    remapped = np.empty_like(inv)
    for b in range(len(old_sizes)):
        sel = (inv >= old_offsets[b]) & (inv < old_offsets[b + 1])
        remapped[sel] = inv[sel] - old_offsets[b] + new_offsets[b]
    sel = inv >= old_offsets[-1]  # zero-degree block
    remapped[sel] = inv[sel] - old_offsets[-1] + new_offsets[-1]

    inv_perm = jax.device_put(
        jnp.asarray(pad_to_multiple(remapped.astype(np.int32), n_dev)), row_sh
    )

    return EllGraph(
        nbrs=tuple(nbrs),
        weights=tuple(weights),
        rows=tuple(rows),
        inv_perm=inv_perm,
        row_scale=tuple(scales),
        num_nodes=g.num_nodes,
        widths=g.widths,
        n_zero_deg=zero_block_new,
    )


def shard_graph_inputs(mesh: Mesh, data, gops, shard_tables: bool = True) -> Tuple:
    """Place node arrays and aggregation tables on the mesh, rows sharded.
    With shard_tables=False, gops is returned untouched (the explicit
    shard_map path partitions its own tables via partition_bsda).

    Returns (x, y, timestep, train_mask_f, row_mask, gops, n_padded).
    Node arrays are padded; padded rows are unlabeled (train mask 0),
    edge-free, and excluded from BatchNorm statistics via `row_mask`, so
    results are bitwise-identical to 1 chip.

    For a BsdaGraph (kernels/bsda.py), the dense chunk tables are sharded
    along the destination-chunk dim and the node arrays padded to the chunk
    grid; XLA partitions the batched matmuls and all-gathers source chunks
    over ICI as needed.
    """
    from ..kernels.bsda import BsdaGraph

    n_dev = mesh.devices.size
    row_sh = NamedSharding(mesh, P(NODE_AXIS))
    row2_sh = NamedSharding(mesh, P(NODE_AXIS, None))

    n0 = data.num_nodes
    if isinstance(gops, BsdaGraph):
        n_target = gops.num_chunks * gops.chunk
        assert n_target % n_dev == 0 or True  # GSPMD tolerates uneven shards

        def pad_rows(a, fill=0):
            padw = [(0, n_target - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, padw, constant_values=fill)

        x = pad_rows(data.x)
        y = pad_rows(np.maximum(data.y, 0).astype(np.int32))
        ts = pad_rows(data.timestep.astype(np.int32), fill=1)
        tm = pad_rows(data.train_mask.astype(np.float32))
        gops_sh = shard_bsda_graph(gops, mesh) if shard_tables else gops
    else:
        x = pad_to_multiple(data.x, n_dev)
        y = pad_to_multiple(np.maximum(data.y, 0).astype(np.int32), n_dev)
        ts = pad_to_multiple(data.timestep.astype(np.int32), n_dev, fill=1)
        tm = pad_to_multiple(data.train_mask.astype(np.float32), n_dev)
        # NB: inv_perm gather output must cover padded node count; extend it
        # by pointing padded nodes at the zero block.
        gops_sh = shard_ell_graph(_extend_for_padding(gops, x.shape[0]), mesh)

    rm = (np.arange(x.shape[0]) < n0).astype(np.float32)
    x_d = jax.device_put(jnp.asarray(x), row2_sh)
    y_d = jax.device_put(jnp.asarray(y), row_sh)
    ts_d = jax.device_put(jnp.asarray(ts), row_sh)
    tm_d = jax.device_put(jnp.asarray(tm), row_sh)
    rm_d = jax.device_put(jnp.asarray(rm), row_sh)
    return x_d, y_d, ts_d, tm_d, rm_d, gops_sh, x.shape[0] - n0


def shard_bsda_graph(g, mesh: Mesh):
    """Shard BSDA dense tables over destination chunks; the small residual
    stays replicated. Falls back to replicated tables when the chunk count
    doesn't divide the mesh (tiny test graphs) — GSPMD still partitions the
    compute by the row-sharded inputs."""
    import dataclasses

    n_dev = mesh.devices.size
    if g.num_chunks % n_dev == 0:
        chunk_sh = NamedSharding(mesh, P(NODE_AXIS, None, None, None))
        chunk1_sh = NamedSharding(mesh, P(NODE_AXIS, None))
    else:
        chunk_sh = NamedSharding(mesh, P())
        chunk1_sh = NamedSharding(mesh, P())
    rep = NamedSharding(mesh, P())

    def place(gg):
        repl = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), t
        )
        row_sh = (
            NamedSharding(mesh, P(NODE_AXIS))
            if (gg.num_chunks * gg.chunk) % n_dev == 0
            else rep
        )
        return dataclasses.replace(
            gg,
            a=jax.device_put(gg.a, chunk_sh),
            src_chunk=jax.device_put(gg.src_chunk, chunk1_sh),
            residual=repl(gg.residual) if gg.residual is not None else None,
            residual_rows=(
                jax.device_put(gg.residual_rows, rep)
                if gg.residual_rows is not None else None
            ),
            dst_scale=(
                jax.device_put(gg.dst_scale, row_sh)
                if gg.dst_scale is not None else None
            ),
            src_scale=(
                jax.device_put(gg.src_scale, row_sh)
                if gg.src_scale is not None else None
            ),
            transpose=place(gg.transpose) if gg.transpose is not None else None,
        )

    return place(g)


def _extend_for_padding(g: EllGraph, n_padded: int) -> EllGraph:
    """Grow the node count to n_padded: padded nodes are zero-degree."""
    extra = n_padded - g.num_nodes
    if extra <= 0:
        return g
    total_rows = sum(int(np.asarray(n).shape[0]) for n in g.nbrs)
    # new zero-degree positions appended at the end of the zero block
    inv = (
        np.arange(g.num_nodes, dtype=np.int32)
        if g.inv_perm is None
        else np.asarray(g.inv_perm)
    )
    new_positions = np.arange(
        total_rows + g.n_zero_deg, total_rows + g.n_zero_deg + extra, dtype=np.int32
    )
    inv_new = np.concatenate([inv, new_positions])
    return EllGraph(
        nbrs=g.nbrs,
        weights=g.weights,
        rows=g.rows,
        inv_perm=jnp.asarray(inv_new),
        row_scale=g.row_scale,
        num_nodes=n_padded,
        widths=g.widths,
        n_zero_deg=g.n_zero_deg + extra,
    )
