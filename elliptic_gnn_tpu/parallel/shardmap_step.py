"""Explicit-collective multi-chip training step (shard_map + halo exchange).

The GSPMD path (parallel/sharded.py) annotates shardings and lets XLA place
collectives. This module is the hand-scheduled counterpart for large meshes,
written with explicit collectives so the communication pattern is visible
and controllable (SURVEY.md §2.3: "all-to-all of boundary node features over
ICI ... psum for gradient/BN-stat reduction"):

  - BSDA chunk tables are SPLIT per device (each chip owns a contiguous
    range of destination chunks; with BFS ordering the edge cut is small);
  - each aggregation performs one `lax.all_gather` of node features over
    the `nodes` ICI axis (the halo exchange — source chunks may live on any
    chip), then purely local MXU chunk matmuls + the local residual;
  - BatchNorm statistics and the masked loss reduce with explicit `psum`s;
  - parameter gradients all-reduce automatically: shard_map's AD transposes
    parameter replication into `psum`, and the all_gather transposes into
    `psum_scatter` for the feature cotangents.

The step is numerically equivalent to the single-device step
(tests/test_shardmap.py asserts it on the 8-virtual-device CPU mesh).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels.bsda import BsdaGraph
from ..models.losses import cross_entropy_per_sample
from .mesh import NODE_AXIS


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "src_chunk", "res_nbr", "res_w", "res_scale", "res_rows"],
    meta_fields=["chunk", "depth", "num_chunks_global", "axis_name"],
)
@dataclasses.dataclass
class ShardedBsda:
    """Per-device BSDA shard, stacked over a leading device axis so
    shard_map can split it with P(axis).

    a:         [n_dev, B_loc, D, C, C]
    src_chunk: [n_dev, B_loc, D]  GLOBAL source-chunk ids
    res_nbr:   [n_dev, R, W] int32 — residual neighbors (GLOBAL node ids);
               padded rows have weight 0
    res_w:     [n_dev, R, W] f32
    res_scale: [n_dev, R] f32
    res_rows:  [n_dev, R] int32 — LOCAL destination row of each residual row
    """

    a: jnp.ndarray
    src_chunk: jnp.ndarray
    res_nbr: jnp.ndarray
    res_w: jnp.ndarray
    res_scale: jnp.ndarray
    res_rows: jnp.ndarray
    chunk: int
    depth: int
    num_chunks_global: int
    axis_name: str


def partition_bsda(g: BsdaGraph, n_dev: int,
                   axis_name: str = NODE_AXIS) -> ShardedBsda:
    """Split a BsdaGraph into n_dev contiguous destination-chunk ranges.

    Requires num_chunks % n_dev == 0 (pad chunks upstream if needed).
    The residual's compact rows are routed to the device owning each
    destination node; per-device residual tables are padded to a common
    fixed shape (the residual is tiny — a few % of edges).
    """
    b = g.num_chunks
    assert b % n_dev == 0, (b, n_dev)
    b_loc = b // n_dev
    c = g.chunk

    a = np.asarray(g.a).reshape(n_dev, b_loc, g.depth, c, c)
    src_chunk = np.asarray(g.src_chunk).reshape(n_dev, b_loc, g.depth)

    # flatten the residual ELL (compact rows) back to per-edge lists
    if g.residual is not None:
        rows_nodes = np.asarray(g.residual_rows)  # compact row -> node id
        nbr_all, w_all, dst_all = [], [], []
        for nbr, w, rows, scale in zip(
            g.residual.nbrs, g.residual.weights, g.residual.rows,
            g.residual.row_scale,
        ):
            nbr = np.asarray(nbr)
            w = np.asarray(w) * np.asarray(scale)[:, None]
            rr = rows_nodes[np.asarray(rows)]
            valid = np.asarray(w) != 0
            r_idx, s_idx = np.where(valid)
            nbr_all.append(nbr[r_idx, s_idx])
            w_all.append(w[r_idx, s_idx])
            dst_all.append(rr[r_idx])
        e_nbr = np.concatenate(nbr_all) if nbr_all else np.zeros(0, np.int64)
        e_w = np.concatenate(w_all) if w_all else np.zeros(0, np.float32)
        e_dst = np.concatenate(dst_all) if dst_all else np.zeros(0, np.int64)
    else:
        e_nbr = np.zeros(0, np.int64)
        e_w = np.zeros(0, np.float32)
        e_dst = np.zeros(0, np.int64)

    n_loc = b_loc * c
    dev_of = e_dst // n_loc

    # per-device compact residual rows, padded to common (R, W)
    per_dev = []
    r_max, w_max = 1, 1
    for d in range(n_dev):
        sel = dev_of == d
        dsts = e_dst[sel]
        rows_u, inv = np.unique(dsts, return_inverse=True)
        counts = np.bincount(inv, minlength=rows_u.size) if rows_u.size else np.zeros(0, np.int64)
        r_max = max(r_max, rows_u.size)
        w_max = max(w_max, int(counts.max()) if counts.size else 1)
        per_dev.append((sel, rows_u, inv, counts))

    res_nbr = np.zeros((n_dev, r_max, w_max), np.int32)
    res_w = np.zeros((n_dev, r_max, w_max), np.float32)
    res_rows = np.zeros((n_dev, r_max), np.int32)
    for d, (sel, rows_u, inv, counts) in enumerate(per_dev):
        if not rows_u.size:
            continue
        order = np.argsort(inv, kind="stable")
        within = np.arange(order.size) - np.cumsum(np.r_[0, counts[:-1]])[inv[order]]
        res_nbr[d, inv[order], within] = e_nbr[sel][order]
        res_w[d, inv[order], within] = e_w[sel][order]
        res_rows[d, : rows_u.size] = (rows_u - d * n_loc).astype(np.int32)

    return ShardedBsda(
        a=jnp.asarray(a),
        src_chunk=jnp.asarray(src_chunk),
        res_nbr=jnp.asarray(res_nbr),
        res_w=jnp.asarray(res_w),
        res_scale=jnp.asarray(np.ones((n_dev, r_max), np.float32)),
        res_rows=jnp.asarray(res_rows),
        chunk=c,
        depth=g.depth,
        num_chunks_global=b,
        axis_name=axis_name,
    )


def sharded_bsda_spmm(sg: ShardedBsda, x_local: jnp.ndarray,
                      compute_dtype=None) -> jnp.ndarray:
    """Halo aggregation inside shard_map: all_gather features over ICI,
    local chunk matmuls, local residual. x_local/returns: [N_loc, F].

    The shard_map caller passes the per-device slice of the stacked tables
    (leading axis length 1)."""
    a = sg.a[0]
    src_chunk = sg.src_chunk[0]
    out_dtype = x_local.dtype
    xc = (
        x_local.astype(compute_dtype) if compute_dtype is not None else x_local
    )
    # halo exchange: every chip contributes its rows; result is the full
    # node-feature matrix, used only as matmul operand (never re-stored)
    x_full = jax.lax.all_gather(xc, sg.axis_name, axis=0, tiled=True)
    f = x_full.shape[-1]
    x3 = x_full.reshape(sg.num_chunks_global, sg.chunk, f)
    gathered = x3[src_chunk]  # [B_loc, D, C, F]
    out = jnp.einsum(
        "bdij,bdjf->bif", a.astype(xc.dtype), gathered,
        preferred_element_type=jnp.float32,
    ).reshape(-1, f)

    # local residual: gather sources from the gathered features, reduce per
    # compact row, add into local rows
    res_nbr, res_w, res_rows = sg.res_nbr[0], sg.res_w[0], sg.res_rows[0]
    g_res = x_full[res_nbr]  # [R, W, F]
    spill = jnp.einsum(
        "rw,rwf->rf", res_w.astype(g_res.dtype), g_res,
        preferred_element_type=jnp.float32,
    )
    out = out.at[res_rows].add(spill, mode="drop")
    return out.astype(out_dtype)


def make_shardmap_train_step(mesh: Mesh, model, tx, loss_fn_cfg: Tuple,
                             sg: ShardedBsda):
    """Build the explicit-collective train step.

    loss_fn_cfg: (class_weights jnp [2],) — the step computes the masked,
    class-weighted CE with explicit psum reductions (global mean over train
    rows across chips).
    Returns step(params, state, opt_state, rng, x, y, ts, tmask, row_mask)
    with x/y/ts/tmask/row_mask row-sharded on the `nodes` axis.
    """
    import optax

    (cw,) = loss_fn_cfg
    axis = sg.axis_name
    p_rep = P()
    p_row = P(NODE_AXIS)
    p_row2 = P(NODE_AXIS, None)

    sg_specs = ShardedBsda(
        a=P(NODE_AXIS, None, None, None, None),
        src_chunk=P(NODE_AXIS, None, None),
        res_nbr=P(NODE_AXIS, None, None),
        res_w=P(NODE_AXIS, None, None),
        res_scale=P(NODE_AXIS, None),
        res_rows=P(NODE_AXIS, None),
        chunk=sg.chunk,
        depth=sg.depth,
        num_chunks_global=sg.num_chunks_global,
        axis_name=axis,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(p_rep, p_rep, p_rep, p_rep, p_row2, p_row, p_row, p_row,
                  p_row, sg_specs),
        out_specs=(p_rep, p_rep, p_rep, p_rep),
        check_vma=True,
    )
    def step(params, state, opt_state, rng, x, y, ts, tmask, row_mask, sg_loc):
        def lf(p):
            logits, new_state = model.apply(
                p, state, x, sg_loc, ts, training=True, rng=rng,
                axis_name=axis, row_mask=row_mask,
            )
            vec = cross_entropy_per_sample(logits, y.astype(jnp.int32), cw)
            num = jax.lax.psum((vec * tmask).sum(), axis)
            den = jax.lax.psum(tmask.sum(), axis)
            return num / jnp.maximum(den, 1.0), new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        # with vma (replication) tracking, AD inserts the gradient psum at
        # the replicated->varying boundary itself; no manual all-reduce
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, loss

    @jax.jit
    def jitted(params, state, opt_state, rng, x, y, ts, tmask, row_mask):
        return step(params, state, opt_state, rng, x, y, ts, tmask, row_mask, sg)

    return jitted
