"""Explicit-collective multi-chip training step (shard_map + halo exchange).

The GSPMD path (parallel/sharded.py) annotates shardings and lets XLA place
collectives. This module is the hand-scheduled counterpart for large
meshes, written with explicit collectives so the communication pattern is
visible and controllable (SURVEY.md §2.3 halo row: "all-to-all of boundary
node features over ICI ... overlapped with local SpMM"):

  - BSDA chunk tables are SPLIT per device: each chip owns a contiguous
    range of destination chunks. With the BFS-clustered ordering every
    source chunk lies within `max_chunk_dist` chunks of its destination
    (kernels/bsda.py), so the only remote rows a chip ever needs are the
    H = max_chunk_dist boundary chunks of its ring neighbors;
  - the halo exchange is two `lax.ppermute`s moving 2*H*C rows per chip —
    O(H*C*F) bytes over ICI instead of the O(N*F) full all_gather the
    round-1 implementation used (~200x less at Elliptic scale / 8 chips);
  - the halo exchange OVERLAPS the bulk of the local aggregation
    (SURVEY §2.3: "overlapped with local SpMM"): the per-shard A-table is
    split at partition time into a LOCAL part (every A-block whose source
    chunk the shard owns — all blocks of interior destination chunks plus
    the local blocks of boundary chunks) and a tiny HALO-FIXUP part (the
    <= 2H boundary destination chunks' blocks with remote sources). The
    local part runs the banded kernel on x_local with NO data dependency
    on the ppermutes, so XLA schedules it while the halos fly; the fixup
    (a [K_h, D_h, C, C] einsum over <= 2H chunks) and the residual spill
    read the halo-extended buffer afterwards and scatter into the kernel
    result;
  - BatchNorm statistics and the masked loss reduce with explicit `psum`s;
  - parameter gradients all-reduce automatically: shard_map's AD transposes
    parameter replication into `psum`, and each ppermute transposes into
    the reverse ppermute for the halo cotangents.

The step is numerically equivalent to the single-device step
(tests/test_shardmap.py asserts it on the 8-virtual-device CPU mesh), and
is user-reachable via `aggregation: shard_map` + `mesh_devices: N` in a
training config (train/train_gnn.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels.bsda import BsdaGraph
from .mesh import NODE_AXIS

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "src_local", "res_nbr", "res_w", "res_dst",
                 "res_rows", "res_perm", "rest_nbr", "rest_w", "rest_rows",
                 "rest_perm", "dst_scale", "src_scale_ext",
                 "a_loc", "src_loc", "hal_a", "hal_src", "hal_dst",
                 "a_t", "src_t", "ds_kern", "ss_kern",
                 "a_loc_p", "a_t_p"],
    meta_fields=["chunk", "depth", "num_chunks_global", "axis_name",
                 "halo_chunks", "n_dev", "use_pallas", "b_ext_pad",
                 "depth_t", "a_dtype_name", "a_pack"],
)
@dataclasses.dataclass
class ShardedBsda:
    """Per-device BSDA shard, stacked over a leading device axis so
    shard_map can split it with P(axis).

    a:          [n_dev, B_loc, D, C, C]
    src_local:  [n_dev, B_loc, D]  EXT-LOCAL source-chunk ids — index into
                the halo-extended buffer [halo_L | local | halo_R] of
                B_loc + 2*H chunks
    res_nbr:    tuple of [n_dev, R_k, W_k] int32 — residual neighbors as
                EXT-LOCAL node ids, width-bucketed (pow2 widths): each
                spill destination row lives in the narrowest bucket whose
                width covers its source count, like the single-device
                EllGraph residual. Padding every row to one max width
                would let a single ~100-wide hub row inflate the gather
                ~30x (measured 1.2 ms vs 0.03 ms at Elliptic scale, v5e)
    res_w:      tuple of [n_dev, R_k, W_k] f32 (true edge weights —
                residual edges bypass the factored scales; 0 = padding)
    res_perm:   [n_dev, R_u] int32 — static merge permutation: position in
                the concatenated bucket outputs of the t-th
                sorted-by-destination residual row
    res_rows:   [n_dev, R_u] int32 — unique LOCAL destination rows, sorted
                ascending: one unique+sorted scatter-add applies the whole
                spill (padded rows hold DISTINCT ascending out-of-range
                values n_loc + t, dropped by scatter mode='drop' — a
                repeated pad value would violate unique_indices and is UB
                on the TPU scatter fast path)
    dst_scale:  [n_dev, N_loc] f32 or None — factored row scales
    src_scale_ext: [n_dev, N_ext] f32 or None — factored column scales over
                the halo-extended rows (precomputed host-side: scales are
                static, so the halo needs no exchange for them)

    LOCAL/HALO split of the dense tables (always built — both the Pallas
    and the einsum per-shard paths use it, round-5 overlap design): the
    local part carries every A-block whose source chunk is shard-local
    (halo-source blocks zeroed, sources re-based to LOCAL chunk coords,
    zeroed slots self-pointing — still banded with max_chunk_dist = H), so
    the bulk of the aggregation has NO data dependency on the halo
    exchange and overlaps the ppermutes. The <= 2H boundary destination
    chunks' halo-source blocks live in the compact fixup tables and are
    applied as one [K_h, D_h, C, C] einsum over the halo-extended buffer
    after the exchange lands.

    a_loc:   [n_dev, B_loc, D, C, C]  (halo-source blocks zeroed)
    src_loc: [n_dev, B_loc, D] LOCAL source-chunk ids (self for zeroed)
    hal_a:   [n_dev, K_h, D_h, C, C] f32 halo-source blocks (0 = padding)
    hal_src: [n_dev, K_h, D_h] EXT source-chunk ids (0 on padding)
    hal_dst: [n_dev, K_h] LOCAL destination chunks, unique sorted
             ascending; pads hold DISTINCT ascending out-of-range values
             B_loc + t (scatter mode='drop')

    Pallas backward tables (use_pallas; None on the einsum path, whose
    backward is plain shard_map AD). The backward runs the SAME banded
    kernel (kernels/pallas_bsda.py) on the exact block-transpose over the
    halo-extended grid [b_ext_pad = B_loc + 2H padded to the kernel group
    size]: for ext chunk j, a_t[j,s] = a[l,d]^T for every (l,d) with
    src_local[l,d] == j, src_t[j,s] = l + H.

    a_t:     [n_dev, b_ext_pad, DT, C, C]
    src_t:   [n_dev, b_ext_pad, DT]
    ds_kern: [n_dev, b_ext_pad*C] dst scales embedded at ext offset (or None)
    ss_kern: [n_dev, b_ext_pad*C] src scales over ext rows, padded (or None)
    """

    a: jnp.ndarray
    src_local: jnp.ndarray
    res_nbr: tuple
    res_w: tuple
    # res_dst: tuple of [n_dev, R_k] int32 — LOCAL destination row of each
    # bucket row (pad -> n_loc). The linear spmm never needs it (the merge
    # permutation + unique-row scatter suffice), but per-destination
    # softmax attention (sharded_gat_attend) must read a_dst at the
    # destination BEFORE its within-row reduction.
    res_dst: tuple
    res_rows: jnp.ndarray
    res_perm: jnp.ndarray
    dst_scale: Optional[jnp.ndarray]
    src_scale_ext: Optional[jnp.ndarray]
    chunk: int
    depth: int
    num_chunks_global: int
    axis_name: str
    halo_chunks: int
    n_dev: int
    # transpose-residual tables (same edges grouped by EXT SOURCE row):
    # the spill backward runs as bucketed gathers/einsums + one
    # unique+sorted scatter — structurally identical to the forward
    # (rest_nbr holds LOCAL destination rows; rest_rows unique sorted ext
    # sources, distinct ascending out-of-range pads)
    rest_nbr: tuple = ()
    rest_w: tuple = ()
    rest_rows: Optional[jnp.ndarray] = None
    rest_perm: Optional[jnp.ndarray] = None
    a_loc: Optional[jnp.ndarray] = None
    src_loc: Optional[jnp.ndarray] = None
    hal_a: Optional[jnp.ndarray] = None
    hal_src: Optional[jnp.ndarray] = None
    hal_dst: Optional[jnp.ndarray] = None
    a_t: Optional[jnp.ndarray] = None
    src_t: Optional[jnp.ndarray] = None
    ds_kern: Optional[jnp.ndarray] = None
    ss_kern: Optional[jnp.ndarray] = None
    use_pallas: bool = False
    b_ext_pad: int = 0
    depth_t: int = 0
    a_dtype_name: str = "float32"
    # bit-packed planes of a_loc / a_t (see kernels/bsda.pack_a_planes) —
    # the kernel ships these instead of the int8 tables when a_pack > 1
    a_loc_p: Optional[jnp.ndarray] = None
    a_t_p: Optional[jnp.ndarray] = None
    a_pack: int = 1


def _bucket_group(n_dev: int, dev_of: np.ndarray, keys: np.ndarray,
                  gath: np.ndarray, w: np.ndarray, pad_base: int):
    """Group per-device edge lists by `keys` (the row each edge's output
    lands on, already device-local) into pow2-width-bucketed tables.

    Returns (nbr tuple of [n_dev, R_k, W_k] int32 gathered ids,
             w tuple of [n_dev, R_k, W_k] f32 (0 = padding),
             dst tuple of [n_dev, R_k] int32 key row per bucket row
               (pad -> pad_base),
             rows [n_dev, R_u] int32 unique keys sorted ascending — pads
               hold DISTINCT ascending out-of-range values pad_base + t
               (a repeated pad value would violate the scatter's
               unique_indices contract: UB that crashes the TPU worker
               when the scatter shares a module with a Mosaic kernel),
             perm [n_dev, R_u] int32 concat position of the t-th sorted
               row)."""
    per_dev = []
    for d in range(n_dev):
        sel = dev_of == d
        kk = keys[sel]
        rows_u, inv = np.unique(kk, return_inverse=True)
        counts = (np.bincount(inv, minlength=rows_u.size)
                  if rows_u.size else np.zeros(0, np.int64))
        per_dev.append((sel, rows_u, inv, counts))

    width_set = {
        int(2 ** np.ceil(np.log2(max(int(cnt), 1))))
        for _, _, _, counts in per_dev for cnt in counts
    }
    widths = sorted(width_set) or [1]
    n_buckets = len(widths)
    b_idx_dev = []
    r_k_max = [1] * n_buckets
    r_u_max = 1
    for _, rows_u, _, counts in per_dev:
        b_idx = np.searchsorted(widths, np.maximum(counts, 1), side="left")
        b_idx_dev.append(b_idx)
        for k in range(n_buckets):
            r_k_max[k] = max(r_k_max[k], int((b_idx == k).sum()))
        r_u_max = max(r_u_max, rows_u.size)

    offsets = np.concatenate([[0], np.cumsum(r_k_max)])
    out_nbr = [np.zeros((n_dev, r_k_max[k], widths[k]), np.int32)
               for k in range(n_buckets)]
    out_w = [np.zeros((n_dev, r_k_max[k], widths[k]), np.float32)
             for k in range(n_buckets)]
    out_dst = [np.full((n_dev, r_k_max[k]), pad_base, np.int32)
               for k in range(n_buckets)]
    out_rows = np.tile(
        np.arange(r_u_max, dtype=np.int32)[None, :], (n_dev, 1)
    ) + pad_base
    out_perm = np.zeros((n_dev, r_u_max), np.int32)
    for d, (sel, rows_u, inv, counts) in enumerate(per_dev):
        g_d = gath[sel]
        w_d = w[sel]
        b_idx = b_idx_dev[d]
        pos_in_bucket = np.zeros(rows_u.size, np.int64)
        for k in range(n_buckets):
            in_k = np.nonzero(b_idx == k)[0]
            pos_in_bucket[in_k] = np.arange(in_k.size)
        for ri in range(rows_u.size):
            sel_e = inv == ri
            k = int(b_idx[ri])
            i = int(pos_in_bucket[ri])
            cnt = int(sel_e.sum())
            out_nbr[k][d, i, :cnt] = g_d[sel_e]
            out_w[k][d, i, :cnt] = w_d[sel_e]
            out_dst[k][d, i] = int(rows_u[ri])
            out_perm[d, ri] = offsets[k] + i
        out_rows[d, : rows_u.size] = rows_u.astype(np.int32)
    return (
        tuple(jnp.asarray(t) for t in out_nbr),
        tuple(jnp.asarray(t) for t in out_w),
        tuple(jnp.asarray(t) for t in out_dst),
        jnp.asarray(out_rows),
        jnp.asarray(out_perm),
    )


def partition_bsda(g: BsdaGraph, n_dev: int,
                   axis_name: str = NODE_AXIS,
                   use_pallas: Optional[bool] = None) -> ShardedBsda:
    """Split a BsdaGraph into n_dev contiguous destination-chunk ranges
    with boundary-only halos.

    Requires num_chunks % n_dev == 0 (pad chunks upstream if needed) and a
    banded ordering: every source chunk and residual source within
    max_chunk_dist <= B_loc of its destination's range. Raises ValueError
    for non-banded graphs (use the GSPMD path there).

    use_pallas: route the per-shard dense aggregation through the banded
    Pallas kernel (ext-shaped tables + exact block-transpose backward).
    None = auto (on when running on TPU).
    """
    b = g.num_chunks
    if b % n_dev:
        raise ValueError(f"num_chunks {b} does not tile {n_dev} devices")
    b_loc = b // n_dev
    c = g.chunk
    h = max(1, int(g.max_chunk_dist))
    if h > b_loc:
        raise ValueError(
            f"halo {h} chunks exceeds per-device range {b_loc}; graph is "
            "not banded enough for boundary-only exchange (GSPMD path "
            "handles this case)"
        )

    a = np.asarray(g.a).reshape(n_dev, b_loc, g.depth, c, c)
    src_g = np.asarray(g.src_chunk).reshape(n_dev, b_loc, g.depth)
    dev_start = (np.arange(n_dev) * b_loc)[:, None, None]
    src_local = src_g - dev_start + h
    if src_local.min() < 0 or src_local.max() >= b_loc + 2 * h:
        raise ValueError("source chunk outside halo window; not banded")
    comm_frac = 2 * h / b
    print(f"[SHARDMAP] halo {h} chunks/side per device; boundary exchange "
          f"moves {2*h*c} rows/chip vs {b*c} full gather "
          f"({comm_frac:.2%} of all-gather volume)")

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
    n_ext = (b_loc + 2 * h) * c
    dev_of = e_dst // n_loc
    # residual sources must live inside the destination's halo window too
    nbr_ext_all = e_nbr - dev_of * n_loc + h * c
    if e_nbr.size and (nbr_ext_all.min() < 0 or nbr_ext_all.max() >= n_ext):
        raise ValueError("residual source outside halo window; not banded")

    # per-device residual: width-bucketed unique rows (pow2 widths, like
    # the single-device EllGraph residual) + a static merge permutation so
    # the step applies the whole spill with ONE unique+sorted scatter-add
    res_nbr, res_w, res_dst, res_rows, res_perm = _bucket_group(
        n_dev, dev_of, e_dst - dev_of * n_loc, nbr_ext_all, e_w,
        pad_base=n_loc,
    )
    # TRANSPOSE residual: the same edges grouped by their EXT SOURCE row
    # (rows_t = unique sorted ext sources, gathered ids = LOCAL dest
    # rows). The backward of the spill is then structurally IDENTICAL to
    # the forward — width-bucketed gathers + einsums + one unique+sorted
    # in-range/dropped scatter — instead of autodiff's repeated-index
    # scatter-add, which (sharing a module with the Mosaic kernel)
    # crashes the TPU worker (tools/verify_shard_kernels.py bisect).
    rest_nbr, rest_w, _, rest_rows, rest_perm = _bucket_group(
        n_dev, dev_of, nbr_ext_all, e_dst - dev_of * n_loc, e_w,
        pad_base=n_ext,
    )

    def split_scale(s, ext: bool):
        if s is None:
            return None
        s = np.asarray(s)  # [b*c] padded at build
        if not ext:
            return jnp.asarray(s.reshape(n_dev, n_loc))
        out = np.zeros((n_dev, n_ext), np.float32)
        for d in range(n_dev):
            lo, hi = d * n_loc - h * c, (d + 1) * n_loc + h * c
            src_lo, src_hi = max(lo, 0), min(hi, s.size)
            out[d, src_lo - lo: src_hi - lo] = s[src_lo:src_hi]
        return jnp.asarray(out)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    # ---- LOCAL/HALO split of the dense tables (round-5 overlap design;
    # SURVEY §2.3 "overlapped with local SpMM"). Every A-block whose
    # source chunk is shard-local moves to a_loc with sources re-based to
    # LOCAL coords (zeroed slots self-point, keeping the encoding banded
    # with max_chunk_dist = h); the remaining blocks — boundary
    # destination chunks reading remote sources — go to the compact fixup
    # tables, applied after the halo exchange lands. ----
    d = g.depth
    nonzero = a.any(axis=(3, 4))  # [n_dev, b_loc, D]
    mask_halo = (src_local < h) | (src_local >= h + b_loc)
    l_idx = np.arange(b_loc)[None, :, None]
    a_loc_np = np.where(mask_halo[..., None, None], 0, a).astype(a.dtype)
    src_loc_np = np.where(mask_halo, l_idx, src_local - h).astype(np.int32)

    fix_mask = mask_halo & nonzero  # blocks that actually need the halo
    per_dev_fix = []
    k_h = 1
    d_h = 1
    for dev in range(n_dev):
        ls, dis = np.nonzero(fix_mask[dev])
        chunks_u, inv = np.unique(ls, return_inverse=True)
        slots = [[] for _ in range(chunks_u.size)]
        for pos, (l_i, d_i) in enumerate(zip(ls, dis)):
            slots[inv[pos]].append((l_i, d_i))
        per_dev_fix.append((chunks_u, slots))
        k_h = max(k_h, chunks_u.size)
        d_h = max(d_h, max((len(s) for s in slots), default=1))
    hal_dst_np = np.tile(
        np.arange(k_h, dtype=np.int32)[None, :], (n_dev, 1)
    ) + b_loc  # distinct ascending out-of-range pads (scatter drop)
    hal_a_np = np.zeros((n_dev, k_h, d_h, c, c), np.float32)
    hal_src_np = np.zeros((n_dev, k_h, d_h), np.int32)
    for dev, (chunks_u, slots) in enumerate(per_dev_fix):
        hal_dst_np[dev, : chunks_u.size] = chunks_u.astype(np.int32)
        for ki, (l_u, sl) in enumerate(zip(chunks_u, slots)):
            for si, (l_i, d_i) in enumerate(sl):
                hal_a_np[dev, ki, si] = a[dev, l_i, d_i].astype(np.float32)
                hal_src_np[dev, ki, si] = int(src_local[dev, l_i, d_i])

    a_t = src_t = ds_kern = ss_kern = None
    a_loc_p = a_t_p = None
    b_ext_pad = 0
    depth_t = 0
    if use_pallas:
        # Pallas backward: the SAME banded kernel on the exact
        # block-transpose over the halo-extended grid. GROUP matches the
        # kernel's group-size rule (pallas_bsda._forward:
        # g_chunks = max(GROUP, max_chunk_dist)).
        from ..kernels.pallas_bsda import GROUP

        grp = max(GROUP, h)
        b_ext = b_loc + 2 * h
        b_ext_pad = -(-b_ext // grp) * grp

        # exact block-transpose per device: ext chunk j receives
        # a[l, di]^T from every (l, di) with src_local[l, di] == j
        refs = [[[] for _ in range(b_ext_pad)] for _ in range(n_dev)]
        for dev in range(n_dev):
            ls, dis = np.nonzero(nonzero[dev])
            for l_i, d_i in zip(ls, dis):
                refs[dev][int(src_local[dev, l_i, d_i])].append((l_i, d_i))
        depth_t = max(
            1, max(len(r) for dev_r in refs for r in dev_r)
        )
        a_t_np = np.zeros((n_dev, b_ext_pad, depth_t, c, c), a.dtype)
        src_t_np = np.tile(
            np.arange(b_ext_pad, dtype=np.int32)[None, :, None],
            (n_dev, 1, depth_t),
        )
        for dev in range(n_dev):
            for j, r in enumerate(refs[dev]):
                for slot, (l_i, d_i) in enumerate(r):
                    a_t_np[dev, j, slot] = a[dev, l_i, d_i].T
                    src_t_np[dev, j, slot] = l_i + h

        def embed_scale(s, at_ext_offset: bool):
            """[n_dev, b_ext_pad*c] scale table for the kernel view:
            local scales at ext offset h*c (at_ext_offset) or the existing
            ext-range scales zero-padded to the group grid."""
            if s is None:
                return None
            s = np.asarray(s)
            out = np.zeros((n_dev, b_ext_pad * c), np.float32)
            if at_ext_offset:
                out[:, h * c: h * c + b_loc * c] = s
            else:
                out[:, : s.shape[1]] = s
            return jnp.asarray(out)

        if g.a_pack > 1:
            from ..kernels.bsda import pack_a_planes

            a_loc_p = jnp.asarray(np.stack([
                pack_a_planes(a_loc_np[dev], g.a_pack)
                for dev in range(n_dev)
            ]))
            a_t_p = jnp.asarray(np.stack([
                pack_a_planes(a_t_np[dev], g.a_pack)
                for dev in range(n_dev)
            ]))
        a_t = jnp.asarray(a_t_np)
        src_t = jnp.asarray(src_t_np)
        ds_local = split_scale(g.dst_scale, ext=False)
        ss_ext = split_scale(g.src_scale, ext=True)
        ds_kern = embed_scale(ds_local, at_ext_offset=True)
        ss_kern = embed_scale(ss_ext, at_ext_offset=False)

    return ShardedBsda(
        a=jnp.asarray(a),
        src_local=jnp.asarray(src_local.astype(np.int32)),
        res_nbr=res_nbr,
        res_w=res_w,
        res_dst=res_dst,
        rest_nbr=rest_nbr,
        rest_w=rest_w,
        rest_rows=rest_rows,
        rest_perm=rest_perm,
        res_rows=jnp.asarray(res_rows),
        res_perm=jnp.asarray(res_perm),
        dst_scale=split_scale(g.dst_scale, ext=False),
        src_scale_ext=split_scale(g.src_scale, ext=True),
        chunk=c,
        depth=g.depth,
        num_chunks_global=b,
        axis_name=axis_name,
        halo_chunks=h,
        n_dev=n_dev,
        a_loc=jnp.asarray(a_loc_np),
        src_loc=jnp.asarray(src_loc_np),
        hal_a=jnp.asarray(hal_a_np),
        hal_src=jnp.asarray(hal_src_np),
        hal_dst=jnp.asarray(hal_dst_np),
        a_t=a_t,
        src_t=src_t,
        ds_kern=ds_kern,
        ss_kern=ss_kern,
        use_pallas=bool(use_pallas),
        b_ext_pad=b_ext_pad,
        depth_t=depth_t,
        a_dtype_name=g.a_dtype_name,
        a_loc_p=a_loc_p,
        a_t_p=a_t_p,
        a_pack=g.a_pack if a_loc_p is not None else 1,
    )


def sharded_specs(sg: ShardedBsda) -> ShardedBsda:
    """PartitionSpec pytree matching ShardedBsda for shard_map in_specs."""

    def opt(field, spec):
        return None if field is None else spec

    return dataclasses.replace(
        sg,
        a=P(NODE_AXIS, None, None, None, None),
        src_local=P(NODE_AXIS, None, None),
        res_nbr=tuple(P(NODE_AXIS, None, None) for _ in sg.res_nbr),
        res_w=tuple(P(NODE_AXIS, None, None) for _ in sg.res_w),
        res_dst=tuple(P(NODE_AXIS, None) for _ in sg.res_dst),
        rest_nbr=tuple(P(NODE_AXIS, None, None) for _ in sg.rest_nbr),
        rest_w=tuple(P(NODE_AXIS, None, None) for _ in sg.rest_w),
        rest_rows=opt(sg.rest_rows, P(NODE_AXIS, None)),
        rest_perm=opt(sg.rest_perm, P(NODE_AXIS, None)),
        res_rows=P(NODE_AXIS, None),
        res_perm=P(NODE_AXIS, None),
        dst_scale=opt(sg.dst_scale, P(NODE_AXIS, None)),
        src_scale_ext=opt(sg.src_scale_ext, P(NODE_AXIS, None)),
        a_loc=opt(sg.a_loc, P(NODE_AXIS, None, None, None, None)),
        src_loc=opt(sg.src_loc, P(NODE_AXIS, None, None)),
        hal_a=opt(sg.hal_a, P(NODE_AXIS, None, None, None, None)),
        hal_src=opt(sg.hal_src, P(NODE_AXIS, None, None)),
        hal_dst=opt(sg.hal_dst, P(NODE_AXIS, None)),
        a_t=opt(sg.a_t, P(NODE_AXIS, None, None, None, None)),
        src_t=opt(sg.src_t, P(NODE_AXIS, None, None)),
        ds_kern=opt(sg.ds_kern, P(NODE_AXIS, None)),
        ss_kern=opt(sg.ss_kern, P(NODE_AXIS, None)),
        a_loc_p=opt(sg.a_loc_p, P(NODE_AXIS, None, None, None, None)),
        a_t_p=opt(sg.a_t_p, P(NODE_AXIS, None, None, None, None)),
    )


def shard_slice(sg: ShardedBsda, d: int) -> ShardedBsda:
    """Device d's tables as leading-axis-1 views — exactly what shard_map
    delivers to shard d. Lets the per-shard computation (and the real
    Mosaic kernel binary it contains) be driven OUTSIDE shard_map, e.g. to
    validate every shard's kernel tables on a single chip
    (tools/verify_shard_kernels.py)."""
    return jax.tree.map(lambda a: a[d: d + 1], sg)


def shard_local_aggregate(sg: ShardedBsda, x_ext: jnp.ndarray,
                          out_dtype=None) -> jnp.ndarray:
    """One shard's full local aggregation given its halo-extended input
    rows x_ext [(B_loc + 2H) * C, F]: local-split dense kernel (Pallas on
    TPU) + halo fixup + width-bucketed residual spill. Returns the shard's
    local rows [B_loc * C, F]. `sg` holds the shard's leading-axis-1 table
    views (from shard_map splitting or `shard_slice`).

    Convenience wrapper for callers that hold a pre-assembled extended
    buffer (tools/verify_shard_kernels.py); the shard_map step calls
    _split_local_aggregate with the ppermute halves directly, so the local
    kernel keeps no data dependency on the exchange."""
    hc = sg.halo_chunks * sg.chunk
    n_loc = sg.a.shape[1] * sg.chunk
    return _split_local_aggregate(
        sg, x_ext[hc: hc + n_loc], x_ext[:hc], x_ext[hc + n_loc:],
        out_dtype=out_dtype,
    )


def _residual_spill(sg: ShardedBsda, x_ext: jnp.ndarray) -> jnp.ndarray:
    """Width-bucketed residual partial sums in sorted-destination order
    [R_u, F] (rows sg.res_rows)."""
    outs = [
        jnp.einsum(
            "rw,rwf->rf", w_k[0].astype(x_ext.dtype), x_ext[nbr_k[0]],
            preferred_element_type=jnp.float32,
        )
        for nbr_k, w_k in zip(sg.res_nbr, sg.res_w)
    ]
    return jnp.concatenate(outs, axis=0)[sg.res_perm[0]]


def sharded_bsda_spmm(sg: ShardedBsda, x_local: jnp.ndarray,
                      compute_dtype=None) -> jnp.ndarray:
    """Boundary-halo aggregation inside shard_map: ring-exchange the H
    boundary chunks with both neighbors, OVERLAPPED with the local-split
    dense kernel (which reads only x_local); the halo fixup + residual
    spill then read the extended buffer. x_local/returns: [N_loc, F].

    The shard_map caller passes the per-device slice of the stacked tables
    (leading axis length 1)."""
    hc = sg.halo_chunks * sg.chunk
    axis = sg.axis_name
    n_dev = sg.n_dev
    out_dtype = x_local.dtype
    xc = (
        x_local.astype(compute_dtype) if compute_dtype is not None else x_local
    )

    # ---- boundary-only halo exchange (2*H*C rows per direction) ----
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    halo_l = jax.lax.ppermute(xc[-hc:], axis, fwd)  # left nbr's tail
    halo_r = jax.lax.ppermute(xc[:hc], axis, bwd)   # right nbr's head
    # (ring wraparound delivers garbage to the edge devices, but no source
    # chunk index ever points there — src ids are window-validated at
    # partition time)

    return _split_local_aggregate(sg, xc, halo_l, halo_r,
                                  out_dtype=out_dtype)


def sharded_gat_attend(sg: ShardedBsda, x_proj: jnp.ndarray,
                       alpha_src: jnp.ndarray, alpha_dst: jnp.ndarray,
                       negative_slope: float = 0.2) -> jnp.ndarray:
    """GAT segment-softmax attention inside shard_map (VERDICT r3 #8: the
    explicit halo path, model-family agnostic).

    The per-destination softmax is LOCAL once the destination's sources
    are present: every source of a local destination chunk lies within the
    halo window (partition_bsda window-validates dense slots AND residual
    sources), so the same boundary-only exchange that powers the linear
    aggregation powers attention — the exchanged payload is
    [ x_proj | a_src ] rows (a_dst is only read at destinations, which are
    local). Per shard this runs the XLA dense chunk-pair formulation of
    kernels/bsda_gat.py (scores masked by the multiplicity pattern, fused
    max/exp, ones-column einsum) on the halo-extended tables, plus the
    width-bucketed residual-spill partials merged with a streaming
    softmax. shard_map AD differentiates straight through (ppermute
    transposes itself), so every loss composes.

    x_proj [N_loc, H, Ch], alpha_src/alpha_dst [N_loc, H] (the shard's
    slice of the globally chunk-padded arrays; padded rows carry zeros —
    harmless, the multiplicity mask excludes them). Returns [N_loc, H, Ch].
    `sg` must be built from a 'gat'-kind BsdaGraph (self-looped edge set,
    unit multiplicities; reference src/models/gnn.py:56-76 semantics).
    """
    hc_rows = sg.halo_chunks * sg.chunk
    axis = sg.axis_name
    n_dev = sg.n_dev
    n_loc, h, ch = x_proj.shape
    hch = h * ch
    b_loc = sg.a.shape[1]
    c = sg.chunk
    neg_inf = -1e30

    # ---- boundary-only halo exchange of [ x_proj | a_src ] ----
    payload = jnp.concatenate(
        [x_proj.reshape(n_loc, hch).astype(jnp.float32),
         alpha_src.astype(jnp.float32)], axis=1,
    )
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    halo_l = jax.lax.ppermute(payload[-hc_rows:], axis, fwd)
    halo_r = jax.lax.ppermute(payload[:hc_rows], axis, bwd)
    pay_ext = jnp.concatenate([halo_l, payload, halo_r], axis=0)
    xp_ext = pay_ext[:, :hch].reshape(-1, h, ch)
    asrc_ext = pay_ext[:, hch:]                       # [N_ext, H]
    adst = alpha_dst.astype(jnp.float32)              # [N_loc, H]

    mult = sg.a[0]                                    # [B_loc, D, C, C]
    src = sg.src_local[0]                             # [B_loc, D] ext chunks
    valid = mult > 0
    adst3 = adst.reshape(b_loc, c, h)
    asrc_ext3 = asrc_ext.reshape(-1, c, h)
    xp_ext3 = xp_ext.reshape(-1, c, h, ch)

    ms, ss, accs = [], [], []
    for head in range(h):
        asrc_chunks = asrc_ext3[:, :, head][src]      # [B_loc, D, C]
        adst_h = adst3[:, :, head]                    # [B_loc, C]

        def scores():
            return jnp.where(
                valid,
                jax.nn.leaky_relu(
                    asrc_chunks[:, :, None, :] + adst_h[:, None, :, None],
                    negative_slope,
                ),
                neg_inf,
            )

        m_h = jnp.max(scores(), axis=(1, 3))          # [B_loc, C]
        e = (jnp.exp(scores() - m_h[:, None, :, None])
             * mult.astype(jnp.float32))
        e_dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
        e = e.astype(e_dtype)
        xp_h = xp_ext3[:, :, head, :].astype(e_dtype)[src]  # [B_loc,D,C,Ch]
        xp_e = jnp.concatenate(
            [xp_h, jnp.ones(xp_h.shape[:-1] + (1,), xp_h.dtype)], axis=-1
        )
        acc_ext = jnp.einsum(
            "bdij,bdjf->bif", e, xp_e, preferred_element_type=jnp.float32
        )
        # fence heads so XLA keeps each head's score pipeline fused
        # (bsda_gat.py measured ~1.3 GB of transients without it)
        m_h, s_h, acc_h = jax.lax.optimization_barrier(
            (m_h, acc_ext[..., -1], acc_ext[..., :-1])
        )
        ms.append(m_h.reshape(-1))
        ss.append(s_h.reshape(-1))
        accs.append(acc_h.reshape(-1, ch))
    m = jnp.stack(ms, axis=1)                         # [N_loc, H]
    s = jnp.stack(ss, axis=1)
    acc = jnp.stack(accs, axis=1)                     # [N_loc, H, Ch]

    # ---- residual-spill attention partials (width-bucketed) ----
    if sg.res_rows.shape[1] > 0 and len(sg.res_nbr) > 0:
        m2p, s2p, acc2p = [], [], []
        for nbr_k, w_k, dst_k in zip(sg.res_nbr, sg.res_w, sg.res_dst):
            nbr = nbr_k[0]                            # [R_k, W_k] ext ids
            w = w_k[0]                                # [R_k, W_k] mult
            dst = jnp.clip(dst_k[0], 0, n_loc - 1)    # pad rows clamp
            sc = jax.nn.leaky_relu(
                asrc_ext[nbr] + adst[dst][:, None, :], negative_slope
            )                                         # [R_k, W_k, H]
            sc = jnp.where((w > 0)[:, :, None], sc, neg_inf)
            m_l = jnp.max(sc, axis=1)                 # [R_k, H]
            e_l = jnp.exp(sc - m_l[:, None, :]) * w[:, :, None]
            s_l = e_l.sum(axis=1)
            acc_l = jnp.einsum(
                "rwh,rwhf->rhf", e_l, xp_ext[nbr],
                preferred_element_type=jnp.float32,
            )
            m2p.append(m_l)
            s2p.append(s_l)
            acc2p.append(acc_l)
        m2 = jnp.concatenate(m2p)[sg.res_perm[0]]     # sorted-dest order
        s2 = jnp.concatenate(s2p)[sg.res_perm[0]]
        acc2 = jnp.concatenate(acc2p)[sg.res_perm[0]]

        rows = sg.res_rows[0]                         # unique sorted local
        rows_c = jnp.clip(rows, 0, n_loc - 1)
        cur_m = m[rows_c]
        cur_s = s[rows_c]
        cur_acc = acc[rows_c]
        # padded entries (rows == n_loc) must not alter the merge source;
        # give them a NEG_INF spill partial so the merge is the identity
        live = (rows < n_loc)[:, None]
        m2 = jnp.where(live, m2, neg_inf)
        s2 = jnp.where(live, s2, 0.0)
        acc2 = jnp.where(live[..., None], acc2, 0.0)
        big = jnp.maximum(cur_m, m2)
        w1 = jnp.exp(cur_m - big)
        w2 = jnp.exp(m2 - big)
        s_m = cur_s * w1 + s2 * w2
        acc_m = cur_acc * w1[..., None] + acc2 * w2[..., None]
        s = s.at[rows].set(s_m, mode="drop", indices_are_sorted=True,
                           unique_indices=True)
        acc = acc.at[rows].set(acc_m, mode="drop", indices_are_sorted=True,
                               unique_indices=True)

    return (acc / jnp.maximum(s, 1e-16)[..., None]).astype(x_proj.dtype)


def _local_view(sg: ShardedBsda):
    """BsdaGraph view of the LOCAL split tables: the banded kernel (or the
    XLA einsum impl off-TPU) runs on x_local in local chunk coordinates —
    a strictly smaller grid than the shard's old ext-shaped kernel, with
    no data dependency on the halo exchange."""
    from ..kernels.bsda import BsdaGraph

    c = sg.chunk
    hc = sg.halo_chunks * c
    b_loc = sg.a.shape[1]
    n_loc = b_loc * c
    return BsdaGraph(
        a=sg.a_loc[0], src_chunk=sg.src_loc[0], residual=None,
        residual_rows=None, num_nodes=n_loc, num_chunks=b_loc,
        depth=sg.depth, n_pad=0, a_dtype_name=sg.a_dtype_name, chunk=c,
        use_pallas_kernel=sg.use_pallas, max_chunk_dist=sg.halo_chunks,
        dst_scale=None if sg.dst_scale is None else sg.dst_scale[0],
        src_scale=(
            None if sg.src_scale_ext is None
            else jax.lax.slice_in_dim(sg.src_scale_ext[0], hc, hc + n_loc)
        ),
        a_packed=None if sg.a_loc_p is None else sg.a_loc_p[0],
        a_pack=sg.a_pack if sg.a_loc_p is not None else 1,
    )


def _halo_fixup(sg: ShardedBsda, xe: jnp.ndarray) -> jnp.ndarray:
    """Boundary destination chunks' halo-source contributions
    [K_h, C, F] f32 (chunk rows sg.hal_dst), read from the halo-extended
    buffer — the only dense compute that waits on the exchange."""
    c = sg.chunk
    b_loc = sg.a.shape[1]
    f = xe.shape[-1]
    xe3 = xe.reshape(-1, c, f)
    gath = xe3[sg.hal_src[0]]  # [K_h, D_h, C, F]
    if sg.src_scale_ext is not None:
        ss3 = sg.src_scale_ext[0].reshape(-1, c)
        gath = gath * ss3[sg.hal_src[0]][..., None].astype(gath.dtype)
    fix = jnp.einsum(
        "kdij,kdjf->kif", sg.hal_a[0].astype(gath.dtype), gath,
        preferred_element_type=jnp.float32,
    )
    if sg.dst_scale is not None:
        ds3 = sg.dst_scale[0].reshape(b_loc, c)
        fix = fix * ds3[jnp.clip(sg.hal_dst[0], 0, b_loc - 1)][..., None]
    return fix


def _apply_ext_terms(sg: ShardedBsda, out: jnp.ndarray,
                     xe: jnp.ndarray) -> jnp.ndarray:
    """Scatter the halo fixup and the residual spill into the local dense
    result (unique+sorted dropped-pad scatters)."""
    c = sg.chunk
    b_loc = sg.a.shape[1]
    f = out.shape[-1]
    fix = _halo_fixup(sg, xe)
    out3 = out.reshape(b_loc, c, f).at[sg.hal_dst[0]].add(
        fix.astype(out.dtype), mode="drop", indices_are_sorted=True,
        unique_indices=True,
    )
    out = out3.reshape(b_loc * c, f)
    spill = _residual_spill(sg, xe)
    return out.at[sg.res_rows[0]].add(
        spill.astype(out.dtype), mode="drop", indices_are_sorted=True,
        unique_indices=True,
    )


def _split_local_aggregate(sg: ShardedBsda, x_loc: jnp.ndarray,
                           halo_l: jnp.ndarray, halo_r: jnp.ndarray,
                           out_dtype=None) -> jnp.ndarray:
    """One shard's aggregation from its local rows + the two halo halves:
    the local-split dense kernel reads ONLY x_loc (no data dependency on
    the ppermutes, so XLA schedules it while the exchange flies — the
    SURVEY §2.3 comm/compute overlap), then the halo fixup einsum and the
    width-bucketed residual spill read the extended buffer and scatter
    into the kernel result."""
    if out_dtype is None:
        out_dtype = x_loc.dtype
    if sg.use_pallas:
        return _pallas_split_aggregate(
            sg, x_loc, halo_l, halo_r
        ).astype(out_dtype)
    # einsum path: same structure, plain autodiff backward (no Mosaic
    # call in the module, so no ordering discipline needed)
    from ..kernels.bsda import _bsda_spmm_impl

    out = _bsda_spmm_impl(_local_view(sg), x_loc, None)
    xe = jnp.concatenate([halo_l, x_loc, halo_r], axis=0)
    return _apply_ext_terms(sg, out, xe).astype(out_dtype)


def _pallas_split_aggregate(sg: ShardedBsda, x_loc: jnp.ndarray,
                            halo_l: jnp.ndarray,
                            halo_r: jnp.ndarray) -> jnp.ndarray:
    """Per-shard dense aggregation through the banded Pallas kernel on the
    LOCAL split tables PLUS halo fixup and residual spill, under one
    custom VJP.

    Forward: local kernel FIRST (independent of the halos — overlaps the
    ppermutes), then the fixup/residual gathers read the extended buffer
    BARRIERED after the kernel, and the scatters land strictly after,
    into its result. The barrier order exists because XLA otherwise
    schedules gathers/scatters concurrently with the pallas custom call,
    which crashes the TPU worker on n>1 shard tables (round-4 13-step
    bisect, tools/verify_shard_kernels.py; a multiply-by-zero token is
    NOT safe — the algebraic simplifier folds it away).

    Backward: hand-written residual cotangent (transpose-residual tables:
    bucketed gathers/einsums + one unique+sorted dropped-pad scatter)
    computed first and barriered before the block-transpose kernel
    (autodiff cannot see inside pallas_call; the transposed encoding is
    also ~2x faster than the chunk scatter-add autodiff would emit), then
    the scatter into the kernel result — the exact op order of the
    (stable) forward."""
    from ..kernels.bsda import BsdaGraph, _bsda_spmm_impl
    from ..kernels.pallas_bsda import _forward as _pallas_forward

    if jax.default_backend() == "tpu":
        _forward = _pallas_forward
    else:
        # interpret-mode pallas cannot run under shard_map check_vma (the
        # HLO interpreter's internal buffers carry no vma); off-TPU the
        # same local/transpose tables run through the XLA einsum impl —
        # the identical math, so CPU tests still verify this path's
        # tables and custom VJP
        def _forward(g, xe):
            return _bsda_spmm_impl(g, xe, None)

    c, h = sg.chunk, sg.halo_chunks
    b_loc = sg.a.shape[1]
    n_loc = b_loc * c
    b_ext_pad = sg.b_ext_pad
    n_ext = n_loc + 2 * h * c

    g_loc = _local_view(sg)
    # backward: ct_ext = ss .* (A^T @ (ds .* ct)) — roles of the factored
    # scales swap (the kernel view's dst scale becomes ss over ext rows).
    # a_t transposes the FULL per-shard table (local + halo blocks), so
    # one kernel covers both forward terms' cotangents.
    g_bwd = BsdaGraph(
        a=sg.a_t[0], src_chunk=sg.src_t[0], residual=None,
        residual_rows=None, num_nodes=b_ext_pad * c, num_chunks=b_ext_pad,
        depth=sg.depth_t, n_pad=0, a_dtype_name=sg.a_dtype_name, chunk=c,
        use_pallas_kernel=True, max_chunk_dist=h,
        dst_scale=None if sg.ss_kern is None else sg.ss_kern[0],
        src_scale=None if sg.ds_kern is None else sg.ds_kern[0],
        a_packed=None if sg.a_t_p is None else sg.a_t_p[0],
        a_pack=sg.a_pack if sg.a_t_p is not None else 1,
    )

    def _run(xl, hl, hr):
        out = _forward(g_loc, xl)
        xe = jnp.concatenate([hl, xl, hr], axis=0)
        # module discipline: the extended buffer (every fixup/residual
        # gather's operand) passes through an optimization_barrier with
        # the kernel output, so no gather can be scheduled concurrently
        # with the Mosaic call; the scatters go into `out` — strictly
        # after the kernel
        xe, out = jax.lax.optimization_barrier((xe, out))
        return _apply_ext_terms(sg, out, xe)

    @jax.custom_vjp
    def agg(xl, hl, hr):
        return _run(xl, hl, hr)

    def agg_fwd(xl, hl, hr):
        out = _run(xl, hl, hr)
        # token residual: a slice of the forward output, barriered into
        # the backward below. Under jax.grad the primal's pallas_call can
        # remain in the module with its output otherwise UNUSED (custom
        # calls are not DCE'd), leaving it unordered against the
        # backward's gathers/scatters — the final unordered pair behind
        # the flaky TPU worker crashes. The token chains
        # fwd-kernel -> backward.
        return out, out[:1, :1]

    def agg_bwd(res, ct):
        ct, _tok = jax.lax.optimization_barrier((ct, res))
        f = ct.shape[1]
        # ---- residual backward via the TRANSPOSE-residual tables: the
        # same bucketed-gather/einsum + one unique+sorted dropped-pad
        # scatter structure as the forward (linear in ct, needs no saved
        # values). d x_ext[j] = sum_{e: src=j} w_e * ct[dst_e]; rest_nbr
        # holds local destination rows, padded entries carry w=0 so the
        # clipped gather contributes nothing. ----
        outs = [
            jnp.einsum(
                "rw,rwf->rf", w_k[0].astype(ct.dtype),
                ct[jnp.clip(nbr_k[0], 0, n_loc - 1)],
                preferred_element_type=jnp.float32,
            )
            for nbr_k, w_k in zip(sg.rest_nbr, sg.rest_w)
        ]
        d_sorted = jnp.concatenate(outs, axis=0)[sg.rest_perm[0]]
        # gathers, barrier, kernel, scatter into the kernel result
        ct_k, d_sorted = jax.lax.optimization_barrier((ct, d_sorted))
        ctp = jnp.concatenate([
            jnp.zeros((h * c, f), ct.dtype),
            ct_k,
            jnp.zeros((b_ext_pad * c - (h * c + n_loc), f), ct.dtype),
        ], axis=0)
        ct_ext = jax.lax.slice_in_dim(_forward(g_bwd, ctp), 0, n_ext)
        d_xe = ct_ext.at[sg.rest_rows[0]].add(
            d_sorted.astype(ct_ext.dtype), mode="drop",
            indices_are_sorted=True, unique_indices=True,
        )
        hc = h * c
        return (
            jax.lax.slice_in_dim(d_xe, hc, hc + n_loc),
            jax.lax.slice_in_dim(d_xe, 0, hc),
            jax.lax.slice_in_dim(d_xe, hc + n_loc, n_ext),
        )

    agg.defvjp(agg_fwd, agg_bwd)
    return agg(x_loc, halo_l, halo_r)


def make_shardmap_train_step(mesh: Mesh, model, tx, loss_parts: Tuple,
                             sg: ShardedBsda):
    """Build the explicit-collective train step.

    loss_parts: (loss_vec_fn, penalty_fn) from losses.make_loss_parts —
    ANY reference loss (weighted CE, focal, time-weighted, + time-embed
    L2) composes here, because each is a per-sample vector whose masked
    mean reduces with explicit psums (global numerator/denominator over
    train rows across chips) plus a penalty on the replicated params added
    after the reduction — identical math to the single-device step.
    Returns step(params, state, opt_state, rng, x, y, ts, tmask, row_mask,
    sg) -> (params, state, opt_state, loss, probs) with x/y/ts/tmask/
    row_mask row-sharded on the `nodes` axis and probs the post-update eval
    P(illicit) for every (sharded) row — so the trainer's fused-epoch
    contract works unchanged. `sg` is a call argument (closing over the
    chunk tables would embed them in the compile payload — pathological on
    remote-compile relays).
    """
    import optax

    loss_vec_fn, penalty_fn = loss_parts
    axis = sg.axis_name
    p_rep = P()
    p_row = P(NODE_AXIS)
    p_row2 = P(NODE_AXIS, None)
    sg_specs = sharded_specs(sg)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(p_rep, p_rep, p_rep, p_rep, p_row2, p_row, p_row, p_row,
                  p_row, sg_specs),
        out_specs=(p_rep, p_rep, p_rep, p_rep, p_row),
        check_vma=True,
    )
    def step(params, state, opt_state, rng, x, y, ts, tmask, row_mask, sg_loc):
        # de-correlate dropout across chips (each chip draws masks for its
        # own rows)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def lf(p):
            logits, new_state = model.apply(
                p, state, x, sg_loc, ts, training=True, rng=rng,
                axis_name=axis, row_mask=row_mask,
            )
            vec = loss_vec_fn(logits, y.astype(jnp.int32), ts)
            num = jax.lax.psum((vec * tmask).sum(), axis)
            den = jax.lax.psum(tmask.sum(), axis)
            return num / jnp.maximum(den, 1.0) + penalty_fn(p), new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        # with vma (replication) tracking, AD inserts the gradient psum at
        # the replicated->varying boundary itself; no manual all-reduce
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        logits_eval, _ = model.apply(
            new_params, new_state, x, sg_loc, ts, training=False,
            axis_name=axis, row_mask=row_mask,
        )
        probs = jax.nn.softmax(logits_eval, axis=1)[:, 1]
        return new_params, new_state, new_opt, loss, probs

    @jax.jit
    def jitted(params, state, opt_state, rng, x, y, ts, tmask, row_mask,
               sg_arg=None):
        return step(params, state, opt_state, rng, x, y, ts, tmask,
                    row_mask, sg if sg_arg is None else sg_arg)

    return jitted
