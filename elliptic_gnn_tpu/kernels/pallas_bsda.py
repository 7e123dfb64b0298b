"""Pallas BSDA-SpMM: banded G-chunked block-sparse aggregation, zero gathers.

The XLA BSDA path (kernels/bsda.py) materializes the gathered source chunks
x3[src_chunk] — a [B, D, C, F] HBM round-trip (docs/PERF_NOTES.md "What the
compiled HLO shows"). This kernel removes it by exploiting a structural
property of the BFS-clustered ordering: every kept source chunk lies within
max_chunk_dist (<= 3 at Elliptic scale) of its destination chunk. Grouping
G >= max_chunk_dist destination chunks per grid step, all source chunks for
the group live in the previous/current/next G-block window:

  ring variant (single feature tile, the production shape):
    grid = (B/G,); a 4-slot VMEM ring holds G-blocks of x — block gb lives
    at ring slot gb % 4, one async HBM->VMEM block copy per step fetched
    two steps ahead, so x streams exactly ONCE. A-blocks and out-blocks
    auto-pipeline through BlockSpecs.
  window variant (multi-tile features / tiny graphs):
    three shifted auto-pipelined BlockSpecs stage the prev/cur/next
    G-blocks into a VMEM scratch window (x streams 3x).

Factored-scale encodings (BsdaGraph.dst_scale/src_scale, a_dtype int8)
apply the per-node scales in-kernel: the full [B, C] scale tables are tiny
(~0.8 MB) and live wholly in VMEM, so the dominant HBM stream is the int8
multiplicity table — 4x smaller than f32 weights. bf16/int8 A-tables dot in
bf16 with f32 accumulation — the same operand demotion XLA applies to f32
matmuls on TPU.

The residual spill (slots beyond depth, or outside the window on non-local
graphs) runs in XLA. Backward = the same kernel on the transposed encoding
(jax.custom_vjp), like bsda_spmm.

Works under interpret mode off-TPU (tests); compiles with Mosaic on TPU.
Replaces torch_scatter/pyg_lib CUDA segment kernels (reference
models/gnn.py:8) at the aggregation layer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsda import BsdaGraph

FEAT_TILE = 128
GROUP = 8  # destination chunks per grid step (also the window half-width)
RING = 4   # x-block ring slots (window needs 3; the 4th absorbs prefetch)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _out_shape(shape, x) -> jax.ShapeDtypeStruct:
    """Out aval for pallas_call. Under shard_map with check_vma=True the
    output must declare which mesh axes it varies over — inherit x's vma
    (the kernel is elementwise in the sharded chunk axis)."""
    vma = getattr(jax.typeof(x), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, x.dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, x.dtype)


def _mxu_dtype(a_dtype, x_dtype):
    # MXU runs bf16 natively (~6x the f32 rate): dot in bf16 with f32
    # accumulation whenever either operand is already bf16 (a bf16 A-table
    # is pre-rounded; bf16 x is the amp path — the same operand demotion
    # XLA applies on TPU). int8 multiplicity tables follow x's dtype so
    # f32 pipelines stay exact.
    if a_dtype == jnp.bfloat16 or x_dtype == jnp.bfloat16:
        return jnp.bfloat16
    return x_dtype


def _slot_compute(src_ref, a_ref, ds_ref, ss_ref, out_ref, read_chunk,
                  base, g_chunks, d, mxu, pack=1):
    """Shared inner loop: G destination chunks x D slots of MXU dots with
    factored scales applied in-VMEM.

    pack > 1: a_ref holds bit-packed planes ([G, ceil(D/pack), C, C]
    uint8, `pack` depth slots per byte — see bsda.pack_a_planes). The
    unpack is a shift+mask on the VPU per block, traded for a pack-x
    smaller A-table HBM stream (the dominant stream of the aggregation).
    The u8->i32 widening of each plane is hoisted out of the slot loop
    (all `pack` slots share it); at depth 3 / pack 4 that removes 2 of 3
    converts from the per-step VPU chain, which profiling shows sits on
    the packed kernel's critical path (docs/PERF_NOTES.md round 4)."""
    bits = 8 // pack
    mask = (1 << bits) - 1
    n_planes = -(-d // pack)
    for g_i in range(g_chunks):
        planes = (
            [a_ref[g_i, p].astype(jnp.int32) for p in range(n_planes)]
            if pack > 1 else None
        )
        acc = None
        for d_i in range(d):
            src = src_ref[base + g_i, d_i]
            rhs = read_chunk(src).astype(mxu)
            if ss_ref is not None:
                rhs = rhs * ss_ref[src][:, None].astype(mxu)
            if pack == 1:
                a_blk = a_ref[g_i, d_i].astype(mxu)
            else:
                u = planes[d_i // pack]
                sh = bits * (d_i % pack)
                a_blk = (((u >> sh) if sh else u) & mask).astype(mxu)
            part = jax.lax.dot(
                a_blk, rhs,
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        if ds_ref is not None:
            acc = acc * ds_ref[base + g_i][:, None]
        out_ref[g_i] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "ft", "has_ds", "has_ss", "pack"),
)
def _banded_call(src_chunk, a, x3, ds2, ss2, *, c, g_chunks, d, ft,
                 has_ds, has_ss, pack=1):
    """Window variant: x supplied through three shifted BlockSpecs.
    All encoding tables are jit arguments (closures would upload hundreds
    of MB per executable on remote-compile relays)."""
    b_pad = a.shape[0]
    nb = b_pad // g_chunks
    f = x3.shape[-1]
    n_ft = f // ft
    mxu = _mxu_dtype(a.dtype, x3.dtype)

    def kernel(src_ref, a_ref, x_prv, x_cur, x_nxt, ds_ref, ss_ref,
               out_ref, xw):
        bi = pl.program_id(0)
        base = bi * g_chunks

        # stage the 3G-chunk source window into one scratch ref (values
        # can't be dynamically sliced under Mosaic; refs can). Clamped index
        # maps make the boundary blocks duplicates of valid ones, but
        # src_chunk never points outside [0, B) so those are never selected.
        xw[0:g_chunks] = x_prv[...].astype(mxu)
        xw[g_chunks:2 * g_chunks] = x_cur[...].astype(mxu)
        xw[2 * g_chunks:3 * g_chunks] = x_nxt[...].astype(mxu)

        def read_chunk(src):
            return xw[src - base + g_chunks]

        _slot_compute(
            src_ref, a_ref, ds_ref if has_ds else None,
            ss_ref if has_ss else None, out_ref, read_chunk,
            base, g_chunks, d, mxu, pack=pack,
        )

    d_planes = a.shape[1]  # = ceil(d / pack)
    full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # src_chunk table
        grid=(nb, n_ft),
        in_specs=[
            pl.BlockSpec(
                (g_chunks, d_planes, c, c),
                lambda bi, fi, src: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_chunks, c, ft),
                lambda bi, fi, src: (jnp.maximum(bi - 1, 0), 0, fi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_chunks, c, ft),
                lambda bi, fi, src: (bi, 0, fi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_chunks, c, ft),
                lambda bi, fi, src: (jnp.minimum(bi + 1, nb - 1), 0, fi),
                memory_space=pltpu.VMEM,
            ),
            full_vmem,  # dst scale [B, C], wholly VMEM-resident
            full_vmem,  # src scale [B, C]
        ],
        out_specs=pl.BlockSpec(
            (g_chunks, c, ft),
            lambda bi, fi, src: (bi, 0, fi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((3 * g_chunks, c, ft), mxu)],
    )

    return pl.pallas_call(
        kernel,
        out_shape=_out_shape((b_pad, c, f), x3),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * c * c * f,
            bytes_accessed=(
                int(np.prod(a.shape)) * a.dtype.itemsize
                + 3 * b_pad * c * f * x3.dtype.itemsize
                + b_pad * c * f * x3.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(src_chunk, a, x3, x3, x3, ds2, ss2)


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "has_ds", "has_ss", "pack"),
)
def _ring_call(src_chunk, a, x3, ds2, ss2, *, c, g_chunks, d, has_ds,
               has_ss, pack=1):
    """Ring variant (single feature tile): x stays in HBM and streams
    exactly once through a 4-slot VMEM ring of G-blocks, fetched two grid
    steps ahead so the copy hides behind compute. Block gb occupies ring
    slot gb % RING, so source lookups never need relabeling."""
    b_pad = a.shape[0]
    nb = b_pad // g_chunks
    f = x3.shape[-1]
    mxu = _mxu_dtype(a.dtype, x3.dtype)

    def kernel(src_ref, a_ref, x_hbm, ds_ref, ss_ref, out_ref, ring, sem):
        bi = pl.program_id(0)
        base = bi * g_chunks

        def block_copy(gb):
            slot = jax.lax.rem(gb, RING)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(gb * g_chunks, g_chunks)],
                ring.at[pl.ds(slot * g_chunks, g_chunks)],
                sem,
            )

        @pl.when(bi == 0)
        def _():
            # warm-up: blocks 0 and 1 synchronously, then prefetch block 2
            cp = block_copy(0)
            cp.start()
            cp.wait()

            @pl.when(nb > 1)
            def _():
                cp1 = block_copy(1)
                cp1.start()
                cp1.wait()

            @pl.when(nb > 2)
            def _():
                block_copy(2).start()

        @pl.when(jnp.logical_and(bi > 0, bi + 1 < nb))
        def _():
            block_copy(bi + 1).wait()  # issued two steps ago

        @pl.when(jnp.logical_and(bi > 0, bi + 2 < nb))
        def _():
            block_copy(bi + 2).start()

        def read_chunk(src):
            gb = src // g_chunks
            return ring[jax.lax.rem(gb, RING) * g_chunks + src % g_chunks]

        _slot_compute(
            src_ref, a_ref, ds_ref if has_ds else None,
            ss_ref if has_ss else None, out_ref, read_chunk,
            base, g_chunks, d, mxu, pack=pack,
        )

    d_planes = a.shape[1]  # = ceil(d / pack)
    full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (g_chunks, d_planes, c, c),
                lambda bi, src: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # x3 stays in HBM
            full_vmem,  # dst scale [B, C]
            full_vmem,  # src scale [B, C]
        ],
        out_specs=pl.BlockSpec(
            (g_chunks, c, f),
            lambda bi, src: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((RING * g_chunks, c, f), x3.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=_out_shape((b_pad, c, f), x3),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * c * c * f,
            bytes_accessed=(
                int(np.prod(a.shape)) * a.dtype.itemsize
                + 2 * b_pad * c * f * x3.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(src_chunk, a, x3, ds2, ss2)


def _forward(g: BsdaGraph, x: jnp.ndarray) -> jnp.ndarray:
    n0, f0 = x.shape
    c = g.chunk
    b = g.num_chunks
    d = g.depth
    # the window property requires G >= max chunk distance; cap for VMEM
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    if g_chunks > 64 or b < 2:
        from .bsda import _bsda_spmm_impl  # non-local graph: XLA fallback

        return _bsda_spmm_impl(g, x, None)

    # NB on module discipline: the n>1 SHARD path orders the residual's
    # gathers/scatters against the Mosaic kernel with optimization_barrier
    # (parallel/shardmap_step.py::_pallas_split_aggregate) because the
    # unordered combination crashes the TPU worker on shard tables. The
    # single-device module here has never exhibited the crash (Elliptic-
    # scale production across four rounds + dedicated small-table
    # bisects), and adding the barrier measurably serializes the whole
    # epoch module (+13 ms/epoch: every kernel call became a schedule
    # fence), so it stays barrier-free; the spill scatter already lands
    # after the kernel by dataflow.

    # Mosaic DMA slices must be 128-lane aligned: pad features to the lane
    # tile (hidden_dim 64 models). XLA fuses the zero-pad into the producer.
    ft = FEAT_TILE
    pad_f = (-f0) % ft
    if pad_f:
        x = jnp.concatenate([x, jnp.zeros((n0, pad_f), x.dtype)], axis=1)
    pad_n = b * c - n0
    if pad_n:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_n, x.shape[1]), x.dtype)], axis=0
        )
    f = x.shape[1]
    x3 = x.reshape(b, c, f)

    # pad the chunk axis to a multiple of G (zero blocks, window-local srcs)
    pad_b = (-b) % g_chunks
    # bit-packed A-planes when available: same kernel, pack-x smaller
    # dominant HBM stream (unpacked by shift+mask in _slot_compute)
    pack = g.a_pack if g.a_packed is not None else 1
    a = g.a_packed if pack > 1 else g.a
    src_chunk = g.src_chunk
    b_pad = b + pad_b
    if pad_b:
        a = jnp.concatenate(
            [a, jnp.zeros((pad_b,) + a.shape[1:], a.dtype)], axis=0
        )
        src_chunk = jnp.concatenate(
            [src_chunk, jnp.full((pad_b, d), b - 1, src_chunk.dtype)], axis=0
        )
        x3 = jnp.concatenate(
            [x3, jnp.zeros((pad_b, c, f), x3.dtype)], axis=0
        )

    def scale2(s):
        if s is None:
            return jnp.ones((b_pad, c), jnp.float32)
        s2 = s.reshape(b, c)
        if pad_b:
            s2 = jnp.concatenate(
                [s2, jnp.zeros((pad_b, c), s2.dtype)], axis=0
            )
        return s2

    ds2 = scale2(g.dst_scale)
    ss2 = scale2(g.src_scale)

    nb = b_pad // g_chunks
    if f == ft and nb > RING:
        out = _ring_call(src_chunk, a, x3, ds2, ss2, c=c,
                         g_chunks=g_chunks, d=d, pack=pack,
                         has_ds=g.dst_scale is not None,
                         has_ss=g.src_scale is not None)
    else:
        out = _banded_call(src_chunk, a, x3, ds2, ss2, c=c,
                           g_chunks=g_chunks, d=d, ft=ft, pack=pack,
                           has_ds=g.dst_scale is not None,
                           has_ss=g.src_scale is not None)

    out = out.reshape(-1, f)[:n0, :f0]
    if g.residual is not None:
        from .bsda import _residual_spmm

        spill = _residual_spmm(g.residual, x[:n0, :f0], None)
        out = out.at[g.residual_rows].add(
            spill.astype(out.dtype), unique_indices=True,
            indices_are_sorted=True,
        )
    return out


def pallas_bsda_spmm(g: BsdaGraph, x: jnp.ndarray,
                     compute_dtype=None) -> jnp.ndarray:
    """out = A_w @ x via the banded Pallas kernel; gradients flow through
    the transposed encoding when present, else through the XLA path
    (autodiff can't see inside pallas_call)."""
    out_dtype = x.dtype
    xc = x.astype(compute_dtype) if compute_dtype is not None else x

    if g.transpose is not None:
        g_t = g.transpose

        @jax.custom_vjp
        def fwd(xc):
            return _forward(g, xc)

        def f_fwd(xc):
            return _forward(g, xc), None

        def f_bwd(_res, ct):
            return (_forward(g_t, ct.astype(xc.dtype)),)

        fwd.defvjp(f_fwd, f_bwd)
        return fwd(xc).astype(out_dtype)
    return _forward(g, xc).astype(out_dtype)
