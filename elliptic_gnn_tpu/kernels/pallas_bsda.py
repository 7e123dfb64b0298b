"""Pallas BSDA-SpMM: banded G-chunked block-sparse aggregation, zero gathers.

The XLA BSDA path (kernels/bsda.py) materializes the gathered source chunks
x3[src_chunk] — a [B, D, C, F] HBM round-trip (docs/PERF_NOTES.md "What the
compiled HLO shows"). This kernel removes it by exploiting a structural
property of the BFS-clustered ordering: every kept source chunk lies within
max_chunk_dist (<= 2 at Elliptic scale) of its destination chunk. Grouping
G >= max_chunk_dist destination chunks per grid step, all source chunks for
the group live in the previous/current/next G-block window, so they arrive
through three shifted auto-pipelined BlockSpecs — no row gathers, no
per-chunk DMAs (the round-1 designs that lost to per-step overhead and to
DMA-vs-cache asymmetry; see PERF_NOTES "round-2 Pallas iterations"):

    grid = (B/G, F/FT)                       # ~199 steps at G=8
    A block     [G, D, C, C]  <- a[bi*G : (bi+1)*G]       (auto-pipelined)
    x windows   [G, C, FT] x3 <- x3 at block bi-1, bi, bi+1
    out block   [G, C, FT]
    kernel: for each (g, d) slot, pick the source chunk out of the 3G-wide
    window by the prefetched src_chunk table, one MXU dot per slot,
    accumulate in VMEM registers.

bf16 A-tables dot in bf16 with f32 accumulation — the same operand demotion
XLA applies to f32 matmuls on TPU. The residual spill (slots beyond depth,
or outside the window on non-local graphs) runs in XLA. Backward = the same
kernel on the transposed encoding (jax.custom_vjp), like bsda_spmm.

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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("c", "g_chunks", "d", "ft"))
def _banded_call(src_chunk, a, x3, *, c, g_chunks, d, ft):
    """pallas_call wrapper; all encoding tables are jit arguments (closures
    would upload hundreds of MB per executable on remote-compile relays)."""
    b_pad = a.shape[0]
    nb = b_pad // g_chunks
    f = x3.shape[-1]
    n_ft = f // ft
    gd = g_chunks * d

    # MXU runs bf16 natively (~6x the f32 rate); with a bf16 A-table, feed
    # bf16 operands with f32 accumulation — the same demotion XLA applies
    # to f32 matmuls on TPU.
    mxu = jnp.bfloat16 if a.dtype == jnp.bfloat16 else x3.dtype

    def kernel(src_ref, a_ref, x_prv, x_cur, x_nxt, out_ref, xw):
        bi = pl.program_id(0)
        base = bi * g_chunks

        # stage the 3G-chunk source window into one scratch ref (values
        # can't be dynamically sliced under Mosaic; refs can). Clamped index
        # maps make the boundary blocks duplicates of valid ones, but
        # src_chunk never points outside [0, B) so those are never selected.
        xw[0:g_chunks] = x_prv[...].astype(mxu)
        xw[g_chunks:2 * g_chunks] = x_cur[...].astype(mxu)
        xw[2 * g_chunks:3 * g_chunks] = x_nxt[...].astype(mxu)

        for g_i in range(g_chunks):
            acc = None
            for d_i in range(d):
                off = src_ref[base + g_i, d_i] - base + g_chunks
                part = jax.lax.dot(
                    a_ref[g_i, d_i].astype(mxu),
                    xw[off],
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            out_ref[g_i] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # src_chunk table
        grid=(nb, n_ft),
        in_specs=[
            pl.BlockSpec(
                (g_chunks, d, c, c),
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
        out_shape=jax.ShapeDtypeStruct((b_pad, c, f), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * c * c * f,
            bytes_accessed=(
                int(np.prod(a.shape)) * a.dtype.itemsize
                + 3 * b_pad * c * f * x3.dtype.itemsize
                + b_pad * c * f * 4
            ),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(src_chunk, a, x3, x3, x3)


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

    pad_f = (-f0) % FEAT_TILE
    if pad_f:
        x = jnp.concatenate([x, jnp.zeros((n0, pad_f), x.dtype)], axis=1)
    pad_n = b * c - n0
    if pad_n:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_n, x.shape[1]), x.dtype)], axis=0
        )
    f = x.shape[1]
    x3 = x.reshape(b, c, f)

    # pad the chunk axis to a multiple of G (zero blocks, self-pointing srcs
    # keep the window property; x3 is NOT padded — clamped index maps reuse
    # the last valid block and zero A-blocks discard it)
    pad_b = (-b) % g_chunks
    a = g.a
    src_chunk = g.src_chunk
    if pad_b:
        a = jnp.concatenate(
            [a, jnp.zeros((pad_b,) + a.shape[1:], a.dtype)], axis=0
        )
        src_chunk = jnp.concatenate(
            [
                src_chunk,
                jnp.full((pad_b, d), b - 1, src_chunk.dtype),
            ],
            axis=0,
        )
        x3 = jnp.concatenate(
            [x3, jnp.zeros((pad_b, c, f), x3.dtype)], axis=0
        )

    out = _banded_call(src_chunk, a, x3, c=c, g_chunks=g_chunks, d=d,
                       ft=min(FEAT_TILE, f))

    out = out.reshape(-1, f)[:n0, :f0]
    if g.residual is not None:
        from .bsda import _residual_spmm

        spill = _residual_spmm(g.residual, x[:n0, :f0], None)
        out = out.at[g.residual_rows].add(
            spill, unique_indices=True, indices_are_sorted=True
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
