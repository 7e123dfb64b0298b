"""Flash-style Pallas GAT attention over the banded BSDA encoding.

The XLA dense-attention path (kernels/bsda_gat.py) materializes per-head
[B, D, C, C] score/exp tensors — ~1.3 GB of HBM round-trips per aggregate
at Elliptic scale (fusion depth limits; see docs/PERF_NOTES.md). This
kernel keeps the whole softmax in VMEM: for each destination chunk it
computes the CxC chunk-pair scores, runs the online (running-max) softmax
across the D source slots, and accumulates the weighted feature sum — the
only HBM traffic is the int8 multiplicity table, the packed node payload
(features + attention coefficients), and the packed output.

Node payload packing (one 128-lane row per node, so the banded ring
machinery from pallas_bsda.py applies unchanged):
    [ x_proj (H*Ch) | a_src (H) | a_dst (H) | zero pad ]   -> [N, 128]
Output packing per node: [ acc (H*Ch) | m (H) | s (H) | pad ] — the
(max, sumexp, weighted-sum) triple that bsda_gat.py's streaming-softmax
merge combines with the residual spill, so the result is bitwise the
global segment softmax.

Forward-only: training uses the autodiff-able XLA path (bsda_gat.py);
inference and the per-epoch val evaluation dispatch here
(models/modules.py gat_layer_apply(training=...)).

Replaces GATConv's fused CUDA attention kernels (reference
src/models/gnn.py:56-76 via PyG) at the eval path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsda import BsdaGraph

PACK = 128
GROUP = 4   # destination chunks per grid step (>= max_chunk_dist required)
RING = 4
NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "h", "ch", "negative_slope"),
)
def _flash_gat_call(src_chunk, mult, packed3, *, c, g_chunks, d, h, ch,
                    negative_slope):
    b_pad = mult.shape[0]
    nb = b_pad // g_chunks
    hc = h * ch

    def kernel(src_ref, a_ref, x_hbm, out_ref, ring, sem):
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
            cp = block_copy(0)
            cp.start()
            cp.wait()
            cp1 = block_copy(1)
            cp1.start()
            cp1.wait()
            block_copy(2).start()

        @pl.when(jnp.logical_and(bi > 0, bi + 1 < nb))
        def _():
            block_copy(bi + 1).wait()

        @pl.when(jnp.logical_and(bi > 0, bi + 2 < nb))
        def _():
            block_copy(bi + 2).start()

        def chunk_payload(src):
            gb = src // g_chunks
            return ring[jax.lax.rem(gb, RING) * g_chunks + src % g_chunks]

        ones_col = jnp.ones((c, 1), jnp.float32)
        for g_i in range(g_chunks):
            own = chunk_payload(base + g_i)          # [C, PACK]
            # hoist per-slot work out of the head loop: payload values,
            # int8->f32 block conversion, the [H, Cj] transposed source
            # coefficients, and the per-slot source maxima [1, H]
            bufs, mults, asrcT, maxsrc = [], [], [], []
            for d_i in range(d):
                src = src_ref[base + g_i, d_i]
                buf = chunk_payload(src)             # [C, PACK]
                bufs.append(buf)
                mults.append(a_ref[g_i, d_i].astype(jnp.float32))
                asrcT.append(jnp.transpose(buf[:, hc: hc + h]))  # [H, Cj]
                maxsrc.append(
                    jnp.max(buf[:, hc: hc + h], axis=0, keepdims=True)
                )
            m_out, s_out, acc_out = [], [], []
            for hh in range(h):
                adst_h = own[:, hc + h + hh: hc + h + hh + 1]  # [Ci, 1]
                # leaky_relu is monotonic, so the UNMASKED row max is
                # exactly leaky(adst_i + max_j asrc_j) — a per-slot scalar
                # instead of a [C, C] reduction. As a softmax shift any
                # upper bound is exact math (shift-invariance); masked
                # entries contribute nothing because e is multiplied by
                # the multiplicity pattern (0 on non-edges).
                m = None
                for d_i in range(d):
                    cand = adst_h + maxsrc[d_i][:, hh: hh + 1]
                    cand = jnp.where(
                        cand >= 0, cand, cand * negative_slope)
                    m = cand if m is None else jnp.maximum(m, cand)
                acc_ext = jnp.zeros((c, ch + 1), jnp.float32)
                for d_i in range(d):
                    raw = asrcT[d_i][hh: hh + 1, :] + adst_h  # [Ci, Cj]
                    sc = jnp.where(
                        raw >= 0, raw, raw * negative_slope)
                    e = jnp.exp(sc - m) * mults[d_i]
                    # ones-column: one dot yields the weighted feature sum
                    # AND the softmax denominator
                    rhs = jnp.concatenate(
                        [bufs[d_i][:, hh * ch: (hh + 1) * ch], ones_col],
                        axis=1,
                    )
                    acc_ext = acc_ext + jax.lax.dot(
                        e, rhs, preferred_element_type=jnp.float32
                    )
                m_out.append(m)
                s_out.append(acc_ext[:, ch: ch + 1])
                acc_out.append(acc_ext[:, :ch])
            # pack [acc | m | s | pad] into the 128-lane output row
            packed = jnp.concatenate(
                [jnp.concatenate(acc_out, axis=1)]
                + m_out + s_out
                + [jnp.zeros((c, PACK - hc - 2 * h), jnp.float32)],
                axis=1,
            )
            out_ref[g_i] = packed

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (g_chunks, d, c, c),
                lambda bi, src: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (g_chunks, c, PACK),
            lambda bi, src: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((RING * g_chunks, c, PACK), packed3.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, c, PACK), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * h * c * c * ch,
            bytes_accessed=(
                int(np.prod(mult.shape)) * mult.dtype.itemsize
                + 2 * b_pad * c * PACK * 4
            ),
            transcendentals=b_pad * d * h * c * c,
        ),
        interpret=_interpret(),
    )(src_chunk, mult, packed3)


def flash_gat_dense(g: BsdaGraph, xp, asrc, adst, negative_slope=0.2):
    """Dense-block attention partials for all heads via the flash kernel.

    xp [N_pad, H, Ch] (padded to the chunk grid), asrc/adst [N_pad, H].
    Returns (m [N_pad, H], s [N_pad, H], acc [N_pad, H, Ch]) — same
    contract as per-head _dense_part stacks, merged with the residual by
    the caller. Returns None when the shape doesn't fit the packing.
    """
    n_pad, h, ch = xp.shape
    c = g.chunk
    b = g.num_chunks
    d = g.depth
    hc = h * ch
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    if hc + 2 * h > PACK or n_pad != b * c or g_chunks > 64 or b < 2:
        return None
    pad_b = (-b) % g_chunks
    b_pad = b + pad_b
    if b_pad // g_chunks <= RING:
        return None

    payload = jnp.concatenate(
        [
            xp.reshape(n_pad, hc).astype(jnp.float32),
            asrc.astype(jnp.float32),
            adst.astype(jnp.float32),
            jnp.zeros((n_pad, PACK - hc - 2 * h), jnp.float32),
        ],
        axis=1,
    ).reshape(b, c, PACK)

    mult = g.a
    src_chunk = g.src_chunk
    if pad_b:
        mult = jnp.concatenate(
            [mult, jnp.zeros((pad_b,) + mult.shape[1:], mult.dtype)], axis=0
        )
        src_chunk = jnp.concatenate(
            [src_chunk, jnp.full((pad_b, d), b - 1, src_chunk.dtype)], axis=0
        )
        payload = jnp.concatenate(
            [payload, jnp.full((pad_b, c, PACK), NEG_INF, payload.dtype)],
            axis=0,
        )

    out = _flash_gat_call(
        src_chunk, mult, payload, c=c, g_chunks=g_chunks, d=d, h=h, ch=ch,
        negative_slope=float(negative_slope),
    )
    out = out.reshape(b_pad * c, PACK)[:n_pad]
    acc = out[:, :hc].reshape(n_pad, h, ch)
    m = out[:, hc: hc + h]
    s = out[:, hc + h: hc + 2 * h]
    return m, s, acc
