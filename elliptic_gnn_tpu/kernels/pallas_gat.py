"""Flash-style Pallas GAT attention over the banded BSDA encoding.

The XLA dense-attention path (kernels/bsda_gat.py) materializes per-head
[B, D, C, C] score/exp tensors — ~1.3 GB of HBM round-trips per aggregate
at Elliptic scale (fusion depth limits; see docs/PERF_NOTES.md). This
kernel keeps the whole softmax in VMEM: for each destination chunk it
computes the CxC chunk-pair scores, runs the online (running-max) softmax
across the D source slots, and accumulates the weighted feature sum — the
only HBM traffic is the int8 multiplicity table, the packed node payload
(features + attention coefficients), and the packed output.

Node payload packing (one row of PACK lanes per node, PACK = the smallest
multiple of 128 that fits H*Ch + 2H, so the banded ring machinery from
pallas_bsda.py applies unchanged):
    [ x_proj (H*Ch) | a_src (H) | a_dst (H) | zero pad ]   -> [N, PACK]
Output packing per node: [ acc (H*Ch) | m (H) | s (H) | pad ] — the
(max, sumexp, weighted-sum) triple that bsda_gat.py's streaming-softmax
merge combines with the residual spill, so the result is bitwise the
global segment softmax.

The kernel itself is forward-only. Inference and the per-epoch val
evaluation dispatch here (models/modules.py); on TPU, training also runs
this forward by default via the fused custom-VJP pipeline whose backward
sweeps live in pallas_gat_bwd.py (round 3: the occupancy-gated sweeps
made it faster than the autodiff XLA path; `gat_fused_vjp: false`
reverts). An occupancy-gated fori_loop variant of THIS kernel was
measured slower than the unrolled two-pass form (+40% at ~14% skippable
slots — the rescaling chain serializes what the unrolled loop
interleaves), so the forward stays fully unrolled.

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

LANE = 128  # payload lanes are padded to a multiple of the VPU lane count
GROUP = 4   # destination chunks per grid step (>= max_chunk_dist required)
RING = 4
NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def ring_plumbing(x_hbm, ring, sem, g_chunks, nb):
    """The banded kernels' shared 2-step-lookahead ring copy schedule:
    G-blocks of the HBM-resident stream are async-copied into a RING-deep
    VMEM window as the grid walks; returns `chunk_payload(src)` resolving
    a chunk id to its resident VMEM row. One definition — the DMA
    start/wait ordering is subtle and must not fork (used by both flash
    forwards here and every backward sweep in pallas_gat_bwd.py)."""
    bi = pl.program_id(0)

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

    return chunk_payload


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "h", "ch", "pack",
                     "negative_slope", "normalize"),
)
def _flash_gat_call(src_chunk, mult, packed3, *, c, g_chunks, d, h, ch, pack,
                    negative_slope, normalize=False):
    b_pad = mult.shape[0]
    nb = b_pad // g_chunks
    hc = h * ch

    def kernel(src_ref, a_ref, x_hbm, out_ref, ring, sem):
        bi = pl.program_id(0)
        base = bi * g_chunks
        chunk_payload = ring_plumbing(x_hbm, ring, sem, g_chunks, nb)

        ones_col = jnp.ones((c, 1), jnp.float32)
        for g_i in range(g_chunks):
            own = chunk_payload(base + g_i)          # [C, pack]
            # hoist per-slot work out of the head loop: payload values,
            # int8->f32 block conversion, the [H, Cj] transposed source
            # coefficients, the per-slot source maxima [1, H], and the
            # rank-1 source exp factors (see below)
            bufs, mults, asrcT, maxsrc, ebp, ebn = [], [], [], [], [], []
            for d_i in range(d):
                src = src_ref[base + g_i, d_i]
                buf = chunk_payload(src)             # [C, pack]
                bufs.append(buf)
                mults.append(a_ref[g_i, d_i].astype(jnp.float32))
                bsrc = jnp.transpose(buf[:, hc: hc + h])  # [H, Cj]
                asrcT.append(bsrc)
                mb = jnp.max(bsrc, axis=1, keepdims=True)  # [H, 1]
                maxsrc.append(jnp.transpose(mb))           # [1, H]
                ebp.append(jnp.exp(bsrc - mb))
                ebn.append(jnp.exp(negative_slope * (bsrc - mb)))
            m_out, s_out, acc_out = [], [], []
            for hh in range(h):
                adst_h = own[:, hc + h + hh: hc + h + hh + 1]  # [Ci, 1]
                # leaky_relu is monotonic, so the UNMASKED row max is
                # exactly leaky(adst_i + max_j asrc_j) — a per-slot scalar
                # instead of a [C, C] reduction. As a softmax shift any
                # upper bound is exact math (shift-invariance); masked
                # entries contribute nothing because e is multiplied by
                # the multiplicity pattern (0 on non-edges).
                cands, m = [], None
                for d_i in range(d):
                    cand = adst_h + maxsrc[d_i][:, hh: hh + 1]
                    cands.append(cand)
                    lr = jnp.where(
                        cand >= 0, cand, cand * negative_slope)
                    m = lr if m is None else jnp.maximum(m, lr)
                acc_ext = jnp.zeros((c, ch + 1), jnp.float32)
                for d_i in range(d):
                    # rank-1 separable exp: with t = a_dst_i + a_src_j,
                    # Mb = max_j a_src_j, and s the leaky slope,
                    #   exp(lrelu(t) - m) =
                    #     t >= 0: exp(a_dst_i + Mb - m) * exp(a_src_j - Mb)
                    #     t <  0: exp(s*(a_dst_i+Mb) - m) * exp(s*(a_src_j-Mb))
                    # i.e. an outer product of a [C,1] row factor and a
                    # [1,C] column factor per branch, selected by sign(t).
                    # All four exponents are <= 0 (m >= lrelu(cand) per
                    # slot), so nothing overflows; the C*C exp grid becomes
                    # O(C) exps + one select — the VPU transcendental cost
                    # drops ~C/4x.
                    pa = jnp.exp(cands[d_i] - m)                    # [Ci,1]
                    na = jnp.exp(negative_slope * cands[d_i] - m)   # [Ci,1]
                    t = asrcT[d_i][hh: hh + 1, :] + adst_h   # [Ci, Cj]
                    e = jnp.where(
                        t >= 0,
                        pa * ebp[d_i][hh: hh + 1, :],
                        na * ebn[d_i][hh: hh + 1, :],
                    ) * mults[d_i]
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
                s_col = acc_ext[:, ch: ch + 1]
                s_out.append(s_col)
                if normalize:
                    # fold the softmax normalization into the kernel: emit
                    # val = acc / s in the acc lanes (raw s kept in its
                    # lane for the spill merge / backward transform) —
                    # kills the [pack, pack] selector matmul + divide pass
                    # outside (round 5, docs/PERF_NOTES.md)
                    acc_out.append(acc_ext[:, :ch]
                                   / jnp.maximum(s_col, 1e-16))
                else:
                    acc_out.append(acc_ext[:, :ch])
            # pack [acc | m | s | pad] into the pack-lane output row
            packed = jnp.concatenate(
                [jnp.concatenate(acc_out, axis=1)]
                + m_out + s_out
                + [jnp.zeros((c, pack - hc - 2 * h), jnp.float32)],
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
            pl.BlockSpec(memory_space=pl.ANY),  # packed x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (g_chunks, c, pack),
            lambda bi, src: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((RING * g_chunks, c, pack), packed3.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, c, pack), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * h * c * c * ch,
            bytes_accessed=(
                int(np.prod(mult.shape)) * mult.dtype.itemsize
                + 2 * b_pad * c * pack * 4
            ),
            transcendentals=b_pad * d * h * 4 * c,
        ),
        interpret=_interpret(),
    )(src_chunk, mult, packed3)


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "h", "ch", "pack",
                     "negative_slope", "normalize"),
)
def _flash_gat_call_gated(src_chunk, occ, mult, packed3, *, c, g_chunks, d,
                          h, ch, pack, negative_slope, normalize=False):
    """Occupancy-gated variant of the flash forward: two `fori_loop`
    passes over each chunk's slot cover (occ, scalar-prefetched) instead
    of unrolling all D slots — pass 1 computes the per-head softmax shift
    m (a cheap sublane max per slot), pass 2 accumulates (acc, s) with m
    fixed. Round 3 measured a gated SINGLE-pass variant +40% slower
    because the online-softmax rescaling chain serialized; precomputing m
    removes the chain, making the accumulation order-free exactly like
    the backward sweeps' register carries. Worth it since GAT moved to
    depth 4 (round 5): ~35% of forward slots are empty there. The m this
    variant emits maxes over the occ prefix only — a different (valid)
    gauge than the unrolled kernel's all-slot max; every consumer is
    shift-invariant."""
    b_pad = mult.shape[0]
    nb = b_pad // g_chunks
    hc = h * ch

    def kernel(src_ref, occ_ref, a_ref, x_hbm, out_ref, ring, sem):
        bi = pl.program_id(0)
        base = bi * g_chunks
        chunk_payload = ring_plumbing(x_hbm, ring, sem, g_chunks, nb)

        ones_col = jnp.ones((c, 1), jnp.float32)
        for g_i in range(g_chunks):
            own = chunk_payload(base + g_i)              # [C, pack]
            adst_all = own[:, hc + h: hc + 2 * h]        # [Ci, h]
            occ_i = occ_ref[base + g_i]

            def m_body(d_i, m_carry):
                src = src_ref[base + g_i, d_i]
                buf = chunk_payload(src)
                # per-head source max over SUBLANES (no transpose needed)
                mb = jnp.max(buf[:, hc: hc + h], axis=0, keepdims=True)
                cand = adst_all + mb                     # [Ci, h]
                lr = jnp.where(cand >= 0, cand, cand * negative_slope)
                return jnp.maximum(m_carry, lr)

            m_all = jax.lax.fori_loop(
                0, occ_i, m_body, jnp.full((c, h), NEG_INF, jnp.float32))

            def acc_body(d_i, acc_carry):
                src = src_ref[base + g_i, d_i]
                buf = chunk_payload(src)
                mult_b = a_ref[g_i, d_i].astype(jnp.float32)
                bs = jnp.transpose(buf[:, hc: hc + h])   # [H, Cj]
                maxs = jnp.max(bs, axis=1, keepdims=True)
                parts = []
                for hh in range(h):
                    mb = maxs[hh, 0]
                    m_h = m_all[:, hh: hh + 1]
                    cand = adst_all[:, hh: hh + 1] + mb
                    pa = jnp.exp(cand - m_h)             # [Ci, 1]
                    na = jnp.exp(negative_slope * cand - m_h)
                    brow = bs[hh: hh + 1, :]             # [1, Cj]
                    pb = jnp.exp(brow - mb)
                    nb_ = jnp.exp(negative_slope * (brow - mb))
                    t = brow + adst_all[:, hh: hh + 1]   # [Ci, Cj]
                    e = jnp.where(t >= 0, pa * pb, na * nb_) * mult_b
                    rhs = jnp.concatenate(
                        [buf[:, hh * ch: (hh + 1) * ch], ones_col],
                        axis=1,
                    )
                    parts.append(jax.lax.dot(
                        e, rhs, preferred_element_type=jnp.float32))
                return acc_carry + jnp.concatenate(parts, axis=1)

            acc_all = jax.lax.fori_loop(
                0, occ_i, acc_body,
                jnp.zeros((c, h * (ch + 1)), jnp.float32))

            m_out, s_out, acc_out = [], [], []
            for hh in range(h):
                a_ext = acc_all[:, hh * (ch + 1): (hh + 1) * (ch + 1)]
                s_col = a_ext[:, ch: ch + 1]
                m_out.append(m_all[:, hh: hh + 1])
                s_out.append(s_col)
                if normalize:
                    acc_out.append(a_ext[:, :ch]
                                   / jnp.maximum(s_col, 1e-16))
                else:
                    acc_out.append(a_ext[:, :ch])
            out_ref[g_i] = jnp.concatenate(
                [jnp.concatenate(acc_out, axis=1)]
                + m_out + s_out
                + [jnp.zeros((c, pack - hc - 2 * h), jnp.float32)],
                axis=1,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (g_chunks, d, c, c),
                lambda bi, src, occ: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # packed x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (g_chunks, c, pack),
            lambda bi, src, occ: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((RING * g_chunks, c, pack), packed3.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, c, pack), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * h * c * c * ch,
            bytes_accessed=(
                int(np.prod(mult.shape)) * mult.dtype.itemsize
                + 2 * b_pad * c * pack * 4
            ),
            transcendentals=b_pad * d * h * 4 * c,
        ),
        interpret=_interpret(),
    )(src_chunk, occ, mult, packed3)


def pack_width(h: int, ch: int) -> int:
    """Payload lane count for an (h, ch) head shape."""
    return ((h * ch + 2 * h + LANE - 1) // LANE) * LANE


def flash_eligible(g: BsdaGraph, h: int, ch: int) -> bool:
    """True when the banded flash kernel supports this graph/head shape.
    VMEM budget: ring + output + score transients cap the payload width."""
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    b = g.num_chunks
    pad_b = (-b) % g_chunks
    return (
        pack_width(h, ch) <= 512
        and g_chunks <= 64
        and b >= 2
        and (b + pad_b) // g_chunks > RING
    )


def flash_gat_payload(g: BsdaGraph, payload, h: int, ch: int,
                      negative_slope=0.2, normalize: bool = False):
    """Run the flash kernel on an already-packed node payload.

    payload [N_pad, pack] rows `[ x_proj (h*ch) | a_src (h) | a_dst (h) |
    pad ]`, N_pad = num_chunks * chunk. Returns the packed output
    [N_pad, pack] rows `[ acc (h*ch) | m (h) | s (h) | pad ]`, or None when
    the shape doesn't fit the packing. Keeping both sides packed avoids the
    TPU tiling tax on narrow [N, h]/[N, h, ch] tensors (minor dims pad to
    128 lanes — a [N, 4] f32 array occupies 32x its logical bytes in HBM).
    normalize=True emits `acc / max(s, 1e-16)` in the acc lanes instead
    (raw s still in its lane) — the in-kernel softmax normalization.
    """
    c = g.chunk
    b = g.num_chunks
    d = g.depth
    pack = pack_width(h, ch)
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    if payload.shape != (b * c, pack) or not flash_eligible(g, h, ch):
        return None
    pad_b = (-b) % g_chunks
    b_pad = b + pad_b

    payload = payload.astype(jnp.float32).reshape(b, c, pack)
    mult = g.a
    src_chunk = g.src_chunk
    occ = g.slot_occ
    if occ is None:
        nz = jnp.any(mult.reshape(b, d, -1) != 0, axis=-1)
        occ = jnp.max(
            jnp.where(nz, jnp.arange(1, d + 1, dtype=jnp.int32)[None, :], 0),
            axis=1,
        ).astype(jnp.int32)
    if pad_b:
        mult = jnp.concatenate(
            [mult, jnp.zeros((pad_b,) + mult.shape[1:], mult.dtype)], axis=0
        )
        src_chunk = jnp.concatenate(
            [src_chunk, jnp.full((pad_b, d), b - 1, src_chunk.dtype)], axis=0
        )
        payload = jnp.concatenate(
            [payload, jnp.full((pad_b, c, pack), NEG_INF, payload.dtype)],
            axis=0,
        )
        occ = jnp.concatenate([occ, jnp.zeros(pad_b, occ.dtype)], axis=0)

    import os

    # occupancy gating pays only when the per-slot work amortizes the
    # second (m-precompute) pass: same-process A/B at depth 4 reads
    # h=4 5.94 vs 6.20 ms (gated wins) but h=1 3.75 vs 2.99 (gated
    # loses — the tiny single-head slot body is cheaper than the extra
    # pass). Default: gated for h >= 2, unrolled for the skinny final
    # layer; EGNN_GAT_FWD_GATED=1/0 forces either for A/B.
    gate_env = os.environ.get("EGNN_GAT_FWD_GATED", "")
    gated = h >= 2 if gate_env == "" else gate_env != "0"
    if gated:
        out = _flash_gat_call_gated(
            src_chunk, occ, mult, payload, c=c, g_chunks=g_chunks, d=d,
            h=h, ch=ch, pack=pack, negative_slope=float(negative_slope),
            normalize=bool(normalize),
        )
    else:
        out = _flash_gat_call(
            src_chunk, mult, payload, c=c, g_chunks=g_chunks, d=d, h=h,
            ch=ch, pack=pack, negative_slope=float(negative_slope),
            normalize=bool(normalize),
        )
    return out.reshape(b_pad * c, pack)[: b * c]


def flash_gat_dense(g: BsdaGraph, xp, asrc, adst, negative_slope=0.2):
    """Dense-block attention partials for all heads via the flash kernel.

    xp [N_pad, H, Ch] (padded to the chunk grid), asrc/adst [N_pad, H].
    Returns (m [N_pad, H], s [N_pad, H], acc [N_pad, H, Ch]) — same
    contract as per-head _dense_part stacks, merged with the residual by
    the caller. Returns None when the shape doesn't fit the packing.
    """
    n_pad, h, ch = xp.shape
    hc = h * ch
    pack = pack_width(h, ch)
    if n_pad != g.num_chunks * g.chunk or not flash_eligible(g, h, ch):
        return None

    payload = jnp.concatenate(
        [
            xp.reshape(n_pad, hc).astype(jnp.float32),
            asrc.astype(jnp.float32),
            adst.astype(jnp.float32),
            jnp.zeros((n_pad, pack - hc - 2 * h), jnp.float32),
        ],
        axis=1,
    )
    out = flash_gat_payload(g, payload, h, ch, negative_slope)
    if out is None:
        return None
    acc = out[:, :hc].reshape(n_pad, h, ch)
    m = out[:, hc: hc + h]
    s = out[:, hc + h: hc + 2 * h]
    return m, s, acc
