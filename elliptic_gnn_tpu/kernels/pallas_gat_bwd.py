"""Banded Pallas backward sweeps for packed GAT attention.

The custom-VJP boundary is the dense flash kernel (pallas_gat.py):
  fwd:  payload [N, pack] = [ xp | a_src | a_dst | 0 ]
        -> out [N, pack] = [ acc | m | s | 0 ],
        acc_i = sum_j mu_ij e_ij x_j,  s_i = sum_j mu_ij e_ij,
        e_ij = exp(lrelu(a_src_j + a_dst_i) - m_i)
  bwd:  given cotangents (A_bar = d acc, S_bar = d s) and treating the
        softmax shift m as a constant (its lanes are stop_gradient'ed by
        the caller — the standard flash-attention LSE convention; the
        downstream quotient acc/s is shift-invariant, so the total
        gradient is exact):
            d xp_j    = sum_i mu e_ij A_bar_i            (source-oriented)
            dt_ij     = mu e_ij lrelu'(t) (x_j . A_bar_i + S_bar_i)
            d a_src_j = sum_i dt_ij                       (source-oriented)
            d a_dst_i = sum_j dt_ij                       (dest-oriented)

Two banded sweeps, both reusing the fwd kernel's machinery (ring-buffered
HBM->VMEM streaming of the gathered payload, rank-1 separable exp, MXU
dots, everything 128-lane packed):

  sweep_dst  — over destination chunks with the FORWARD tables (g.a),
               own rows = the grad payload G2 [ A_bar | S_bar | a_dst | m ],
               ring = the fwd payload; emits d a_dst.
  sweep_src  — over source chunks with the TRANSPOSE tables (g.transpose),
               own rows = the fwd payload, ring = G2; emits [ d xp | d a_src ].

The residual spill stays on the autodiff XLA path (packed_gat.py gathers
only the few spill rows), so no manual spill backward exists here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsda import BsdaGraph
from .pallas_gat import (
    GROUP, NEG_INF, RING, pack_width, ring_plumbing as _ring_plumbing,
)

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def g2_pack_width(h: int, ch: int) -> int:
    """Grad-payload lanes: [ A_bar (h*ch) | S_bar (h) | a_dst (h) | m (h) ]."""
    return ((h * ch + 3 * h + LANE - 1) // LANE) * LANE


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "h", "ch", "pack1", "pack2",
                     "slope"),
)
def _sweep_dst_call(src_chunk, occ, mult, own2, pay1, *, c, g_chunks, d, h,
                    ch, pack1, pack2, slope):
    """Dest-oriented sweep: own = G2 blocks, ring = fwd payload.
    Emits [b_pad, c, pack1] rows [ 0 (hc) | 0 (h) | d a_dst (h) | 0 ].

    Occupancy-gated like the source sweep (~14% of forward-table slots are
    empty at Elliptic scale): `lax.fori_loop` over the per-chunk slot
    cover with the per-head rowdot accumulators as register carries —
    measured zero overhead at full occupancy vs the unrolled loop."""
    b_pad = mult.shape[0]
    nb = b_pad // g_chunks
    hc = h * ch

    def kernel(src_ref, occ_ref, a_ref, own_ref, pay_hbm, out_ref, ring,
               sem):
        bi = pl.program_id(0)
        base = bi * g_chunks
        chunk_payload = _ring_plumbing(pay_hbm, ring, sem, g_chunks, nb)

        ones_col = jnp.ones((c, 1), jnp.float32)
        for g_i in range(g_chunks):
            own = own_ref[g_i]                       # [C, pack2]
            abar_hs = [own[:, hh * ch: (hh + 1) * ch] for hh in range(h)]
            sbar_hs = [own[:, hc + hh: hc + hh + 1] for hh in range(h)]
            alpha_hs = [own[:, hc + h + hh: hc + h + hh + 1]
                        for hh in range(h)]
            m_hs = [own[:, hc + 2 * h + hh: hc + 2 * h + hh + 1]
                    for hh in range(h)]

            def slot_body(d_i, hacc_all):            # [C, h*(ch+1)]
                src = src_ref[base + g_i, d_i]
                buf = chunk_payload(src)             # [C, pack1]
                mult_b = a_ref[g_i, d_i].astype(jnp.float32)
                bs = jnp.transpose(buf[:, hc: hc + h])       # [H, Cj]
                maxs = jnp.max(bs, axis=1, keepdims=True)    # [H, 1]
                parts = []
                for hh in range(h):
                    mb = maxs[hh, 0]
                    cand = alpha_hs[hh] + mb
                    pa = jnp.exp(cand - m_hs[hh])            # [Ci, 1]
                    na = jnp.exp(slope * cand - m_hs[hh])
                    brow = bs[hh: hh + 1, :]                 # [1, Cj]
                    pb = jnp.exp(brow - mb)
                    nb_ = jnp.exp(slope * (brow - mb))
                    t = brow + alpha_hs[hh]                  # [Ci, Cj]
                    e_sig = jnp.where(
                        t >= 0, pa * pb, slope * (na * nb_)
                    ) * mult_b
                    # rowdot trick: da_dst_i = sum_j e_sig (x_j.A_bar_i +
                    # S_bar_i) = A_bar_i . (e_sig @ x)_i + S_bar_i (e_sig
                    # @ 1)_i — one K=128 MXU pass, no [C,C] q matrix
                    rhs = jnp.concatenate(
                        [buf[:, hh * ch: (hh + 1) * ch], ones_col],
                        axis=1,
                    )                                        # [Cj, ch+1]
                    parts.append(jax.lax.dot(
                        e_sig, rhs, preferred_element_type=jnp.float32
                    ))
                return hacc_all + jnp.concatenate(parts, axis=1)

            hacc_all = jax.lax.fori_loop(
                0, occ_ref[base + g_i], slot_body,
                jnp.zeros((c, h * (ch + 1)), jnp.float32),
            )
            dalpha = []
            for hh in range(h):
                h_acc = hacc_all[:, hh * (ch + 1): (hh + 1) * (ch + 1)]
                da = jnp.sum(abar_hs[hh] * h_acc[:, :ch], axis=1,
                             keepdims=True)
                dalpha.append(da + sbar_hs[hh] * h_acc[:, ch: ch + 1])
            out_ref[g_i] = jnp.concatenate(
                [jnp.zeros((c, hc + h), jnp.float32)]
                + dalpha
                + [jnp.zeros((c, pack1 - hc - 2 * h), jnp.float32)],
                axis=1,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((g_chunks, d, c, c),
                         lambda bi, src, occ: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_chunks, c, pack2),
                         lambda bi, src, occ: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g_chunks, c, pack1),
                               lambda bi, src, occ: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RING * g_chunks, c, pack1), pay1.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, c, pack1), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * d * h * c * c * ch,
            bytes_accessed=int(np.prod(mult.shape)) * mult.dtype.itemsize
            + b_pad * c * (pack1 + pack2) * 4,
            transcendentals=b_pad * d * h * 4 * c,
        ),
        interpret=_interpret(),
    )(src_chunk, occ, mult, own2, pay1)


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "h", "ch", "pack1", "pack2",
                     "slope"),
)
def _sweep_src_call(src_chunk, occ, mult, own1, pay2, *, c, g_chunks, d, h,
                    ch, pack1, pack2, slope):
    """Source-oriented sweep over the TRANSPOSE tables: own = fwd payload,
    ring = G2. Emits [b_pad, c, pack1] rows [ d xp | d a_src | 0 | 0 ].

    Occupancy-gated: the transpose tables pad every chunk to the MAX
    in-reference count (DT=5 on the canonical bench graph: synthetic
    Elliptic-scale, symmetrized, seed 0, depth 3 — mean occ 2.89), so
    ~42% of the (chunk, slot) iterations carry all-zero blocks (a few %
    graph/seed variation; the round-3 measurement graph read 2.59/48%). The slot loop is a
    `lax.fori_loop` with the per-chunk slot cover `occ` (scalar-prefetched)
    as its dynamic trip count, with the per-head (d xp, d a_src) partials
    as REGISTER carries — skipped slots have zero multiplicities, so the
    truncated sum is exact. (An out_ref read-modify-write formulation was
    tried first and lost: the VMEM round-trip per slot serializes the MXU
    pipeline — same-process A/B showed the register-carry unrolled loop
    1.5x faster than RMW at full occupancy; see docs/PERF_NOTES.md.)"""
    b_pad = mult.shape[0]
    nb = b_pad // g_chunks
    hc = h * ch

    lhs_rows = ((ch + 1 + 7) // 8) * 8  # skinny-M lhs padded to sublanes

    def kernel(src_ref, occ_ref, a_ref, own_ref, pay_hbm, out_ref, ring,
               sem):
        bi = pl.program_id(0)
        base = bi * g_chunks
        chunk_payload = _ring_plumbing(pay_hbm, ring, sem, g_chunks, nb)

        for g_i in range(g_chunks):
            own = own_ref[g_i]                       # [C, pack1] fwd payload
            beta = own[:, hc: hc + h]                # [Cj, H]
            mbs = jnp.max(beta, axis=0, keepdims=True)   # [1, H] own-row max
            # per-head own-chunk working set, hoisted out of the slot loop:
            # transposed [feature, node] layouts keep the skinny dimension
            # on sublanes so every MXU pass streams only ch/ch+1 rows
            # instead of padding N to 128 lanes
            xp_ts, beta_rows, pb_rs, nb_rs = [], [], [], []
            for hh in range(h):
                xp_ts.append(jnp.transpose(own[:, hh * ch: (hh + 1) * ch]))
                beta_row = jnp.transpose(beta[:, hh: hh + 1])    # [1, Cj]
                beta_rows.append(beta_row)
                mb = mbs[0, hh]
                pb_rs.append(jnp.exp(beta_row - mb))             # [1, Cj]
                nb_rs.append(jnp.exp(slope * (beta_row - mb)))

            def slot_body(d_i, carry):
                dxp_all, dbeta_all = carry           # [h*ch, C], [h, C]
                src = src_ref[base + g_i, d_i]
                buf = chunk_payload(src)             # [C, pack2] G2
                mult_b = a_ref[g_i, d_i].astype(jnp.float32)
                dx_parts, db_parts = [], []
                for hh in range(h):
                    abar = buf[:, hh * ch: (hh + 1) * ch]   # [Ci, ch]
                    sbar = buf[:, hc + hh: hc + hh + 1]     # [Ci, 1]
                    alpha = buf[:, hc + h + hh: hc + h + hh + 1]
                    m_i = buf[:, hc + 2 * h + hh: hc + 2 * h + hh + 1]
                    mb = mbs[0, hh]
                    cand = alpha + mb                        # [Ci, 1]
                    pa_c = jnp.exp(cand - m_i)
                    na_c = jnp.exp(slope * cand - m_i)
                    t = alpha + beta_rows[hh]                # [Ci, Cj]
                    pos = t >= 0
                    e = jnp.where(pos, pa_c * pb_rs[hh],
                                  na_c * nb_rs[hh]) * mult_b
                    e_sig = jnp.where(pos, e, slope * e)
                    # lhs [ abar | S_bar | 0pad ]^T: ch+1 live rows, padded
                    # to a sublane multiple — two skinny-M passes replace
                    # the old q-matrix + ones-column dots
                    lhs = jnp.transpose(jnp.concatenate(
                        [abar, sbar,
                         jnp.zeros((c, lhs_rows - ch - 1), jnp.float32)],
                        axis=1,
                    ))                                       # [lhs_rows, Ci]
                    dx_parts.append(jax.lax.dot(
                        lhs[:ch], e, preferred_element_type=jnp.float32
                    ))
                    z = jax.lax.dot(
                        lhs, e_sig, preferred_element_type=jnp.float32
                    )                                        # [lhs_rows, Cj]
                    # d a_src_j = x_j . (e_sig^T A_bar)_j + (e_sig^T S)_j
                    db_parts.append(jnp.sum(
                        xp_ts[hh] * z[:ch], axis=0, keepdims=True
                    ) + z[ch: ch + 1])
                return (
                    dxp_all + jnp.concatenate(dx_parts, axis=0),
                    dbeta_all + jnp.concatenate(db_parts, axis=0),
                )

            dxp_all, dbeta_all = jax.lax.fori_loop(
                0, occ_ref[base + g_i], slot_body,
                (jnp.zeros((hc, c), jnp.float32),
                 jnp.zeros((h, c), jnp.float32)),
            )
            dx_out = [jnp.transpose(dxp_all[hh * ch: (hh + 1) * ch])
                      for hh in range(h)]               # [Cj, ch] each
            dbeta_out = [jnp.transpose(dbeta_all[hh: hh + 1])
                         for hh in range(h)]            # [Cj, 1] each
            out_ref[g_i] = jnp.concatenate(
                dx_out + dbeta_out
                + [jnp.zeros((c, pack1 - hc - h), jnp.float32)],
                axis=1,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((g_chunks, d, c, c),
                         lambda bi, src, occ: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_chunks, c, pack1),
                         lambda bi, src, occ: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g_chunks, c, pack1),
                               lambda bi, src, occ: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RING * g_chunks, c, pack2), pay2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, c, pack1), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * b_pad * d * h * c * c * ch,
            bytes_accessed=int(np.prod(mult.shape)) * mult.dtype.itemsize
            + b_pad * c * (pack1 + pack2) * 4,
            transcendentals=b_pad * d * h * 6 * c,
        ),
        interpret=_interpret(),
    )(src_chunk, occ, mult, own1, pay2)


@functools.partial(
    jax.jit,
    static_argnames=("c", "g_chunks", "d", "h", "ch", "pack1", "slope",
                     "normalized"),
)
def _sweep_fused_call(src_chunk, occ, mult, gbar3, pay3, out3, ring1, *, c,
                      g_chunks, d, h, ch, pack1, slope, normalized=False):
    """ONE-kernel backward walking the FORWARD tables only: own = the
    cotangent gbar3 + fwd payload pay3 + kernel output out3 blocks (their
    relevant lanes indexed directly — no [N, pack2] grad-payload G2 is
    ever materialized, killing the three XLA selector matmuls + one
    full-size HBM round-trip per layer), ring = fwd payload — and each
    slot's [C, C] e-matrix build (the dominant VPU cost: the round-4
    attribution puts ~2.0 ms/head/layer on it, paid once per sweep)
    feeds THREE dots instead of one:

      dot(e_sig, [x_j | 1])        -> d a_dst_i   (own-oriented, as before)
      dot([abar|sbar]^T, e_sig)    -> z2: per-source d a_src partials
      dot(abar^T, e)               -> z1: per-source d xp

    The source-oriented z rows land in a revolving per-source-chunk VMEM
    accumulator: by bandedness (|chunk(i) - chunk(j)| <= max_chunk_dist <=
    g_chunks) a source G-block jb only receives contributions from own
    steps jb-1, jb, jb+1, so a 4-deep rotation of G-block accumulators
    suffices — block bi-2 is flushed to its output window (index map
    bi -> clamp(bi-2)) and zeroed for reuse as block bi+2. The grid runs
    nb + 2 steps (the trailing two only flush). This replaces the entire
    transpose-table source sweep: one e-build instead of two, no second
    kernel launch, no second A-table stream, and no dependence on
    g.transpose (round-5; same-process A/B vs the two-sweep path in
    docs/PERF_NOTES.md).

    Outputs: out1 [b_pad, c, pack1] rows [ 0 | 0 | d a_dst | 0 ] and
    out2 [b_pad, r_pad, c] per-source z rows (head hh at row offset
    hh*(ch + lhs_rows): ch rows z1, then lhs_rows rows z2 with rows
    ch..lhs_rows-1 zero); the caller transposes out2 once in XLA and
    contracts z2 with xp for d a_src."""
    b_pad = mult.shape[0]
    nb = b_pad // g_chunks
    hc = h * ch
    lhs_rows = ((ch + 1 + 7) // 8) * 8
    rph = ch + lhs_rows
    r_pad = ((h * rph + 7) // 8) * 8
    n_acc = 4 * g_chunks

    def kernel(src_ref, occ_ref, a_ref, gbar_ref, pay_ref, out_ref,
               pay_hbm, out1_ref, out2_ref, acc, ring, sem):
        bi = pl.program_id(0)
        base = bi * g_chunks
        chunk_payload = _ring_plumbing(pay_hbm, ring, sem, g_chunks, nb)

        @pl.when(bi == 0)
        def _():
            acc[...] = jnp.zeros((n_acc, r_pad, c), jnp.float32)

        @pl.when(bi < nb)
        def _compute():
            ones_col = jnp.ones((c, 1), jnp.float32)
            for g_i in range(g_chunks):
                # own-side lanes read straight from their sources:
                # A_bar/S_bar from the cotangent's acc/s lanes, a_dst from
                # the fwd payload, m from the kernel output
                gb = gbar_ref[g_i]                       # [C, pack1]
                po = pay_ref[g_i]
                oo = out_ref[g_i]
                if normalized:
                    # kernel output was val = acc/s: transform the val
                    # cotangent to the raw-(acc, s) gauge in-register —
                    # A_bar = gbar/s, S_bar = gbar_s - (gbar . val)/s
                    abar_hs, sbar_hs = [], []
                    for hh in range(h):
                        gv = gb[:, hh * ch: (hh + 1) * ch]
                        val = oo[:, hh * ch: (hh + 1) * ch]
                        inv_s = 1.0 / jnp.maximum(
                            oo[:, hc + h + hh: hc + h + hh + 1], 1e-16)
                        abar_hs.append(gv * inv_s)
                        sbar_hs.append(
                            gb[:, hc + h + hh: hc + h + hh + 1]
                            - jnp.sum(gv * val, axis=1, keepdims=True)
                            * inv_s
                        )
                else:
                    abar_hs = [gb[:, hh * ch: (hh + 1) * ch]
                               for hh in range(h)]
                    sbar_hs = [gb[:, hc + h + hh: hc + h + hh + 1]
                               for hh in range(h)]
                alpha_hs = [po[:, hc + h + hh: hc + h + hh + 1]
                            for hh in range(h)]
                m_hs = [oo[:, hc + hh: hc + hh + 1] for hh in range(h)]
                # hoisted per-head lhs^T = [ abar | sbar | 0 ]^T
                lhsT_hs = [
                    jnp.transpose(jnp.concatenate(
                        [abar_hs[hh], sbar_hs[hh],
                         jnp.zeros((c, lhs_rows - ch - 1), jnp.float32)],
                        axis=1,
                    ))                                   # [lhs_rows, Ci]
                    for hh in range(h)
                ]

                def slot_body(d_i, hacc_all):            # [C, h*(ch+1)]
                    src = src_ref[base + g_i, d_i]
                    buf = chunk_payload(src)             # [C, pack1]
                    mult_b = a_ref[g_i, d_i].astype(jnp.float32)
                    bs = jnp.transpose(buf[:, hc: hc + h])       # [H, Cj]
                    maxs = jnp.max(bs, axis=1, keepdims=True)    # [H, 1]
                    hacc_parts, z_parts = [], []
                    for hh in range(h):
                        mb = maxs[hh, 0]
                        cand = alpha_hs[hh] + mb
                        pa = jnp.exp(cand - m_hs[hh])            # [Ci, 1]
                        na = jnp.exp(slope * cand - m_hs[hh])
                        brow = bs[hh: hh + 1, :]                 # [1, Cj]
                        pb = jnp.exp(brow - mb)
                        nb_ = jnp.exp(slope * (brow - mb))
                        t = brow + alpha_hs[hh]                  # [Ci, Cj]
                        pos = t >= 0
                        e = jnp.where(pos, pa * pb, na * nb_) * mult_b
                        e_sig = jnp.where(pos, e, slope * e)
                        rhs = jnp.concatenate(
                            [buf[:, hh * ch: (hh + 1) * ch], ones_col],
                            axis=1,
                        )                                        # [Cj, ch+1]
                        hacc_parts.append(jax.lax.dot(
                            e_sig, rhs, preferred_element_type=jnp.float32
                        ))
                        z_parts.append(jax.lax.dot(
                            lhsT_hs[hh][:ch], e,
                            preferred_element_type=jnp.float32,
                        ))                                       # [ch, Cj]
                        z_parts.append(jax.lax.dot(
                            lhsT_hs[hh], e_sig,
                            preferred_element_type=jnp.float32,
                        ))                                       # [lhs_rows, Cj]
                    z_all = jnp.concatenate(z_parts, axis=0)
                    if r_pad > h * rph:
                        z_all = jnp.concatenate(
                            [z_all,
                             jnp.zeros((r_pad - h * rph, c), jnp.float32)],
                            axis=0,
                        )
                    jslot = (
                        jax.lax.rem(src // g_chunks, 4) * g_chunks
                        + jax.lax.rem(src, g_chunks)
                    )
                    acc[jslot] = acc[jslot] + z_all
                    return hacc_all + jnp.concatenate(hacc_parts, axis=1)

                hacc_all = jax.lax.fori_loop(
                    0, occ_ref[base + g_i], slot_body,
                    jnp.zeros((c, h * (ch + 1)), jnp.float32),
                )
                dalpha = []
                for hh in range(h):
                    h_acc = hacc_all[:, hh * (ch + 1): (hh + 1) * (ch + 1)]
                    da = jnp.sum(abar_hs[hh] * h_acc[:, :ch], axis=1,
                                 keepdims=True)
                    dalpha.append(da + sbar_hs[hh] * h_acc[:, ch: ch + 1])
                out1_ref[g_i] = jnp.concatenate(
                    [jnp.zeros((c, hc + h), jnp.float32)]
                    + dalpha
                    + [jnp.zeros((c, pack1 - hc - 2 * h), jnp.float32)],
                    axis=1,
                )

        # flush source G-block bi-2 (complete after step bi-1) and zero
        # its accumulator slot for reuse as block bi+2
        @pl.when(bi >= 2)
        def _flush():
            s = jax.lax.rem(bi - 2, 4) * g_chunks
            for g_i in range(g_chunks):
                out2_ref[g_i] = acc[s + g_i]
                acc[s + g_i] = jnp.zeros((r_pad, c), jnp.float32)

    own_spec = pl.BlockSpec(
        (g_chunks, c, pack1),
        lambda bi, src, occ: (jnp.minimum(bi, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb + 2,),
        in_specs=[
            pl.BlockSpec((g_chunks, d, c, c),
                         lambda bi, src, occ: (jnp.minimum(bi, nb - 1),
                                               0, 0, 0),
                         memory_space=pltpu.VMEM),
            own_spec,
            own_spec,
            own_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((g_chunks, c, pack1),
                         lambda bi, src, occ: (jnp.minimum(bi, nb - 1),
                                               0, 0)),
            pl.BlockSpec((g_chunks, r_pad, c),
                         lambda bi, src, occ: (
                             jnp.clip(bi - 2, 0, nb - 1), 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((4 * g_chunks, r_pad, c), jnp.float32),
            pltpu.VMEM((RING * g_chunks, c, pack1), ring1.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c, pack1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, r_pad, c), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b_pad * d * h * c * c * ch,
            bytes_accessed=int(np.prod(mult.shape)) * mult.dtype.itemsize
            + b_pad * c * (5 * pack1 + r_pad) * 4,
            transcendentals=b_pad * d * h * 4 * c,
        ),
        interpret=_interpret(),
    )(src_chunk, occ, mult, gbar3, pay3, out3, ring1)


def _grid_pad(g: BsdaGraph, g_chunks: int, payload, fill_rows, ring):
    """Pad tables, own-blocks AND the ring-side stream to a multiple of
    g_chunks. The ring DMA copies whole G-blocks: without padding, the
    last block's dynamic-slice start clamps and the copied rows shift by
    pad_b — silently corrupting every read from the final G-block (the
    fwd kernel pads its payload for the same reason)."""
    b = g.num_chunks
    d = g.depth
    pad_b = (-b) % g_chunks
    mult = g.a
    src_chunk = g.src_chunk
    # per-chunk slot cover for the occupancy-gated source sweep; padded
    # chunks have no edges (occ 0). Falls back to a dense compute from the
    # tables when the graph was built without slot_occ.
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
            [src_chunk, jnp.full((pad_b, d), b - 1, src_chunk.dtype)],
            axis=0,
        )
        occ = jnp.concatenate([occ, jnp.zeros(pad_b, occ.dtype)], axis=0)
        payload = jnp.concatenate(
            [payload,
             jnp.broadcast_to(fill_rows, (pad_b,) + payload.shape[1:])],
            axis=0,
        )
        ring = jnp.concatenate(
            [ring, jnp.zeros((pad_b,) + ring.shape[1:], ring.dtype)],
            axis=0,
        )
    return src_chunk, occ, mult, payload, ring, b + pad_b


def one_sweep_eligible(g: BsdaGraph, h: int, ch: int) -> bool:
    """True when the fused one-kernel backward supports this graph/shape
    (revolving accumulator fits VMEM). `EGNN_GAT_ONE_SWEEP=0` disables
    it for A/B against the two-sweep path."""
    import os

    c = g.chunk
    b = g.num_chunks
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    lhs_rows = ((ch + 1 + 7) // 8) * 8
    r_pad = ((h * (ch + lhs_rows) + 7) // 8) * 8
    return (
        os.environ.get("EGNN_GAT_ONE_SWEEP", "1") != "0"
        and pack_width(h, ch) <= 512
        and g_chunks <= 64
        and b >= 2
        and (b + (-b) % g_chunks) // g_chunks > RING
        and 4 * g_chunks * r_pad * c * 4 <= 4 * 1024 * 1024
    )


def flash_gat_backward3(g: BsdaGraph, payload, gbar, out_k, h: int, ch: int,
                        negative_slope: float, normalized: bool = False):
    """Dense-block VJP of the flash forward — fused one-kernel sweep fed
    by its three natural streams (no G2 grad-payload is materialized):

      payload [N_pad, pack1] fwd payload (a_dst lanes + ring xp/a_src),
      gbar    [N_pad, pack1] output cotangent (acc lanes = A_bar,
              s lanes = S_bar; m lanes ignored),
      out_k   [N_pad, pack1] kernel forward output (m lanes; with
              normalized=True also the val/s lanes, and gbar is the VAL
              cotangent — the kernel transforms it to the raw gauge
              in-register).

    Returns the payload cotangent [N_pad, pack1] rows
    [ d xp | d a_src | d a_dst | 0 ], or None when ineligible.
    """
    c = g.chunk
    b = g.num_chunks
    pack1 = pack_width(h, ch)
    hc = h * ch
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    if payload.shape != (b * c, pack1) or gbar.shape != payload.shape \
            or out_k.shape != payload.shape:
        return None
    if not one_sweep_eligible(g, h, ch):
        return None
    slope = float(negative_slope)

    pay3 = payload.astype(jnp.float32).reshape(b, c, pack1)
    gbar3 = gbar.astype(jnp.float32).reshape(b, c, pack1)
    out3 = out_k.astype(jnp.float32).reshape(b, c, pack1)
    # grid padding: padded chunks have occ 0 (no slots run) and are never
    # referenced as sources by real chunks, so zero fill is fine for all
    # three own streams AND the ring
    zero_fill = jnp.zeros((pack1,), jnp.float32)
    src_c, occ_d, mult, gbar_p, ring_p, b_pad = _grid_pad(
        g, g_chunks, gbar3, zero_fill, pay3,
    )
    pad_b = b_pad - b
    if pad_b:
        zrows = jnp.zeros((pad_b, c, pack1), jnp.float32)
        pay_p = jnp.concatenate([pay3, zrows], axis=0)
        out_p = jnp.concatenate([out3, zrows], axis=0)
    else:
        pay_p, out_p = pay3, out3

    out1, out2 = _sweep_fused_call(
        src_c, occ_d, mult, gbar_p, pay_p, out_p, ring_p,
        c=c, g_chunks=g_chunks, d=g.depth, h=h, ch=ch, pack1=pack1,
        slope=slope, normalized=bool(normalized),
    )
    lhs_rows = ((ch + 1 + 7) // 8) * 8
    rph = ch + lhs_rows
    r_pad = ((h * rph + 7) // 8) * 8
    d_adst = out1.reshape(-1, pack1)[: b * c]
    # [b_pad, r_pad, c] -> per-node z rows [N, r_pad] (one XLA transpose),
    # then contract z2 with xp for d a_src
    znode = jnp.swapaxes(out2, 1, 2).reshape(-1, r_pad)[: b * c]
    payf = payload.astype(jnp.float32)
    dxp_parts, dasrc_parts = [], []
    for hh in range(h):
        zb = hh * rph
        dxp_parts.append(znode[:, zb: zb + ch])
        z2a = znode[:, zb + ch: zb + 2 * ch]
        z2b = znode[:, zb + 2 * ch: zb + 2 * ch + 1]
        xp_h = payf[:, hh * ch: (hh + 1) * ch]
        dasrc_parts.append(
            jnp.sum(xp_h * z2a, axis=1, keepdims=True) + z2b)
    d_src = jnp.concatenate(
        dxp_parts + dasrc_parts
        + [jnp.zeros((b * c, pack1 - hc - h), jnp.float32)],
        axis=1,
    )
    return d_adst + d_src


def flash_gat_backward(g: BsdaGraph, payload, g2, h: int, ch: int,
                       negative_slope: float):
    """Dense-block VJP of the flash forward (G2 grad-payload interface).

    payload [N_pad, pack1] fwd payload; g2 [N_pad, pack2] grad payload
    [ A_bar | S_bar | a_dst | m ]. Returns the payload cotangent
    [N_pad, pack1] rows [ d xp | d a_src | d a_dst | 0 ], or None when
    the shapes don't fit (caller falls back to autodiff-able XLA).

    Production (packed_gat.py) calls flash_gat_backward3 directly with
    the three source arrays; this wrapper keeps the G2 interface for
    tools/tests and the two-sweep fallback, reconstructing the lane
    views from g2 when routing to the one-sweep kernel.
    """
    c = g.chunk
    b = g.num_chunks
    pack1 = pack_width(h, ch)
    pack2 = g2_pack_width(h, ch)
    hc = h * ch
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    if payload.shape != (b * c, pack1) or g2.shape != (b * c, pack2):
        return None
    if pack2 > 512 or g_chunks > 64 or b < 2:
        return None
    if (b + (-b) % g_chunks) // g_chunks <= RING:
        return None
    slope = float(negative_slope)

    if one_sweep_eligible(g, h, ch):
        g2f = g2.astype(jnp.float32)
        z = jnp.zeros((b * c, pack1), jnp.float32)
        gbar = jnp.concatenate(
            [g2f[:, :hc], jnp.zeros((b * c, h), jnp.float32),
             g2f[:, hc: hc + h], z[:, hc + 2 * h:]], axis=1)
        pay_mix = jnp.concatenate(
            [payload.astype(jnp.float32)[:, : hc + h],
             g2f[:, hc + h: hc + 2 * h],
             jnp.zeros((b * c, pack1 - hc - 2 * h), jnp.float32)], axis=1)
        out_k = jnp.concatenate(
            [z[:, :hc], g2f[:, hc + 2 * h: hc + 3 * h],
             z[:, hc + h:]], axis=1)
        return flash_gat_backward3(g, pay_mix, gbar, out_k, h, ch, slope)

    # two-sweep fallback: dest sweep over the forward tables + source
    # sweep over the TRANSPOSE tables (own = fwd payload; ring = G2)
    gT = g.transpose
    if gT is None:
        return None
    gt_chunks = max(GROUP, int(gT.max_chunk_dist))
    if gt_chunks > 64 or gT.num_chunks != b or gT.chunk != c:
        return None
    if (gT.num_chunks + (-gT.num_chunks) % gt_chunks) // gt_chunks <= RING:
        return None

    pay3 = payload.astype(jnp.float32).reshape(b, c, pack1)
    g23 = g2.astype(jnp.float32).reshape(b, c, pack2)
    # dest sweep own = G2 (pad: zeros with a_dst lanes at NEG_INF so the
    # rank-1 exponents vanish), ring = fwd payload
    fill2 = np.zeros(pack2, np.float32)
    fill2[hc + h: hc + 2 * h] = NEG_INF
    src_c, occ_d, mult, own2, ring1, _ = _grid_pad(
        g, g_chunks, g23, jnp.asarray(fill2), pay3,
    )
    d_adst = _sweep_dst_call(
        src_c, occ_d, mult, own2, ring1,
        c=c, g_chunks=g_chunks, d=g.depth, h=h, ch=ch, pack1=pack1,
        pack2=pack2, slope=slope,
    ).reshape(-1, pack1)[: b * c]
    src_t, occ_t, mult_t, own1, ring2, _ = _grid_pad(
        gT, gt_chunks, pay3, jnp.full((pack1,), NEG_INF, jnp.float32), g23,
    )
    d_src = _sweep_src_call(
        src_t, occ_t, mult_t, own1, ring2,
        c=c, g_chunks=gt_chunks, d=gT.depth, h=h, ch=ch, pack1=pack1,
        pack2=pack2, slope=slope,
    ).reshape(-1, pack1)[: b * c]

    return d_adst + d_src
