"""BSDA GAT attention: SDDMM + segment-softmax + weighted SpMM as dense
chunk-pair compute on the MXU.

The ELL GAT path (kernels/ell.py::ell_gat_aggregate) is gather-bound like
any row-gather on TPU. This encoding reuses the BSDA chunk structure
(kernels/bsda.py): per destination chunk b and slot d, attention scores
form a dense C x C block

    score[b,d,i,j] = LeakyReLU(a_src . Wx[src_j] + a_dst . Wx[dst_i])

masked by the block's edge-multiplicity pattern (parallel edges contribute
`mult` identical softmax terms — exactly PyG's semantics for duplicate
edges). The per-destination softmax spans the D dense blocks AND the spill
residual; the two parts combine with a streaming-softmax (flash-attention
style) merge of (max, sumexp, weighted-sum) triples, so the result is
bitwise the global segment softmax.

Heads are processed sequentially to bound transient memory at one
[B, D, C, C] score tensor.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from .bsda import BsdaGraph

NEG_INF = -1e30


def _dense_part(g: BsdaGraph, xp_h, asrc_h, adst_h, negative_slope):
    """Per-head dense-block attention partials.

    xp_h [N_pad, Ch], asrc_h/adst_h [N_pad] (padded to the chunk grid).
    Returns (m [B,C], s [B,C], acc [B,C,Ch]) — running max, sum of
    exp(score - m) weighted by multiplicity, and the weighted feature sum.

    Written so the [B, D, C, C] score tensor is never stored: the max pass
    recomputes scores inside its reduction (XLA fuses elementwise producers
    into reduces, not into dot operands), and the single materialized
    tensor is the exp-weights `e` — in bf16 on the amp path — consumed by
    ONE einsum whose last column is all-ones, yielding the softmax
    denominator for free. ~4x less HBM traffic than the round-1 version
    that stored f32 scores and read them for max/exp/sum/dot separately.
    """
    b, c = g.num_chunks, g.chunk
    mult = g.a  # [B, D, C, C] edge multiplicities (0 = no edge)
    asrc3 = asrc_h.reshape(b, c)
    adst3 = adst_h.reshape(b, c)
    xp3 = xp_h.reshape(b, c, -1)

    asrc_chunks = asrc3[g.src_chunk]  # [B, D, C]
    valid = mult > 0

    def scores():
        return jnp.where(
            valid,
            jax.nn.leaky_relu(
                asrc_chunks[:, :, None, :] + adst3[:, None, :, None],
                negative_slope,
            ),
            NEG_INF,
        )

    m = jnp.max(scores(), axis=(1, 3))  # [B, C]; fused reduction
    e = jnp.exp(scores() - m[:, None, :, None]) * mult.astype(jnp.float32)
    # the stored exp-weight tensor is the traffic bottleneck: bf16 on TPU
    # (the MXU demotes f32 dot operands to bf16 anyway), f32 elsewhere so
    # CPU parity oracles stay exact
    e_dtype = (
        jnp.bfloat16 if jax.default_backend() == "tpu" else xp_h.dtype
    )
    e = e.astype(e_dtype)
    xp_h = xp_h.astype(e_dtype)
    xp_chunks = xp3[g.src_chunk]  # [B, D, C, Ch] (Ch small; cheap gather)
    # ones-column trick: one dot produces both the weighted feature sum and
    # the softmax denominator
    xp_ext = jnp.concatenate(
        [xp_chunks, jnp.ones(xp_chunks.shape[:-1] + (1,), xp_chunks.dtype)],
        axis=-1,
    )
    acc_ext = jnp.einsum(
        "bdij,bdjf->bif", e, xp_ext, preferred_element_type=jnp.float32
    )
    return m, acc_ext[..., -1], acc_ext[..., :-1]


def _spill_part(g: BsdaGraph, xp, asrc, adst, negative_slope):
    """Residual attention partials over compact spill rows, ALL heads.

    xp [N_pad, H, Ch], asrc/adst [N_pad, H].
    Returns (m2 [R, H], s2 [R, H], acc2 [R, H, Ch])."""
    res = g.residual
    rows = g.residual_rows  # compact row -> node id
    m2_parts, s2_parts, acc_parts = [], [], []
    h, ch = xp.shape[1], xp.shape[2]
    for nbr, w, rws in zip(res.nbrs, res.weights, res.rows):
        valid = (w > 0)[:, :, None]
        sc = jax.nn.leaky_relu(
            asrc[nbr] + adst[rows[rws]][:, None, :], negative_slope
        )  # [R, W, H]
        sc = jnp.where(valid, sc, NEG_INF)
        m_l = jnp.max(sc, axis=1)  # [R, H]
        e = jnp.exp(sc - m_l[:, None, :]) * w[:, :, None]  # w = multiplicity
        s_l = e.sum(axis=1)
        acc_l = jnp.einsum(
            "rwh,rwhf->rhf", e, xp[nbr], preferred_element_type=jnp.float32
        )
        m2_parts.append(m_l)
        s2_parts.append(s_l)
        acc_parts.append(acc_l)
    if res.n_zero_deg:
        z = res.n_zero_deg
        m2_parts.append(jnp.full((z, h), NEG_INF))
        s2_parts.append(jnp.zeros((z, h)))
        acc_parts.append(jnp.zeros((z, h, ch)))
    m2 = jnp.concatenate(m2_parts)
    s2 = jnp.concatenate(s2_parts)
    acc2 = jnp.concatenate(acc_parts)
    if res.inv_perm is not None:
        m2 = m2[res.inv_perm]
        s2 = s2[res.inv_perm]
        acc2 = acc2[res.inv_perm]
    return m2, s2, acc2


def _attend_impl(g: BsdaGraph, xp, asrc, adst, negative_slope, use_flash):
    """Global segment-softmax attention on PADDED arrays.

    xp [N_pad, H, Ch], asrc/adst [N_pad, H] (N_pad = num_chunks * chunk,
    padded rows carry NEG_INF coefficients). Returns (y, m, s) all padded:
    y [N_pad, H, Ch] the attention output, m/s [N_pad, H] the merged
    (running-max, sum-exp) softmax state — the residuals the fused VJP
    needs to reconstruct the softmax weights without re-reducing.
    """
    n_pad, h, ch = xp.shape

    flash = None
    if use_flash:
        # forward-only Pallas kernel: the whole per-chunk softmax stays in
        # VMEM (kernels/pallas_gat.py) — ~8x less HBM traffic than the XLA
        # dense path
        from .pallas_gat import flash_gat_dense

        flash = flash_gat_dense(g, xp, asrc, adst, negative_slope)
    if flash is not None:
        m, s, acc = flash
    else:
        ms, ss, accs = [], [], []
        for head in range(h):
            m_h, s_h, acc_h = _dense_part(
                g, xp[:, head, :], asrc[:, head], adst[:, head],
                negative_slope,
            )
            # fence each head: without this XLA fuses/schedules the four
            # heads' score pipelines together and materializes ~1.3 GB of
            # [B,D,C,C] transients (measured 12 ms); fenced, each head
            # keeps the compact fused form (~0.4 ms/head)
            m_h, s_h, acc_h = jax.lax.optimization_barrier(
                (m_h, s_h, acc_h)
            )
            ms.append(m_h.reshape(-1))
            ss.append(s_h.reshape(-1))
            accs.append(acc_h.reshape(-1, ch))
        m = jnp.stack(ms, axis=1)      # [N_pad, H]
        s = jnp.stack(ss, axis=1)
        acc = jnp.stack(accs, axis=1)  # [N_pad, H, Ch]

    if g.residual is not None:
        m2c, s2c, acc2c = _spill_part(g, xp, asrc, adst, negative_slope)
        rows = g.residual_rows
        m2 = jnp.full((n_pad, h), NEG_INF).at[rows].set(m2c)
        s2 = jnp.zeros((n_pad, h)).at[rows].set(s2c)
        acc2 = jnp.zeros((n_pad, h, ch)).at[rows].set(acc2c)
        # streaming-softmax merge of the two partials
        big = jnp.maximum(m, m2)
        w1 = jnp.exp(m - big)
        w2 = jnp.exp(m2 - big)
        m = big
        s = s * w1 + s2 * w2
        acc = acc * w1[..., None] + acc2 * w2[..., None]

    y = acc / jnp.maximum(s, 1e-16)[..., None]
    return y, m, s


def bsda_gat_aggregate(
    g: BsdaGraph,
    x_proj: jnp.ndarray,
    alpha_src: jnp.ndarray,
    alpha_dst: jnp.ndarray,
    negative_slope: float = 0.2,
    use_flash: bool = False,
    fused_vjp: bool = False,
) -> jnp.ndarray:
    """Per-destination softmax-weighted neighbor sum, all heads.

    x_proj [N, H, Ch], alpha_src/alpha_dst [N, H] -> [N, H, Ch].
    `g` must be built from the self-looped edge set with unit weights
    (build_bsda_for_kind(..., 'gat')): `a` then holds edge multiplicities.

    use_flash: run the forward through the Pallas flash kernel (TPU
    inference/eval path). fused_vjp: attach the manual backward
    (gat_bwd.py) via jax.custom_vjp — the training path on TPU; the
    forward may then also use the flash kernel since autodiff never
    differentiates through it.
    """
    n0, h, ch = x_proj.shape
    n_pad = g.num_chunks * g.chunk - n0

    def pad(v, fill=0.0):
        if n_pad == 0:
            return v
        shape = (n_pad,) + v.shape[1:]
        return jnp.concatenate([v, jnp.full(shape, fill, v.dtype)], axis=0)

    xp = pad(x_proj)            # [N_pad, H, Ch]
    asrc = pad(alpha_src, NEG_INF)  # [N_pad, H]
    adst = pad(alpha_dst, NEG_INF)

    if fused_vjp:
        from .gat_bwd import attend_bwd

        @jax.custom_vjp
        def attend(xp, asrc, adst):
            y, _, _ = _attend_impl(g, xp, asrc, adst, negative_slope,
                                   use_flash)
            return y

        def attend_fwd(xp, asrc, adst):
            y, m, s = _attend_impl(g, xp, asrc, adst, negative_slope,
                                   use_flash)
            return y, (xp, asrc, adst, m, s, y)

        def attend_rev(res, gbar):
            return attend_bwd(g, negative_slope, res, gbar)

        attend.defvjp(attend_fwd, attend_rev)
        return attend(xp, asrc, adst)[:n0]

    y, _, _ = _attend_impl(g, xp, asrc, adst, negative_slope, use_flash)
    return y[:n0]
