"""Fully-packed GAT forward: the whole eval stack in [N, pack] form.

Why this exists: TPU arrays tile the minor dimension to 128 lanes (and the
second-minor to 8 sublanes), so the "natural" GAT intermediates are
catastrophically padded in HBM — a [N, heads=4] f32 coefficient array
occupies 32x its logical bytes, a [N, 4, 8] per-head feature tensor 16x.
Profiling the round-1 path showed those relayouts/pads dominating the
aggregate (≥3 ms of a 5.6 ms aggregate at Elliptic scale).

This module eliminates every narrow intermediate:

  1. projection + attention coefficients fuse into ONE GEMM:
       payload = h_in @ P,  P = [ W.reshape(F, H*Ch) | W a_src | W a_dst | 0 ]
     (a_src/a_dst are linear in the projected features, so they fold into
     the projection matrix) — producing the flash kernel's packed payload
     [N, pack] directly, perfectly lane-tiled;
  2. the banded flash kernel (pallas_gat.py) consumes and emits packed
     rows [ acc | m | s | pad ];
  3. the residual-spill streaming-softmax merge gathers only the few spill
     rows (R ~ hundreds) before touching narrow lanes;
  4. softmax normalization + bias + ELU happen in packed space: the
     denominator is broadcast from the s-lanes to the acc-lanes with a
     constant [pack, pack] selector matmul (MXU) instead of a reshape;
  5. the next layer's GEMM consumes the packed activation directly — its
     projection matrix simply has zero rows for the m/s/pad lanes.

Forward-only (inference + per-epoch val eval). Training keeps the
autodiff-able XLA path in bsda_gat.py. Semantics match PyG GATConv
(reference src/models/gnn.py:56-76): LeakyReLU(0.2) scores, per-destination
softmax over the self-looped edge multiset, ELU + concat between layers,
single-head final layer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bsda import BsdaGraph
from .pallas_gat import NEG_INF, flash_eligible, flash_gat_payload, pack_width


def _spill_gather_index(g: BsdaGraph):
    """Concatenated payload gather index for the spill merge — every spill
    neighbor id followed by the spill destination node ids — plus the
    per-bucket segment sizes needed to slice the fused gather back apart.

    ONE fused gather matters under autodiff: each separate gather's
    transpose materializes its own full [N, pack] zero+scatter buffer in
    the backward — several width buckets plus the destination-row gather
    was ~4.3 ms of the 34.6 ms train step for 0.6% of the edges (round-4
    attribution, docs/PERF_NOTES.md)."""
    res = g.residual
    rows = g.residual_rows  # compact spill row -> node id
    flat_parts = [jnp.reshape(nbr, (-1,)) for nbr in res.nbrs]
    dst_parts = [rows[rws] for rws in res.rows]
    sizes = [int(p.shape[0]) for p in flat_parts]
    dsizes = [int(p.shape[0]) for p in dst_parts]
    return jnp.concatenate(flat_parts + dst_parts), sizes, dsizes


def _spill_merge_rows(g: BsdaGraph, gathered, cur, h, ch, pack,
                      negative_slope, sizes, dsizes, normalized=False):
    """Compact spill merge: from `gathered` [sum(sizes)+sum(dsizes), pack]
    fused-gather payload rows (neighbors then destinations) and `cur`
    [R, pack] kernel partials on the spill rows, recompute the spill
    attention partials and streaming-softmax-merge them (mirrors
    bsda_gat.py::_spill_part). Returns merged [R, pack]. Everything here is
    compact [R]-space jnp (R ~ hundreds) and differentiable — the
    full-size gathers/scatters stay OUTSIDE (at the caller / custom-VJP
    boundary). normalized=True: `cur` acc lanes hold val = acc/s (the
    in-kernel-normalized output) — raw partials are recovered as val*s
    and the merged rows are re-normalized before return."""
    res = g.residual
    hc = h * ch
    pay_ns, adst_rs = [], []
    off = 0
    for nbr, n in zip(res.nbrs, sizes):
        pay_ns.append(gathered[off: off + n].reshape(nbr.shape + (pack,)))
        off += n
    for nd in dsizes:
        adst_rs.append(gathered[off: off + nd, hc + h: hc + 2 * h])
        off += nd
    m2p, s2p, accp = [], [], []
    for pay_n, adst_r, w in zip(pay_ns, adst_rs, res.weights):
        asrc_n = pay_n[..., hc: hc + h]          # [R, W, H]
        sc = asrc_n + adst_r[:, None, :]
        sc = jnp.where(sc >= 0, sc, sc * negative_slope)
        sc = jnp.where((w > 0)[:, :, None], sc, NEG_INF)
        m_l = jnp.max(sc, axis=1)                # [R, H]
        e = jnp.exp(sc - m_l[:, None, :]) * w[:, :, None]
        s_l = e.sum(axis=1)
        xp_n = pay_n[..., :hc].reshape(*pay_n.shape[:2], h, ch)
        acc_l = jnp.einsum(
            "rwh,rwhf->rhf", e, xp_n, preferred_element_type=jnp.float32
        )
        m2p.append(m_l)
        s2p.append(s_l)
        accp.append(acc_l)
    if res.n_zero_deg:
        z = res.n_zero_deg
        m2p.append(jnp.full((z, h), NEG_INF))
        s2p.append(jnp.zeros((z, h)))
        accp.append(jnp.zeros((z, h, ch)))
    m2 = jnp.concatenate(m2p)
    s2 = jnp.concatenate(s2p)
    acc2 = jnp.concatenate(accp)
    if res.inv_perm is not None:
        m2 = m2[res.inv_perm]
        s2 = s2[res.inv_perm]
        acc2 = acc2[res.inv_perm]

    m1 = cur[:, hc: hc + h]
    s1 = cur[:, hc + h: hc + 2 * h]
    acc1 = cur[:, :hc].reshape(-1, h, ch)
    if normalized:
        acc1 = acc1 * s1[..., None]  # recover raw partials from val*s
    big = jnp.maximum(m1, m2)
    w1 = jnp.exp(m1 - big)
    w2 = jnp.exp(m2 - big)
    s = s1 * w1 + s2 * w2
    acc = acc1 * w1[..., None] + acc2 * w2[..., None]
    if normalized:
        acc = acc / jnp.maximum(s, 1e-16)[..., None]
    return jnp.concatenate(
        [acc.reshape(-1, hc), big, s,
         jnp.zeros((big.shape[0], pack - hc - 2 * h), cur.dtype)],
        axis=1,
    )


def _spill_merge_packed(g: BsdaGraph, payload, out, h, ch, negative_slope,
                        normalized=False):
    """Merge the residual-spill attention partials into the packed kernel
    output on gathered spill rows only (eval path; training folds the same
    compact math into the attend custom-VJP)."""
    res = g.residual
    if res is None:
        return out
    rows = g.residual_rows
    idx, sizes, dsizes = _spill_gather_index(g)
    merged = _spill_merge_rows(
        g, payload[idx], out[rows], h, ch, payload.shape[1],
        negative_slope, sizes, dsizes, normalized=normalized,
    )
    return out.at[rows].set(merged)


def packed_gat_forward(layer_params, x, g, negative_slope: float = 0.2):
    """Forward pass of the whole GAT stack in packed form.

    layer_params: list of {"w" [F,H,Ch], "a_src" [H,Ch], "a_dst" [H,Ch],
    "b" [out]} (models/modules.py gat_layer_init); hidden layers concat
    heads, the final layer must be single-head (concat=False semantics).
    x [N, F] node features (padded rows beyond N are fine). Returns logits
    [N, num_classes], or None when the flash kernel doesn't support the
    graph/shape (caller falls back to the unpacked path).
    """
    if not isinstance(g, BsdaGraph):
        return None
    shapes = [p["w"].shape for p in layer_params]
    if any(not flash_eligible(g, s[1], s[2]) for s in shapes):
        return None
    if shapes[-1][1] != 1:  # final layer is heads=1 (gnn.py:74 concat=False)
        return None

    n0 = x.shape[0]
    n_pad = g.num_chunks * g.chunk
    if n0 > n_pad:
        return None
    h_in = x.astype(jnp.float32)
    if n0 < n_pad:
        h_in = jnp.concatenate(
            [h_in, jnp.zeros((n_pad - n0, x.shape[1]), jnp.float32)], axis=0
        )

    n_layers = len(layer_params)
    for li, p in enumerate(layer_params):
        w = p["w"].astype(jnp.float32)
        f_in, h, ch = w.shape
        hc = h * ch
        pack = pack_width(h, ch)
        # fold the attention coefficients into the projection: ONE GEMM
        # emits [ x_proj | a_src | a_dst | 0 ] packed rows
        a_s_col = jnp.einsum("fhc,hc->fh", w, p["a_src"].astype(jnp.float32))
        a_d_col = jnp.einsum("fhc,hc->fh", w, p["a_dst"].astype(jnp.float32))
        proj = jnp.concatenate(
            [w.reshape(f_in, hc), a_s_col, a_d_col,
             jnp.zeros((f_in, pack - hc - 2 * h), jnp.float32)],
            axis=1,
        )
        if h_in.shape[1] > f_in:
            # packed input from the previous layer: its m/s/pad lanes get
            # zero projection rows
            proj = jnp.concatenate(
                [proj, jnp.zeros((h_in.shape[1] - f_in, pack), jnp.float32)],
                axis=0,
            )
        elif h_in.shape[1] < f_in:
            return None
        payload = h_in @ proj  # [n_pad, pack]

        # the kernel normalizes in-register (val = acc/s); the spill merge
        # recovers raw partials compactly for its few rows
        val = flash_gat_payload(g, payload, h, ch, negative_slope,
                                normalize=True)
        if val is None:
            return None
        val = _spill_merge_packed(g, payload, val, h, ch, negative_slope,
                                  normalized=True)

        if li == n_layers - 1:
            ncls = p["b"].shape[0]
            return (val[:, :ncls] + p["b"])[:n0]
        # bias on the acc lanes only (zero elsewhere)
        val = val + jnp.concatenate(
            [p["b"].astype(jnp.float32),
             jnp.zeros((pack - hc,), jnp.float32)]
        )
        # ELU on all lanes: the garbage m/s lanes are zeroed by the next
        # layer's projection rows anyway
        h_in = jax.nn.elu(val)
    return None  # unreachable


# ---------------- training path (custom-VJP flash attend) ----------------

def _attend_packed_trainable(g, payload, h, ch, negative_slope):
    """flash kernel forward + residual-spill merge + banded Pallas backward
    sweeps, attached via jax.custom_vjp (the kernel itself is not
    differentiable). Returns the packed, spill-merged [ acc | m | s ]
    output; the m lanes must be stop_gradient'ed by the caller (the
    backward treats the softmax shift as a constant — the flash-attention
    LSE convention, exact because acc/s is shift-invariant downstream).

    The spill merge lives INSIDE the VJP so its backward runs entirely in
    compact [R]-space (jax.vjp over _spill_merge_rows): the payload
    cotangent lands as one in-place `at[idx].add` on the sweeps' dense
    cotangent and the kernel-out cotangent as one `at[rows].set` on the
    incoming gbar. Autodiffing the merge outside instead pairs every
    full-size gather/scatter with its own [N, pack] zero+scatter transpose
    buffer — ~2.0 ms of the 31.8 ms round-4 train step for 0.6% of the
    edges (docs/PERF_NOTES.md round-4/5 attribution).

    Returns (out, normalized): on the one-sweep path the kernel emits
    val = acc/s directly (normalized=True) and the backward transforms
    the val cotangent to the raw gauge in-register — the caller must
    skip its selector-matmul normalization."""
    from .pallas_gat_bwd import (
        flash_gat_backward, flash_gat_backward3, g2_pack_width,
        one_sweep_eligible,
    )

    import os

    pack1 = pack_width(h, ch)
    pack2 = g2_pack_width(h, ch)
    hc = h * ch
    # EGNN_GAT_PRENORM=0: one-sweep backward WITHOUT the in-kernel
    # normalization (selector-matmul normalization outside) — A/B hook
    norm = one_sweep_eligible(g, h, ch) and \
        os.environ.get("EGNN_GAT_PRENORM", "1") != "0"
    # constant lane-shuffle selectors building the grad payload
    # G2 = [ A_bar | S_bar | a_dst | m ] from (cotangent, payload, out)
    s_gbar = np.zeros((pack1, pack2), np.float32)
    for lane in range(hc):
        s_gbar[lane, lane] = 1.0          # A_bar
    for i in range(h):
        s_gbar[hc + h + i, hc + i] = 1.0  # S_bar (s-lane cotangent)
    s_pay = np.zeros((pack1, pack2), np.float32)
    for i in range(h):
        s_pay[hc + h + i, hc + h + i] = 1.0   # a_dst
    s_out = np.zeros((pack1, pack2), np.float32)
    for i in range(h):
        s_out[hc + i, hc + 2 * h + i] = 1.0   # m

    spill = g.residual is not None
    if spill:
        rows = g.residual_rows
        idx, sizes, dsizes = _spill_gather_index(g)

        def merge_rows(gathered, cur):
            return _spill_merge_rows(g, gathered, cur, h, ch, pack1,
                                     negative_slope, sizes, dsizes,
                                     normalized=norm)

    @jax.custom_vjp
    def attend(payload):
        out = flash_gat_payload(g, payload, h, ch, negative_slope,
                                normalize=norm)
        if spill:
            out = out.at[rows].set(merge_rows(payload[idx], out[rows]))
        return out

    def attend_fwd(payload):
        out_k = flash_gat_payload(g, payload, h, ch, negative_slope,
                                  normalize=norm)
        out = out_k
        if spill:
            out = out_k.at[rows].set(merge_rows(payload[idx], out_k[rows]))
        return out, (payload, out_k)

    def attend_bwd(res, gbar):
        payload, out_k = res
        d_gathered = None
        if spill:
            # compact VJP of the merge. The m-lane cotangent in d_cur is
            # dropped by the sweep (it reads only gbar's acc/s lanes) —
            # exact under the LSE gauge convention: the sweeps
            # differentiate (acc, s) at fixed m, and since downstream
            # acc/s is shift-invariant the m-direction contributes zero
            # to the loss gradient.
            _, vjp_rows = jax.vjp(merge_rows, payload[idx], out_k[rows])
            d_gathered, d_cur = vjp_rows(gbar[rows])
            gbar = gbar.at[rows].set(d_cur)
        # one-sweep kernel reads (gbar, payload, out_k) lanes directly;
        # the G2 grad-payload (three selector matmuls + one full-size
        # HBM round-trip per layer) only exists on the two-sweep
        # fallback path
        ct = flash_gat_backward3(g, payload, gbar, out_k, h, ch,
                                 negative_slope, normalized=norm)
        if ct is None:
            g2 = (
                gbar @ jnp.asarray(s_gbar)
                + payload @ jnp.asarray(s_pay)
                + out_k @ jnp.asarray(s_out)
            )
            ct = flash_gat_backward(g, payload, g2, h, ch, negative_slope)
        if spill:
            ct = ct.at[idx].add(d_gathered)
        return (ct,)

    attend.defvjp(attend_fwd, attend_bwd)
    return attend(payload), norm


def packed_gat_train_forward(layer_params, x, g, rngs=None,
                             dropout: float = 0.0,
                             negative_slope: float = 0.2):
    """Differentiable packed GAT forward for TRAINING.

    Identical math and packing to packed_gat_forward, but every op outside
    the flash kernel is plain autodiff-able jnp (spill merge,
    normalization, bias, ELU, dropout), and the kernel itself carries the
    banded Pallas backward sweeps via custom_vjp. Returns logits
    [N, num_classes] or None when unsupported (caller falls back to the
    autodiff XLA path)."""
    from .pallas_gat_bwd import g2_pack_width, one_sweep_eligible

    if not isinstance(g, BsdaGraph):
        return None
    shapes = [p["w"].shape for p in layer_params]
    if any(not flash_eligible(g, s[1], s[2]) for s in shapes):
        return None
    if all(one_sweep_eligible(g, s[1], s[2]) for s in shapes):
        # the one-sweep backward walks the FORWARD tables only (round
        # 5) — no transpose tables needed (the trainer stops building
        # them for GAT; ~1/3 of the table bytes + build time saved) and
        # no G2 grad-payload is ever built, so its pack limit is moot
        pass
    elif any(g2_pack_width(s[1], s[2]) > 512 for s in shapes):
        # two-sweep fallback materializes the [N, pack2] G2 stream
        return None
    elif g.transpose is not None:
        gT = g.transpose
        if gT.num_chunks != g.num_chunks or gT.chunk != g.chunk:
            return None
        from .pallas_gat import GROUP, RING
        gt_chunks = max(GROUP, int(gT.max_chunk_dist))
        if gt_chunks > 64 or \
                (gT.num_chunks + (-gT.num_chunks) % gt_chunks) // gt_chunks \
                <= RING:
            return None
    else:
        return None
    if shapes[-1][1] != 1:
        return None

    n0 = x.shape[0]
    n_pad = g.num_chunks * g.chunk
    if n0 > n_pad:
        return None
    h_in = x.astype(jnp.float32)
    if n0 < n_pad:
        h_in = jnp.concatenate(
            [h_in, jnp.zeros((n_pad - n0, x.shape[1]), jnp.float32)], axis=0
        )

    print("[GAT] packed custom-VJP training pipeline engaged "
          f"({len(layer_params)} layers)")  # trace-time marker
    n_layers = len(layer_params)
    for li, p in enumerate(layer_params):
        w = p["w"].astype(jnp.float32)
        f_in, h, ch = w.shape
        hc = h * ch
        pack = pack_width(h, ch)
        a_s_col = jnp.einsum("fhc,hc->fh", w, p["a_src"].astype(jnp.float32))
        a_d_col = jnp.einsum("fhc,hc->fh", w, p["a_dst"].astype(jnp.float32))
        proj = jnp.concatenate(
            [w.reshape(f_in, hc), a_s_col, a_d_col,
             jnp.zeros((f_in, pack - hc - 2 * h), jnp.float32)],
            axis=1,
        )
        if h_in.shape[1] > f_in:
            proj = jnp.concatenate(
                [proj, jnp.zeros((h_in.shape[1] - f_in, pack), jnp.float32)],
                axis=0,
            )
        elif h_in.shape[1] < f_in:
            return None
        payload = h_in @ proj

        out, pre_norm = _attend_packed_trainable(
            g, payload, h, ch, negative_slope)
        if out is None:
            return None
        if pre_norm:
            # one-sweep pipeline: the kernel already emitted val = acc/s
            # (and the backward transforms the cotangent in-register) —
            # no selector-matmul normalization pass. The m-lane
            # stop-gradient is redundant here: the backward kernel reads
            # only gbar's acc/s lanes, and every other m-lane consumer
            # (ELU -> next layer's zero projection rows, final-layer
            # slice) contributes an exactly-zero cotangent.
            val = out
        else:
            # stop-gradient the m (and pad) lanes: the custom backward
            # treats the softmax shift as a constant; the selector
            # normalization below must not differentiate through it
            # (exact — see module docstring). The residual-spill merge
            # already happened inside the attend VJP.
            keep = np.zeros(pack, np.float32)
            keep[:hc] = 1.0
            keep[hc + h: hc + 2 * h] = 1.0  # s lanes
            keep_v = jnp.asarray(keep)
            out = out * keep_v + jax.lax.stop_gradient(out) * (1.0 - keep_v)
            S = np.zeros((pack, pack), np.float32)
            for hh in range(h):
                S[hc + h + hh, hh * ch: (hh + 1) * ch] = 1.0
            inv_mask = np.ones(pack, np.float32)
            inv_mask[:hc] = 0.0
            denom = jax.lax.dot(out, jnp.asarray(S)) + jnp.asarray(inv_mask)
            val = out / jnp.maximum(denom, 1e-16)

        if li == n_layers - 1:
            ncls = p["b"].shape[0]
            return (val[:, :ncls] + p["b"])[:n0]
        val = val + jnp.concatenate(
            [p["b"].astype(jnp.float32),
             jnp.zeros((pack - hc,), jnp.float32)]
        )
        h_in = jax.nn.elu(val)
        if rngs is not None and rngs[li] is not None and dropout > 0.0:
            keep_p = 1.0 - dropout
            mask = jax.random.bernoulli(rngs[li], keep_p, h_in.shape)
            h_in = jnp.where(mask, h_in / keep_p, 0.0)
    return None  # unreachable