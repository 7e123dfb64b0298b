"""Manual backward pass for BSDA GAT attention (the fused VJP).

Autodiff through the XLA attention forward re-materializes the chunk-pair
score pipeline plus its transposes — measured 36.8 ms per train step at
Elliptic scale vs 12.9 ms forward. This module computes the gradients in
closed form from the saved softmax state instead.

Math (per head; i destination, j source, mu the edge multiplicity,
t_ij = a_src_j + a_dst_i, s the leaky slope):

    p_ij = mu_ij * exp(lrelu(t_ij) - m_i) / s_i        (softmax weights)
    y_i  = sum_j p_ij x_j

Given the cotangent g_i = dL/dy_i and rho_i = y_i . g_i:

    dx_j     = sum_i p_ij g_i                          (transpose SpMM)
    da_ij    = p_ij * lrelu'(t_ij) * (x_j . g_i - rho_i)
    da_dst_i = sum_j da_ij          da_src_j = sum_i da_ij

All sums split exactly like the forward: dense chunk-pair blocks (batched
einsums over [B, D, C, C]) + the compact residual spill (tiny). The
exp reconstruction clamps its exponent at 0 — for real edges
lrelu(t) <= m_i by construction, and masked/padded entries (mu = 0) would
otherwise produce inf * 0 = NaN.

Counterpart of PyG GATConv's autograd backward (reference
src/models/gnn.py:56-76); here it is hand-derived so the forward can run
through the non-differentiable Pallas flash kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bsda import BsdaGraph


def _dense_bwd_head(g: BsdaGraph, xp_h, asrc_h, adst_h, m_h, s_h, rho_h,
                    gbar_h, slope):
    """One head's dense-block gradients.

    xp_h [N_pad, Ch], others [N_pad]. Returns (dxp [N_pad, Ch],
    dasrc [N_pad], dadst [N_pad])."""
    b, c = g.num_chunks, g.chunk
    ch = xp_h.shape[1]
    mult = g.a.astype(jnp.float32)          # [B, D, Ci, Cj]
    a3 = asrc_h.reshape(b, c)
    d3 = adst_h.reshape(b, c)
    m3 = m_h.reshape(b, c)
    s3 = jnp.maximum(s_h, 1e-16).reshape(b, c)
    rho3 = rho_h.reshape(b, c)
    g3 = gbar_h.reshape(b, c, ch)
    xp3 = xp_h.reshape(b, c, ch)

    asrc_ch = a3[g.src_chunk]               # [B, D, Cj]
    t = asrc_ch[:, :, None, :] + d3[:, None, :, None]   # [B, D, Ci, Cj]
    lr = jnp.where(t >= 0, t, t * slope)
    # exponent <= 0 for every real edge; clamp kills the inf*0 = NaN that
    # padded rows (NEG_INF coefficients) would produce under the mask
    p = jnp.exp(jnp.minimum(lr - m3[:, None, :, None], 0.0)) * mult \
        / s3[:, None, :, None]

    e_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else p.dtype
    p_c = p.astype(e_dtype)
    g3_c = g3.astype(e_dtype)
    xp_g = xp3[g.src_chunk].astype(e_dtype)  # [B, D, Cj, Ch]

    # q_ij = x_j . g_i
    q = jnp.einsum("bif,bdjf->bdij", g3_c, xp_g,
                   preferred_element_type=jnp.float32)
    da = p * jnp.where(t >= 0, 1.0, slope) * (q - rho3[:, None, :, None])

    dadst = da.sum(axis=(1, 3)).reshape(-1)              # [N_pad]
    # source-side sums scatter at CHUNK granularity (unique (b, d) ->
    # src_chunk ids may repeat, scatter-add handles it)
    dasrc_bd = da.sum(axis=2)                            # [B, D, Cj]
    dxp_bd = jnp.einsum("bdij,bif->bdjf", p.astype(e_dtype), g3_c,
                        preferred_element_type=jnp.float32)  # [B, D, Cj, Ch]
    dasrc = (
        jnp.zeros((b, c)).at[g.src_chunk].add(dasrc_bd).reshape(-1)
    )
    dxp = (
        jnp.zeros((b, c, ch)).at[g.src_chunk].add(dxp_bd).reshape(-1, ch)
    )
    return dxp, dasrc, dadst


def _spill_bwd(g: BsdaGraph, xp, asrc, adst, m, s, rho, gbar, slope,
               dxp, dasrc, dadst):
    """Residual-spill gradients, all heads, accumulated in place."""
    res = g.residual
    rows = g.residual_rows
    s_safe = jnp.maximum(s, 1e-16)
    for nbr, w, rws in zip(res.nbrs, res.weights, res.rows):
        dst = rows[rws]                                # [R]
        t = asrc[nbr] + adst[dst][:, None, :]          # [R, W, H]
        lr = jnp.where(t >= 0, t, t * slope)
        p = jnp.exp(
            jnp.minimum(lr - m[dst][:, None, :], 0.0)
        ) * w[:, :, None] / s_safe[dst][:, None, :]
        q = jnp.einsum("rhf,rwhf->rwh", gbar[dst], xp[nbr],
                       preferred_element_type=jnp.float32)
        da = p * jnp.where(t >= 0, 1.0, slope) * (q - rho[dst][:, None, :])
        dadst = dadst.at[dst].add(da.sum(axis=1))
        dasrc = dasrc.at[nbr].add(da)                  # dup ids: scatter-add
        dxp = dxp.at[nbr].add(
            p[..., None] * gbar[dst][:, None, :, :]
        )
    return dxp, dasrc, dadst


def attend_bwd(g: BsdaGraph, slope, res, gbar):
    """VJP: cotangents (dxp, dasrc, dadst) on the PADDED arrays."""
    xp, asrc, adst, m, s, y = res
    n_pad, h, ch = xp.shape
    rho = jnp.einsum("nhf,nhf->nh", y, gbar,
                     preferred_element_type=jnp.float32)

    dxps, dasrcs, dadsts = [], [], []
    for head in range(h):
        out = _dense_bwd_head(
            g, xp[:, head, :], asrc[:, head], adst[:, head], m[:, head],
            s[:, head], rho[:, head], gbar[:, head, :], slope,
        )
        # fence heads for the same reason as the forward (bsda_gat.py):
        # unfenced, XLA schedules all heads' [B,D,C,C] pipelines at once
        out = jax.lax.optimization_barrier(out)
        dxps.append(out[0])
        dasrcs.append(out[1])
        dadsts.append(out[2])
    dxp = jnp.stack(dxps, axis=1)        # [N_pad, H, Ch]
    dasrc = jnp.stack(dasrcs, axis=1)    # [N_pad, H]
    dadst = jnp.stack(dadsts, axis=1)

    if g.residual is not None:
        dxp, dasrc, dadst = _spill_bwd(
            g, xp, asrc, adst, m, s, rho, gbar, slope, dxp, dasrc, dadst
        )
    return dxp.astype(xp.dtype), dasrc.astype(asrc.dtype), \
        dadst.astype(adst.dtype)
