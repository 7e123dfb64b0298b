"""Same-process A/B of the occupancy-gated GAT kernels vs the old
register-accumulator versions (dev tool; relay variance is process-level,
so cross-process comparisons are meaningless — see RESULTS.md).

Variants per kernel:
  old        — HEAD version (register accumulation, ungated)
  gated      — occupancy-gated RMW version, real occ
  gated-full — same code, occ forced to D (isolates the RMW/structure cost
               from the slot-skip win)

Requires elliptic_gnn_tpu/kernels/old_pallas_gat{,_bwd}.py extracted from
git HEAD (untracked; delete after measuring).
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench.timing import differential_time  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.kernels.bsda import bfs_order, build_bsda_for_kind
    from elliptic_gnn_tpu.kernels import pallas_gat as NEW
    from elliptic_gnn_tpu.kernels import pallas_gat_bwd as NEWB
    from elliptic_gnn_tpu.kernels import old_pallas_gat as OLD
    from elliptic_gnn_tpu.kernels import old_pallas_gat_bwd as OLDB

    dev = jax.devices()[0]
    n_nodes = 203_769 if dev.platform == "tpu" else 20_000
    log(f"[ab] device: {dev.device_kind} ({dev.platform})")
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=8, num_timesteps=49,
        avg_degree=234_355 / 203_769, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
    rdata = data.renumber(rank)
    g = build_bsda_for_kind(rdata.edge_index, rdata.num_nodes, "gat",
                            depth=3, a_dtype="int8", transpose=True)
    gT = g.transpose
    h, ch = 4, 8
    hc = h * ch
    c = g.chunk
    b = g.num_chunks
    pack1 = NEW.pack_width(h, ch)
    pack2 = NEWB.g2_pack_width(h, ch)

    n_pad = b * c
    rng = np.random.default_rng(0)
    pay = np.zeros((n_pad, pack1), np.float32)
    pay[:, : hc + 2 * h] = 0.1 * rng.standard_normal((n_pad, hc + 2 * h))
    payload = jnp.asarray(pay)
    g2 = np.zeros((n_pad, pack2), np.float32)
    g2[:, : hc + h] = 0.1 * rng.standard_normal((n_pad, hc + h))
    g2[:, hc + h: hc + 2 * h] = pay[:, hc + h: hc + 2 * h]
    g2[:, hc + 2 * h: hc + 3 * h] = 0.5
    g2 = jnp.asarray(g2)

    import dataclasses
    g_full = dataclasses.replace(
        g, slot_occ=jnp.full((b,), g.depth, jnp.int32))
    gT_full = dataclasses.replace(
        gT, slot_occ=jnp.full((gT.num_chunks,), gT.depth, jnp.int32))
    g_ab = dataclasses.replace(g, transpose=gT)
    g_ab_full = dataclasses.replace(g_full, transpose=gT_full)

    def t_fwd(mod, gg):
        return differential_time(
            lambda cr, gx: cr + 1e-6 * mod.flash_gat_payload(gx, cr, h, ch,
                                                             0.2),
            payload, gg, n_small=2, n_big=12, repeats=2)[0]

    def t_bwd(mod, gg):
        return differential_time(
            lambda cr, gx, gb: cr + 1e-6 * mod.flash_gat_backward(
                gx, cr, gb, h, ch, 0.2),
            payload, gg, g2, n_small=2, n_big=10, repeats=2)[0]

    # numerical equivalence first (gating must be exact). The online-
    # softmax forward may pick a different (equally valid) shift m than
    # the old two-pass version, so compare the shift-invariant y = acc/s
    # and the true row maxima semantics, not raw lanes.
    o_old = np.asarray(OLD.flash_gat_payload(g, payload, h, ch, 0.2))
    o_new = np.asarray(NEW.flash_gat_payload(g_ab, payload, h, ch, 0.2))

    def norm_y(o):
        acc = o[:, :hc].reshape(-1, h, ch)
        m = o[:, hc: hc + h]
        s = o[:, hc + h: hc + 2 * h]
        # fold the shift back in so (m, s, acc) triples are comparable:
        # true_sumexp = s * exp(m), true_acc = acc * exp(m) — for rows
        # with tiny m this under/overflows, so compare y where s > 0
        y = acc / np.maximum(s, 1e-30)[..., None]
        return y, s * np.exp(np.minimum(m, 50.0))

    y_o, se_o = norm_y(o_old)
    y_n, se_n = norm_y(o_new)
    mask = (se_o > 1e-20) & (se_n > 1e-20)
    dy = np.abs(y_o - y_n)[mask.nonzero()[0]]
    ds = np.abs(se_o - se_n)[mask] / np.maximum(se_o[mask], 1e-20)
    log(f"[ab] fwd max|dy| = {dy.max() if dy.size else 0:.3e}  "
        f"max rel|d sumexp| = {ds.max() if ds.size else 0:.3e}")
    b_o = np.asarray(OLDB.flash_gat_backward(g_ab, payload, g2, h, ch, 0.2))
    b_n = np.asarray(NEWB.flash_gat_backward(g_ab, payload, g2, h, ch, 0.2))
    log(f"[ab] bwd max|old-new| = {np.abs(b_o - b_n).max():.3e} "
        f"(scale {np.abs(b_o).max():.3e})")

    # interleave two rounds of each variant so within-process drift shows
    for rep in range(2):
        f_old = t_fwd(OLD, g)
        f_new = t_fwd(NEW, g_ab)
        f_full = t_fwd(NEW, g_ab_full)
        log(f"[ab] fwd r{rep}: old={f_old*1e3:.3f} gated={f_new*1e3:.3f} "
            f"gated-full={f_full*1e3:.3f} ms")
        b_old = t_bwd(OLDB, g_ab)
        b_new = t_bwd(NEWB, g_ab)
        b_full = t_bwd(NEWB, g_ab_full)
        log(f"[ab] bwd r{rep}: old={b_old*1e3:.3f} gated={b_new*1e3:.3f} "
            f"gated-full={b_full*1e3:.3f} ms")


if __name__ == "__main__":
    main()
