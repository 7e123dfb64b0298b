"""GAT training-step breakdown at Elliptic scale (dev tool).

One process, one readback warmup: measures every component of the GAT
training step so the fused-vs-autodiff comparison (docs/PERF_NOTES.md,
VERDICT r2 directive 3) is attributable instead of a single end-to-end
number:

  - autodiff train step (XLA attention path, kernels/bsda_gat.py)
  - fused train step (packed custom-VJP pipeline, kernels/packed_gat.py)
  - flash forward kernel alone (kernels/pallas_gat.py)
  - backward sweeps alone: dest sweep, source sweep, both
  - packed eval forward (2-layer stack)

Run on TPU:  python tools/bench_gat_breakdown.py
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from bench.timing import differential_time  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def occ_stats(name, gg):
    a = np.asarray(gg.a)
    nz = (np.abs(a).reshape(a.shape[0], a.shape[1], -1).sum(-1) > 0)
    occ = nz.sum(1)
    log(f"[occ] {name}: B={a.shape[0]} D={a.shape[1]} mean_occ="
        f"{occ.mean():.2f} slots_used={nz.mean():.1%} "
        f"dtype={a.dtype} hist={np.bincount(occ, minlength=a.shape[1]+1)}")


def main():
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.kernels.bsda import bfs_order, build_bsda_for_kind
    from elliptic_gnn_tpu.models.modules import build_model

    dev = jax.devices()[0]
    n_nodes = 203_769 if dev.platform == "tpu" else 20_000
    log(f"[bench] device: {dev.device_kind} ({dev.platform})")
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=166, num_timesteps=49,
        avg_degree=234_355 / 203_769, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
    rdata = data.renumber(rank)
    g = build_bsda_for_kind(rdata.edge_index, rdata.num_nodes, "gat",
                            depth=4, a_dtype="int8", transpose=True)
    occ_stats("fwd", g)
    occ_stats("transpose", g.transpose)

    h, ch = 4, 8
    cfg = {"hidden_dim": 32, "layers": 2, "heads": 4, "dropout": 0.0}
    model = build_model("gat", 166, dict(cfg, gat_fused_vjp=False))
    model_fused = build_model("gat", 166, dict(cfg, gat_fused_vjp=True))
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jnp.asarray(rdata.x)
    y = jnp.asarray(np.maximum(rdata.y, 0).astype(np.int32))
    tm = jnp.asarray(rdata.train_mask.astype(np.float32))

    def make_step(mdl):
        def train_step(carry, x, y, tm, g):
            params, opt_state = carry

            def lf(p):
                logits, _ = mdl.apply(p, {}, x, g, training=True,
                                      rng=jax.random.key(0))
                logp = jax.nn.log_softmax(logits, axis=1)
                nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
                return (nll * tm).sum() / tm.sum()

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt2 = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt2)

        return train_step

    # ---- component kernels (payload-level) ----
    from elliptic_gnn_tpu.kernels.pallas_gat import (
        flash_gat_payload, pack_width,
    )
    from elliptic_gnn_tpu.kernels.pallas_gat_bwd import (
        flash_gat_backward, flash_gat_backward3, g2_pack_width,
    )

    def bwd3_args(pay_np, g2_np, h_, ch_, p1):
        """Map a (payload, g2) pair onto flash_gat_backward3's three
        source streams (gbar, out_k) for kernel-alone timing."""
        hc_ = h_ * ch_
        gb = np.zeros((pay_np.shape[0], p1), np.float32)
        gb[:, :hc_] = g2_np[:, :hc_]                       # A_bar
        gb[:, hc_ + h_: hc_ + 2 * h_] = g2_np[:, hc_: hc_ + h_]  # S_bar
        ok = np.zeros((pay_np.shape[0], p1), np.float32)
        ok[:, hc_: hc_ + h_] = g2_np[:, hc_ + 2 * h_: hc_ + 3 * h_]  # m
        return jnp.asarray(gb), jnp.asarray(ok)

    n_pad = g.num_chunks * g.chunk
    pack1 = pack_width(h, ch)
    pack2 = g2_pack_width(h, ch)
    rng = np.random.default_rng(0)
    pay = np.zeros((n_pad, pack1), np.float32)
    pay[:, : h * ch + 2 * h] = 0.1 * rng.standard_normal(
        (n_pad, h * ch + 2 * h))
    payload = jnp.asarray(pay)
    g2 = np.zeros((n_pad, pack2), np.float32)
    g2[:, : h * ch + h] = 0.1 * rng.standard_normal((n_pad, h * ch + h))
    g2[:, h * ch + h: h * ch + 2 * h] = pay[:, h * ch + h: h * ch + 2 * h]
    g2[:, h * ch + 2 * h: h * ch + 3 * h] = 0.5  # m lanes
    g2 = jnp.asarray(g2)

    dt_fwd, _ = differential_time(
        lambda c, gg: c + 1e-6 * flash_gat_payload(gg, c, h, ch, 0.2),
        payload, g, n_small=2, n_big=12, repeats=2)
    log(f"[bench] flash fwd kernel (1 layer): {dt_fwd*1e3:.3f} ms")

    gbar_1, outk_1 = bwd3_args(pay, np.asarray(g2), h, ch, pack1)
    dt_bwd, _ = differential_time(
        lambda c, gg, gb, ok: c + 1e-6 * flash_gat_backward3(
            gg, c, gb, ok, h, ch, 0.2),
        payload, g, gbar_1, outk_1, n_small=2, n_big=12, repeats=2)
    log(f"[bench] one-sweep backward (1 layer): {dt_bwd*1e3:.3f} ms")

    # individual sweeps, replicating flash_gat_backward's padding
    from elliptic_gnn_tpu.kernels.pallas_gat_bwd import (
        NEG_INF, _grid_pad, _sweep_dst_call, _sweep_src_call,
    )
    from elliptic_gnn_tpu.kernels.pallas_gat import GROUP

    gT = g.transpose
    c = g.chunk
    hc = h * ch
    g_chunks = max(GROUP, int(g.max_chunk_dist))
    gt_chunks = max(GROUP, int(gT.max_chunk_dist))
    pay3 = payload.reshape(g.num_chunks, c, pack1)
    g23 = g2.reshape(g.num_chunks, c, pack2)
    fill2 = np.zeros(pack2, np.float32)
    fill2[hc + h: hc + 2 * h] = NEG_INF
    src_c, _occ_d, mult, own2, ring1, _ = _grid_pad(
        g, g_chunks, g23, jnp.asarray(fill2), pay3)
    src_t, occ_t, mult_t, own1, ring2, _ = _grid_pad(
        gT, gt_chunks, pay3, jnp.full((pack1,), NEG_INF, jnp.float32), g23)

    def dst_op(cr, src_c, occ_d, mult, ring1):
        out = _sweep_dst_call(src_c, occ_d, mult, cr, ring1, c=c,
                              g_chunks=g_chunks, d=g.depth, h=h, ch=ch,
                              pack1=pack1, pack2=pack2, slope=0.2)
        return cr + 1e-6 * out

    dt_dst, _ = differential_time(dst_op, own2, src_c, _occ_d, mult, ring1,
                                  n_small=2, n_big=12, repeats=2)
    log(f"[bench] dest sweep alone: {dt_dst*1e3:.3f} ms")

    def src_op(cr, src_t, occ_t, mult_t, ring2):
        out = _sweep_src_call(src_t, occ_t, mult_t, cr, ring2, c=c,
                              g_chunks=gt_chunks, d=gT.depth, h=h, ch=ch,
                              pack1=pack1, pack2=pack2, slope=0.2)
        return cr + 1e-6 * out

    dt_src, _ = differential_time(src_op, own1, src_t, occ_t, mult_t, ring2,
                                  n_small=2, n_big=12, repeats=2)
    log(f"[bench] source sweep alone: {dt_src*1e3:.3f} ms")

    # ---- L2-shape kernels (final classification layer: h=1, ch=2) ----
    h2, ch2 = 1, 2
    pack1_2 = pack_width(h2, ch2)
    pack2_2 = g2_pack_width(h2, ch2)
    pay_2 = np.zeros((n_pad, pack1_2), np.float32)
    pay_2[:, : h2 * ch2 + 2 * h2] = 0.1 * rng.standard_normal(
        (n_pad, h2 * ch2 + 2 * h2))
    payload_2 = jnp.asarray(pay_2)
    g2_2 = np.zeros((n_pad, pack2_2), np.float32)
    g2_2[:, : h2 * ch2 + h2] = 0.1 * rng.standard_normal(
        (n_pad, h2 * ch2 + h2))
    g2_2[:, h2 * ch2 + h2: h2 * ch2 + 2 * h2] = \
        pay_2[:, h2 * ch2 + h2: h2 * ch2 + 2 * h2]
    g2_2[:, h2 * ch2 + 2 * h2: h2 * ch2 + 3 * h2] = 0.5
    g2_2 = jnp.asarray(g2_2)

    dt_fwd2, _ = differential_time(
        lambda c, gg: c + 1e-6 * flash_gat_payload(gg, c, h2, ch2, 0.2),
        payload_2, g, n_small=2, n_big=12, repeats=2)
    log(f"[bench] flash fwd kernel (L2 h=1): {dt_fwd2*1e3:.3f} ms")

    gbar_2, outk_2 = bwd3_args(pay_2, np.asarray(g2_2), h2, ch2, pack1_2)
    dt_bwd2, _ = differential_time(
        lambda c, gg, gb, ok: c + 1e-6 * flash_gat_backward3(
            gg, c, gb, ok, h2, ch2, 0.2),
        payload_2, g, gbar_2, outk_2, n_small=2, n_big=12, repeats=2)
    log(f"[bench] one-sweep backward (L2 h=1): {dt_bwd2*1e3:.3f} ms")

    # ---- glue / spill attribution via attention stubs ----
    import elliptic_gnn_tpu.kernels.packed_gat as PG

    real_attend = PG._attend_packed_trainable

    def stub_no_attn(g_, payload, h_, ch_, ns_):
        # keep shapes; skip kernel AND spill merge (pre_norm True skips
        # the selector normalization too, matching the production path)
        return payload * 1.000001, True

    try:
        PG._attend_packed_trainable = stub_no_attn
        dt_stub = min(
            differential_time(make_step(model_fused), (params, opt_state),
                              x, y, tm, g, n_small=2, n_big=8, repeats=2)[0]
            for _ in range(2)
        )
        log(f"[bench] glue-only step (attention stubbed): "
            f"{dt_stub*1e3:.3f} ms")
    finally:
        PG._attend_packed_trainable = real_attend

    # ---- eval forward (packed pipeline, 2 layers) ----
    def eval_fwd(cr, params, gg):
        out, _ = model.apply(params, {}, cr, gg, training=False)
        return cr + jnp.pad(
            out, ((0, 0), (0, cr.shape[1] - out.shape[1]))) * 1e-6

    dt_eval, _ = differential_time(eval_fwd, x, params, g,
                                   n_small=2, n_big=10, repeats=2)
    log(f"[bench] eval forward (2-layer packed): {dt_eval*1e3:.3f} ms")

    # ---- full train steps ----
    dt_auto = min(
        differential_time(make_step(model), (params, opt_state), x, y, tm,
                          g, n_small=2, n_big=8, repeats=2)[0]
        for _ in range(2)
    )
    log(f"[bench] autodiff train step: {dt_auto*1e3:.3f} ms")

    dt_fused = min(
        differential_time(make_step(model_fused), (params, opt_state), x, y,
                          tm, g, n_small=2, n_big=8, repeats=2)[0]
        for _ in range(2)
    )
    log(f"[bench] fused train step:    {dt_fused*1e3:.3f} ms")

    log(f"[summary] fwd_kernel={dt_fwd*1e3:.2f} bwd_sweeps={dt_bwd*1e3:.2f} "
        f"(dst={dt_dst*1e3:.2f} src={dt_src*1e3:.2f}) "
        f"eval2={dt_eval*1e3:.2f} auto={dt_auto*1e3:.2f} "
        f"fused={dt_fused*1e3:.2f}")


if __name__ == "__main__":
    main()
