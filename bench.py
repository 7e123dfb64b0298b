"""Headline benchmark: SpMM aggregation throughput (edges/s/chip) and
end-to-end training epoch time on an Elliptic-sized graph.

Prints exactly ONE JSON line on stdout:
  {"metric": "spmm_edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": r, "detail": {...}}

vs_baseline: measured edges/s divided by the 70%-of-roofline target from
the north star (BASELINE.json: "SpMM at >70% of roofline"), so r > 1.0
beats the target. The roofline model counts the unavoidable HBM traffic of
the production aggregation encoding (int8 factored BSDA, kernels/bsda.py +
kernels/pallas_bsda.py: int8 multiplicity tables once, bf16 features once,
bf16 output once, residual tables) against the device's SPEC HBM bandwidth
(819 GB/s for v5e). The measured *streaming* bandwidth of this chip is also
calibrated at runtime and reported in detail (large-array elementwise copy;
the chip sustains ~65% of spec for streams but carries a sizable fast
cache, which the kernel exploits — apparent bandwidth above stream rate is
real cache residency, not timing error).

Timing notes: this TPU is reached through a relay whose dispatch acks are
asynchronous — plain block_until_ready loop timing is unreliable. SpMM is
timed with chained-scan differential timing fenced by readbacks
(bench/timing.py); draws faster than the PHYSICAL floor (bytes the kernel
actually ships — bit-packed planes — at spec bandwidth) are relay
glitches and discarded, and the headline is capped at that floor with the
raw draws reported in detail. The end-to-end epoch time is measured inside
the real training loop via per-epoch logger timestamps (median of epoch
deltas — robust to the relay's per-call compile noise), and includes the
per-epoch device->host sync for early stopping. Diagnostics go to stderr;
stdout carries only the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench.timing import differential_time, make_chained_runner  # noqa: E402

# Elliptic graph scale (reference README.md:42,58)
N_NODES = 203_769
N_EDGES = 234_355
N_FEATURES = 166
HIDDEN = 128
N_TIMESTEPS = 49

HBM_GBPS = {
    "v5 lite": 819.0,  # TPU v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
}
ROOFLINE_TARGET_FRACTION = 0.70


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def hbm_bandwidth_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    log(f"[bench] unknown device kind {kind!r}; assuming 819 GB/s")
    return 819.0


def measured_stream_gbps() -> float:
    """Calibrate the achievable streaming bandwidth: big-array elementwise
    op (read+write) well past any cache capacity."""
    n = 1_600_000  # x128 f32 = 819 MB working set
    x = jnp.asarray(np.zeros((n, 128), np.float32))
    dt, _ = differential_time(
        lambda c: c * 1.000001 + 0.5, x, n_small=2, n_big=12, repeats=2
    )
    return 2 * n * 128 * 4 / dt / 1e9


def bsda_traffic_bytes(g, feat: int, x_itemsize: int,
                       physical: bool = False) -> int:
    """Unavoidable HBM bytes for one BSDA aggregation pass with the given
    encoding: A-table once, features once, output once, scale vectors,
    residual tables.

    physical=False counts the LOGICAL int8 A-table (the round-to-round
    roofline model, comparable across rounds regardless of packing);
    physical=True counts the bytes the kernel actually ships — the
    bit-packed A planes when present — which is the hard floor no valid
    measurement can beat (used to reject non-physical relay draws)."""
    if physical and g.a_packed is not None:
        a_bytes = int(np.prod(g.a_packed.shape)) * g.a_packed.dtype.itemsize
    else:
        a_bytes = int(np.prod(g.a.shape)) * g.a.dtype.itemsize
    n_rows = g.num_chunks * g.chunk
    x_bytes = n_rows * feat * x_itemsize
    out_bytes = n_rows * feat * x_itemsize
    scale_bytes = sum(
        int(np.prod(s.shape)) * s.dtype.itemsize
        for s in (g.dst_scale, g.src_scale) if s is not None
    )
    res_bytes = 0
    if g.residual is not None:
        for nbr in g.residual.nbrs:
            r, w = nbr.shape
            res_bytes += r * w * (feat * x_itemsize + 8) + r * feat * x_itemsize
    return a_bytes + x_bytes + out_bytes + scale_bytes + res_bytes


class _TimingLogger:
    """Stand-in RunLogger that records wall-clock per epoch."""

    def __init__(self):
        self.stamps = []

    def log_epoch(self, *a, **k):
        self.stamps.append(time.perf_counter())

    def close(self):
        pass

    def epoch_seconds(self, skip: int = 4) -> float:
        """Mean epoch time over the post-warmup span. With the K-epoch
        scanned loop (epochs_per_sync) timestamps arrive in per-block
        bursts, so a median of adjacent diffs would read ~0; the span mean
        is correct for both loop modes."""
        s = self.stamps[skip:]
        if len(s) < 2:
            return float("nan")
        return float((s[-1] - s[0]) / (len(s) - 1))


def main() -> None:
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges
    from elliptic_gnn_tpu.kernels import bsda as B
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph, ell_spmm, renumber_for_ell
    from elliptic_gnn_tpu.kernels.pallas_bsda import pallas_bsda_spmm

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"[bench] device: {dev.device_kind} ({dev.platform})")
    n_nodes = N_NODES
    if not on_tpu:  # keep a CPU fallback run within time budget
        n_nodes = 20_000
        log("[bench] CPU fallback: reduced graph size")

    t0 = time.time()
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=N_FEATURES,
        num_timesteps=N_TIMESTEPS, avg_degree=N_EDGES / N_NODES, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    data = symmetrize_edges(data)
    e = data.num_edges
    log(f"[bench] graph: {data.num_nodes} nodes, {e} edges (symmetrized), "
        f"built in {time.time()-t0:.1f}s")

    rank = B.bfs_order(data.edge_index, data.num_nodes, data.timestep)
    data = data.renumber(rank)
    # production encoding: int8 factored multiplicities, depth 3
    g = B.build_bsda_for_kind(
        data.edge_index, data.num_nodes, "sage", depth=3, a_dtype="int8",
        transpose=False,
    )

    # node rows padded to the chunk grid (as the trainer keeps them);
    # bf16 features = the amp production path on TPU
    n_pad_rows = g.num_chunks * g.chunk
    xp = np.zeros((n_pad_rows, HIDDEN), np.float32)
    xp[:data.num_nodes] = np.random.default_rng(0).standard_normal(
        (data.num_nodes, HIDDEN)
    )
    x_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    x = jnp.asarray(xp).astype(x_dtype)

    # ---- SpMM: chained-scan differential timing, packed-vs-unpacked
    # same-process A/B (VERDICT r3 directive 1). The bit-packed and
    # unpacked kernels are measured INTERLEAVED in this process so relay
    # drift hits both equally and the packing delta is a real A/B, not a
    # cross-process comparison. Draws below the PHYSICAL floor — the bytes
    # the kernel actually ships (packed planes) at spec HBM bandwidth —
    # are relay queue hiccups and are discarded; a variant whose draws are
    # all non-physical is re-measured once and then marked failed rather
    # than min'd over (a discarded draw must never become the headline). ----
    import dataclasses as _dc

    bw_spec = hbm_bandwidth_gbps()
    bw_stream = measured_stream_gbps()
    isz = np.dtype(x_dtype).itemsize
    traffic = bsda_traffic_bytes(g, HIDDEN, isz)  # logical int8 model
    roofline_dt = traffic / (bw_spec * 1e9)
    variants = {"packed": g}
    if g.a_packed is not None:
        variants["unpacked"] = _dc.replace(g, a_packed=None, a_pack=1)
    floors = {
        name: bsda_traffic_bytes(gg, HIDDEN, isz, physical=True)
        / (bw_spec * 1e9)
        for name, gg in variants.items()
    }
    draws = {name: [] for name in variants}
    for _rep in range(3):
        for name, gg in variants.items():
            draws[name].append(differential_time(
                lambda c, gg: pallas_bsda_spmm(gg, c), x, gg
            )[0])
    valid = {
        name: [dt for dt in ds if dt >= floors[name]]
        for name, ds in draws.items()
    }
    for name in variants:
        if len(valid[name]) < len(draws[name]):
            log(f"[bench] discarded "
                f"{len(draws[name]) - len(valid[name])} non-physical "
                f"{name} draw(s) < {floors[name]*1e3:.3f} ms")
        if not valid[name]:  # one re-measure before declaring failure
            redraw = [differential_time(
                lambda c, gg: pallas_bsda_spmm(gg, c), x, variants[name]
            )[0] for _ in range(2)]
            draws[name].extend(redraw)
            valid[name] = [dt for dt in redraw if dt >= floors[name]]
            log(f"[bench] re-measured {name}: "
                f"{[f'{d*1e3:.3f}' for d in redraw]} ms")
    # headline per variant = MEDIAN of validated draws (VERDICT r4 #7):
    # relay day-drift swings single best draws by +-30%, which put a
    # 1.13-1.46 spread on vs_baseline across clean runs; the median of
    # floor-validated draws is drift-robust while the raw draw lists stay
    # in detail. spmm_ms_min_draw records the old best-draw number.
    dt_packed = (
        float(np.median(valid["packed"])) if valid["packed"] else None
    )
    dt_unpacked = (
        float(np.median(valid["unpacked"])) if valid.get("unpacked") else None
    )
    dt_pallas = dt_packed if dt_packed is not None else dt_unpacked
    pallas_variant = "packed" if dt_packed is not None else "unpacked"
    # best draw of the HEADLINE variant only — mixing variants would let
    # an unpacked draw masquerade as the packed lineage's best
    dt_min_draw = min(valid[pallas_variant], default=None) \
        if valid.get(pallas_variant) else None
    dt_xla, _ = differential_time(lambda c, gg: B.bsda_spmm(gg, c), x, g)
    if dt_pallas is None:
        log("[bench] ALL pallas draws non-physical; falling back to XLA "
            "for the headline")
        dt_best, path = dt_xla, "xla_einsum"
        floor_best = roofline_dt
    elif dt_pallas <= dt_xla:
        dt_best, path = dt_pallas, "pallas_ring"
        floor_best = floors[pallas_variant]
    else:
        dt_best, path = dt_xla, "xla_einsum"
        floor_best = roofline_dt
    # the headline is capped at the winning variant's PHYSICAL floor (not
    # the logical roofline: a packed kernel legitimately streams fewer
    # bytes than the logical int8 model and may beat its roofline — that
    # is the optimization, not a timing error)
    capped = dt_best < floor_best
    dt_eff = max(dt_best, floor_best)
    edges_per_s = e / dt_eff
    target = ROOFLINE_TARGET_FRACTION * (e / roofline_dt)
    log(f"[bench] SpMM packed "
        f"{'-' if dt_packed is None else f'{dt_packed*1e3:.3f}'} ms | "
        f"unpacked {'-' if dt_unpacked is None else f'{dt_unpacked*1e3:.3f}'}"
        f" ms | xla {dt_xla*1e3:.3f} ms -> best {dt_best*1e3:.3f} ms ({path})")
    log(f"[bench] traffic model {traffic/1e6:.0f} MB logical "
        f"(physical floor {floor_best*1e3:.3f} ms), roofline(spec "
        f"{bw_spec:.0f} GB/s) {roofline_dt*1e3:.3f} ms, measured stream "
        f"{bw_stream:.0f} GB/s; capped={capped} -> {edges_per_s/1e9:.3f} Ge/s")

    # ELL fallback path for comparison — as the trainer runs it: full f32
    # (the row gather is transaction-limited, so bf16 saves nothing and
    # costs a conversion pass; measured 2.19 f32 / 2.46 bf16 / 2.64
    # post-gather-cast — kernels/ell.py note). BENCH_r01's driver-recorded
    # ELL was 2.17 ms at f32: there was never a regression, only the bf16
    # operand the round-2 bench fed it.
    g_e, rk = renumber_for_ell(
        build_ell_graph(data.edge_index, data.num_nodes, mean=True)
    )
    x_e = jnp.asarray(xp[np.argsort(rk)][: data.num_nodes])
    dt_ell, _ = differential_time(lambda c, gg: ell_spmm(gg, c), x_e, g_e)
    log(f"[bench] ELL SpMM: {dt_ell*1e3:.3f} ms ({e/dt_ell/1e9:.3f} Ge/s)")

    # ---- explicit shard_map aggregation, mesh=1 on this chip (VERDICT r3
    # directive 3: a driver-tracked stage, so the halo-path aggregation
    # cost and any regression land in BENCH_r0N rather than RESULTS
    # prose). Mesh=1 exercises the full machinery — halo ppermutes,
    # ext-shaped per-shard kernel tables, width-bucketed residual — with
    # zero-distance communication; it is the only mesh this single-chip
    # environment can run for real. Best-effort stage. ----
    dt_sm = None
    sm_error = None
    try:
        from functools import partial as _partial

        from jax import shard_map as _shard_map
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from elliptic_gnn_tpu.parallel.mesh import NODE_AXIS, make_mesh
        from elliptic_gnn_tpu.parallel.shardmap_step import (
            partition_bsda, sharded_bsda_spmm, sharded_specs,
        )

        mesh1 = make_mesh(1)
        sg1 = partition_bsda(g, 1)
        sg1_specs = sharded_specs(sg1)

        @_partial(
            _shard_map, mesh=mesh1,
            in_specs=(_P(NODE_AXIS, None), sg1_specs),
            out_specs=_P(NODE_AXIS, None), check_vma=True,
        )
        def _sm_agg(x_loc, sg_loc):
            return sharded_bsda_spmm(sg_loc, x_loc)

        x_sm = jax.device_put(
            x, NamedSharding(mesh1, _P(NODE_AXIS, None))
        )
        sm_draws = [differential_time(
            lambda c, ss: _sm_agg(c, ss), x_sm, sg1, n_small=2, n_big=12,
            repeats=2,
        )[0] for _ in range(2)]
        # same physical floor as the packed kernel (identical tables);
        # a faster draw is a relay glitch
        sm_valid = [d for d in sm_draws if d >= floors["packed"]]
        dt_sm = float(np.median(sm_valid)) if sm_valid else None
        if dt_sm is None:
            sm_error = (f"all draws non-physical: "
                        f"{[f'{d*1e3:.3f}' for d in sm_draws]} ms")
            log(f"[bench] shard_map stage: {sm_error}")
        else:
            log(f"[bench] shard_map aggregation (mesh=1, halo machinery + "
                f"per-shard kernel): {dt_sm*1e3:.3f} ms")
    except Exception as exc:  # pragma: no cover - hardware-dependent
        sm_error = f"{type(exc).__name__}: {exc}"
        log(f"[bench] shard_map stage failed (continuing): {exc}")

    # ---- GAT 2-layer forward (packed flash pipeline; VERDICT r1 target
    # <= 8 ms at Elliptic scale). Round 5 (VERDICT r4 #6): the packed
    # flash forward and the XLA chunk-pair forward are measured
    # INTERLEAVED in this process — the flash/XLA paired ratio is the
    # drift-robust field (relay day-drift moved the raw number 7.35 ->
    # 8.1 ms across rounds with no code change), and the headline is the
    # median of the flash draws. Best-effort: a failure here must not
    # lose the headline SpMM metric. ----
    dt_gat = None
    gat_error = None
    gat_fwd_ratio = None
    gat_fwd_draws = {}
    try:
        from elliptic_gnn_tpu.models.modules import build_model

        g_gat = B.build_bsda_for_kind(
            data.edge_index, data.num_nodes, "gat", depth=4,
            a_dtype="float32", transpose=False,
        )
        gat_model = build_model(
            "gat", N_FEATURES,
            {"hidden_dim": 32, "layers": 2, "heads": 4, "dropout": 0.0},
        )
        gat_params, _ = gat_model.init(jax.random.PRNGKey(0))

        def gat_fwd(c, params, gg):
            out, _ = gat_model.apply(params, {}, c, gg, training=False)
            return c + jnp.pad(
                out, ((0, 0), (0, c.shape[1] - out.shape[1]))) * 1e-6

        # explicit fused_vjp=False comparator: since round 5 a
        # transpose-free graph no longer blocks the packed training
        # pipeline (the one-sweep backward needs no transpose tables),
        # so training=True alone stopped selecting the XLA path
        gat_model_xla = build_model(
            "gat", N_FEATURES,
            {"hidden_dim": 32, "layers": 2, "heads": 4, "dropout": 0.0,
             "gat_fused_vjp": False},
        )

        def gat_fwd_xla(c, params, gg):
            # training=True + fused_vjp=False -> the generic XLA
            # chunk-pair formulation (kernels/bsda_gat.py), the
            # same-process comparator for the paired ratio
            out, _ = gat_model_xla.apply(params, {}, c, gg, training=True)
            return c + jnp.pad(
                out, ((0, 0), (0, c.shape[1] - out.shape[1]))) * 1e-6

        x_gat = jnp.asarray(data.x)
        gat_fwd_draws = {"flash": [], "xla": []}
        for _rep in range(3):
            gat_fwd_draws["flash"].append(differential_time(
                gat_fwd, x_gat, gat_params, g_gat, n_small=2, n_big=10,
                repeats=2,
            )[0])
            gat_fwd_draws["xla"].append(differential_time(
                gat_fwd_xla, x_gat, gat_params, g_gat, n_small=2, n_big=10,
                repeats=2,
            )[0])
        dt_gat = float(np.median(gat_fwd_draws["flash"]))
        gat_fwd_ratio = float(np.median([
            a / f for f, a in zip(gat_fwd_draws["flash"],
                                  gat_fwd_draws["xla"])
        ]))
        log(f"[bench] GAT 2-layer forward (packed flash): {dt_gat*1e3:.3f} ms"
            f" | XLA {np.median(gat_fwd_draws['xla'])*1e3:.3f} ms "
            f"(paired flash speedup {gat_fwd_ratio:.2f}x)")
    except Exception as exc:  # pragma: no cover - hardware-dependent
        gat_error = f"{type(exc).__name__}: {exc}"
        log(f"[bench] GAT stage failed (continuing): {exc}")

    # ---- GAT train step (fwd+bwd+Adam) through the DEFAULT training
    # dispatch (VERDICT r2 directive 3: a first-class bench field, not a
    # dev-tool number). Round 5 (VERDICT r4 #6): the default (fused
    # custom-VJP) and the autodiff-XLA steps are measured INTERLEAVED —
    # the fused/autodiff paired ratio is the drift-robust field; the
    # headline is the median of the default-dispatch draws. ----
    dt_gat_train = None
    gat_train_error = None
    gat_train_ratio = None
    gat_train_draws = {}
    try:
        import optax

        from elliptic_gnn_tpu.models.modules import build_model

        # transpose=False mirrors the production trainer (round 5: the
        # one-sweep backward walks forward tables only)
        g_gt = B.build_bsda_for_kind(
            data.edge_index, data.num_nodes, "gat", depth=4,
            a_dtype="int8", transpose=False,
        )
        gt_cfg = {"hidden_dim": 32, "layers": 2, "heads": 4, "dropout": 0.0}
        gt_model = build_model("gat", N_FEATURES, gt_cfg)
        gt_auto = build_model(
            "gat", N_FEATURES, dict(gt_cfg, gat_fused_vjp=False)
        )
        gt_params, _ = gt_model.init(jax.random.PRNGKey(0))
        gt_tx = optax.adam(1e-3)
        gt_opt = gt_tx.init(gt_params)
        y_gt = jnp.asarray(np.maximum(data.y, 0).astype(np.int32))
        tm_gt = jnp.asarray(data.train_mask.astype(np.float32))
        x_gt = jnp.asarray(data.x)

        def make_step(model):
            def gat_train_step(carry, x, y, tm, gg):
                params, opt_state = carry

                def lf(p):
                    logits, _ = model.apply(p, {}, x, gg, training=True,
                                            rng=jax.random.key(0))
                    logp = jax.nn.log_softmax(logits, axis=1)
                    nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
                    return (nll * tm).sum() / tm.sum()

                _, grads = jax.value_and_grad(lf)(params)
                updates, opt2 = gt_tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt2)

            return gat_train_step

        step_fused = make_step(gt_model)
        step_auto = make_step(gt_auto)
        gat_train_draws = {"fused": [], "autodiff": []}
        # 3 interleaved draws: a true median headline, robust to one
        # relay-drift outlier (the fwd stage already draws 3)
        for _rep in range(3):
            gat_train_draws["fused"].append(differential_time(
                step_fused, (gt_params, gt_opt), x_gt, y_gt, tm_gt, g_gt,
                n_small=2, n_big=8, repeats=2,
            )[0])
            gat_train_draws["autodiff"].append(differential_time(
                step_auto, (gt_params, gt_opt), x_gt, y_gt, tm_gt, g_gt,
                n_small=2, n_big=8, repeats=2,
            )[0])
        dt_gat_train = float(np.median(gat_train_draws["fused"]))
        gat_train_ratio = float(np.median([
            a / f for f, a in zip(gat_train_draws["fused"],
                                  gat_train_draws["autodiff"])
        ]))
        log(f"[bench] GAT train step (default dispatch): "
            f"{dt_gat_train*1e3:.3f} ms | autodiff "
            f"{np.median(gat_train_draws['autodiff'])*1e3:.3f} ms "
            f"(paired fused speedup {gat_train_ratio:.2f}x)")
    except Exception as exc:  # pragma: no cover - hardware-dependent
        gat_train_error = f"{type(exc).__name__}: {exc}"
        log(f"[bench] GAT train stage failed (continuing): {exc}")

    # ---- end-to-end training epochs (timed inside the loop) ----
    from elliptic_gnn_tpu.train.train_gnn import (
        _train_loop_fullbatch, build_train_state,
    )

    cfg = {
        "run_name": "bench", "seed": 42, "arch": "sage_resbn",
        "hidden_dim": 64, "layers": 3, "dropout": 0.2, "lr": 5e-4,
        "weight_decay": 5e-5, "grad_clip": 1.0, "time_embed_dim": 2,
        "time_embed_type": "sin", "max_timestep": N_TIMESTEPS,
        "patience": 10_000, "amp": True, "max_epochs": 36,
    }
    epoch_s = epoch_s_serial = float("nan")
    epoch_error = None
    try:
        data_t, model, gops, params, state, tx, opt_state, loss_fn = (
            build_train_state(cfg, data, 42)
        )
        # serial pipelined loop (explicit epochs_per_sync: 1): one
        # device->host AP sync per epoch — the relay's ~30 ms readback
        # latency bounds this mode; kept as a comparison row
        cfg_serial = dict(cfg, epochs_per_sync=1)
        tl = _TimingLogger()
        _, _, best_val, _ = _train_loop_fullbatch(
            cfg_serial, "/tmp", data_t, model, gops, params, state, tx,
            opt_state, loss_fn, tl,
        )
        epoch_s_serial = tl.epoch_seconds()
        log(f"[bench] train epoch serial (SAGE-ResBN 64x3, full-batch, "
            f"incl. per-epoch host AP sync): {epoch_s_serial*1e3:.1f} ms "
            f"(best_val={best_val:.4f})")
        # DEFAULT dispatch (epochs_per_sync: auto -> K=8 device-side scan
        # on TPU since round 4): early stopping + best tracking on device,
        # one host sync per 8 epochs. This is what a stock champion config
        # runs, and the headline train_epoch_ms.
        cfg_k = dict(cfg, max_epochs=40)
        tl = _TimingLogger()
        _, _, best_val_k, _ = _train_loop_fullbatch(
            cfg_k, "/tmp", data_t, model, gops, params, state, tx,
            opt_state, loss_fn, tl,
        )
        epoch_s = tl.epoch_seconds(skip=8)
        log(f"[bench] train epoch DEFAULT dispatch (epochs_per_sync auto, "
            f"device-side early stop): {epoch_s*1e3:.1f} ms "
            f"(best_val={best_val_k:.4f})")
    except Exception as exc:  # pragma: no cover - hardware-dependent
        epoch_error = f"{type(exc).__name__}: {exc}"
        log(f"[bench] epoch stage failed (continuing): {exc}")

    # ---- epoch through the explicit shard_map path at mesh=1 (VERDICT r4
    # #4: the scan x shard_map composition as a driver-visible stage). The
    # degenerate single-shard ring still runs the full machinery — halo
    # ppermutes, per-shard local-split Pallas kernel + fixup, psum'd loss
    # — inside the K-epoch device-side scan, exactly the code an N-chip
    # config runs. ----
    epoch_sm_s = float("nan")
    epoch_sm_error = None
    try:
        cfg_sm = dict(cfg, aggregation="shard_map", mesh_devices=1,
                      max_epochs=40)
        (data_sm, model_sm, gops_sm2, params_sm, state_sm, tx_sm, opt_sm,
         loss_sm) = build_train_state(cfg_sm, data, 42)
        tl = _TimingLogger()
        _, _, best_val_sm, _ = _train_loop_fullbatch(
            cfg_sm, "/tmp", data_sm, model_sm, gops_sm2, params_sm,
            state_sm, tx_sm, opt_sm, loss_sm, tl,
        )
        epoch_sm_s = tl.epoch_seconds(skip=8)
        log(f"[bench] train epoch shard_map mesh=1 (K-epoch scan over the "
            f"explicit halo step): {epoch_sm_s*1e3:.1f} ms "
            f"(best_val={best_val_sm:.4f})")
    except Exception as exc:  # pragma: no cover - hardware-dependent
        epoch_sm_error = f"{type(exc).__name__}: {exc}"
        log(f"[bench] shard_map epoch stage failed (continuing): {exc}")

    result = {
        "metric": "spmm_edges_per_s_per_chip",
        "value": float(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": float(edges_per_s / target),
        "detail": {
            "spmm_ms_raw": dt_best * 1e3,
            "spmm_ms_min_draw": (
                None if dt_min_draw is None else dt_min_draw * 1e3
            ),
            # same-process packed-vs-unpacked A/B (VERDICT r3 directive 1):
            # interleaved draws, per-variant physical floors; None = every
            # draw of that variant was a non-physical relay glitch
            "spmm_ms_packed": (
                None if dt_packed is None else dt_packed * 1e3
            ),
            "spmm_ms_unpacked": (
                None if dt_unpacked is None else dt_unpacked * 1e3
            ),
            "spmm_packed_speedup": (
                None if (dt_packed is None or dt_unpacked is None)
                else float(dt_unpacked / dt_packed)
            ),
            # drift-robust A/B: the draws are interleaved, so the
            # per-round unpacked/packed ratio cancels monotone relay
            # drift; median of ratios is the speedup of record
            "spmm_packed_speedup_paired": (
                (lambda ratios: None if not ratios
                 else float(np.median(ratios)))([
                    u / p for p, u in zip(draws["packed"],
                                          draws["unpacked"])
                    if p >= floors["packed"] and u >= floors["unpacked"]
                ]) if (valid["packed"] and "unpacked" in draws) else None
            ),
            # relay noise: full draw lists (incl. discarded) + physical
            # floors are self-describing (VERDICT r2/r3 "What's weak")
            "spmm_ms_draws": {
                name: [d * 1e3 for d in ds] for name, ds in draws.items()
            },
            "spmm_ms_physical_floor": {
                name: f * 1e3 for name, f in floors.items()
            },
            "spmm_ms_xla": dt_xla * 1e3,
            "spmm_path": path,
            "spmm_ms_roofline_spec": roofline_dt * 1e3,
            "timing_capped_at_physical_floor": bool(capped),
            "traffic_model_mb": traffic / 1e6,
            "hbm_gbps_spec": bw_spec,
            "hbm_gbps_measured_stream": bw_stream,
            "ell_spmm_ms": dt_ell * 1e3,
            "shardmap_agg_ms": (
                f"failed: {sm_error}" if sm_error is not None
                else None if dt_sm is None else dt_sm * 1e3
            ),
            # explicit failure markers: a silent None is how a perf
            # regression hides (VERDICT r2 "What's weak")
            "gat_forward_ms": (
                f"failed: {gat_error}" if gat_error is not None
                else None if dt_gat is None else dt_gat * 1e3
            ),
            # drift-robust paired ratios (VERDICT r4 #6): interleaved
            # same-process draws; median of per-round comparator/headline
            # ratios cancels monotone relay drift
            "gat_forward_flash_speedup_paired": gat_fwd_ratio,
            "gat_forward_ms_draws": {
                k: [d * 1e3 for d in v] for k, v in gat_fwd_draws.items()
            },
            "gat_train_step_ms": (
                f"failed: {gat_train_error}" if gat_train_error is not None
                else None if dt_gat_train is None else dt_gat_train * 1e3
            ),
            "gat_train_fused_speedup_paired": gat_train_ratio,
            "gat_train_step_ms_draws": {
                k: [d * 1e3 for d in v] for k, v in gat_train_draws.items()
            },
            "train_epoch_ms": (
                f"failed: {epoch_error}" if epoch_error is not None
                else epoch_s * 1e3
            ),
            "train_epoch_ms_serial": (
                f"failed: {epoch_error}" if epoch_error is not None
                else epoch_s_serial * 1e3
            ),
            "shardmap_epoch_ms": (
                f"failed: {epoch_sm_error}" if epoch_sm_error is not None
                else epoch_sm_s * 1e3
            ),
            "device": dev.device_kind,
            "num_edges": int(e),
            "encoding": f"bsda_int8_factored_d3_{np.dtype(x_dtype).name}",
            # the Pallas kernel ships a bit-packed A-table (a_pack slots
            # per byte) when multiplicities fit — the traffic model above
            # still counts the logical int8 encoding for round-to-round
            # comparability, so measured edges/s may exceed what that
            # model's stream rate implies
            "a_table_pack": int(g.a_pack),
            "bsda_spill_frac": (
                0.0 if g.residual is None
                else float(sum(int((np.asarray(w) > 0).sum())
                               for w in g.residual.weights)) / e
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # `python bench.py --mesh 1,2,4,8` -> mesh-scaling harness on the
    # virtual CPU mesh (re-execs with the platform env set; see
    # bench/scaling.py). Plain `python bench.py` = the headline TPU bench.
    if len(sys.argv) > 2 and sys.argv[1] == "--mesh":
        import subprocess

        import os as _os

        sizes = sys.argv[2]
        n_max = max(int(s) for s in sizes.split(","))
        env = dict(_os.environ)
        env["EGNN_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_max}"
        ).strip()
        sys.exit(subprocess.call(
            [sys.executable, "-m", "bench.scaling", "--sizes", sizes]
            + sys.argv[3:],
            env=env,
        ))
    try:
        main()
    except Exception as exc:  # always emit the JSON line for the driver
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "spmm_edges_per_s_per_chip",
            "value": 0.0,
            "unit": "edges/s",
            "vs_baseline": 0.0,
            "detail": {"error": f"{type(exc).__name__}: {exc}"},
        }))
        sys.exit(1)
