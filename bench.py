"""Headline benchmark: SpMM aggregation throughput (edges/s/chip) and
end-to-end training epoch time on an Elliptic-sized graph.

Prints exactly ONE JSON line on stdout:
  {"metric": "spmm_edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": r, "detail": {...}}

vs_baseline: measured edges/s divided by the 70%-of-roofline target from
the north star (BASELINE.json: "SpMM at >70% of roofline"), so r > 1.0
beats the target. The roofline model counts unavoidable HBM traffic for the
BSDA encoding (kernels/bsda.py): dense chunk blocks A, feature read, output
write, residual tables.

Timing notes: this TPU is reached through a relay whose dispatch acks are
asynchronous — plain block_until_ready loop timing is unreliable. SpMM is
timed with chained-scan differential timing fenced by readbacks
(bench/timing.py); values above the physical roofline are capped and the
raw value reported in detail. The end-to-end epoch time is wall-clock over
real training epochs with a per-epoch host sync — the most robust number
this environment can produce. Diagnostics go to stderr; stdout carries only
the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench.timing import differential_time  # noqa: E402

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


def bsda_traffic_bytes(g, feat: int) -> int:
    """Unavoidable HBM bytes for one BSDA aggregation pass."""
    a_bytes = int(np.prod(g.a.shape)) * g.a.dtype.itemsize
    x_bytes = g.num_chunks * g.chunk * feat * 4  # gathered chunks (>= x once)
    out_bytes = g.num_chunks * g.chunk * feat * 4
    res_bytes = 0
    if g.residual is not None:
        for nbr in g.residual.nbrs:
            r, w = nbr.shape
            res_bytes += r * w * (feat * 4 + 8) + r * feat * 4
    return a_bytes + x_bytes + out_bytes + res_bytes


def main() -> None:
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges
    from elliptic_gnn_tpu.kernels import bsda as B
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph, ell_spmm, renumber_for_ell

    dev = jax.devices()[0]
    log(f"[bench] device: {dev.device_kind} ({dev.platform})")
    n_nodes = N_NODES
    if dev.platform == "cpu":  # keep a CPU fallback run within time budget
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
    g = B.build_bsda(data.edge_index, data.num_nodes, mean=True, depth=2)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((data.num_nodes, HIDDEN)),
        dtype=jnp.float32,
    )

    # ---- SpMM: chained-scan differential timing ----
    dt_bsda, dbg = differential_time(
        lambda c, gg: B.bsda_spmm(gg, c), x, g
    )
    bw = hbm_bandwidth_gbps()
    traffic = bsda_traffic_bytes(g, HIDDEN)
    roofline_dt = traffic / (bw * 1e9)
    capped = dt_bsda < roofline_dt
    dt_eff = max(dt_bsda, roofline_dt)
    edges_per_s = e / dt_eff
    target = ROOFLINE_TARGET_FRACTION * (e / roofline_dt)
    log(f"[bench] BSDA SpMM: raw {dt_bsda*1e3:.3f} ms/iter "
        f"(roofline {roofline_dt*1e3:.3f} ms; capped={capped}) "
        f"-> {edges_per_s/1e9:.3f} Ge/s")

    # ELL fallback path for comparison
    g_e, rk = renumber_for_ell(build_ell_graph(data.edge_index, data.num_nodes, mean=True))
    x_e = x[jnp.asarray(np.argsort(rk))]
    dt_ell, _ = differential_time(
        lambda c, gg: ell_spmm(gg, c), x_e, g_e
    )
    log(f"[bench] ELL SpMM: {dt_ell*1e3:.3f} ms/iter ({e/dt_ell/1e9:.3f} Ge/s)")

    # ---- end-to-end training epochs (wall clock, per-epoch host sync) ----
    from elliptic_gnn_tpu.train.train_gnn import (
        _train_loop_fullbatch, build_train_state, prepare_data,
    )

    class _NullLogger:
        def log_epoch(self, *a, **k):
            pass

        def close(self):
            pass

    cfg = {
        "run_name": "bench", "seed": 42, "arch": "sage_resbn",
        "hidden_dim": 64, "layers": 3, "dropout": 0.2, "lr": 5e-4,
        "weight_decay": 5e-5, "grad_clip": 1.0, "time_embed_dim": 2,
        "time_embed_type": "sin", "max_timestep": N_TIMESTEPS,
        "patience": 10_000, "amp": True, "aggregation": "bsda",
    }
    data_t, model, gops, params, state, tx, opt_state, loss_fn = (
        build_train_state(cfg, data, 42)
    )


    # reuse the real training loop for a fixed number of epochs
    def run_epochs(n):
        c = dict(cfg, max_epochs=n)
        return _train_loop_fullbatch(
            c, "/tmp", data_t, model, gops, params, state, tx, opt_state,
            loss_fn, _NullLogger(),
        )

    t0 = time.time()
    run_epochs(4)
    t5 = time.time() - t0
    t0 = time.time()
    run_epochs(28)
    t45 = time.time() - t0
    epoch_s = (t45 - t5) / 24
    log(f"[bench] train epoch (SAGE-ResBN, full-batch, incl. host AP sync): "
        f"{epoch_s*1e3:.1f} ms")

    result = {
        "metric": "spmm_edges_per_s_per_chip",
        "value": float(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": float(edges_per_s / target),
        "detail": {
            "spmm_ms_raw": dt_bsda * 1e3,
            "spmm_ms_roofline": roofline_dt * 1e3,
            "timing_capped_at_roofline": bool(capped),
            "ell_spmm_ms": dt_ell * 1e3,
            "train_epoch_ms": epoch_s * 1e3,
            "hbm_gbps_assumed": bw,
            "device": dev.device_kind,
            "num_edges": int(e),
            "bsda_spill_frac": (
                0.0 if g.residual is None
                else float(sum(int((np.asarray(w) > 0).sum())
                               for w in g.residual.weights)) / e
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
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
