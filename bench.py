"""Headline benchmark: SpMM aggregation throughput (edges/s/chip) on an
Elliptic-sized graph, plus end-to-end train-step time.

Prints exactly ONE JSON line on stdout:
  {"metric": "spmm_edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": r}

vs_baseline: measured edges/s divided by the 70%-of-roofline target the
north star demands (BASELINE.json: "SpMM at >70% of roofline"). The
roofline model counts unavoidable HBM traffic for one mean-aggregation pass
over the ELL encoding:
    read gathered rows   sum_b R_b * W_b * F * 4 B
    write aggregated     R_total * F * 4 B
    read tables          sum_b R_b * W_b * 8 B  (nbr i32 + weight f32)
    inv-perm reorder     2 * N * F * 4 B + N * 4 B
so vs_baseline > 1.0 means the kernel beats the target. All diagnostics go
to stderr; stdout carries only the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


# Elliptic graph scale (reference README.md:42,58)
N_NODES = 203_769
N_EDGES = 234_355
N_FEATURES = 166
HIDDEN = 128
N_TIMESTEPS = 49

HBM_GBPS = {
    # device_kind substring -> HBM bandwidth GB/s
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


def ell_traffic_bytes(g, feat: int) -> int:
    total = 0
    r_total = 0
    for nbr in g.nbrs:
        r, w = nbr.shape
        total += r * w * feat * 4      # gathered source rows
        total += r * w * 8             # nbr idx + weight
        total += r * feat * 4          # bucket output write
        r_total += r
    n = g.num_nodes
    total += 2 * n * feat * 4 + n * 4  # inv-perm gather (read+write+idx)
    return total


def _timeit(fn, *args, iters=30, warmup=5) -> float:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph
    from elliptic_gnn_tpu.models import build_model, prepare_graph_ops
    from elliptic_gnn_tpu.models.losses import class_weights, make_loss_fn
    from elliptic_gnn_tpu.train.train_gnn import make_optimizer

    dev = jax.devices()[0]
    log(f"[bench] device: {dev.device_kind} ({dev.platform})")

    avg_deg = N_EDGES / N_NODES
    t0 = time.time()
    data = synthetic.generate(
        num_nodes=N_NODES,
        num_features=N_FEATURES,
        num_timesteps=N_TIMESTEPS,
        avg_degree=avg_deg,
        seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    data = symmetrize_edges(data)
    log(f"[bench] graph: {data.num_nodes} nodes, {data.num_edges} edges "
        f"(symmetrized), built in {time.time()-t0:.1f}s")

    t0 = time.time()
    g = build_ell_graph(data.edge_index, data.num_nodes, mean=True)
    log(f"[bench] ELL pack: widths={g.widths} padded_slots={g.padded_slots} "
        f"({g.padded_slots/max(data.num_edges,1):.2f}x edges) in {time.time()-t0:.1f}s")

    # ---- SpMM microbench (hidden-width features, the hot layer shape) ----
    from elliptic_gnn_tpu.kernels.ell import ell_spmm

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((data.num_nodes, HIDDEN)),
        dtype=jnp.float32,
    )
    spmm = jax.jit(lambda x: ell_spmm(g, x))
    dt = _timeit(spmm, x)
    edges_per_s = data.num_edges / dt
    traffic = ell_traffic_bytes(g, HIDDEN)
    gbps = traffic / dt / 1e9
    bw = hbm_bandwidth_gbps()
    roofline_edges_per_s = data.num_edges / (traffic / (bw * 1e9))
    target = ROOFLINE_TARGET_FRACTION * roofline_edges_per_s
    log(f"[bench] SpMM(mean, F={HIDDEN}): {dt*1e3:.3f} ms  "
        f"{edges_per_s/1e9:.3f} Ge/s  {gbps:.1f} GB/s "
        f"({gbps/bw*100:.1f}% of {bw:.0f} GB/s roofline)")

    # ---- end-to-end flagship train step ----
    cfg = {
        "arch": "sage_resbn", "hidden_dim": 64, "layers": 3, "dropout": 0.2,
        "lr": 5e-4, "weight_decay": 5e-5, "grad_clip": 1.0,
        "time_embed_dim": 2, "time_embed_type": "sin", "max_timestep": 49,
    }
    import optax

    gops = prepare_graph_ops(data.edge_index, data.num_nodes, "sage")
    model = build_model("sage_resbn", data.num_features, cfg)
    params, state = model.init(jax.random.key(0))
    cw = class_weights(data.y[data.train_mask])
    ts_tr = data.timestep[data.train_mask]
    loss_fn = make_loss_fn(cfg, cw, int(ts_tr.min()), int(ts_tr.max()))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    xf = jnp.asarray(data.x)
    y = jnp.asarray(np.maximum(data.y, 0).astype(np.int32))
    ts = jnp.asarray(data.timestep.astype(np.int32))
    tm = jnp.asarray(data.train_mask.astype(np.float32))

    @jax.jit
    def train_step(params, state, opt_state, rng):
        def lf(p):
            logits, new_state = model.apply(
                p, state, xf, gops, ts, training=True, rng=rng
            )
            return loss_fn(p, logits, y, None, tm), new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt, loss

    rng = jax.random.key(1)

    def one_step(params, state, opt_state):
        return train_step(params, state, opt_state, rng)

    dt_step = _timeit(one_step, params, state, opt_state, iters=10, warmup=3)
    log(f"[bench] flagship train step: {dt_step*1e3:.2f} ms/epoch(full-batch)  "
        f"{data.num_edges * 7 / dt_step / 1e9:.2f} Ge/s effective "
        f"(7 SpMM-equivalents: 3 fwd + 3 bwd + wgrad)")

    result = {
        "metric": "spmm_edges_per_s_per_chip",
        "value": float(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": float(edges_per_s / target),
        "detail": {
            "spmm_ms": dt * 1e3,
            "spmm_gbps": gbps,
            "hbm_gbps": bw,
            "roofline_fraction": gbps / bw,
            "train_step_ms": dt_step * 1e3,
            "device": dev.device_kind,
            "num_edges": int(data.num_edges),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
