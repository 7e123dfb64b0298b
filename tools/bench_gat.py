"""GAT forward benchmark at Elliptic scale.

Measures the full 2-layer GAT model forward (heads=4, width 128 — the
configs/gat.yaml shape, mirroring reference src/models/gnn.py:56-76 via
PyG GATConv) on the production BSDA attention encoding, three ways:

  flash   forward-only Pallas kernel (kernels/pallas_gat.py) — the
          inference / per-epoch-val path (training=False)
  xla     autodiff-able XLA dense chunk-pair path (kernels/bsda_gat.py) —
          the training path (training=True)
  ell     masked-row-softmax ELL fallback (kernels/ell.py)

Timing uses chained-scan differential timing with readback fencing
(bench/timing.py) because the relay acks dispatches asynchronously.

Run: python tools/bench_gat.py   (prints one JSON line; details on stderr)
VERDICT round-1 target: 2-layer forward <= 8 ms at Elliptic scale.
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

N_NODES = 203_769
N_EDGES = 234_355
N_FEATURES = 166
N_TIMESTEPS = 49


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.kernels.bsda import bfs_order, build_bsda_for_kind
    from elliptic_gnn_tpu.models.modules import build_model, prepare_graph_ops

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"[bench_gat] device: {dev.device_kind} ({dev.platform})")
    n_nodes = N_NODES if on_tpu else 20_000

    t0 = time.time()
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=N_FEATURES,
        num_timesteps=N_TIMESTEPS, avg_degree=N_EDGES / N_NODES, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    log(f"[bench_gat] graph: {data.num_nodes} nodes, {data.num_edges} edges"
        f" ({time.time()-t0:.1f}s)")

    cfg = {"arch": "gat", "hidden_dim": 32, "layers": 2, "heads": 4,
           "dropout": 0.0}
    model = build_model("gat", N_FEATURES, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
    rdata = data.renumber(rank)
    g = build_bsda_for_kind(
        rdata.edge_index, rdata.num_nodes, "gat", depth=3, a_dtype="float32",
        transpose=False,
    )
    x = jnp.asarray(rdata.x)

    def fwd(training):
        def op(c, params, g):
            out, _ = model.apply(params, {}, c, g, training=training)
            # shape-preserving carry: fold logits back into the features
            return c + jnp.pad(
                out, ((0, 0), (0, c.shape[1] - out.shape[1]))
            ) * 1e-6
        return op

    results = {}
    for name, training in (("flash", False), ("xla", True)):
        dt = min(
            differential_time(fwd(training), x, params, g,
                              n_small=2, n_big=12, repeats=2)[0]
            for _ in range(2)
        )
        results[name] = dt
        log(f"[bench_gat] {name}: {dt*1e3:.3f} ms / 2-layer forward")

    g_ell = prepare_graph_ops(data.edge_index, data.num_nodes, "gat")
    x_ell = jnp.asarray(data.x)
    dt = differential_time(fwd(True), x_ell, params, g_ell,
                           n_small=2, n_big=12, repeats=2)[0]
    results["ell"] = dt
    log(f"[bench_gat] ell: {dt*1e3:.3f} ms / 2-layer forward")

    best = min(results["flash"], results["xla"])
    print(json.dumps({
        "metric": "gat_forward_ms",
        "value": round(best * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(8.0 / (best * 1e3), 3),  # >1.0 beats target
        "detail": {k: round(v * 1e3, 3) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
