"""GAT training-step benchmark at Elliptic scale (dev tool).

Measures one full train step (forward + backward + Adam) of the 2-layer
GAT through the autodiff XLA attention path (kernels/bsda_gat.py), the
counterpart of tools/bench_gat.py's forward-only numbers.
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


def main():
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.kernels.bsda import bfs_order, build_bsda_for_kind
    from elliptic_gnn_tpu.models.modules import build_model

    dev = jax.devices()[0]
    n_nodes = 203_769 if dev.platform == "tpu" else 20_000
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=166, num_timesteps=49,
        avg_degree=234_355 / 203_769, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
    rdata = data.renumber(rank)
    g = build_bsda_for_kind(rdata.edge_index, rdata.num_nodes, "gat",
                            depth=3, a_dtype="float32", transpose=True)

    # force the autodiff path: this tool's historical numbers (36.8 ms r2)
    # are XLA-autodiff; the fused custom-VJP default is measured by
    # bench.py's gat_train_step_ms stage and tools/bench_gat_breakdown.py
    model = build_model("gat", 166, {"hidden_dim": 32, "layers": 2,
                                     "heads": 4, "dropout": 0.0,
                                     "gat_fused_vjp": False})
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jnp.asarray(rdata.x)
    y = jnp.asarray(np.maximum(rdata.y, 0).astype(np.int32))
    tm = jnp.asarray(rdata.train_mask.astype(np.float32))

    def train_step(carry, x, y, tm):
        params, opt_state = carry

        def lf(p):
            logits, _ = model.apply(p, {}, x, g, training=True,
                                    rng=jax.random.key(0))
            logp = jax.nn.log_softmax(logits, axis=1)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return (nll * tm).sum() / tm.sum()

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt2)

    dt = min(
        differential_time(train_step, (params, opt_state), x, y, tm,
                          n_small=2, n_big=8, repeats=2)[0]
        for _ in range(2)
    )
    log(f"[bench_gat_train] train step (fwd+bwd+adam): {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
