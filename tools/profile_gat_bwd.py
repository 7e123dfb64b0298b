"""Profile the packed GAT training pipeline components on TPU (dev tool)."""
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
    from elliptic_gnn_tpu.kernels.packed_gat import packed_gat_train_forward
    from elliptic_gnn_tpu.kernels.pallas_gat import pack_width
    from elliptic_gnn_tpu.kernels.pallas_gat_bwd import (
        flash_gat_backward, g2_pack_width,
    )
    from elliptic_gnn_tpu.models.modules import build_model

    dev = jax.devices()[0]
    n = 203_769 if dev.platform == "tpu" else 20_000
    data = synthetic.generate(num_nodes=n, num_features=166,
                              num_timesteps=49,
                              avg_degree=234_355 / 203_769, seed=0)
    data = make_temporal_masks(data, 34, 43)
    rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
    rdata = data.renumber(rank)
    g = build_bsda_for_kind(rdata.edge_index, rdata.num_nodes, "gat",
                            depth=3, a_dtype="float32", transpose=True)
    rng = np.random.default_rng(0)
    h, ch = 4, 8
    pack1 = pack_width(h, ch)
    pack2 = g2_pack_width(h, ch)
    n_pad = g.num_chunks * g.chunk

    pay = jnp.asarray(rng.standard_normal((n_pad, pack1)), jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((n_pad, pack2)), jnp.float32)

    def bwd_op(c, g2):
        out = flash_gat_backward(g, c, g2, h, ch, 0.2)
        return out
    dt = differential_time(bwd_op, pay, g2, n_small=2, n_big=10, repeats=1)[0]
    log(f"both sweeps (one layer, h=4/ch=8): {dt*1e3:.3f} ms")

    model = build_model("gat", 166, {"hidden_dim": 32, "layers": 2,
                                     "heads": 4, "dropout": 0.0})
    params, _ = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rdata.x)
    y = jnp.asarray(np.maximum(rdata.y, 0).astype(np.int32))

    def loss(params, x):
        logits = packed_gat_train_forward(params["layers"], x, g)
        assert logits is not None
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    def fwd_op(c, params):
        return c * 0.999 + loss(params, x * (1 + c * 1e-9))

    carry0 = jnp.zeros(())
    dt = differential_time(fwd_op, carry0, params, n_small=2, n_big=10,
                           repeats=1)[0]
    log(f"packed train forward (loss only): {dt*1e3:.3f} ms")

    def grad_op(c, params):
        l, grads = jax.value_and_grad(loss)(params, x * (1 + c * 1e-9))
        return c * 0.999 + l + sum(
            jnp.sum(v) for v in jax.tree_util.tree_leaves(grads)) * 1e-9

    dt = differential_time(grad_op, carry0, params, n_small=2, n_big=10,
                           repeats=1)[0]
    log(f"packed train fwd+bwd: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
