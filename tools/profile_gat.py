"""Profile GAT aggregate components at Elliptic scale (dev tool)."""
from __future__ import annotations

import sys
import time

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
    from elliptic_gnn_tpu.kernels import bsda_gat as BG
    from elliptic_gnn_tpu.kernels import pallas_gat as PG

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n_nodes = 203_769 if on_tpu else 20_000
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=166, num_timesteps=49,
        avg_degree=234_355 / 203_769, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
    ei = rank[data.edge_index]
    g = build_bsda_for_kind(ei, n_nodes, "gat", depth=3, a_dtype="float32",
                            transpose=False)
    log(f"chunks={g.num_chunks} depth={g.depth} chunk={g.chunk} "
        f"max_chunk_dist={g.max_chunk_dist}")

    rng = np.random.default_rng(0)
    h, ch = 4, 8  # configs/gat.yaml: hidden 32 / 4 heads
    xp = jnp.asarray(rng.standard_normal((n_nodes, h, ch)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n_nodes, h)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((n_nodes, h)), jnp.float32)

    # does flash engage?
    n_pad = g.num_chunks * g.chunk - n_nodes
    pad = lambda v, f=0.0: jnp.concatenate(  # noqa: E731
        [v, jnp.full((n_pad,) + v.shape[1:], f, v.dtype)], axis=0)
    fl = PG.flash_gat_dense(g, pad(xp), pad(a_s, PG.NEG_INF),
                            pad(a_d, PG.NEG_INF))
    log(f"flash engages: {fl is not None}")

    # carry threads THROUGH the aggregate (xp derived from the carry) so the
    # chained scan cannot hoist the op as loop-invariant
    def agg(flash):
        def op(c, a_s, a_d):
            out = BG.bsda_gat_aggregate(
                g, c.reshape(n_nodes, h, ch), a_s, a_d, use_flash=flash)
            return out.reshape(n_nodes, h * ch)
        return op

    carry = jnp.asarray(rng.standard_normal((n_nodes, h * ch)), jnp.float32)
    # flash dense part alone (no spill/merge) — measure first
    asp, adp = pad(a_s, PG.NEG_INF), pad(a_d, PG.NEG_INF)
    carry_p = jnp.asarray(
        rng.standard_normal((n_nodes + n_pad, h * ch)), jnp.float32)

    def dense_only(c, asp, adp):
        m, s, acc = PG.flash_gat_dense(g, c.reshape(-1, h, ch), asp, adp)
        return (acc / jnp.maximum(s, 1e-16)[..., None]).reshape(c.shape)

    dt = differential_time(dense_only, carry_p, asp, adp,
                           n_small=2, n_big=10, repeats=1)[0]
    log(f"flash dense part: {dt*1e3:.3f} ms")

    for name, flash in (("flash", True), ("xla", False)):
        dt = differential_time(agg(flash), carry, a_s, a_d,
                               n_small=2, n_big=10, repeats=1)[0]
        log(f"aggregate[{name}]: {dt*1e3:.3f} ms")

    t0 = time.time()
    log("done", time.time() - t0)


if __name__ == "__main__":
    main()
