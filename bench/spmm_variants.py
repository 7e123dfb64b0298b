"""SpMM implementation shootout on real TPU hardware.

Times XLA-level variants of the mean-aggregation SpMM to locate the
bottleneck before writing the Pallas kernel:
  A  current ELL (power-of-two buckets, inv-perm gather at the end)
  B  ELL with min bucket width 8 (fewer kernels, more padding)
  C  ELL on a degree-renumbered graph (identity inv-perm — no final gather)
  D  edge-list gather + sorted segment_sum
  E  gather-only (x[nbr] for all buckets, no reduce) — isolates gather cost
  F  reduce-only on pre-gathered data — isolates reduce cost

Run:  python bench/spmm_variants.py [--nodes 203769] [--feat 128]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=203_769)
    ap.add_argument("--feat", type=int, default=128)
    args = ap.parse_args()

    from elliptic_gnn_tpu.graph import synthetic
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph, ell_spmm

    data = synthetic.generate(
        num_nodes=args.nodes, num_timesteps=49,
        avg_degree=234_355 / 203_769, seed=0,
    )
    data = symmetrize_edges(data)
    n, e = data.num_nodes, data.num_edges
    f = args.feat
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, f)), dtype=jnp.float32
    )
    print(f"graph: {n} nodes, {e} edges, F={f}")

    def report(name, dt, extra=""):
        print(f"{name:38s} {dt*1e3:8.3f} ms  {e/dt/1e9:6.3f} Ge/s  {extra}")

    # A: current ELL
    gA = build_ell_graph(data.edge_index, n, mean=True)
    fA = jax.jit(lambda x: ell_spmm(gA, x))
    report(f"A ell pow2 ({len(gA.widths)} buckets)", timeit(fA, x),
           f"pad={gA.padded_slots/e:.2f}x")

    # B: larger minimum bucket width
    for mw in (4, 8, 16):
        gB = build_ell_graph(data.edge_index, n, mean=True, min_width=mw)
        fB = jax.jit(lambda x, g=gB: ell_spmm(g, x))
        report(f"B ell minw={mw} ({len(gB.widths)} buckets)", timeit(fB, x),
               f"pad={gB.padded_slots/e:.2f}x")

    # C: degree-renumbered graph (identity inv_perm)
    perm_parts = []
    for rows in gA.rows:
        perm_parts.append(np.asarray(rows))
    deg = np.zeros(n, np.int64)
    np.add.at(deg, data.edge_index[1], 1)
    perm_parts.append(np.where(deg == 0)[0])
    perm = np.concatenate(perm_parts)  # new order: bucket rows then isolated
    rank = np.empty(n, np.int64)
    rank[perm] = np.arange(n)
    ei_re = rank[data.edge_index]
    gC = build_ell_graph(ei_re.astype(np.int64), n, mean=True)
    ident = bool((np.asarray(gC.inv_perm) == np.arange(n)).all())
    x_re = x[jnp.asarray(perm)]
    fC = jax.jit(lambda x: ell_spmm(gC, x))
    report(f"C ell renumbered (ident={ident})", timeit(fC, x_re))

    # D: edge-list segment-sum (sorted by dst)
    order = np.argsort(data.edge_index[1], kind="stable")
    src_s = jnp.asarray(data.edge_index[0][order].astype(np.int32))
    dst_s = jnp.asarray(data.edge_index[1][order].astype(np.int32))
    inv_deg = jnp.asarray((1.0 / np.maximum(deg, 1)).astype(np.float32))

    @jax.jit
    def fD(x):
        msg = x[src_s]
        agg = jax.ops.segment_sum(msg, dst_s, n, indices_are_sorted=True)
        return agg * inv_deg[:, None]

    report("D edge-list sorted segment_sum", timeit(fD, x))

    # E: gather-only over buckets
    @jax.jit
    def fE(x):
        return [x[nbr].sum(dtype=jnp.float32) for nbr in gA.nbrs]

    report("E gather-only (buckets)", timeit(fE, x))

    # F: weighted reduce on pre-gathered (no gather)
    pre = [jnp.asarray(np.random.default_rng(1).standard_normal(
        (nbr.shape[0], nbr.shape[1], f)), dtype=jnp.float32) for nbr in gA.nbrs]

    @jax.jit
    def fF(pre):
        return [
            jnp.einsum("rw,rwf->rf", w, p)
            for w, p in zip(gA.weights, pre)
        ]

    report("F reduce-only (pre-gathered)", timeit(fF, pre))

    # G: final inv-perm gather alone
    permuted = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, f)), dtype=jnp.float32
    )

    @jax.jit
    def fG(p):
        return p[gA.inv_perm]

    report("G inv-perm gather alone", timeit(fG, permuted))


if __name__ == "__main__":
    main()
