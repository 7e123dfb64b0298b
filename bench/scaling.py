"""Mesh-scaling harness: the sharded training step at n ∈ {1,2,4,8,...}
devices on the virtual CPU mesh (BASELINE.md row 4: edges/s scaling at
1 chip / 1 host / N hosts — the N-real-chip column is blocked on hardware
in this environment, so this harness validates correctness + communication
scaling and measures relative step time on the virtual mesh). With
--multihost P it ALSO runs the same step across P separate processes
(multi-controller over gloo — the DCN analogue) and appends a row
asserting loss equality with the in-process mesh.

For each mesh size it runs the explicit-collective shard_map step
(boundary-only halo, parallel/shardmap_step.py) and reports:
  - step wall time (median; virtual-CPU-relative, NOT TPU-absolute),
  - per-chip halo rows exchanged vs the full-gather volume,
  - the training loss (must agree across mesh sizes — correctness).

Usage (the env vars must be set before the process starts):
  EGNN_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m bench.scaling [--sizes 1,2,4,8] [--nodes 60000] \
      [--multihost 2]
or via the top-level wrapper, which re-execs itself with the env set:
  python bench.py --mesh 1,2,4,8

Writes bench_scaling.json and prints a table to stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build(nodes: int, mesh_devices: int):
    """Shared graph/model/state build (identical in parent and workers)."""
    import jax.numpy as jnp

    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges
    from elliptic_gnn_tpu.models.losses import class_weights, make_loss_parts
    from elliptic_gnn_tpu.train.train_gnn import build_train_state

    cfg = {
        "arch": "sage_resbn", "hidden_dim": 64, "layers": 3, "dropout": 0.0,
        "lr": 5e-4, "weight_decay": 5e-5, "grad_clip": 1.0,
        "time_embed_dim": 2, "time_embed_type": "sin", "max_timestep": 49,
        "aggregation": "shard_map", "mesh_devices": mesh_devices,
    }
    data0 = synthetic.generate(
        num_nodes=nodes, num_features=166, num_timesteps=49,
        avg_degree=1.15, seed=0,
    )
    data0 = make_temporal_masks(data0, 34, 43)
    data0 = symmetrize_edges(data0)
    data, model, gops, params, state, tx, opt_state, _ = build_train_state(
        cfg, data0, 42
    )
    cw = jnp.asarray(class_weights(data.y[data.train_mask]))
    return data0, data, model, gops, params, state, tx, opt_state, cw


def _run_size(n: int, steps: int, built):
    """One mesh size: returns (median step seconds, loss, halo stats)."""
    import jax

    from elliptic_gnn_tpu.models.losses import make_loss_parts
    from elliptic_gnn_tpu.kernels.bsda import pad_bsda_chunks
    from elliptic_gnn_tpu.parallel import make_mesh, shard_graph_inputs
    from elliptic_gnn_tpu.parallel.mesh import replicated
    from elliptic_gnn_tpu.parallel.shardmap_step import (
        make_shardmap_train_step, partition_bsda,
    )

    _, data, model, gops, params, state, tx, opt_state, cw = built
    mesh = make_mesh(n)
    gops_p = pad_bsda_chunks(gops, n)
    sg = partition_bsda(gops_p, n)
    x, y, ts, tm, rm, _, _ = shard_graph_inputs(
        mesh, data, gops_p, shard_tables=False
    )
    rep = replicated(mesh)
    p = jax.device_put(params, rep)
    s = jax.device_put(state, rep)
    o = jax.device_put(opt_state, rep)
    step = make_shardmap_train_step(
        mesh, model, tx, make_loss_parts({}, cw, 0, 1), sg
    )

    rng = jax.random.key(0)
    p1, s1, o1, loss, probs = step(p, s, o, rng, x, y, ts, tm, rm, sg)
    jax.block_until_ready(loss)  # compile + warm
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        p1, s1, o1, loss, probs = step(p1, s1, o1, rng, x, y, ts, tm, rm, sg)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), float(np.asarray(loss)), sg


def _worker(args):
    """Multi-host worker: join the coordinator, run the sharded step over
    the GLOBAL mesh, report the loss (host 0 writes the result file)."""
    import jax

    from elliptic_gnn_tpu.parallel import multihost

    multihost.maybe_initialize({})
    n = len(jax.devices())
    built = _build(args.nodes, n)
    dt, loss, _ = _run_size(n, args.steps, built)
    if multihost.is_primary():
        with open(args.mh_out, "w") as f:
            json.dump({"devices": n,
                       "processes": multihost.process_count(),
                       "step_ms": dt * 1e3, "loss_step1": loss}, f)
    multihost.barrier("scaling")


# assumed one-directional ICI bandwidth per link, GB/s (public specs /
# jax-ml.github.io/scaling-book; the ring halo sends each direction over a
# different link concurrently, so one direction's bytes bound the time)
ICI_GBPS = {"v5e": 45.0, "v5p": 90.0}


def project_efficiency(bench_detail: dict, sg, layer_widths, n_params: int,
                       sizes, amp: bool = True) -> dict:
    """Analytic N-chip projection from single-chip TPU measurements
    (VERDICT r4 #5: a falsifiable scaling claim checkable today).

    Model, per training epoch-equivalent step and chip:
      t_local(n)  = t_mesh1 / n          (the kernel is HBM-bandwidth
                    bound and the row partition divides its streams
                    evenly; measured mesh=1 TPU epoch from bench.py)
      t_halo(n)   = passes' one-direction halo bytes / ICI_bw
                    (2*ppermutes ride opposite-direction links
                    concurrently; halo rows = 2H boundary chunks * C,
                    independent of n)
      t_psum(n)   = 2*(n-1)/n * param_bytes / ICI_bw  (ring all-reduce of
                    the replicated gradients)
      projected   = max(t_local, t_halo) + t_psum   [overlapped: round-5
                    local-split kernel has no data dependency on the halo]
      serialized  = t_local + t_halo + t_psum       [comparison: what a
                    non-overlapped schedule would pay]
      efficiency  = t_mesh1 / (n * projected)
    """
    t1 = bench_detail.get("train_epoch_ms")
    agg1 = bench_detail.get("shardmap_agg_ms")
    if not isinstance(t1, (int, float)) or not t1 or t1 != t1:
        return {"error": "no single-chip TPU epoch measurement available"}
    isz = 2 if amp else 4
    hc_rows = sg.halo_chunks * sg.chunk
    # per epoch: train fwd + bwd + eval fwd each exchange one halo per
    # aggregation layer, of that layer's input width (cotangent width ==
    # input width on the backward)
    sum_f = 3 * sum(layer_widths)
    halo_bytes_dir = hc_rows * sum_f * isz
    param_bytes = n_params * 4
    out = {}
    for chip, bw in ICI_GBPS.items():
        rows = []
        for n in sizes:
            if n < 2:
                rows.append({"devices": 1, "projected_step_ms": t1,
                             "efficiency": 1.0})
                continue
            t_local = t1 / n
            t_halo = halo_bytes_dir / (bw * 1e9) * 1e3
            t_psum = 2 * (n - 1) / n * param_bytes / (bw * 1e9) * 1e3
            proj = max(t_local, t_halo) + t_psum
            ser = t_local + t_halo + t_psum
            rows.append({
                "devices": n,
                "halo_mb_per_chip_per_step": halo_bytes_dir / 1e6,
                "t_local_ms": t_local,
                "t_halo_ms": t_halo,
                "t_grad_psum_ms": t_psum,
                "projected_step_ms": proj,
                "projected_step_ms_serialized": ser,
                "efficiency": t1 / (n * proj),
                "efficiency_serialized": t1 / (n * ser),
            })
        out[chip] = rows
    out["inputs"] = {
        "t_mesh1_epoch_ms": t1,
        "shardmap_agg_ms_mesh1": agg1,
        "halo_rows_per_side": int(hc_rows),
        "layer_widths": list(layer_widths),
        "passes_per_epoch": 3 * len(layer_widths),
        "param_bytes": param_bytes,
        "dtype_bytes": isz,
        "ici_gbps_assumed": ICI_GBPS,
    }
    return out


def _latest_bench_detail() -> dict:
    """The most recent driver BENCH_r0N.json's detail dict (the real-chip
    single-device measurements the projection anchors on)."""
    import glob
    import re

    best, best_n = None, -1
    for p in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        if not m:
            continue
        if int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), p
    if best is None:
        return {}
    try:
        with open(best) as f:
            j = json.load(f)
        d = j.get("parsed", j).get("detail", {})
        d["_source"] = best
        return d
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--nodes", type=int, default=60_000)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out", default="bench_scaling.json")
    ap.add_argument("--multihost", type=int, default=0,
                    help="also run max(sizes) devices split across P "
                         "separate processes (gloo multi-controller)")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--mh-out", default="/tmp/egnn_mh_row.json",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import jax

    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")

    if args.worker:
        _worker(args)
        return

    if len(jax.devices()) < max(sizes):
        raise RuntimeError(
            f"need {max(sizes)} devices, have {len(jax.devices())}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N first"
        )

    built = _build(args.nodes, max(sizes))
    data0 = built[0]
    e = data0.num_edges
    log(f"[scaling] graph: {data0.num_nodes} nodes, {e} edges")

    rows = []
    for n in sizes:
        dt, loss, sg = _run_size(n, args.steps, built)
        halo_rows = 2 * sg.halo_chunks * sg.chunk
        full_rows = sg.num_chunks_global * sg.chunk
        rows.append({
            "devices": n,
            "step_ms": dt * 1e3,
            "edges_per_s": e / dt,
            "loss_step1": loss,
            "halo_rows_per_chip": int(halo_rows if n > 1 else 0),
            "comm_vs_allgather": (
                float(halo_rows / full_rows) if n > 1 else 0.0
            ),
        })
        log(f"[scaling] n={n}: step {dt*1e3:8.1f} ms  "
            f"{e/dt/1e6:7.2f} Me/s  halo {halo_rows if n>1 else 0} rows/chip "
            f"loss {loss:.6f}")

    # correctness: the post-step loss must agree across mesh sizes
    losses = [r["loss_step1"] for r in rows]
    spread = max(losses) - min(losses)
    log(f"[scaling] loss spread across mesh sizes: {spread:.2e}")

    mh_row = None
    if args.multihost > 1:
        # the same global mesh, split across REAL processes (gloo): the
        # multi-controller DCN analogue. Loss must match the in-process row.
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        n_total = max(sizes)
        per = n_total // args.multihost
        procs = []
        for pid in range(args.multihost):
            env = dict(os.environ)
            env["EGNN_PLATFORM"] = "cpu"
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={per}"
            )
            env["EGNN_COORDINATOR"] = f"127.0.0.1:{port}"
            env["EGNN_NUM_PROCESSES"] = str(args.multihost)
            env["EGNN_PROCESS_ID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "bench.scaling", "--worker",
                 "--nodes", str(args.nodes), "--steps", str(args.steps),
                 "--mh-out", args.mh_out],
                env=env,
            ))
        rcs = [p.wait(timeout=900) for p in procs]
        if any(rcs):
            log(f"[scaling] multihost workers failed rc={rcs}")
        else:
            with open(args.mh_out) as f:
                mh_row = json.load(f)
            ref = next(r for r in rows if r["devices"] == n_total)
            mh_row["loss_delta_vs_single_process"] = abs(
                mh_row["loss_step1"] - ref["loss_step1"]
            )
            rows.append(mh_row)
            log(f"[scaling] multihost {args.multihost}x{per}dev: loss "
                f"{mh_row['loss_step1']:.6f} (delta vs 1-process "
                f"{mh_row['loss_delta_vs_single_process']:.2e})")

    # ---- quantitative N-chip projection anchored on the latest real-chip
    # single-device measurements (VERDICT r4 #5) ----
    bench_detail = _latest_bench_detail()
    params_tree = built[4]
    n_params = int(sum(
        np.prod(a.shape) for a in jax.tree_util.tree_leaves(params_tree)
    ))
    # champion SAGE-ResBN 64x3 aggregation input widths: layer 1 sees
    # in_dim 166 + sin time embed 2; layers 2..3 see hidden 64
    widths = [168, 64, 64]
    projection = project_efficiency(
        bench_detail, sg, widths, n_params,
        sorted(set(sizes) | {16, 32}), amp=True,
    )
    if "error" not in projection:
        for chip in ICI_GBPS:
            eff8 = next(
                (r for r in projection[chip] if r["devices"] == 8), None
            )
            if eff8:
                log(f"[scaling] projected {chip} 8-chip epoch: "
                    f"{eff8['projected_step_ms']:.2f} ms "
                    f"({eff8['efficiency']:.1%} efficiency, halo "
                    f"{eff8['halo_mb_per_chip_per_step']:.2f} MB/chip)")
    else:
        log(f"[scaling] projection skipped: {projection['error']}")

    result = {
        "metric": "shard_map_scaling",
        "platform": jax.devices()[0].platform,
        "projected_efficiency": projection,
        "note": ("virtual CPU mesh: validates correctness + comm scaling; "
                 "absolute times are not TPU times. N>=2 real-chip numbers "
                 "blocked on hardware availability; the multi-host row "
                 "(when present) runs the same step across REAL processes "
                 "over gloo collectives — see also tests/test_multihost.py."),
        "graph_nodes": data0.num_nodes,
        "graph_edges": e,
        "loss_spread": spread,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
