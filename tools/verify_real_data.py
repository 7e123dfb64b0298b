"""Real-data self-certification for the Elliptic ingest (VERDICT r3 #7).

In this environment the raw Elliptic CSVs are git-lfs pointer stubs, so
every pipeline number is synthetic-graph. This tool is the one command
that certifies the ingest the day real bytes appear:

    python tools/verify_real_data.py                 # data/raw, README counts
    python tools/verify_real_data.py --mock-dir /tmp/mock --mock-nodes 203769

It

  1. detects whether the three CSVs exist and are real bytes (not LFS
     pointer stubs);
  2. runs the ingest TWICE in subprocesses — once with the native mmap
     parser (EGNN_NATIVE=1) and once on the pure pandas path
     (EGNN_NATIVE=0) — and asserts the two produce bit-identical
     x / y / timestep / edge_index / masks;
  3. asserts the README-documented dataset shape (203,769 nodes, 234,355
     intra-timestep edges, 166 features, timesteps 1..49;
     /root/reference/README.md:42,58 — overridable for mocks);
  4. asserts the zero cross-time-edge invariant on the built graph
     (reference eda.py:124-150);
  5. writes REAL_DATA_CERT.json with the checks, input SHA-256 digests,
     and both engines' parse times.

`--mock-dir` first GENERATES a full-size Elliptic-shaped mock CSV triple
(real formats: headerless features, classes with header + 'unknown'
labels, edgelist with header) and certifies against it — proving the
whole certification path end-to-end today (tests/test_analysis.py runs a
reduced-size mock; the full-size run is recorded in docs/RESULTS.md).

Exit codes: 0 = certified, 2 = data absent / LFS stubs (nothing to
certify), 1 = certification FAILED.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = (
    "elliptic_txs_features.csv",
    "elliptic_txs_classes.csv",
    "elliptic_txs_edgelist.csv",
)
# /root/reference/README.md:42,58 and configs/split.yaml
EXPECTED = {"nodes": 203_769, "edges": 234_355, "features": 166, "t_max": 49}


def file_status(path: str) -> str:
    if not os.path.exists(path):
        return "missing"
    with open(path, "rb") as fh:
        head = fh.read(64)
    if head.startswith(b"version https://git-lfs"):
        return "lfs_stub"
    return "real"


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for block in iter(lambda: fh.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def make_mock(out_dir: str, nodes: int, t_max: int = 49,
              features: int = 166, edges: int = 234_355,
              seed: int = 0) -> None:
    """Write a full-format Elliptic-shaped mock CSV triple: headerless
    features (txId, timestep, f0..f{features-1}), classes with header and
    string labels incl. 'unknown', edgelist with header, all edges
    intra-timestep. Label mix follows the real dataset (~2% illicit,
    ~21% licit, rest unknown)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    tx = rng.choice(
        np.arange(10_000_000, 400_000_000, dtype=np.int64), size=nodes,
        replace=False,
    )
    # real timestep distribution is uneven; draw from a skewed multinomial
    ts = rng.integers(1, t_max + 1, size=nodes).astype(np.int64)
    feats = rng.standard_normal((nodes, features)).astype(np.float32)

    t0 = time.time()
    with open(os.path.join(out_dir, NAMES[0]), "w") as fh:
        for i in range(nodes):
            fh.write(f"{tx[i]},{ts[i]},")
            fh.write(",".join(f"{v:.6f}" for v in feats[i]))
            fh.write("\n")

    lab = rng.choice(["1", "2", "unknown"], size=nodes,
                     p=[0.0223, 0.2062, 0.7715])
    with open(os.path.join(out_dir, NAMES[1]), "w") as fh:
        fh.write("txId,class\n")
        for i in range(nodes):
            fh.write(f"{tx[i]},{lab[i]}\n")

    # intra-timestep edges: group nodes by timestep, sample pairs inside
    by_ts = {t: np.where(ts == t)[0] for t in range(1, t_max + 1)}
    e_src = np.empty(edges, np.int64)
    e_dst = np.empty(edges, np.int64)
    filled = 0
    while filled < edges:
        take = min(edges - filled, 50_000)
        t = int(rng.integers(1, t_max + 1))
        pool = by_ts[t]
        if pool.size < 2:
            continue
        s = rng.choice(pool, size=take)
        d = rng.choice(pool, size=take)
        keep = s != d
        k = int(keep.sum())
        e_src[filled: filled + k] = tx[s[keep]]
        e_dst[filled: filled + k] = tx[d[keep]]
        filled += k
    with open(os.path.join(out_dir, NAMES[2]), "w") as fh:
        fh.write("txId1,txId2\n")
        for i in range(edges):
            fh.write(f"{e_src[i]},{e_dst[i]}\n")
    print(f"[MOCK] wrote {nodes} nodes / {edges} edges to {out_dir} "
          f"in {time.time()-t0:.1f}s")


_INGEST_SNIPPET = r"""
import sys, time
import numpy as np
sys.path.insert(0, {repo!r})
import elliptic_gnn_tpu  # EGNN_PLATFORM honored
from elliptic_gnn_tpu.graph.ingest import load_elliptic_as_graph
from elliptic_gnn_tpu.graph.masks import make_temporal_masks
from elliptic_gnn_tpu.native import is_available
t0 = time.time()
data, meta = load_elliptic_as_graph({data_dir!r})
dt = time.time() - t0
data = make_temporal_masks(data, {t_train_end}, {t_val_end})
np.savez({out!r}, x=data.x, y=data.y, timestep=data.timestep,
         edge_index=data.edge_index, train_mask=data.train_mask,
         val_mask=data.val_mask, test_mask=data.test_mask,
         parse_seconds=dt, native=int(is_available()),
         meta=np.array([data.num_nodes, data.num_edges,
                        data.num_features], np.int64))
"""


def run_ingest(data_dir: str, native: bool, out: str) -> dict:
    env = dict(os.environ, EGNN_NATIVE="1" if native else "0",
               EGNN_PLATFORM="cpu")
    code = _INGEST_SNIPPET.format(
        repo=REPO, data_dir=data_dir, out=out, t_train_end=34, t_val_end=43,
    )
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(
            f"ingest subprocess ({'native' if native else 'pandas'}) "
            f"failed:\n{r.stderr[-2000:]}"
        )
    z = np.load(out)
    return {
        "arrays": {k: z[k] for k in
                   ("x", "y", "timestep", "edge_index", "train_mask",
                    "val_mask", "test_mask")},
        "meta": z["meta"],
        "parse_seconds": float(z["parse_seconds"]),
        "native_lib_loaded": bool(int(z["native"])),
        "wall_seconds": time.time() - t0,
    }


def certify(data_dir: str, expected: dict, out_json: str) -> int:
    status = {n: file_status(os.path.join(data_dir, n)) for n in NAMES}
    if any(s != "real" for s in status.values()):
        report = {"status": "data_absent", "files": status,
                  "hint": "place the real Elliptic CSVs (git lfs pull) "
                          "and re-run"}
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[CERT] no real data: {status} -> {out_json}")
        return 2

    digests = {n: sha256(os.path.join(data_dir, n)) for n in NAMES}
    with tempfile.TemporaryDirectory() as td:
        nat = run_ingest(data_dir, True, os.path.join(td, "nat.npz"))
        pan = run_ingest(data_dir, False, os.path.join(td, "pan.npz"))

    checks = {}
    n_nodes, n_edges, n_feat = (int(v) for v in nat["meta"])
    checks["node_count"] = {
        "expected": expected["nodes"], "got": n_nodes,
        "pass": n_nodes == expected["nodes"],
    }
    checks["edge_count"] = {
        "expected": expected["edges"], "got": n_edges,
        "pass": n_edges == expected["edges"],
    }
    checks["feature_count"] = {
        "expected": expected["features"], "got": n_feat,
        "pass": n_feat == expected["features"],
    }
    ts = nat["arrays"]["timestep"]
    checks["timestep_range"] = {
        "expected": [1, expected["t_max"]],
        "got": [int(ts.min()), int(ts.max())],
        "pass": int(ts.min()) >= 1 and int(ts.max()) <= expected["t_max"],
    }
    ei = nat["arrays"]["edge_index"]
    n_cross = int((ts[ei[0]] != ts[ei[1]]).sum())
    checks["zero_cross_time_edges"] = {"violations": n_cross,
                                       "pass": n_cross == 0}
    # native and pandas paths must agree bit-for-bit
    eq = {}
    for k, a in nat["arrays"].items():
        b = pan["arrays"][k]
        eq[k] = bool(a.shape == b.shape and np.array_equal(a, b))
    checks["native_equals_pandas"] = {
        "per_array": eq,
        "native_lib_was_loaded": nat["native_lib_loaded"],
        "pass": all(eq.values()),
    }
    if not nat["native_lib_loaded"]:
        # without the native lib both subprocesses ran pandas — the
        # equality check is then vacuous; surface it rather than pass
        checks["native_equals_pandas"]["note"] = (
            "native library unavailable; both runs used pandas"
        )

    ok = all(c["pass"] for c in checks.values())
    report = {
        "status": "certified" if ok else "FAILED",
        "data_dir": os.path.abspath(data_dir),
        "files": status,
        "sha256": digests,
        "checks": checks,
        "parse_seconds": {"native": nat["parse_seconds"],
                          "pandas": pan["parse_seconds"]},
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[CERT] {report['status']} -> {out_json} "
          f"(native parse {nat['parse_seconds']:.1f}s, pandas "
          f"{pan['parse_seconds']:.1f}s)")
    return 0 if ok else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/raw")
    ap.add_argument("--out", default="REAL_DATA_CERT.json")
    ap.add_argument("--mock-dir", default=None,
                    help="generate an Elliptic-shaped mock here and "
                         "certify against it")
    ap.add_argument("--mock-nodes", type=int, default=EXPECTED["nodes"])
    ap.add_argument("--mock-edges", type=int, default=EXPECTED["edges"])
    ap.add_argument("--expect-nodes", type=int, default=None)
    ap.add_argument("--expect-edges", type=int, default=None)
    args = ap.parse_args()

    expected = dict(EXPECTED)
    data_dir = args.data_dir
    if args.mock_dir is not None:
        make_mock(args.mock_dir, args.mock_nodes, edges=args.mock_edges)
        data_dir = args.mock_dir
        expected["nodes"] = args.mock_nodes
        expected["edges"] = args.mock_edges
    if args.expect_nodes is not None:
        expected["nodes"] = args.expect_nodes
    if args.expect_edges is not None:
        expected["edges"] = args.expect_edges

    sys.exit(certify(data_dir, expected, args.out))


if __name__ == "__main__":
    main()
