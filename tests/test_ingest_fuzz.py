"""Real-format ingest fuzzing: the reference loader survives messy CSVs via
pandas (/root/reference/src/data/dataset_elliptic.py:70-233); this battery
proves the native mmap parser + pandas-fallback ingest path does too —
quoted fields, CRLF, shuffled/extra columns, missing labels, 64-bit txIds,
NaN features, spacing, trailing-newline variants.

The contract under test: `parse_numeric_csv` either parses EXACTLY or
returns None (never silently mis-parses), and `load_elliptic_as_graph`
produces the same graph for every equivalent formatting of the same data.
"""
import os

import numpy as np
import pytest

from elliptic_gnn_tpu.graph.ingest import load_elliptic_as_graph
from elliptic_gnn_tpu.native import is_available, parse_numeric_csv

N_FEAT = 4


def _write(d, name, text):
    path = os.path.join(d, name)
    with open(path, "w", newline="") as f:
        f.write(text)
    return path


def _base_rows(tx_base=10_000):
    """8 nodes over 2 timesteps with known labels and features."""
    rng = np.random.default_rng(0)
    tx = tx_base + np.arange(8)
    ts = np.array([1, 1, 1, 1, 2, 2, 2, 2])
    y = ["1", "2", "unknown", "1", "2", "unknown", "1", "2"]
    x = np.round(rng.standard_normal((8, N_FEAT)), 4)
    edges = [(tx[0], tx[1]), (tx[1], tx[2]), (tx[4], tx[5]), (tx[6], tx[7]),
             (tx[0], tx[4])]  # last one crosses timesteps -> dropped
    return tx, ts, y, x, edges


def _write_standard(d, tx, ts, y, x, edges, *, eol="\n", quote=False,
                    spaces=False, edge_header=True, cls_extra_col=False,
                    cls_shuffled=False, trailing_newline=True):
    q = (lambda s: f'"{s}"') if quote else (lambda s: s)
    sep = ", " if spaces else ","

    feat_lines = [
        sep.join([q(str(t))] + [q(str(s))] + [q(repr(float(v))) for v in row])
        for t, s, row in zip(tx, ts, x)
    ]
    cls_header = ["txId", "class"]
    if cls_extra_col:
        cls_header.append("notes")
    if cls_shuffled:
        cls_header = cls_header[::-1]
    cls_lines = [sep.join(q(h) for h in cls_header)]
    for t, lab in zip(tx, y):
        row = {"txId": str(t), "class": lab, "notes": "n/a"}
        cls_lines.append(sep.join(q(row[h]) for h in cls_header))
    edge_lines = ([sep.join([q("txId1"), q("txId2")])] if edge_header else [])
    edge_lines += [sep.join([q(str(a)), q(str(b))]) for a, b in edges]

    tail = eol if trailing_newline else ""
    _write(d, "elliptic_txs_features.csv", eol.join(feat_lines) + tail)
    _write(d, "elliptic_txs_classes.csv", eol.join(cls_lines) + tail)
    _write(d, "elliptic_txs_edgelist.csv", eol.join(edge_lines) + tail)


def _check_graph(data, meta, tx, ts, y, x):
    assert data.x.shape == (8, N_FEAT)
    np.testing.assert_allclose(data.x, x.astype(np.float32), rtol=1e-5)
    np.testing.assert_array_equal(data.timestep, ts)
    expect_y = np.array([{"1": 1, "2": 0, "unknown": -1}[v] for v in y])
    np.testing.assert_array_equal(data.y, expect_y)
    # 4 intra-timestep edges kept, 1 cross-timestep dropped
    assert data.edge_index.shape == (2, 4)
    s, t = data.edge_index
    assert (data.timestep[s] == data.timestep[t]).all()


@pytest.mark.parametrize("variant", [
    "plain", "crlf", "quoted", "spaces", "no_edge_header",
    "cls_extra_col", "cls_shuffled", "no_trailing_newline",
])
def test_format_variants_identical(tmp_path, variant):
    """Every equivalent formatting of the same data yields the same graph."""
    tx, ts, y, x, edges = _base_rows()
    kw = {}
    if variant == "crlf":
        kw["eol"] = "\r\n"
    elif variant == "quoted":
        kw["quote"] = True
    elif variant == "spaces":
        kw["spaces"] = True
    elif variant == "no_edge_header":
        kw["edge_header"] = False
    elif variant == "cls_extra_col":
        kw["cls_extra_col"] = True
    elif variant == "cls_shuffled":
        kw["cls_shuffled"] = True
    elif variant == "no_trailing_newline":
        kw["trailing_newline"] = False
    d = str(tmp_path)
    _write_standard(d, tx, ts, y, x, edges, **kw)
    data, meta = load_elliptic_as_graph(d)
    _check_graph(data, meta, tx, ts, y, x)


def test_64bit_txids(tmp_path):
    """txIds beyond f64's 2^53 integer range must map exactly (the strict
    native parser bails at >15 digits; pandas keeps int64)."""
    base = 9_007_199_254_740_993 + 10  # > 2^53, consecutive ids collide in f64
    tx, ts, y, x, edges = _base_rows(tx_base=base)
    d = str(tmp_path)
    _write_standard(d, tx, ts, y, x, edges)
    data, meta = load_elliptic_as_graph(d)
    _check_graph(data, meta, tx, ts, y, x)


def test_missing_labels(tmp_path):
    """txIds absent from classes.csv -> unlabeled (-1), graph unchanged."""
    tx, ts, y, x, edges = _base_rows()
    d = str(tmp_path)
    _write_standard(d, tx, ts, y, x, edges)
    # drop rows 2 and 5 from classes
    path = os.path.join(d, "elliptic_txs_classes.csv")
    lines = open(path).read().splitlines()
    del lines[6], lines[3]  # (1-indexed header) rows for tx[2], tx[5]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    data, _ = load_elliptic_as_graph(d)
    expect_y = np.array([{"1": 1, "2": 0, "unknown": -1}[v] for v in y])
    expect_y[2] = expect_y[5] = -1
    np.testing.assert_array_equal(data.y, expect_y)
    assert data.edge_index.shape == (2, 4)


def test_nan_features(tmp_path):
    """Empty / NaN feature cells survive (pandas fallback carries NaN)."""
    tx, ts, y, x, edges = _base_rows()
    d = str(tmp_path)
    _write_standard(d, tx, ts, y, x, edges)
    path = os.path.join(d, "elliptic_txs_features.csv")
    lines = open(path).read().splitlines()
    cells = lines[3].split(",")
    cells[2] = "NaN"
    cells[3] = ""
    lines[3] = ",".join(cells)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    data, _ = load_elliptic_as_graph(d)
    assert data.x.shape == (8, N_FEAT)
    assert np.isnan(data.x[3, 0]) and np.isnan(data.x[3, 1])
    np.testing.assert_array_equal(data.timestep, ts)


def test_unmapped_edge_endpoints_dropped(tmp_path):
    """Edges referencing unknown txIds are dropped, not crashed on."""
    tx, ts, y, x, edges = _base_rows()
    edges = edges + [(999, tx[0]), (tx[1], 123456789)]
    d = str(tmp_path)
    _write_standard(d, tx, ts, y, x, edges)
    data, _ = load_elliptic_as_graph(d)
    assert data.edge_index.shape == (2, 4)


# ------------------------- native parser contract -------------------------

needs_native = pytest.mark.skipif(
    not is_available(), reason="native lib not built"
)


@needs_native
def test_native_rejects_quoted(tmp_path):
    p = _write(str(tmp_path), "q.csv", '"1","2.5"\n"3","4.5"\n')
    assert parse_numeric_csv(p) is None


@needs_native
def test_native_rejects_text(tmp_path):
    p = _write(str(tmp_path), "h.csv", "txId,feat\n1,2.5\n")
    assert parse_numeric_csv(p) is None


@needs_native
def test_native_rejects_nan_literal(tmp_path):
    p = _write(str(tmp_path), "n.csv", "1,NaN\n2,3.5\n")
    assert parse_numeric_csv(p) is None


@needs_native
def test_native_rejects_wide_ints(tmp_path):
    p = _write(str(tmp_path), "w.csv",
               "9007199254740993001,1.0\n9007199254740993002,2.0\n")
    assert parse_numeric_csv(p) is None


@needs_native
def test_native_parses_crlf_and_exponents(tmp_path):
    p = _write(str(tmp_path), "ok.csv",
               "10001,1,-1.5e-3,2.25\r\n10002,2,+4e2,-0.5\r\n")
    raw = parse_numeric_csv(p)
    assert raw is not None
    np.testing.assert_allclose(
        raw,
        [[10001, 1, -1.5e-3, 2.25], [10002, 2, 4e2, -0.5]],
        rtol=1e-12,
    )


@needs_native
def test_native_rejects_ragged(tmp_path):
    p = _write(str(tmp_path), "r.csv", "1,2,3\n4,5\n6,7,8\n")
    assert parse_numeric_csv(p) is None


def test_real_data_certification_tool(tmp_path):
    """tools/verify_real_data.py end-to-end on a reduced Elliptic-shaped
    mock: generates real-format CSVs (headerless features, classes header
    + 'unknown', edgelist header, intra-timestep edges), runs native +
    pandas ingest subprocesses, asserts counts / zero-cross-time /
    engine equality, writes the certification JSON. The same command
    certifies the real dataset the day real bytes replace the LFS stubs
    (reference dataset_elliptic.py:49-265; README.md:58 counts)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "cert.json")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "verify_real_data.py"),
         "--mock-dir", str(tmp_path / "mock"), "--mock-nodes", "4000",
         "--mock-edges", "5000", "--out", out],
        capture_output=True, text=True, cwd=repo, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    cert = json.load(open(out))
    assert cert["status"] == "certified"
    assert all(c["pass"] for c in cert["checks"].values())
    assert cert["checks"]["zero_cross_time_edges"]["violations"] == 0


def test_real_data_certification_detects_stubs(tmp_path):
    """LFS pointer stubs are reported as data-absent (exit 2), never
    certified."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = tmp_path / "raw"
    d.mkdir()
    for n in ("elliptic_txs_features.csv", "elliptic_txs_classes.csv",
              "elliptic_txs_edgelist.csv"):
        (d / n).write_text(
            "version https://git-lfs.github.com/spec/v1\noid sha256:ab\n"
        )
    out = str(tmp_path / "cert.json")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "verify_real_data.py"),
         "--data_dir", str(d), "--out", out],
        capture_output=True, text=True, cwd=repo, timeout=120,
    )
    assert r.returncode == 2, r.stdout + r.stderr
    cert = json.load(open(out))
    assert cert["status"] == "data_absent"
    assert set(cert["files"].values()) == {"lfs_stub"}
