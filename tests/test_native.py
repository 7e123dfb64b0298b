"""Native C++ runtime vs numpy-fallback equivalence (native/egnn_native.cpp
via elliptic_gnn_tpu/native.py)."""
import os

import numpy as np
import pytest

from elliptic_gnn_tpu import native


requires_native = pytest.mark.skipif(
    not native.is_available(), reason="native lib not built"
)


@requires_native
def test_map_ids_matches_numpy():
    rng = np.random.default_rng(0)
    ids = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    queries = np.concatenate([
        rng.choice(ids, 3000), rng.integers(10_000_001, 20_000_000, 500)
    ]).astype(np.int64)

    idx_c, found_c = native.map_ids(ids, queries)

    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    pos = np.clip(np.searchsorted(sorted_ids, queries), 0, ids.size - 1)
    found_p = sorted_ids[pos] == queries
    idx_p = order[pos]

    np.testing.assert_array_equal(found_c, found_p)
    np.testing.assert_array_equal(idx_c[found_c], idx_p[found_p])
    # mapped indices actually resolve to the queried ids
    assert (ids[idx_c[found_c]] == queries[found_c]).all()


@requires_native
def test_build_csr_matches_numpy():
    rng = np.random.default_rng(1)
    n, e = 500, 3000
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)

    indptr_c, col_c, order_c = native.build_csr(src, dst, n)

    order_p = np.argsort(dst, kind="stable")
    indptr_p = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=n), out=indptr_p[1:])

    np.testing.assert_array_equal(indptr_c, indptr_p)
    # same per-destination segments (order within a segment may differ only
    # if unstable; counting sort preserves edge order -> identical)
    np.testing.assert_array_equal(col_c, src[order_p])
    np.testing.assert_array_equal(order_c, order_p)


@requires_native
def test_csv_parse_matches_pandas(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(2)
    arr = np.concatenate([
        rng.integers(10_000_000, 99_999_999, (200, 1)).astype(np.float64),
        np.round(rng.standard_normal((200, 20)) * 10, 6),
    ], axis=1)
    path = str(tmp_path / "t.csv")
    np.savetxt(path, arr, delimiter=",", fmt=["%d"] + ["%.6f"] * 20)

    parsed = native.parse_numeric_csv(path)
    ref = pd.read_csv(path, header=None).to_numpy(np.float64)
    assert parsed.shape == ref.shape
    np.testing.assert_allclose(parsed, ref, rtol=1e-9, atol=1e-9)
    # txId column is bit-exact (f64 holds 8-digit ints exactly)
    np.testing.assert_array_equal(parsed[:, 0], ref[:, 0])


@requires_native
def test_bfs_rank_valid_permutation_groups_components():
    rng = np.random.default_rng(3)
    n = 300
    # two disjoint cliques + isolated nodes
    a = rng.integers(0, 100, 400)
    b = rng.integers(0, 100, 400)
    c = rng.integers(150, 250, 400)
    d = rng.integers(150, 250, 400)
    src = np.concatenate([a, c]).astype(np.int64)
    dst = np.concatenate([b, d]).astype(np.int64)

    rank = native.bfs_order(src, dst, n)
    assert sorted(rank.tolist()) == list(range(n))
    # both components map to contiguous rank ranges
    r1 = np.sort(rank[:100])
    r2 = np.sort(rank[150:250])
    assert (np.diff(r1) == 1).all()
    assert (np.diff(r2) == 1).all()


def test_python_fallback_when_disabled(monkeypatch):
    """EGNN_NATIVE=0 forces numpy fallbacks (fresh module state)."""
    import importlib

    from elliptic_gnn_tpu import native as nat

    monkeypatch.setenv("EGNN_NATIVE", "0")
    mod = importlib.reload(nat)
    assert not mod.is_available()
    ids = np.array([5, 1, 3], np.int64)
    idx, found = mod.map_ids(ids, np.array([3, 9], np.int64))
    assert list(found) == [True, False]
    assert ids[idx[0]] == 3
    importlib.reload(mod)  # restore
