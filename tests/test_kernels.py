"""Kernel unit tests: ELL aggregation and segment primitives vs dense
adjacency oracles (SURVEY.md §4: kernel tests vs dense reference)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elliptic_gnn_tpu.kernels import (
    build_ell_graph,
    ell_gat_aggregate,
    ell_spmm,
    segment_softmax,
    spmm_edge_list,
)
from elliptic_gnn_tpu.kernels.ell import gcn_norm_weights
from elliptic_gnn_tpu.graph.transform import add_self_loops


def _random_graph(n, e, seed=0, with_isolated=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    if with_isolated:
        # force some isolated nodes (zero in-degree)
        dst = np.where(dst == 0, 1, dst).astype(np.int32)
    return np.stack([src, dst])


def _dense_adj(edge_index, n, weights=None):
    a = np.zeros((n, n), dtype=np.float64)
    w = np.ones(edge_index.shape[1]) if weights is None else weights
    # multigraph-safe accumulation: A[dst, src] += w
    np.add.at(a, (edge_index[1], edge_index[0]), w)
    return a


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ell_spmm_sum_matches_dense(seed):
    n, e, f = 50, 200, 7
    ei = _random_graph(n, e, seed)
    rng = np.random.default_rng(seed + 10)
    w = rng.random(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)

    g = build_ell_graph(ei, n, edge_weights=w, mean=False)
    out = np.asarray(ell_spmm(g, jnp.asarray(x)))
    expect = _dense_adj(ei, n, w) @ x.astype(np.float64)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_ell_spmm_mean_matches_dense(seed):
    n, e, f = 40, 150, 5
    ei = _random_graph(n, e, seed)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, f)).astype(np.float32)

    g = build_ell_graph(ei, n, mean=True)
    out = np.asarray(ell_spmm(g, jnp.asarray(x)))

    a = _dense_adj(ei, n)
    deg = a.sum(axis=1)
    expect = a @ x.astype(np.float64) / np.maximum(deg, 1.0)[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
    # zero in-degree rows aggregate to exactly 0 (PyG SAGE convention)
    zero_rows = deg == 0
    if zero_rows.any():
        assert np.abs(out[zero_rows]).max() == 0.0


def test_ell_matches_edge_list_path():
    n, e, f = 64, 300, 8
    ei = _random_graph(n, e, 4)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    g = build_ell_graph(ei, n, mean=True)
    out_ell = ell_spmm(g, x)
    out_ref = spmm_edge_list(x, jnp.asarray(ei[0]), jnp.asarray(ei[1]), n, mean=True)
    np.testing.assert_allclose(np.asarray(out_ell), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


def test_gcn_norm_weights():
    n = 5
    ei = np.array([[0, 1, 2], [1, 2, 1]], np.int32)
    ei = add_self_loops(ei, n)
    w = gcn_norm_weights(ei, n)
    # degrees from dst incl. self-loops: node1: edges 0->1,2->1,loop = 3
    deg = np.bincount(ei[1], minlength=n)
    expect = (deg[ei[0]] ** -0.5) * (deg[ei[1]] ** -0.5)
    np.testing.assert_allclose(w, expect, rtol=1e-6)


def test_segment_softmax_matches_dense():
    rng = np.random.default_rng(7)
    e, n = 100, 10
    seg = np.sort(rng.integers(0, n, e)).astype(np.int32)
    scores = rng.standard_normal(e).astype(np.float32)
    out = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(seg), n))
    for s in range(n):
        m = seg == s
        if m.sum() == 0:
            continue
        ex = np.exp(scores[m] - scores[m].max())
        np.testing.assert_allclose(out[m], ex / ex.sum(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[m].sum(), 1.0, rtol=1e-5)


def test_ell_gat_aggregate_matches_dense():
    n, e, h, c = 30, 120, 4, 8
    ei = _random_graph(n, e, 9, with_isolated=False)
    ei = add_self_loops(ei, n)  # GAT convention: every node has >=1 in-edge
    rng = np.random.default_rng(9)
    xp = rng.standard_normal((n, h, c)).astype(np.float32)
    a_src = rng.standard_normal((n, h)).astype(np.float32)
    a_dst = rng.standard_normal((n, h)).astype(np.float32)

    g = build_ell_graph(ei, n, mean=False)
    out = np.asarray(ell_gat_aggregate(g, jnp.asarray(xp), jnp.asarray(a_src), jnp.asarray(a_dst)))

    # dense oracle
    expect = np.zeros((n, h, c))
    src, dst = ei[0], ei[1]
    for head in range(h):
        scores = a_src[src, head] + a_dst[dst, head]
        scores = np.where(scores > 0, scores, 0.2 * scores)  # LeakyReLU(0.2)
        for d in range(n):
            m = dst == d
            if m.sum() == 0:
                continue
            sc = scores[m]
            ex = np.exp(sc - sc.max())
            att = ex / ex.sum()
            expect[d, head] = (att[:, None] * xp[src[m], head]).sum(axis=0)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_ell_grad_flows():
    """SpMM must be differentiable wrt features (backward = SpMM with A^T)."""
    n, e, f = 20, 60, 4
    ei = _random_graph(n, e, 11)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    g = build_ell_graph(ei, n, mean=True)

    def loss(x):
        return (ell_spmm(g, x) ** 2).sum()

    grad = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(grad)).all()
    # numeric check on one coordinate
    eps = 1e-3
    x0 = np.asarray(x).copy()
    x1 = x0.copy()
    x1[3, 2] += eps
    num = (loss(jnp.asarray(x1)) - loss(jnp.asarray(x0))) / eps
    np.testing.assert_allclose(np.asarray(grad)[3, 2], num, rtol=2e-2, atol=2e-2)


def test_ell_handles_hub_degrees():
    """Power-of-two bucketing must cope with one massive hub row."""
    n = 200
    hub_edges = np.stack([np.arange(1, n, dtype=np.int32), np.zeros(n - 1, np.int32)])
    g = build_ell_graph(hub_edges, n, mean=True)
    x = jnp.asarray(np.ones((n, 3), np.float32))
    out = np.asarray(ell_spmm(g, x))
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-6)  # mean of ones
    assert np.abs(out[1:]).max() == 0.0


def test_renumber_for_ell_equivalence():
    """Aggregation on a renumbered graph equals the permutation of the
    original aggregation; inv_perm gather is skipped (None)."""
    from elliptic_gnn_tpu.kernels.ell import renumber_for_ell

    n, e, f = 80, 300, 6
    ei = _random_graph(n, e, 21)
    rng = np.random.default_rng(21)
    x = rng.standard_normal((n, f)).astype(np.float32)

    g = build_ell_graph(ei, n, mean=True)
    out_ref = np.asarray(ell_spmm(g, jnp.asarray(x)))

    g2, rank = renumber_for_ell(g)
    assert g2.inv_perm is None
    perm = np.argsort(rank)
    out2 = np.asarray(ell_spmm(g2, jnp.asarray(x[perm])))
    # out2[new_id] corresponds to out_ref[old_id = perm[new_id]]
    np.testing.assert_allclose(out2, out_ref[perm], rtol=1e-5, atol=1e-6)


def test_spmm_bf16_compute_dtype():
    n, e, f = 60, 200, 8
    ei = _random_graph(n, e, 31)
    rng = np.random.default_rng(31)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g = build_ell_graph(ei, n, mean=True)
    out32 = np.asarray(ell_spmm(g, jnp.asarray(x)))
    out16 = np.asarray(ell_spmm(g, jnp.asarray(x), compute_dtype=jnp.bfloat16))
    assert out16.dtype == np.float32  # accumulate + output stay f32
    np.testing.assert_allclose(out16, out32, rtol=2e-2, atol=2e-2)
