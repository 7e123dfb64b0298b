"""BSDA (block-sparse dense aggregation) tests: numerics vs dense oracle,
BFS clustering spill behavior, gradients, trainer integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elliptic_gnn_tpu.kernels.bsda import (
    bfs_order,
    build_bsda,
    build_bsda_for_kind,
    bsda_spmm,
)


def _graph(n, t_blocks, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    sizes = rng.multinomial(n - t_blocks, np.ones(t_blocks) / t_blocks) + 1
    block_ids = np.repeat(np.arange(t_blocks), sizes)
    starts = np.r_[0, np.cumsum(sizes)[:-1]]
    srcs, dsts = [], []
    for b in range(t_blocks):
        lo, sz = starts[b], sizes[b]
        m = int(avg_deg * sz)
        if sz >= 2 and m:
            srcs.append(rng.integers(lo, lo + sz, m))
            dsts.append(rng.integers(lo, lo + sz, m))
    ei = np.stack([np.concatenate(srcs), np.concatenate(dsts)]).astype(np.int64)
    return ei, block_ids


def _dense(ei, n, w=None):
    a = np.zeros((n, n))
    np.add.at(a, (ei[1], ei[0]), np.ones(ei.shape[1]) if w is None else w)
    return a


def test_bfs_order_is_permutation_and_groups_components():
    ei, block_ids = _graph(500, 4, 1.2, seed=2)
    rank = bfs_order(ei, 500, block_ids)
    assert sorted(rank.tolist()) == list(range(500))
    # neighbors should end up close in the new order (clustering quality)
    d = np.abs(rank[ei[0]].astype(int) - rank[ei[1]].astype(int))
    assert np.median(d) < 64


@pytest.mark.parametrize("mean", [False, True])
def test_bsda_matches_dense(mean):
    n, f = 700, 96
    ei, block_ids = _graph(n, 5, 1.5, seed=4)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((n, f)).astype(np.float32)

    g = build_bsda(ei_r, n, mean=mean, depth=2)
    out = np.asarray(bsda_spmm(g, jnp.asarray(x)))

    a = _dense(ei_r, n)
    expect = a @ x.astype(np.float64)
    if mean:
        deg = a.sum(axis=1)
        expect = expect / np.maximum(deg, 1.0)[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_bsda_weighted_and_spill():
    """Random (non-clustered) graph forces spill through the residual."""
    n, f = 600, 32
    rng = np.random.default_rng(8)
    ei = np.stack([rng.integers(0, n, 2000), rng.integers(0, n, 2000)]).astype(np.int64)
    w = rng.random(2000).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)

    g = build_bsda(ei, n, edge_weights=w, depth=2)
    assert g.residual is not None  # random graph must spill
    out = np.asarray(bsda_spmm(g, jnp.asarray(x)))
    expect = _dense(ei, n, w) @ x.astype(np.float64)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_bsda_grad_matches_ell():
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph, ell_spmm

    n, f = 400, 16
    ei, block_ids = _graph(n, 3, 2.0, seed=6)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    g = build_bsda(ei_r, n, mean=True, depth=2)
    g_e = build_ell_graph(ei_r, n, mean=True)
    _, vjp_b = jax.vjp(lambda x: bsda_spmm(g, x), x)
    _, vjp_e = jax.vjp(lambda x: ell_spmm(g_e, x), x)
    np.testing.assert_allclose(
        np.asarray(vjp_b(ct)[0]), np.asarray(vjp_e(ct)[0]), rtol=1e-4, atol=1e-4
    )


def test_bsda_gcn_kind_matches_ell_kind():
    from elliptic_gnn_tpu.models import prepare_graph_ops
    from elliptic_gnn_tpu.kernels.ell import ell_spmm

    n, f = 500, 24
    ei, block_ids = _graph(n, 4, 1.5, seed=7)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    g_b = build_bsda_for_kind(ei_r, n, "gcn")
    g_e = prepare_graph_ops(ei_r.astype(np.int32), n, "gcn")
    np.testing.assert_allclose(
        np.asarray(bsda_spmm(g_b, x)), np.asarray(ell_spmm(g_e, x)),
        rtol=1e-4, atol=1e-4,
    )


def test_trainer_bsda_end_to_end(tmp_path):
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 0, "t_train_end": 5, "t_val_end": 7, "t_max": 9,
        "synthetic": True, "synthetic_nodes": 1200,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    cfg = {
        "run_name": "bsda_t", "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 16, "layers": 2, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 8, "patience": 8,
        "aggregation": "bsda", "time_embed_dim": 2, "time_embed_type": "sin",
        "max_timestep": 9, "calibrate_temperature": False,
    }
    metrics = train_gnn.main(cfg)
    assert np.isfinite(metrics["pr_auc_illicit"])
    # node_idx artifacts must be translated back to on-disk ids (renumber)
    import os

    idx = np.load(os.path.join(str(tmp_path / "o"), "gnn", "bsda_t",
                               "node_idx_test.npy"))
    from elliptic_gnn_tpu.graph import load_processed

    d = load_processed(processed)
    expected = np.where(d.test_mask)[0]
    np.testing.assert_array_equal(np.sort(idx), expected)


def test_bsda_vs_ell_same_training_result(tmp_path):
    """Same seed + dropout 0: BSDA and ELL aggregation give (near-)identical
    metrics — the encoding is an implementation detail, not a model change."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p2")
    build_graph.main({
        "seed": 1, "t_train_end": 5, "t_val_end": 7, "t_max": 9,
        "synthetic": True, "synthetic_nodes": 900,
        "processed_dir": processed, "data_dir": str(tmp_path / "r2"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o2"), "arch": "sage",
        "hidden_dim": 16, "layers": 2, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 5, "patience": 5,
        "calibrate_temperature": False,
    }
    m1 = train_gnn.main(dict(base, run_name="agg_bsda", aggregation="bsda"))
    m2 = train_gnn.main(dict(base, run_name="agg_ell", aggregation="ell"))
    assert abs(m1["pr_auc_illicit"] - m2["pr_auc_illicit"]) < 1e-3
    assert abs(m1["best_val_pr_auc"] - m2["best_val_pr_auc"]) < 1e-3


def test_transpose_vjp_matches_autodiff():
    """Custom VJP through the transpose encoding == autodiff gradients."""
    from elliptic_gnn_tpu.kernels.bsda import build_bsda_for_kind

    n, f = 500, 16
    ei, block_ids = _graph(n, 4, 2.0, seed=11)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    g_t = build_bsda_for_kind(ei_r, n, "sage", transpose=True)
    g_a = build_bsda_for_kind(ei_r, n, "sage", transpose=False)
    assert g_t.transpose is not None and g_a.transpose is None

    out_t = np.asarray(bsda_spmm(g_t, x))
    out_a = np.asarray(bsda_spmm(g_a, x))
    np.testing.assert_allclose(out_t, out_a, rtol=1e-5, atol=1e-6)

    _, vjp_t = jax.vjp(lambda x: bsda_spmm(g_t, x), x)
    _, vjp_a = jax.vjp(lambda x: bsda_spmm(g_a, x), x)
    np.testing.assert_allclose(
        np.asarray(vjp_t(ct)[0]), np.asarray(vjp_a(ct)[0]), rtol=1e-4, atol=1e-5
    )


def test_bsda_gat_matches_ell_gat():
    """Dense chunk-pair attention == ELL masked-row-softmax attention,
    including spill edges and duplicate (parallel) edges."""
    from elliptic_gnn_tpu.graph.transform import add_self_loops
    from elliptic_gnn_tpu.kernels import gat_aggregate
    from elliptic_gnn_tpu.kernels.bsda import build_bsda_for_kind
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph

    n, h, c = 700, 4, 8
    ei, block_ids = _graph(n, 5, 2.0, seed=13)
    # force duplicates and some spill (random long-range edges)
    rng = np.random.default_rng(13)
    dup = ei[:, rng.integers(0, ei.shape[1], 50)]
    far = np.stack([rng.integers(0, n, 60), rng.integers(0, n, 60)])
    ei = np.concatenate([ei, dup, far], axis=1).astype(np.int64)

    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    xp = jnp.asarray(rng.standard_normal((n, h, c)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))

    g_b = build_bsda_for_kind(ei_r, n, "gat", depth=2)
    assert g_b.residual is not None  # far edges must spill
    ei_loops = add_self_loops(ei_r.astype(np.int32), n)
    g_e = build_ell_graph(ei_loops, n, mean=False)

    out_b = np.asarray(gat_aggregate(g_b, xp, a_s, a_d))
    out_e = np.asarray(gat_aggregate(g_e, xp, a_s, a_d))
    np.testing.assert_allclose(out_b, out_e, rtol=2e-4, atol=2e-5)


def test_bsda_gat_grad_matches_ell():
    from elliptic_gnn_tpu.graph.transform import add_self_loops
    from elliptic_gnn_tpu.kernels import gat_aggregate
    from elliptic_gnn_tpu.kernels.bsda import build_bsda_for_kind
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph

    n, h, c = 300, 2, 4
    ei, block_ids = _graph(n, 3, 1.5, seed=17)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(17)
    xp = jnp.asarray(rng.standard_normal((n, h, c)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))

    g_b = build_bsda_for_kind(ei_r, n, "gat", depth=2)
    g_e = build_ell_graph(add_self_loops(ei_r.astype(np.int32), n), n)

    def loss_b(xp, a_s, a_d):
        return (gat_aggregate(g_b, xp, a_s, a_d) ** 2).sum()

    def loss_e(xp, a_s, a_d):
        return (gat_aggregate(g_e, xp, a_s, a_d) ** 2).sum()

    gb = jax.grad(loss_b, argnums=(0, 1, 2))(xp, a_s, a_d)
    ge = jax.grad(loss_e, argnums=(0, 1, 2))(xp, a_s, a_d)
    for a, b in zip(gb, ge):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )


def test_trainer_gat_bsda_end_to_end(tmp_path):
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "pg")
    build_graph.main({
        "seed": 2, "t_train_end": 5, "t_val_end": 7, "t_max": 9,
        "synthetic": True, "synthetic_nodes": 900,
        "processed_dir": processed, "data_dir": str(tmp_path / "rg"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "og"), "arch": "gat",
        "hidden_dim": 16, "layers": 2, "heads": 4, "dropout": 0.0,
        "lr": 0.01, "weight_decay": 0.0, "max_epochs": 4, "patience": 4,
        "calibrate_temperature": False,
    }
    m_b = train_gnn.main(dict(base, run_name="gat_bsda", aggregation="bsda"))
    m_e = train_gnn.main(dict(base, run_name="gat_ell", aggregation="ell"))
    assert abs(m_b["pr_auc_illicit"] - m_e["pr_auc_illicit"]) < 2e-3


def test_bfs_order_honors_interleaved_blocks():
    """Nodes NOT pre-sorted by block must still get block-contiguous chunks
    (ADVICE round 1: block_ids was previously ignored)."""
    rng = np.random.default_rng(0)
    n = 400
    block = rng.integers(0, 4, size=n).astype(np.int64)  # interleaved
    # random intra-block edges
    srcs, dsts = [], []
    for b in range(4):
        ids = np.where(block == b)[0]
        e = rng.integers(0, ids.size, size=(2, 150))
        srcs.append(ids[e[0]])
        dsts.append(ids[e[1]])
    ei = np.stack([np.concatenate(srcs), np.concatenate(dsts)])
    rank = bfs_order(ei, n, block)
    assert sorted(rank.tolist()) == list(range(n))
    # new order must visit blocks contiguously: block of each new position
    block_by_new = np.empty(n, np.int64)
    block_by_new[rank] = block
    changes = int((np.diff(block_by_new) != 0).sum())
    assert changes == 3, f"blocks interleaved after BFS ({changes} switches)"


def test_slot_occ_cover_matches_tables():
    """slot_occ (the occupancy cover driving the gated GAT backward sweep)
    must equal 1 + the last nonzero slot of the dense tables, for both the
    forward and the exact block-transpose encodings."""
    ei, blocks = _graph(900, 3, 2.5, seed=5)
    rank = bfs_order(ei, 900, blocks)
    ei_r = np.stack([rank[ei[0]], rank[ei[1]]])
    g = build_bsda_for_kind(ei_r, 900, "gat", depth=3, a_dtype="int8",
                            transpose=True)
    for gg in (g, g.transpose):
        a = np.asarray(gg.a)
        nz = a.reshape(a.shape[0], a.shape[1], -1).any(axis=-1)
        cover = np.max(
            np.where(nz, np.arange(1, a.shape[1] + 1)[None, :], 0), axis=1
        )
        assert gg.slot_occ is not None
        np.testing.assert_array_equal(np.asarray(gg.slot_occ), cover)
    # gating skips only zero blocks: every slot >= occ must be all-zero
    aT = np.asarray(g.transpose.a)
    occ = np.asarray(g.transpose.slot_occ)
    for j in range(aT.shape[0]):
        assert not aT[j, occ[j]:].any()
