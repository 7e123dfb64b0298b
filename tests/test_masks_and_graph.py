"""Temporal masks + graph build/ingest tests, including the reference's own
toy case (reference tests/test_masks_and_metrics.py:8-18)."""
import numpy as np

from elliptic_gnn_tpu.graph import GraphData, make_temporal_masks
from elliptic_gnn_tpu.graph import synthetic
from elliptic_gnn_tpu.graph.transform import (
    add_self_loops,
    drop_edges,
    remove_hub_edges,
    symmetrize_edges,
    append_scalar_time,
)


def _toy():
    return GraphData(
        x=np.zeros((5, 3), np.float32),
        y=np.array([1, 0, -1, 1, 0], np.int32),
        timestep=np.array([1, 1, 2, 3, 4], np.int32),
        edge_index=np.array([[0, 1, 3], [1, 0, 4]], np.int32),
    )


def test_temporal_masks_reference_toy():
    d = make_temporal_masks(_toy(), t_train_end=1, t_val_end=3)
    np.testing.assert_array_equal(d.train_mask, [True, True, False, False, False])
    np.testing.assert_array_equal(d.val_mask, [False, False, False, True, False])
    np.testing.assert_array_equal(d.test_mask, [False, False, False, False, True])


def test_temporal_masks_window():
    d = GraphData(
        x=np.zeros((6, 2), np.float32),
        y=np.array([0, 1, 0, 1, 0, 1], np.int32),
        timestep=np.array([1, 2, 3, 4, 5, 6], np.int32),
        edge_index=np.zeros((2, 0), np.int32),
    )
    d = make_temporal_masks(d, t_train_end=4, t_val_end=5, train_window_k=2)
    np.testing.assert_array_equal(d.train_mask, [False, False, True, True, False, False])
    np.testing.assert_array_equal(d.val_mask, [False, False, False, False, True, False])
    np.testing.assert_array_equal(d.test_mask, [False, False, False, False, False, True])


def test_synthetic_graph_invariants():
    d = synthetic.generate(num_nodes=2000, num_timesteps=10, seed=3)
    d.validate()
    assert d.num_nodes == 2000
    assert set(np.unique(d.y)).issubset({-1, 0, 1})
    # dataset guarantee: all edges intra-timestep (dataset_elliptic.py:236-243)
    ts = d.timestep
    assert (ts[d.edge_index[0]] == ts[d.edge_index[1]]).all()
    # nodes ordered by timestep (gives block-diagonal adjacency)
    assert (np.diff(ts) >= 0).all()
    assert (d.y == 1).sum() > 10


def test_ingest_roundtrip_via_csvs(tmp_path):
    d = synthetic.generate(num_nodes=300, num_timesteps=8, seed=5)
    synthetic.write_raw_csvs(d, str(tmp_path), seed=7)
    from elliptic_gnn_tpu.graph.ingest import load_elliptic_as_graph

    d2, meta = load_elliptic_as_graph(str(tmp_path))
    assert d2.num_nodes == d.num_nodes
    np.testing.assert_array_equal(d2.y, d.y)
    np.testing.assert_array_equal(d2.timestep, d.timestep)
    np.testing.assert_allclose(d2.x, d.x, rtol=1e-4, atol=1e-4)
    assert d2.num_edges == d.num_edges
    np.testing.assert_array_equal(
        np.sort(d2.edge_index, axis=1), np.sort(d.edge_index, axis=1)
    )


def test_transforms():
    d = _toy()
    sym = symmetrize_edges(d)
    assert sym.num_edges == 2 * d.num_edges
    np.testing.assert_array_equal(sym.edge_index[:, 3:], d.edge_index[::-1])

    with_t = append_scalar_time(d)
    assert with_t.num_features == d.num_features + 1
    np.testing.assert_allclose(with_t.x[:, -1], d.timestep / d.timestep.max())

    ei = add_self_loops(d.edge_index, d.num_nodes)
    assert ei.shape[1] == d.num_edges + d.num_nodes

    dropped = drop_edges(d.edge_index, 0.34, seed=0)
    assert dropped.shape[1] == 2

    abl, n_hubs = remove_hub_edges(d.edge_index, d.num_nodes, 0.2)
    assert n_hubs == 1
    # node 0 or 1 is the hub (deg 2 each); all their edges removed
    assert abl.shape[1] <= 1


def test_build_graph_cli_synthetic(tmp_path):
    import yaml

    from elliptic_gnn_tpu.graph import build_graph, load_processed

    cfg = {
        "seed": 1,
        "t_train_end": 6,
        "t_val_end": 8,
        "t_max": 10,
        "synthetic": True,
        "synthetic_nodes": 500,
        "processed_dir": str(tmp_path / "processed"),
        "data_dir": str(tmp_path / "raw"),
    }
    build_graph.main(cfg)
    d = load_processed(str(tmp_path / "processed"))
    d.validate()
    assert d.train_mask is not None and d.train_mask.sum() > 0
    assert d.val_mask.sum() > 0 and d.test_mask.sum() > 0
    # leakage-safety: no overlap between splits
    assert not (d.train_mask & d.val_mask).any()
    assert not (d.val_mask & d.test_mask).any()
    assert not (d.train_mask & d.test_mask).any()


def test_ingest_classes_timestep_column(tmp_path):
    """classes.csv carrying a time_step column is the preferred timestep
    source (dataset_elliptic.py:80-106 semantics: CLASSES wins)."""
    import numpy as np

    from elliptic_gnn_tpu.graph import synthetic
    from elliptic_gnn_tpu.graph.ingest import load_elliptic_as_graph

    d = synthetic.generate(num_nodes=200, num_timesteps=6, seed=9)
    synthetic.write_raw_csvs(d, str(tmp_path), seed=11)

    # rewrite classes.csv with a time_step column for EVERY node
    feats = np.loadtxt(
        tmp_path / "elliptic_txs_features.csv", delimiter=",", usecols=(0, 1)
    )
    tx_ids = feats[:, 0].astype(np.int64)
    lines = ["txId,time_step,class"]
    for tx, ts, y in zip(tx_ids, d.timestep, d.y):
        cls = "unknown" if y == -1 else ("1" if y == 1 else "2")
        lines.append(f"{tx},{ts},{cls}")
    (tmp_path / "elliptic_txs_classes.csv").write_text("\n".join(lines) + "\n")

    d2, meta = load_elliptic_as_graph(str(tmp_path))
    assert meta["timestep_source"] == "CLASSES"
    np.testing.assert_array_equal(d2.timestep, d.timestep)
    np.testing.assert_array_equal(d2.y, d.y)
    assert d2.num_edges == d.num_edges
