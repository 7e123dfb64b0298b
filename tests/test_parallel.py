"""Multi-chip sharding tests on the 8-virtual-device CPU mesh:
1-device vs 8-device sharded steps must agree numerically (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
from elliptic_gnn_tpu.graph.transform import symmetrize_edges
from elliptic_gnn_tpu.models import build_model, prepare_graph_ops
from elliptic_gnn_tpu.models.losses import class_weights, make_loss_fn
from elliptic_gnn_tpu.parallel import make_mesh, shard_graph_inputs
from elliptic_gnn_tpu.parallel.mesh import replicated
from elliptic_gnn_tpu.train.train_gnn import make_optimizer

CFG = {
    "arch": "sage_resbn",
    "hidden_dim": 32,
    "layers": 3,
    "dropout": 0.0,  # deterministic for the equivalence check
    "lr": 1e-3,
    "weight_decay": 1e-4,
    "grad_clip": 1.0,
    "time_embed_dim": 2,
    "time_embed_type": "sin",
    "max_timestep": 12,
}


def _setup(num_nodes=600):
    data = synthetic.generate(num_nodes=num_nodes, num_timesteps=12, seed=1)
    data = make_temporal_masks(data, t_train_end=8, t_val_end=10)
    data = symmetrize_edges(data)
    gops = prepare_graph_ops(data.edge_index, data.num_nodes, "sage")
    model = build_model("sage_resbn", data.num_features, CFG)
    params, state = model.init(jax.random.key(0))
    cw = class_weights(data.y[data.train_mask])
    t_tr = data.timestep[data.train_mask]
    loss_fn = make_loss_fn(CFG, cw, int(t_tr.min()), int(t_tr.max()))
    tx = make_optimizer(CFG)
    return data, gops, model, params, state, loss_fn, tx


def _step_fn(model, tx, loss_fn, x, y, ts, tmask, gops, row_mask=None):
    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            logits, new_state = model.apply(
                p, state, x, gops, ts, training=True, rng=None,
                row_mask=row_mask,
            )
            return loss_fn(p, logits, y, None, tmask), new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, loss

    return step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    data, gops, model, params, state, loss_fn, tx = _setup()
    opt_state = tx.init(params)

    # single-device reference
    x1 = jnp.asarray(data.x)
    y1 = jnp.asarray(np.maximum(data.y, 0).astype(np.int32))
    ts1 = jnp.asarray(data.timestep.astype(np.int32))
    tm1 = jnp.asarray(data.train_mask.astype(np.float32))
    step1 = _step_fn(model, tx, loss_fn, x1, y1, ts1, tm1, gops)
    p1, s1, loss1 = step1(params, state, opt_state)

    # 8-device sharded
    mesh = make_mesh(8)
    x8, y8, ts8, tm8, rm8, gops8, n_pad = shard_graph_inputs(mesh, data, gops)
    rep = replicated(mesh)
    params8 = jax.device_put(params, rep)
    state8 = jax.device_put(state, rep)
    opt8 = jax.device_put(tx.init(params), rep)
    step8 = _step_fn(model, tx, loss_fn, x8, y8, ts8, tm8, gops8, rm8)
    p8, s8, loss8 = step8(params8, state8, opt8)

    assert np.isclose(float(loss1), float(loss8), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    # BatchNorm running stats (psum'd batch statistics) must also agree
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_eval_matches_single_device():
    data, gops, model, params, state, loss_fn, tx = _setup()
    x1 = jnp.asarray(data.x)
    ts1 = jnp.asarray(data.timestep.astype(np.int32))
    logits1, _ = jax.jit(
        lambda p, s: model.apply(p, s, x1, gops, ts1, training=False)
    )(params, state)

    mesh = make_mesh(8)
    x8, y8, ts8, tm8, rm8, gops8, n_pad = shard_graph_inputs(mesh, data, gops)
    rep = replicated(mesh)
    logits8, _ = jax.jit(
        lambda p, s: model.apply(p, s, x8, gops8, ts8, training=False)
    )(jax.device_put(params, rep), jax.device_put(state, rep))

    n = data.num_nodes
    np.testing.assert_allclose(
        np.asarray(logits1), np.asarray(logits8)[:n], rtol=2e-4, atol=2e-5
    )


def test_dryrun_multichip_smoke():
    import __graft_entry__ as ge

    n = min(len(jax.devices()), 8)
    ge.dryrun_multichip(n)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("arch", ["sage_resbn", "gcn", "gat"])
def test_sharded_bsda_step_matches_single_device(arch):
    """BSDA aggregation under GSPMD row sharding == single-device result,
    for every architecture family (the reference trains GCN/GAT wherever
    SAGE runs, /root/reference/src/models/gnn.py:25,56-76 — the mesh must
    too; GAT exercises the dense-chunk attention path under GSPMD)."""
    from elliptic_gnn_tpu.train.train_gnn import build_train_state

    cfg = dict(CFG, aggregation="bsda", arch=arch)
    if arch == "gat":
        cfg.update(heads=4, hidden_dim=16, layers=2,
                   time_embed_dim=0, time_embed_type="none")
    elif arch == "gcn":
        cfg.update(time_embed_dim=0, time_embed_type="none")
    data0 = synthetic.generate(num_nodes=600, num_timesteps=12, seed=1)
    from elliptic_gnn_tpu.graph import make_temporal_masks

    data0 = make_temporal_masks(data0, t_train_end=8, t_val_end=10)
    data0 = symmetrize_edges(data0)
    data, model, gops, params, state, tx, opt_state, loss_fn = build_train_state(
        cfg, data0, 0
    )

    x1 = jnp.asarray(data.x)
    y1 = jnp.asarray(np.maximum(data.y, 0).astype(np.int32))
    ts1 = jnp.asarray(data.timestep.astype(np.int32))
    tm1 = jnp.asarray(data.train_mask.astype(np.float32))
    t1 = ts1 if model.uses_time_embed else None
    step1 = _step_fn(model, tx, loss_fn, x1, y1, t1, tm1, gops)
    p1, s1, loss1 = step1(params, state, opt_state)

    mesh = make_mesh(8)
    x8, y8, ts8, tm8, rm8, gops8, _ = shard_graph_inputs(mesh, data, gops)
    rep = replicated(mesh)
    t8 = ts8 if model.uses_time_embed else None
    step8 = _step_fn(model, tx, loss_fn, x8, y8, t8, tm8, gops8, rm8)
    p8, s8, loss8 = step8(
        jax.device_put(params, rep), jax.device_put(state, rep),
        jax.device_put(tx.init(params), rep),
    )
    assert np.isclose(float(loss1), float(loss8), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        # Adam amplifies float reduction-order noise for near-zero-variance
        # params; bound by a fraction of one optimizer step (lr=1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=3e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_gat_shardmap_matches_single_device(tmp_path):
    """arch: gat + aggregation: shard_map trains end-to-end on the
    explicit halo path (round 4: sharded_gat_attend — halo exchange of the
    [x_proj | a_src] payload + per-shard chunk-pair attention + bucketed
    spill softmax merge) and matches the single-device run. Closes the
    round-3 config-error triage: the halo path is model-family agnostic
    (SURVEY §2.3)."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 4, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 1500,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "gat",
        "hidden_dim": 16, "heads": 4, "layers": 2, "dropout": 0.0,
        "lr": 0.01, "weight_decay": 0.0, "max_epochs": 5, "patience": 5,
        "symmetrize_edges": True, "calibrate_temperature": False,
    }
    m1 = train_gnn.main(dict(base, run_name="gat1"))
    m8 = train_gnn.main(dict(
        base, run_name="gat8", mesh_devices=8, aggregation="shard_map"))
    assert abs(m1["pr_auc_illicit"] - m8["pr_auc_illicit"]) < 2e-3
    assert abs(m1["best_val_pr_auc"] - m8["best_val_pr_auc"]) < 2e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_mesh_devices_config(tmp_path):
    """mesh_devices: N in the config trains sharded end-to-end through the
    normal CLI path and matches the single-device run (dropout 0)."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 4, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 1500,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 16, "layers": 3, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 6, "patience": 6,
        "time_embed_dim": 2, "time_embed_type": "sin", "max_timestep": 10,
        "symmetrize_edges": True, "calibrate_temperature": False,
    }
    m1 = train_gnn.main(dict(base, run_name="mesh1"))
    m8 = train_gnn.main(dict(base, run_name="mesh8", mesh_devices=8))
    assert abs(m1["pr_auc_illicit"] - m8["pr_auc_illicit"]) < 2e-3
    assert abs(m1["best_val_pr_auc"] - m8["best_val_pr_auc"]) < 2e-3


def test_trainer_shardmap_config(tmp_path):
    """aggregation: shard_map + mesh_devices: N trains end-to-end through
    the normal CLI path with boundary-only halo exchange and matches the
    single-device run (dropout 0)."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 4, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 1500,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 16, "layers": 3, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 6, "patience": 6,
        "time_embed_dim": 2, "time_embed_type": "sin", "max_timestep": 10,
        "symmetrize_edges": True, "calibrate_temperature": False,
    }
    m1 = train_gnn.main(dict(base, run_name="sm1"))
    m8 = train_gnn.main(dict(
        base, run_name="sm8", mesh_devices=8, aggregation="shard_map"))
    assert abs(m1["pr_auc_illicit"] - m8["pr_auc_illicit"]) < 2e-3
    assert abs(m1["best_val_pr_auc"] - m8["best_val_pr_auc"]) < 2e-3


def test_shardmap_full_loss_surface_matches_single_device(tmp_path):
    """The explicit shard_map path composes with EVERY reference loss —
    focal + linear time weighting + learned-time-embedding L2 at once
    (reference train_gnn.py:136-183 composes any loss with any training
    mode) — and matches the single-device run. The per-sample loss vector
    and the replicated parameter penalty are shared with the single-device
    factory (losses.make_loss_parts); the shard_map step psums the masked
    numerator/denominator."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 4, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 1500,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 16, "layers": 2, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 5, "patience": 5,
        "time_embed_dim": 4, "time_embed_type": "learned",
        "max_timestep": 10, "symmetrize_edges": True,
        "calibrate_temperature": False,
        "focal_loss": True, "focal_gamma": 2.0,
        "time_loss_weighting": "linear", "time_embed_l2": 1e-3,
    }
    m1 = train_gnn.main(dict(base, run_name="smf1"))
    m8 = train_gnn.main(dict(
        base, run_name="smf8", mesh_devices=8, aggregation="shard_map"))
    assert abs(m1["pr_auc_illicit"] - m8["pr_auc_illicit"]) < 2e-3
    assert abs(m1["best_val_pr_auc"] - m8["best_val_pr_auc"]) < 2e-3


def test_aggregation_auto_resolves_to_shardmap_on_meshes():
    """`aggregation: auto` + `mesh_devices > 1` selects the explicit
    shard_map halo path for every BSDA-capable model family (VERDICT r4
    #3: the certified fast path is the multi-device default); mesh=1 keeps
    the single-device resolution; pinned values are honored."""
    from elliptic_gnn_tpu.train.train_gnn import _pick_aggregation

    for kind in ("sage", "gcn", "gat"):
        assert _pick_aggregation({"mesh_devices": 8}, None, kind) == "shard_map"
        assert _pick_aggregation({"mesh_devices": "all"}, None, kind) == (
            "shard_map" if len(jax.devices()) > 1 else
            _pick_aggregation({}, None, kind)
        )
    # mesh=1: unchanged single-device resolution (bsda off-TPU)
    assert _pick_aggregation({}, None, "sage") in ("bsda", "bsda_pallas")
    # pinned values are never overridden
    assert _pick_aggregation(
        {"mesh_devices": 8, "aggregation": "bsda"}, None, "sage") == "bsda"
    assert _pick_aggregation(
        {"mesh_devices": 8, "aggregation": "ell"}, None, "sage") == "ell"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_auto_mesh_falls_back_to_gspmd_when_not_banded(tmp_path, monkeypatch,
                                                       capsys):
    """When partition_bsda rejects the graph (non-banded), `aggregation:
    auto` falls back to the GSPMD einsum path and still matches the
    single-device run; an explicit `aggregation: shard_map` surfaces the
    error instead of silently degrading."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.parallel import shardmap_step
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 4, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 1500,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 16, "layers": 3, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 5, "patience": 5,
        "time_embed_dim": 2, "time_embed_type": "sin", "max_timestep": 10,
        "symmetrize_edges": True, "calibrate_temperature": False,
    }
    m1 = train_gnn.main(dict(base, run_name="fb1"))

    def reject(*a, **k):
        raise ValueError("synthetic non-banded rejection (test)")

    monkeypatch.setattr(shardmap_step, "partition_bsda", reject)
    m8 = train_gnn.main(dict(base, run_name="fb8", mesh_devices=8))
    out = capsys.readouterr().out
    assert "falling back to GSPMD einsum" in out
    assert abs(m1["pr_auc_illicit"] - m8["pr_auc_illicit"]) < 2e-3
    assert abs(m1["best_val_pr_auc"] - m8["best_val_pr_auc"]) < 2e-3

    with pytest.raises(ValueError, match="non-banded rejection"):
        train_gnn.main(dict(base, run_name="fb8x", mesh_devices=8,
                            aggregation="shard_map"))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_epochs_per_sync_scan_composes_with_shardmap(tmp_path):
    """The K-epoch device-side scan wraps the explicit shard_map step
    (VERDICT r4 #4: the scan x shard_map composition was untested):
    `epochs_per_sync: 4` + `aggregation: shard_map` on the 8-device mesh
    must reproduce the serial shard_map run's metrics exactly (the scan
    makes identical per-epoch decisions; tests/test_train.py proves the
    single-device analogue)."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 4, "t_train_end": 6, "t_val_end": 8, "t_max": 10,
        "synthetic": True, "synthetic_nodes": 1500,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    base = {
        "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage_resbn",
        "hidden_dim": 16, "layers": 3, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 6, "patience": 3,
        "time_embed_dim": 2, "time_embed_type": "sin", "max_timestep": 10,
        "symmetrize_edges": True, "calibrate_temperature": False,
        "mesh_devices": 8, "aggregation": "shard_map",
    }
    m_serial = train_gnn.main(dict(base, run_name="sms", epochs_per_sync=1))
    m_scan = train_gnn.main(dict(base, run_name="smk", epochs_per_sync=4))
    assert np.isclose(m_serial["pr_auc_illicit"], m_scan["pr_auc_illicit"],
                      rtol=1e-6, atol=1e-7)
    assert np.isclose(m_serial["best_val_pr_auc"], m_scan["best_val_pr_auc"],
                      rtol=1e-6, atol=1e-7)
