"""Pallas block-ELL SpMM kernel tests (interpret mode on CPU): numerics vs
dense oracle, overflow spill, transpose-VJP gradients, model integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elliptic_gnn_tpu.kernels.pallas_spmm import (
    build_block_ell,
    build_pallas_spmm_graph,
    pallas_spmm_apply,
)


def _block_graph(n, t_blocks, avg_deg, seed=0, hub=False):
    """Random intra-block graph over contiguous equal-ish blocks."""
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
    if hub:
        # one high-degree destination inside block 0 (exceeds slot width)
        hub_dst = starts[0]
        k = min(40, sizes[0])
        srcs.append(np.arange(starts[0], starts[0] + k))
        dsts.append(np.full(k, hub_dst))
    ei = np.stack([np.concatenate(srcs), np.concatenate(dsts)]).astype(np.int64)
    return ei, block_ids


def _dense(ei, n, w=None):
    a = np.zeros((n, n))
    np.add.at(a, (ei[1], ei[0]), np.ones(ei.shape[1]) if w is None else w)
    return a


@pytest.mark.parametrize("mean", [False, True])
@pytest.mark.parametrize("hub", [False, True])
def test_block_ell_spmm_matches_dense(mean, hub):
    n, f = 300, 130  # f deliberately not a 128 multiple
    ei, block_ids = _block_graph(n, 5, 1.5, seed=3, hub=hub)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, f)).astype(np.float32)

    pg = build_pallas_spmm_graph(ei, n, block_ids, mean=mean, width=8)
    if hub:
        assert pg.fwd.overflow is not None  # hub spilled
    out = np.asarray(pallas_spmm_apply(pg, jnp.asarray(x)))

    a = _dense(ei, n)
    expect = a @ x.astype(np.float64)
    if mean:
        deg = a.sum(axis=1)
        expect = expect / np.maximum(deg, 1.0)[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_block_ell_with_weights():
    n, f = 200, 64
    ei, block_ids = _block_graph(n, 4, 2.0, seed=9)
    rng = np.random.default_rng(9)
    w = rng.random(ei.shape[1]).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)

    pg = build_pallas_spmm_graph(ei, n, block_ids, edge_weights=w, width=4)
    out = np.asarray(pallas_spmm_apply(pg, jnp.asarray(x)))
    expect = _dense(ei, n, w) @ x.astype(np.float64)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_block_ell_grad_matches_xla_path():
    """VJP through the transpose kernel == autodiff through the XLA ELL."""
    from elliptic_gnn_tpu.kernels.ell import build_ell_graph, ell_spmm

    n, f = 150, 32
    ei, block_ids = _block_graph(n, 3, 1.5, seed=5, hub=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    pg = build_pallas_spmm_graph(ei, n, block_ids, mean=True, width=8)
    g_ell = build_ell_graph(ei, n, mean=True)

    _, vjp_p = jax.vjp(lambda x: pallas_spmm_apply(pg, x), x)
    _, vjp_e = jax.vjp(lambda x: ell_spmm(g_ell, x), x)
    np.testing.assert_allclose(
        np.asarray(vjp_p(ct)[0]), np.asarray(vjp_e(ct)[0]), rtol=1e-4, atol=1e-4
    )


def test_trainer_uses_pallas_when_forced(tmp_path):
    """use_pallas: true forces the Pallas encoding (interpret mode on CPU)
    through a short end-to-end training run."""
    from elliptic_gnn_tpu.graph import build_graph
    from elliptic_gnn_tpu.train import train_gnn

    processed = str(tmp_path / "p")
    build_graph.main({
        "seed": 0, "t_train_end": 5, "t_val_end": 7, "t_max": 9,
        "synthetic": True, "synthetic_nodes": 600,
        "processed_dir": processed, "data_dir": str(tmp_path / "r"),
    })
    cfg = {
        "run_name": "pallas_t", "seed": 0, "processed_dir": processed,
        "output_root": str(tmp_path / "o"), "arch": "sage",
        "hidden_dim": 16, "layers": 2, "dropout": 0.0, "lr": 0.01,
        "weight_decay": 0.0, "max_epochs": 2, "patience": 2,
        "use_pallas": True, "calibrate_temperature": False,
    }
    metrics = train_gnn.main(cfg)
    assert np.isfinite(metrics["pr_auc_illicit"])
