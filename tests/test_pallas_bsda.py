"""Pallas BSDA-SpMM kernel (scalar-prefetch chunk selection, revisited
output accumulation): interpret-mode numerics vs the XLA BSDA path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elliptic_gnn_tpu.kernels.bsda import (
    bfs_order,
    bsda_spmm,
    build_bsda,
    build_bsda_for_kind,
)
from elliptic_gnn_tpu.kernels.pallas_bsda import pallas_bsda_spmm
from tests.test_bsda import _graph


@pytest.mark.parametrize("mean", [False, True])
def test_pallas_bsda_matches_xla(mean):
    n, f = 900, 96  # f not a FEAT_TILE multiple -> exercises padding
    ei, block_ids = _graph(n, 4, 2.0, seed=23)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    g = build_bsda(ei_r, n, mean=mean, depth=2)
    out_p = np.asarray(pallas_bsda_spmm(g, x))
    out_x = np.asarray(bsda_spmm(g, x))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)


def test_pallas_bsda_with_spill_and_weights():
    n, f = 600, 128
    rng = np.random.default_rng(29)
    ei, block_ids = _graph(n, 3, 1.5, seed=29)
    far = np.stack([rng.integers(0, n, 80), rng.integers(0, n, 80)])
    ei = np.concatenate([ei, far], axis=1).astype(np.int64)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    w = rng.random(ei_r.shape[1]).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    g = build_bsda(ei_r, n, edge_weights=w, depth=2)
    assert g.residual is not None
    np.testing.assert_allclose(
        np.asarray(pallas_bsda_spmm(g, x)),
        np.asarray(bsda_spmm(g, x)),
        rtol=1e-4, atol=1e-5,
    )


def test_pallas_bsda_grad_via_transpose():
    n, f = 500, 32
    ei, block_ids = _graph(n, 3, 2.0, seed=31)
    rank = bfs_order(ei, n, block_ids)
    ei_r = rank[ei].astype(np.int64)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    g = build_bsda_for_kind(ei_r, n, "sage", transpose=True)
    _, vjp_p = jax.vjp(lambda x: pallas_bsda_spmm(g, x), x)
    _, vjp_x = jax.vjp(lambda x: bsda_spmm(g, x), x)
    np.testing.assert_allclose(
        np.asarray(vjp_p(ct)[0]), np.asarray(vjp_x(ct)[0]),
        rtol=1e-4, atol=1e-5,
    )


def test_factored_int8_matches_float_xla():
    """int8 factored encoding (multiplicities + scales) == float encoding,
    through both the XLA impl and the banded Pallas kernel."""
    import numpy as np
    import jax.numpy as jnp
    from elliptic_gnn_tpu.kernels.bsda import (
        bfs_order, build_bsda_for_kind, bsda_spmm,
    )
    from elliptic_gnn_tpu.kernels.pallas_bsda import pallas_bsda_spmm

    rng = np.random.default_rng(3)
    n = 2000
    src = rng.integers(0, n, 6000)
    dst = rng.integers(0, n, 6000)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    rank = bfs_order(ei, n, np.zeros(n, np.int64))
    ei = rank[ei]
    x = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
    for kind in ("sage", "gcn"):
        g_f = build_bsda_for_kind(ei, n, kind, depth=2)
        g_i = build_bsda_for_kind(ei, n, kind, depth=2, a_dtype="int8")
        y_f = np.asarray(bsda_spmm(g_f, x))
        y_i = np.asarray(bsda_spmm(g_i, x))
        np.testing.assert_allclose(y_i, y_f, rtol=2e-5, atol=2e-5)
        y_p = np.asarray(pallas_bsda_spmm(g_i, x))
        np.testing.assert_allclose(y_p, y_f, rtol=2e-5, atol=2e-5)
        # gradients through the transposed factored encoding
        import jax
        g_grad_f = jax.grad(lambda z: (bsda_spmm(g_f, z) ** 2).sum())(x)
        g_grad_p = jax.grad(lambda z: (pallas_bsda_spmm(g_i, z) ** 2).sum())(x)
        np.testing.assert_allclose(
            np.asarray(g_grad_p), np.asarray(g_grad_f), rtol=2e-4, atol=2e-4
        )


def test_ring_variant_matches_window(monkeypatch):
    """Force a graph large enough for the ring path and compare to XLA."""
    import numpy as np
    import jax.numpy as jnp
    from elliptic_gnn_tpu.kernels import pallas_bsda as PB
    from elliptic_gnn_tpu.kernels.bsda import (
        bfs_order, build_bsda_for_kind, bsda_spmm,
    )

    rng = np.random.default_rng(4)
    n = 128 * 60  # 60 chunks; G=2 -> nb=30 > RING
    src = rng.integers(0, n, 3 * n)
    dst = rng.integers(0, n, 3 * n)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    rank = bfs_order(ei, n, np.zeros(n, np.int64))
    ei = rank[ei]
    x = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
    g = build_bsda_for_kind(ei, n, "sage", depth=2, a_dtype="int8")
    monkeypatch.setattr(PB, "GROUP", max(2, g.max_chunk_dist))
    y_ref = np.asarray(bsda_spmm(g, x))
    y = np.asarray(PB.pallas_bsda_spmm(g, x))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,ch", [(4, 16), (4, 32)])
def test_flash_gat_matches_xla_dense(h, ch):
    """Flash GAT kernel (interpret mode) == the XLA dense-attention path.

    (4, 16) packs into one 128-lane row; (4, 32) needs 136 lanes and
    exercises the multi-register 256-lane payload (the configs/gat.yaml
    shape: hidden 32 x 4 heads)."""
    import numpy as np
    import jax.numpy as jnp
    from elliptic_gnn_tpu.kernels import pallas_gat as PG
    from elliptic_gnn_tpu.kernels.bsda import bfs_order, build_bsda_for_kind
    from elliptic_gnn_tpu.kernels.bsda_gat import bsda_gat_aggregate

    rng = np.random.default_rng(7)
    n = 128 * 60
    # block-structured graph so the banded kernel engages (a uniformly
    # random graph yields max_chunk_dist ~ B/2, which the wrapper declines;
    # the round-1 version of this test silently compared XLA to itself)
    ei, block_ids = _graph(n, 16, 3.0, seed=7)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei]
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    g = build_bsda_for_kind(ei, n, "gat", depth=2)
    xp = jnp.asarray(rng.standard_normal((n, h, ch)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    # guard against the wrapper silently declining (None -> XLA fallback),
    # which would make this test compare the XLA path to itself
    n_pad = g.num_chunks * g.chunk - n
    pad = lambda v, f=0.0: jnp.concatenate(  # noqa: E731
        [v, jnp.full((n_pad,) + v.shape[1:], f, v.dtype)], axis=0
    )
    assert PG.flash_gat_dense(
        g, pad(xp), pad(a_s, PG.NEG_INF), pad(a_d, PG.NEG_INF)
    ) is not None

    ref = np.asarray(bsda_gat_aggregate(g, xp, a_s, a_d, use_flash=False))
    out = np.asarray(bsda_gat_aggregate(g, xp, a_s, a_d, use_flash=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hidden,heads", [(32, 4), (128, 4)])
def test_packed_gat_forward_matches_unpacked(hidden, heads):
    """Fully-packed GAT stack (kernels/packed_gat.py) == the generic
    per-layer path (projection einsums + bsda_gat_aggregate), including
    spill merging, bias, and ELU. Covers both the one-row (hc+2h <= 128)
    and multi-register payload packings."""
    from elliptic_gnn_tpu.kernels.packed_gat import packed_gat_forward
    from elliptic_gnn_tpu.models.modules import (
        build_model, gat_layer_apply,
    )

    rng = np.random.default_rng(11)
    n = 128 * 60
    ei, block_ids = _graph(n, 16, 3.0, seed=11)
    # add spill edges so the residual-merge path is exercised
    far = np.stack([rng.integers(0, n, 60), rng.integers(0, n, 60)])
    ei = np.concatenate([ei, far], axis=1).astype(np.int64)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei]
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    g = build_bsda_for_kind(ei, n, "gat", depth=3)
    assert g.residual is not None

    model = build_model(
        "gat", 40, {"hidden_dim": hidden, "layers": 2, "heads": heads,
                    "dropout": 0.0},
    )
    params, _ = model.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.standard_normal((n, 40)), jnp.float32)

    out_packed = packed_gat_forward(params["layers"], x, g)
    assert out_packed is not None, "packed path declined (shape mismatch?)"

    h = x
    for p in params["layers"][:-1]:
        h = jax.nn.elu(gat_layer_apply(p, h, g, concat=True, training=True))
    ref = gat_layer_apply(params["layers"][-1], h, g, concat=False,
                          training=True)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(ref), rtol=3e-4, atol=3e-5
    )
