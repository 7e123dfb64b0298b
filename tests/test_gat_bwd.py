"""Fused GAT VJP (kernels/gat_bwd.py) == autodiff through the XLA path.

The manual closed-form backward must reproduce jax.grad of the
differentiable attention forward — including residual spill edges,
duplicate edges (multiplicity > 1), and the LeakyReLU kink handling —
for every input (x_proj, alpha_src, alpha_dst)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elliptic_gnn_tpu.kernels.bsda import bfs_order, build_bsda_for_kind
from elliptic_gnn_tpu.kernels.bsda_gat import bsda_gat_aggregate
from tests.test_bsda import _graph


@pytest.mark.parametrize("h,ch", [(4, 8), (2, 16)])
def test_fused_vjp_matches_autodiff(h, ch):
    rng = np.random.default_rng(5)
    n = 128 * 12
    ei, block_ids = _graph(n, 6, 2.5, seed=5)
    far = np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])
    dup = ei[:, rng.integers(0, ei.shape[1], 40)]  # duplicate edges
    ei = np.concatenate([ei, far, dup], axis=1).astype(np.int64)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei]
    g = build_bsda_for_kind(ei, n, "gat", depth=2)
    assert g.residual is not None

    xp = jnp.asarray(rng.standard_normal((n, h, ch)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    # a fixed cotangent-shaping weight so the loss exercises all outputs
    wout = jnp.asarray(rng.standard_normal((n, h, ch)), jnp.float32)

    def loss(fused):
        def f(xp, a_s, a_d):
            y = bsda_gat_aggregate(g, xp, a_s, a_d, fused_vjp=fused)
            return jnp.sum(y * wout) + jnp.sum(jnp.sin(y) * 0.1)
        return f

    g_auto = jax.grad(loss(False), argnums=(0, 1, 2))(xp, a_s, a_d)
    g_fused = jax.grad(loss(True), argnums=(0, 1, 2))(xp, a_s, a_d)
    for ga, gf, name in zip(g_auto, g_fused, ("dxp", "dasrc", "dadst")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(ga), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_fused_vjp_value_unchanged():
    """fused_vjp must not change the forward value."""
    rng = np.random.default_rng(9)
    n = 128 * 8
    ei, block_ids = _graph(n, 4, 2.0, seed=9)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei].astype(np.int64)
    g = build_bsda_for_kind(ei, n, "gat", depth=2)
    xp = jnp.asarray(rng.standard_normal((n, 4, 8)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    y0 = bsda_gat_aggregate(g, xp, a_s, a_d, fused_vjp=False)
    y1 = bsda_gat_aggregate(g, xp, a_s, a_d, fused_vjp=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("hidden,heads", [(32, 4)])
def test_packed_train_forward_grads_match_autodiff(hidden, heads):
    """The packed custom-VJP training pipeline (flash forward + banded
    Pallas backward sweeps, kernels/packed_gat.py + pallas_gat_bwd.py)
    must produce the same loss AND parameter gradients as the per-layer
    autodiff XLA path, including spill edges."""
    from elliptic_gnn_tpu.kernels.packed_gat import packed_gat_train_forward
    from elliptic_gnn_tpu.models.modules import build_model, gat_layer_apply

    rng = np.random.default_rng(17)
    n = 128 * 60
    ei, block_ids = _graph(n, 16, 3.0, seed=17)
    far = np.stack([rng.integers(0, n, 60), rng.integers(0, n, 60)])
    ei = np.concatenate([ei, far], axis=1).astype(np.int64)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei]
    g = build_bsda_for_kind(ei, n, "gat", depth=3, transpose=True)
    assert g.transpose is not None and g.residual is not None

    model = build_model("gat", 24, {"hidden_dim": hidden, "layers": 2,
                                    "heads": heads, "dropout": 0.0})
    params, _ = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))

    def loss_packed(params):
        logits = packed_gat_train_forward(params["layers"], x, g)
        assert logits is not None
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    def loss_ref(params):
        h = x
        for p in params["layers"][:-1]:
            h = jax.nn.elu(
                gat_layer_apply(p, h, g, concat=True, training=True))
        logits = gat_layer_apply(params["layers"][-1], h, g, concat=False,
                                 training=True)
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    l_p, g_p = jax.value_and_grad(loss_packed)(params)
    l_r, g_r = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_r = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_r)
    )
    for k, v in flat_p:
        ref = flat_r[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.parametrize("depth", [3, 4])
def test_one_sweep_backward_matches_two_sweep(monkeypatch, depth):
    """The fused one-kernel backward (_sweep_fused_call: dest-oriented
    walk emitting source-oriented z rows through the revolving
    accumulator) must reproduce the two-sweep (dest + transpose-table
    source) payload cotangent exactly. depth 4 is the GAT production
    default (train_gnn.py round 5); depth 3 the shared bench shape."""
    from elliptic_gnn_tpu.kernels.pallas_gat import pack_width
    from elliptic_gnn_tpu.kernels import pallas_gat_bwd as PB

    rng = np.random.default_rng(23)
    n = 128 * 40
    ei, block_ids = _graph(n, 10, 2.5, seed=23)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei].astype(np.int64)
    g = build_bsda_for_kind(ei, n, "gat", depth=depth, transpose=True)
    assert g.transpose is not None

    for h, ch in [(4, 8), (1, 2)]:
        pack1 = pack_width(h, ch)
        pack2 = PB.g2_pack_width(h, ch)
        n_pad = g.num_chunks * g.chunk
        hc = h * ch
        pay = np.zeros((n_pad, pack1), np.float32)
        pay[:, : hc + 2 * h] = 0.3 * rng.standard_normal((n_pad, hc + 2 * h))
        g2 = np.zeros((n_pad, pack2), np.float32)
        g2[:, : hc + h] = 0.3 * rng.standard_normal((n_pad, hc + h))
        g2[:, hc + h: hc + 2 * h] = pay[:, hc + h: hc + 2 * h]
        g2[:, hc + 2 * h: hc + 3 * h] = 0.5  # m lanes
        pay, g2 = jnp.asarray(pay), jnp.asarray(g2)

        monkeypatch.setenv("EGNN_GAT_ONE_SWEEP", "0")
        ct_two = PB.flash_gat_backward(g, pay, g2, h, ch, 0.2)
        monkeypatch.setenv("EGNN_GAT_ONE_SWEEP", "1")
        ct_one = PB.flash_gat_backward(g, pay, g2, h, ch, 0.2)
        assert ct_two is not None and ct_one is not None
        np.testing.assert_allclose(
            np.asarray(ct_one), np.asarray(ct_two), rtol=1e-5, atol=1e-5,
            err_msg=f"h={h} ch={ch}",
        )


def test_packed_train_forward_without_transpose_tables():
    """Round 5: the one-sweep backward walks the forward tables only, so
    the packed training pipeline must engage (and be exact) on a graph
    built WITHOUT transpose tables — the trainer no longer builds them
    for GAT."""
    from elliptic_gnn_tpu.kernels.packed_gat import packed_gat_train_forward
    from elliptic_gnn_tpu.models.modules import build_model, gat_layer_apply

    rng = np.random.default_rng(31)
    n = 128 * 40
    ei, block_ids = _graph(n, 8, 2.5, seed=31)
    far = np.stack([rng.integers(0, n, 40), rng.integers(0, n, 40)])
    ei = np.concatenate([ei, far], axis=1).astype(np.int64)
    rank = bfs_order(ei, n, block_ids)
    ei = rank[ei]
    g = build_bsda_for_kind(ei, n, "gat", depth=4, transpose=False)
    assert g.transpose is None and g.residual is not None

    model = build_model("gat", 16, {"hidden_dim": 16, "layers": 2,
                                    "heads": 2, "dropout": 0.0})
    params, _ = model.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))

    def loss_packed(params):
        logits = packed_gat_train_forward(params["layers"], x, g)
        assert logits is not None, "pipeline must engage without transpose"
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    def loss_ref(params):
        h = x
        for p in params["layers"][:-1]:
            h = jax.nn.elu(
                gat_layer_apply(p, h, g, concat=True, training=True))
        logits = gat_layer_apply(params["layers"][-1], h, g, concat=False,
                                 training=True)
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    l_p, g_p = jax.value_and_grad(loss_packed)(params)
    l_r, g_r = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-5)
    flat_r = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_r)
    )
    for k, v in jax.tree_util.tree_leaves_with_path(g_p):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=5e-5, err_msg=jax.tree_util.keystr(k),
        )
