"""Cross-framework parity: our JAX layers vs independent PyTorch
implementations of the PyG conv semantics, with identical weights
(BASELINE.md north star: per-layer activations allclose vs the PyTorch
reference). The torch code here is written from scratch against the
documented conventions — message flow src->dst, GCN/GAT self-loops +
normalization, SAGE mean aggregation with zero-degree rows -> 0 — not
imported from PyG (unavailable in this environment).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from elliptic_gnn_tpu.models import build_model, prepare_graph_ops
from elliptic_gnn_tpu.models.modules import (
    gat_layer_apply,
    gcn_layer_apply,
    sage_layer_apply,
)

torch.manual_seed(0)


def _graph(n=60, e=240, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = np.where(rng.integers(0, n, e) == 0, 1, rng.integers(0, n, e))
    return np.stack([src, dst]).astype(np.int64)


# ---------------- torch oracles (written from PyG's documented behavior) ----

def torch_sage_conv(x, ei, w_l, b_l, w_r):
    n = x.shape[0]
    agg = torch.zeros_like(x)
    cnt = torch.zeros(n)
    agg.index_add_(0, ei[1], x[ei[0]])
    cnt.index_add_(0, ei[1], torch.ones(ei.shape[1]))
    agg = agg / cnt.clamp(min=1.0).unsqueeze(1)
    return agg @ w_l + b_l + x @ w_r


def torch_gcn_conv(x, ei, w, b):
    n = x.shape[0]
    loops = torch.arange(n)
    ei = torch.cat([ei, torch.stack([loops, loops])], dim=1)
    deg = torch.zeros(n)
    deg.index_add_(0, ei[1], torch.ones(ei.shape[1]))
    dinv = deg.pow(-0.5)
    norm = dinv[ei[0]] * dinv[ei[1]]
    h = x @ w
    out = torch.zeros_like(h)
    out.index_add_(0, ei[1], h[ei[0]] * norm.unsqueeze(1))
    return out + b


def torch_gat_conv(x, ei, w, a_src, a_dst, bias, heads, c, concat=True):
    n = x.shape[0]
    loops = torch.arange(n)
    ei = torch.cat([ei, torch.stack([loops, loops])], dim=1)
    xp = torch.einsum("nf,fhc->nhc", x, w)
    al_s = torch.einsum("nhc,hc->nh", xp, a_src)
    al_d = torch.einsum("nhc,hc->nh", xp, a_dst)
    score = torch.nn.functional.leaky_relu(al_s[ei[0]] + al_d[ei[1]], 0.2)
    # per-destination softmax
    out = torch.zeros(n, heads, c)
    for d in range(n):
        m = ei[1] == d
        if m.sum() == 0:
            continue
        att = torch.softmax(score[m], dim=0)  # [E_d, H]
        out[d] = (att.unsqueeze(-1) * xp[ei[0][m]]).sum(0)
    out = out.reshape(n, heads * c) if concat else out.mean(dim=1)
    return out + bias


# ------------------------------------------------------------- tests ----

def test_sage_layer_matches_torch():
    n, f, h = 60, 24, 16
    ei = _graph(n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g = prepare_graph_ops(ei, n, "sage")

    from elliptic_gnn_tpu.models.modules import sage_layer_init

    p = sage_layer_init(jax.random.key(0), f, h)
    out_j = np.asarray(sage_layer_apply(p, jnp.asarray(x), g))

    out_t = torch_sage_conv(
        torch.from_numpy(x), torch.from_numpy(ei),
        torch.from_numpy(np.asarray(p["w_l"])),
        torch.from_numpy(np.asarray(p["b_l"])),
        torch.from_numpy(np.asarray(p["w_r"])),
    )
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_gcn_layer_matches_torch():
    n, f, h = 50, 20, 12
    ei = _graph(n)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g = prepare_graph_ops(ei, n, "gcn")

    from elliptic_gnn_tpu.models.modules import gcn_layer_init

    p = gcn_layer_init(jax.random.key(1), f, h)
    out_j = np.asarray(gcn_layer_apply(p, jnp.asarray(x), g))
    out_t = torch_gcn_conv(
        torch.from_numpy(x), torch.from_numpy(ei),
        torch.from_numpy(np.asarray(p["w"])),
        torch.from_numpy(np.asarray(p["b"])),
    )
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_gat_layer_matches_torch():
    n, f, heads, c = 40, 16, 4, 8
    ei = _graph(n, 160)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g = prepare_graph_ops(ei, n, "gat")

    from elliptic_gnn_tpu.models.modules import gat_layer_init

    p = gat_layer_init(jax.random.key(2), f, heads, c, True)
    out_j = np.asarray(gat_layer_apply(p, jnp.asarray(x), g, concat=True))
    out_t = torch_gat_conv(
        torch.from_numpy(x), torch.from_numpy(ei),
        torch.from_numpy(np.asarray(p["w"])),
        torch.from_numpy(np.asarray(p["a_src"])),
        torch.from_numpy(np.asarray(p["a_dst"])),
        torch.from_numpy(np.asarray(p["b"])),
        heads, c, concat=True,
    )
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_torch():
    from elliptic_gnn_tpu.models.modules import bn_apply, bn_init

    n, h = 200, 32
    rng = np.random.default_rng(4)
    x = rng.standard_normal((n, h)).astype(np.float32)
    p, s = bn_init(h)

    bn_t = torch.nn.BatchNorm1d(h, momentum=0.1, eps=1e-5)
    bn_t.train()
    out_t = bn_t(torch.from_numpy(x))
    out_j, s1 = bn_apply(p, s, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    # running stats after one step (torch: unbiased var in running stats)
    np.testing.assert_allclose(np.asarray(s1["mean"]),
                               bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["var"]),
                               bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5)
    # eval mode uses running stats
    bn_t.eval()
    out_te = bn_t(torch.from_numpy(x))
    out_je, _ = bn_apply(p, s1, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(out_je), out_te.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sinusoid_matches_reference_formula():
    """Exact reproduction of SAGEResBNNet._sinusoid (gnn.py:146-166) in
    torch as oracle."""
    import math

    from elliptic_gnn_tpu.models.modules import sinusoid_time_embed

    max_t, dim = 49, 2
    t_idx = np.arange(1, 50, dtype=np.int32)

    t = torch.clamp(torch.from_numpy(t_idx).long() - 1, 0, max_t - 1).float()
    t = t / max(float(max_t - 1), 1.0)
    half = dim // 2
    freqs = torch.arange(1, half + 1).float() * (2.0 * math.pi)
    ang = t.unsqueeze(1) * freqs.unsqueeze(0)
    feat_t = torch.cat([torch.sin(ang), torch.cos(ang)], dim=1)

    feat_j = sinusoid_time_embed(jnp.asarray(t_idx), dim, max_t)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_weighted_ce_matches_torch():
    from elliptic_gnn_tpu.models.losses import class_weights, make_loss_fn

    rng = np.random.default_rng(5)
    logits = rng.standard_normal((100, 2)).astype(np.float32)
    y = (rng.random(100) < 0.2).astype(np.int64)
    cw = class_weights(y)
    loss_fn = make_loss_fn({}, cw, 1, 10)
    loss_j = float(loss_fn({}, jnp.asarray(logits), jnp.asarray(y)))

    lt = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(y),
        weight=torch.from_numpy(cw), reduction="none",
    ).mean()
    np.testing.assert_allclose(loss_j, float(lt), rtol=1e-5)


def test_focal_loss_matches_torch():
    from elliptic_gnn_tpu.models.losses import make_loss_fn

    rng = np.random.default_rng(6)
    logits = rng.standard_normal((80, 2)).astype(np.float32)
    y = (rng.random(80) < 0.3).astype(np.int64)
    loss_fn = make_loss_fn(
        {"focal_loss": True, "focal_gamma": 2.0}, np.array([1.0, 1.0]), 1, 10
    )
    loss_j = float(loss_fn({}, jnp.asarray(logits), jnp.asarray(y)))

    lt = torch.from_numpy(logits)
    yt = torch.from_numpy(y)
    ce = torch.nn.functional.cross_entropy(lt, yt, reduction="none")
    pt = torch.softmax(lt, dim=1)[torch.arange(80), yt]
    focal = (((1 - pt) ** 2.0) * ce).mean()
    np.testing.assert_allclose(loss_j, float(focal), rtol=1e-5)


def test_temperature_matches_torch_lbfgs():
    from elliptic_gnn_tpu.train.calibrate import fit_temperature

    rng = np.random.default_rng(7)
    # informative but overconfident logits: optimal T is finite and > 1
    z = rng.standard_normal(500)
    y = (z + 0.8 * rng.standard_normal(500) > 0).astype(np.int64)
    logits = np.stack([-4 * z, 4 * z], axis=1).astype(np.float32)

    t_j = fit_temperature(logits, y)

    t_param = torch.ones(1, requires_grad=True)
    opt = torch.optim.LBFGS([t_param], lr=0.1, max_iter=200)
    lt, yt = torch.from_numpy(logits), torch.from_numpy(y)

    def closure():
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(lt / t_param, yt)
        loss.backward()
        return loss

    opt.step(closure)
    t_torch = float(t_param.detach())
    np.testing.assert_allclose(t_j, t_torch, rtol=1e-2)


def test_full_sage_resbn_forward_matches_torch():
    """Whole-model parity: SAGE-ResBN (BN train mode + residual projections
    + sin time embeds) vs an independent torch assembly with transplanted
    weights — the north star's per-layer/model allclose check."""
    import math

    n, f_in, hidden, layers = 80, 20, 16, 3
    max_t = 12
    ei = _graph(n, 300, seed=41)
    rng = np.random.default_rng(41)
    x = rng.standard_normal((n, f_in)).astype(np.float32)
    t_idx = rng.integers(1, max_t + 1, n).astype(np.int32)

    cfg = {
        "hidden_dim": hidden, "layers": layers, "dropout": 0.0,
        "use_bn": True, "residual": True, "time_embed_dim": 2,
        "time_embed_type": "sin", "max_timestep": max_t,
    }
    model = build_model("sage_resbn", f_in, cfg)
    params, state = model.init(jax.random.key(3))
    g = prepare_graph_ops(ei, n, "sage")

    logits_j, _ = model.apply(
        params, state, jnp.asarray(x), g, jnp.asarray(t_idx), training=True
    )

    # ---- torch assembly ----
    tt = torch.from_numpy
    # sinusoid (reference formula)
    t_c = torch.clamp(tt(t_idx).long() - 1, 0, max_t - 1).float()
    t_n = t_c / max(float(max_t - 1), 1.0)
    freqs = torch.arange(1, 2).float() * (2.0 * math.pi)
    ang = t_n.unsqueeze(1) * freqs.unsqueeze(0)
    h = torch.cat([tt(x), torch.sin(ang), torch.cos(ang)], dim=1)

    eit = tt(ei)
    for li in range(layers - 1):
        p = params["layers"][li]
        h_in = h
        h = torch_sage_conv(
            h, eit, tt(np.asarray(p["w_l"])), tt(np.asarray(p["b_l"])),
            tt(np.asarray(p["w_r"])),
        )
        bnp = params["bns"][li]
        bn = torch.nn.BatchNorm1d(hidden, momentum=0.1, eps=1e-5)
        with torch.no_grad():
            bn.weight.copy_(tt(np.asarray(bnp["scale"])))
            bn.bias.copy_(tt(np.asarray(bnp["bias"])))
        bn.train()
        h = torch.relu(bn(h))
        proj = params["res_projs"][li]
        h = h + (h_in if proj is None else h_in @ tt(np.asarray(proj["w"])))
    p = params["layers"][-1]
    logits_t = torch_sage_conv(
        h, eit, tt(np.asarray(p["w_l"])), tt(np.asarray(p["b_l"])),
        tt(np.asarray(p["w_r"])),
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), rtol=2e-3, atol=2e-4
    )
