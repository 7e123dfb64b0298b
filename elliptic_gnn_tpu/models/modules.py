"""Functional GNN model families: GCN, GraphSAGE, GAT, SAGE-ResBN.

Pure-pytree re-designs of the reference's four architectures
(/root/reference/src/models/gnn.py:14-194) on top of the ELL aggregation
kernels. Uniform interface:

    model = build_model(arch, in_dim, cfg)
    params, state = model.init(jax.random.key(seed))
    logits, new_state = model.apply(params, state, x, gops, t_idx,
                                    training=True, rng=key, axis_name=None)

`state` carries BatchNorm running statistics (empty dict for BN-free models).
`axis_name` names a mesh axis over which BatchNorm batch statistics are
globally reduced when node rows are sharded (psum of sums/counts) — the
multi-chip counterpart of torch's single-device BatchNorm1d.

Semantic parity notes (verified by tests/test_torch_parity.py against the
PyTorch/PyG reference):
  - GCNConv: self-loops appended, symmetric normalization with degrees
    counted on the destination column incl. self-loops, x @ W -> aggregate
    -> + bias (PyG gcn_norm convention).
  - SAGEConv: mean over incoming edges of raw features -> lin_l (with bias)
    + root lin_r (no bias); zero-degree rows aggregate to 0.
  - GATConv: self-loops, per-head additive attention with LeakyReLU(0.2),
    per-destination softmax, bias added after head concat (or head-mean for
    the final concat=False layer).
  - SAGEResBNNet: BatchNorm(momentum 0.1, eps 1e-5) on hidden layers, ReLU,
    dropout, residual with identity/linear projection, and timestep
    embeddings (learned table or the exact sinusoid of gnn.py:146-166).
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import gat_aggregate, spmm
from ..kernels.ell import (
    EllGraph,
    build_ell_graph,
    gcn_norm_weights,
)
from ..graph.transform import add_self_loops

Params = Dict[str, Any]
State = Dict[str, Any]


class Model(NamedTuple):
    init: Callable[[jax.Array], Tuple[Params, State]]
    apply: Callable[..., Tuple[jnp.ndarray, State]]
    arch: str
    graph_kind: str  # which EllGraph encoding the model expects
    uses_time_embed: bool


MODEL_GRAPH_KIND = {
    "gcn": "gcn",
    "sage": "sage",
    "gat": "gat",
    "sage_resbn": "sage",
    "sage_bn": "sage",
    "sage_res": "sage",
}


def resolve_gat_fused(cfg: dict) -> bool:
    """Resolve the fused GAT attention custom-VJP dispatch (one shared
    rule: cfg `gat_fused_vjp` true/false/'auto', overridden by
    EGNN_GAT_FUSED=1/0; 'auto' = on when running on TPU). Used both by the
    model's training dispatch below and by the trainer's decision to build
    the block-transpose tables (train/train_gnn.py) — a single resolver so
    the two can never disagree (a build without transpose tables would make
    packed_gat_train_forward silently fall back to autodiff)."""
    fused_cfg = cfg.get("gat_fused_vjp", "auto")
    env_fused = os.environ.get("EGNN_GAT_FUSED", "")
    if env_fused == "1":
        fused_cfg = True
    elif env_fused == "0":
        fused_cfg = False
    elif env_fused:
        import warnings

        warnings.warn(
            f"EGNN_GAT_FUSED={env_fused!r} not understood (expected '1' or "
            "'0'); ignoring", stacklevel=2,
        )
    if fused_cfg == "auto":
        return jax.default_backend() == "tpu"
    return bool(fused_cfg)


def prepare_graph_ops(edge_index: np.ndarray, num_nodes: int, kind: str):
    """Build the model-specific ELL aggregation encoding (host-side,
    one-time). The BSDA encodings (kernels/bsda.py) are built directly by
    the trainer; this covers the always-valid fallback path.

    'sage': mean aggregation over the raw (possibly symmetrized) edges.
    'gcn':  self-loops + symmetric-norm edge weights, sum aggregation.
    'gat':  self-loops, unit validity weights (attention computed in-model).
    """
    if kind == "sage":
        return build_ell_graph(edge_index, num_nodes, mean=True)
    if kind == "gcn":
        ei = add_self_loops(edge_index, num_nodes)
        w = gcn_norm_weights(ei, num_nodes)
        return build_ell_graph(ei, num_nodes, edge_weights=w, mean=False)
    if kind == "gat":
        ei = add_self_loops(edge_index, num_nodes)
        return build_ell_graph(ei, num_nodes, mean=False)
    raise ValueError(f"unknown graph kind {kind}")


# ---------------- initializers ----------------

def _glorot(key, shape, fan_in=None, fan_out=None):
    if fan_in is None:
        fan_in = shape[0]
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _dropout(rng, h, rate: float, training: bool):
    if not training or rate <= 0.0:
        return h
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, h.shape)
    return jnp.where(mask, h / keep, 0.0)


# ---------------- BatchNorm ----------------

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


def bn_init(dim: int) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)), "count": jnp.zeros(())}
    return params, state


def bn_apply(params, state, h, training: bool, axis_name: Optional[str] = None,
             row_mask: Optional[jnp.ndarray] = None):
    """BatchNorm1d over the node dimension; running stats torch-convention
    (momentum 0.1 toward the batch statistic, unbiased var in running stats).

    Under sharding (axis_name set), batch statistics are computed over the
    global node set via psum of per-shard sums/counts. `row_mask` [N]
    excludes padding rows from the statistics (sharded inputs pad node
    arrays to the chunk grid) so padded and unpadded runs are bit-equal.
    """
    if training:
        if row_mask is not None:
            m = row_mask.astype(h.dtype)[:, None]
            n = row_mask.astype(h.dtype).sum()
            s = (h * m).sum(axis=0)
            sq = (h * h * m).sum(axis=0)
        else:
            n = jnp.asarray(h.shape[0], h.dtype)
            s = h.sum(axis=0)
            sq = (h * h).sum(axis=0)
        if axis_name is not None:
            n = jax.lax.psum(n, axis_name)
            s = jax.lax.psum(s, axis_name)
            sq = jax.lax.psum(sq, axis_name)
        mean = s / n
        var = sq / n - mean * mean  # biased, used for normalization
        var = jnp.maximum(var, 0.0)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
            "count": state["count"] + 1.0,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (h - mean) * inv * params["scale"] + params["bias"], new_state


# ---------------- conv layers ----------------

def gcn_layer_init(key, d_in, d_out) -> Params:
    kw, = jax.random.split(key, 1)
    return {"w": _glorot(kw, (d_in, d_out)), "b": jnp.zeros((d_out,))}


def gcn_layer_apply(p, x, g: EllGraph, compute_dtype=None):
    return spmm(g, x @ p["w"], compute_dtype=compute_dtype) + p["b"]


def sage_layer_init(key, d_in, d_out) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "w_l": _glorot(k1, (d_in, d_out)),
        "b_l": jnp.zeros((d_out,)),
        "w_r": _glorot(k2, (d_in, d_out)),
    }


def sage_layer_apply(p, x, g: EllGraph, compute_dtype=None):
    agg = spmm(g, x, compute_dtype=compute_dtype)  # masked mean
    return agg @ p["w_l"] + p["b_l"] + x @ p["w_r"]


def gat_layer_init(key, d_in, heads, d_head, concat: bool) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    out_dim = heads * d_head if concat else d_head
    return {
        "w": _glorot(k1, (d_in, heads, d_head), fan_in=d_in, fan_out=heads * d_head),
        "a_src": _glorot(k2, (heads, d_head), fan_in=d_head, fan_out=1),
        "a_dst": _glorot(k3, (heads, d_head), fan_in=d_head, fan_out=1),
        "b": jnp.zeros((out_dim,)),
    }


def _flash_ok() -> bool:
    """Flash/packed GAT kernels are a real win only on TPU; off-TPU they
    would run in Pallas interpret mode (orders of magnitude slower than
    the XLA path). Kernel tests exercise interpret mode directly."""
    return jax.default_backend() == "tpu"


def gat_layer_apply(p, x, g: EllGraph, concat: bool, training: bool = True):
    xp = jnp.einsum("nf,fhc->nhc", x, p["w"])
    a_src = jnp.einsum("nhc,hc->nh", xp, p["a_src"])
    a_dst = jnp.einsum("nhc,hc->nh", xp, p["a_dst"])
    # inference/eval on TPU runs the forward-only flash attention kernel;
    # training here uses autodiff through the XLA path (the packed
    # custom-VJP training pipeline lives in kernels/packed_gat.py and is
    # dispatched at the model level)
    out = gat_aggregate(g, xp, a_src, a_dst,
                        use_flash=not training and _flash_ok())
    if concat:
        out = out.reshape(out.shape[0], -1)
    else:
        out = out.mean(axis=1)
    return out + p["b"]


# ---------------- time embeddings (SAGE-ResBN) ----------------

def sinusoid_time_embed(t_idx, dim: int, max_timestep: int):
    """Exact reference sinusoid (gnn.py:146-166): t clamped to
    [0, max_timestep-1], normalized to [0,1], freqs k*2pi for k=1..dim//2,
    [sin, cos] concat, zero-padded to odd dims."""
    t = jnp.clip(t_idx.astype(jnp.float32) - 1.0, 0.0, float(max_timestep - 1))
    t = t / max(float(max_timestep - 1), 1.0)
    half = dim // 2
    freqs = jnp.arange(1, half + 1, dtype=jnp.float32) * (2.0 * math.pi)
    angles = t[:, None] * freqs[None, :]
    feat = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=1)
    if feat.shape[1] < dim:
        feat = jnp.concatenate(
            [feat, jnp.zeros((feat.shape[0], dim - feat.shape[1]), feat.dtype)], axis=1
        )
    return feat


# ---------------- model builders ----------------

def _stack_apply(layer_apply, act):
    """Shared forward for the plain GCN/SAGE/GAT stacks: conv -> act ->
    dropout between layers, final conv produces logits (gnn.py:25-76)."""

    def apply(params, state, x, g, t_idx=None, *, training=False, rng=None,
              axis_name=None, row_mask=None, dropout=0.0):
        h = x
        n_layers = len(params["layers"])
        rngs = (
            jax.random.split(rng, n_layers) if rng is not None else [None] * n_layers
        )
        for li, p in enumerate(params["layers"][:-1]):
            h = layer_apply(p, h, g)
            h = act(h)
            h = _dropout(rngs[li], h, dropout, training)
        h = layer_apply(params["layers"][-1], h, g)
        return h, state

    return apply


def build_model(arch: str, in_dim: int, cfg: dict) -> Model:
    """Model factory mirroring the reference's build_model
    (train_gnn.py:67-104), with the same config keys and defaults."""
    hidden = int(cfg.get("hidden_dim", 128))
    layers = int(cfg.get("layers", 3))
    dropout = float(cfg.get("dropout", 0.2))
    num_classes = 2
    assert layers >= 2
    # amp: gather-side bf16 with f32 accumulation (see ell_spmm). Off by
    # default so CPU parity tests stay exact; configs enable it like the
    # reference enables CUDA AMP (train_gnn.py:291).
    cdt = jnp.bfloat16 if bool(cfg.get("amp", False)) else None

    if arch == "gcn":
        dims = [in_dim] + [hidden] * (layers - 1) + [num_classes]

        def init(key):
            keys = jax.random.split(key, layers)
            return (
                {"layers": [
                    gcn_layer_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
                ]},
                {},
            )

        base = _stack_apply(
            lambda p, h, g: gcn_layer_apply(p, h, g, cdt), jax.nn.relu
        )

        def apply(params, state, x, g, t_idx=None, *, training=False, rng=None,
                  axis_name=None, row_mask=None):
            return base(params, state, x, g, t_idx, training=training, rng=rng,
                        axis_name=axis_name, dropout=dropout)

        return Model(init, apply, arch, "gcn", False)

    if arch == "sage":
        dims = [in_dim] + [hidden] * (layers - 1) + [num_classes]

        def init(key):
            keys = jax.random.split(key, layers)
            return (
                {"layers": [
                    sage_layer_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
                ]},
                {},
            )

        base = _stack_apply(
            lambda p, h, g: sage_layer_apply(p, h, g, cdt), jax.nn.relu
        )

        def apply(params, state, x, g, t_idx=None, *, training=False, rng=None,
                  axis_name=None, row_mask=None):
            return base(params, state, x, g, t_idx, training=training, rng=rng,
                        axis_name=axis_name, dropout=dropout)

        return Model(init, apply, arch, "sage", False)

    if arch == "gat":
        heads = int(cfg.get("heads", 4))
        d_head = hidden // heads
        # custom-VJP training pipeline (flash forward + banded Pallas
        # backward sweeps): DEFAULT on TPU since the round-3
        # occupancy-gated sweeps — measured ~25% faster than the XLA
        # autodiff path at Elliptic scale in same-process A/B
        # (docs/PERF_NOTES.md "GAT training backward", round 3). Off-TPU
        # the kernels run in interpret mode and autodiff stays default.
        # Override with `gat_fused_vjp: true/false` or EGNN_GAT_FUSED=1/0;
        # unsupported shapes/graphs still fall back to autodiff at trace
        # time (packed_gat_train_forward returns None).
        fused_train = resolve_gat_fused(cfg)

        def init(key):
            keys = jax.random.split(key, layers)
            ps = [gat_layer_init(keys[0], in_dim, heads, d_head, True)]
            for i in range(layers - 2):
                ps.append(gat_layer_init(keys[1 + i], heads * d_head, heads, d_head, True))
            ps.append(gat_layer_init(keys[-1], heads * d_head, 1, num_classes, False))
            return {"layers": ps}, {}

        def apply(params, state, x, g, t_idx=None, *, training=False, rng=None,
                  axis_name=None, row_mask=None):
            n_layers = len(params["layers"])
            rngs = (
                jax.random.split(rng, n_layers) if rng is not None else [None] * n_layers
            )
            if _flash_ok():
                # fully-packed pipeline: every intermediate stays at
                # 128-lane tiling (kernels/packed_gat.py). Eval uses the
                # forward-only variant; training the (opt-in) custom-VJP
                # variant (flash forward + banded Pallas backward sweeps).
                # None -> shape/graph unsupported, use the generic path.
                out = None
                if training and fused_train:
                    from ..kernels.packed_gat import packed_gat_train_forward

                    out = packed_gat_train_forward(
                        params["layers"], x, g, rngs=rngs, dropout=dropout
                    )
                elif not training:
                    from ..kernels.packed_gat import packed_gat_forward

                    out = packed_gat_forward(params["layers"], x, g)
                if out is not None:
                    return out, state
            h = x
            for li, p in enumerate(params["layers"][:-1]):
                h = gat_layer_apply(p, h, g, concat=True, training=training)
                h = jax.nn.elu(h)
                h = _dropout(rngs[li], h, dropout, training)
            h = gat_layer_apply(
                params["layers"][-1], h, g, concat=False, training=training
            )
            return h, state

        return Model(init, apply, arch, "gat", False)

    if arch in ("sage_resbn", "sage_bn", "sage_res"):
        use_bn = bool(cfg.get("use_bn", True))
        residual = bool(cfg.get("residual", True))
        time_embed_dim = int(cfg.get("time_embed_dim", 0))
        time_embed_type = str(cfg.get("time_embed_type", "learned"))
        max_timestep = int(cfg.get("max_timestep", 49))
        if time_embed_dim <= 0 or time_embed_type == "none":
            time_embed_dim, time_embed_type = 0, "none"
        eff_in = in_dim + time_embed_dim

        dims = [eff_in] + [hidden] * (layers - 1) + [num_classes]
        res_in = [eff_in] + [hidden] * (layers - 2)

        def init(key):
            keys = jax.random.split(key, 2 * layers + 2)
            params: Params = {
                "layers": [
                    sage_layer_init(keys[i], dims[i], dims[i + 1])
                    for i in range(layers)
                ],
            }
            state: State = {}
            if use_bn:
                bn_p, bn_s = [], []
                for _ in range(layers - 1):
                    p, s = bn_init(hidden)
                    bn_p.append(p)
                    bn_s.append(s)
                params["bns"] = bn_p
                state["bns"] = bn_s
            if residual:
                projs = []
                for i, d_in in enumerate(res_in):
                    if d_in == hidden:
                        projs.append(None)
                    else:
                        projs.append({"w": _glorot(keys[layers + i], (d_in, hidden))})
                params["res_projs"] = projs
            if time_embed_type == "learned":
                params["time_emb"] = (
                    jax.random.normal(keys[-1], (max_timestep, time_embed_dim)) * 1.0
                )
            return params, state

        def inject_time(params, x, t_idx):
            if time_embed_dim <= 0 or t_idx is None:
                return x
            if time_embed_type == "learned":
                tidx = jnp.clip(t_idx.astype(jnp.int32) - 1, 0, max_timestep - 1)
                te = params["time_emb"][tidx]
            else:  # sin
                te = sinusoid_time_embed(t_idx, time_embed_dim, max_timestep)
            return jnp.concatenate([x, te.astype(x.dtype)], axis=1)

        def apply(params, state, x, g, t_idx=None, *, training=False, rng=None,
                  axis_name=None, row_mask=None):
            h = inject_time(params, x, t_idx)
            n_layers = len(params["layers"])
            rngs = (
                jax.random.split(rng, n_layers) if rng is not None else [None] * n_layers
            )
            new_bn_states = []
            for li in range(n_layers - 1):
                h_in = h
                h = sage_layer_apply(params["layers"][li], h, g, cdt)
                if use_bn:
                    h, bns = bn_apply(
                        params["bns"][li], state["bns"][li], h, training,
                        axis_name, row_mask,
                    )
                    new_bn_states.append(bns)
                h = jax.nn.relu(h)
                h = _dropout(rngs[li], h, dropout, training)
                if residual:
                    proj = params["res_projs"][li]
                    h = h + (h_in if proj is None else h_in @ proj["w"])
            h = sage_layer_apply(params["layers"][-1], h, g, cdt)
            new_state = dict(state)
            if use_bn:
                new_state["bns"] = new_bn_states
            return h, new_state

        return Model(init, apply, arch, "sage", time_embed_dim > 0)

    raise ValueError(f"Unknown arch {arch!r}")
