"""Loss functions: class-weighted CE, focal loss, time-weighted variants.

Matches the reference loss factory (/root/reference/src/train_gnn.py:116-183):
  - inverse-frequency class weights w_c = (P+N) / (2 * count_c)
  - focal: (1 - p_t)^gamma * CE (unweighted CE inside focal, as the ref does)
  - time reweighting: normalized train-time in [0,1], 'linear' or 'sqrt',
    clamped to >= 1e-3
  - optional L2 on the learned time-embedding table
All differentiable jnp ops, usable inside jit.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def class_weights(train_y: np.ndarray) -> np.ndarray:
    """Inverse-frequency weights [w_neg, w_pos] (train_gnn.py:116-123)."""
    pos = int((train_y == 1).sum())
    neg = int((train_y == 0).sum())
    if pos == 0 or neg == 0:
        return np.array([1.0, 1.0], dtype=np.float32)
    tot = pos + neg
    return np.array([tot / (2.0 * neg), tot / (2.0 * pos)], dtype=np.float32)


def cross_entropy_per_sample(logits, targets, weights=None):
    """Per-sample CE over 2-class logits; optional per-class weights."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32), axis=1)[:, 0]
    ce = -ll
    if weights is not None:
        ce = ce * weights[targets]
    return ce


def make_loss_parts(cfg: dict, cw: np.ndarray, t_min: int, t_max: int):
    """The loss factory, split into composable parts:

      loss_vec_fn(logits, targets, t_idx) -> per-sample loss vector
      penalty_fn(params)                  -> replicated scalar penalty

    Every reference loss (weighted CE, focal, linear/sqrt time weighting;
    /root/reference/src/train_gnn.py:136-183) is a per-sample vector plus
    an optional parameter penalty, so the masked mean composes identically
    on a single device (plain sum/mean, `make_loss_fn` below) and inside
    shard_map (psum'd numerator/denominator over row shards — the penalty
    is computed from replicated params and added after the reduction).
    """
    use_focal = bool(cfg.get("focal_loss", False))
    gamma = float(cfg.get("focal_gamma", 2.0))
    scheme = str(cfg.get("time_loss_weighting", "none"))
    embed_l2 = float(cfg.get("time_embed_l2", 0.0))
    cw = jnp.asarray(cw, dtype=jnp.float32)
    denom_t = max(float(t_max - t_min), 1.0)
    if scheme not in ("none", "linear", "sqrt"):
        raise ValueError(f"unknown time_loss_weighting={scheme}")

    def loss_vec_fn(logits, targets, t_idx=None):
        targets = targets.astype(jnp.int32)
        if use_focal:
            ce = cross_entropy_per_sample(logits, targets)
            p = jax.nn.softmax(logits, axis=1)
            pt = jnp.take_along_axis(p, targets[:, None], axis=1)[:, 0]
            loss_vec = ((1.0 - pt) ** gamma) * ce
        else:
            loss_vec = cross_entropy_per_sample(logits, targets, cw)

        if scheme != "none" and t_idx is not None:
            wt = (t_idx.astype(jnp.float32) - float(t_min)) / denom_t
            if scheme == "sqrt":
                wt = jnp.sqrt(jnp.maximum(wt, 0.0))
            wt = jnp.maximum(wt, 1e-3)
            loss_vec = loss_vec * wt
        return loss_vec

    def penalty_fn(params):
        if embed_l2 > 0.0 and isinstance(params, dict) and "time_emb" in params:
            return embed_l2 * jnp.mean(params["time_emb"] ** 2)
        return jnp.asarray(0.0, jnp.float32)

    return loss_vec_fn, penalty_fn


def make_loss_fn(cfg: dict, cw: np.ndarray, t_min: int, t_max: int):
    """Returns loss(params, logits, targets, t_idx, sample_mask) -> scalar.

    `sample_mask` supports fixed-shape masked batches (TPU-friendly): the
    mean is taken over mask weight instead of array length. With a weighted
    CE, torch's `F.cross_entropy(..., weight=w, reduction='none').mean()`
    equals the plain mean of weighted per-sample losses — matched here.
    """
    loss_vec_fn, penalty_fn = make_loss_parts(cfg, cw, t_min, t_max)

    def loss_fn(params, logits, targets, t_idx=None, sample_mask=None):
        loss_vec = loss_vec_fn(logits, targets, t_idx)
        if sample_mask is not None:
            m = sample_mask.astype(loss_vec.dtype)
            loss = (loss_vec * m).sum() / jnp.maximum(m.sum(), 1.0)
        else:
            loss = loss_vec.mean()
        return loss + penalty_fn(params)

    return loss_fn
