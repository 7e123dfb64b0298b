"""Device-side epoch decomposition at Elliptic scale (dev tool).

The round-3 scanned loop (epochs_per_sync) removed the ~30 ms relay sync
per epoch; what remains is ~8 ms of device compute per epoch. This tool
attributes it by differential measurement in ONE process (the relay has
no usable device profiler):

  train_step      value_and_grad + Adam on the SAGE-ResBN champion shape
  eval_fwd        inference forward (the second forward of each epoch)
  epoch_step      train + eval fused (what the scan body dispatches)
  pr_auc_device   the on-device AP metric over the val slice
  spmm            one aggregation pass (for reference)
  no_dropout      train_step with dropout 0 (isolates RNG cost)

Run:  python tools/bench_epoch_breakdown.py
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from bench.timing import differential_time  # noqa: E402

N_NODES = 203_769
N_EDGES = 234_355
N_FEATURES = 166
N_TIMESTEPS = 49


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(cfg_extra=None):
    from elliptic_gnn_tpu.graph import make_temporal_masks, synthetic
    from elliptic_gnn_tpu.graph.transform import symmetrize_edges
    from elliptic_gnn_tpu.train.train_gnn import build_train_state

    dev = jax.devices()[0]
    n_nodes = N_NODES if dev.platform == "tpu" else 20_000
    data = synthetic.generate(
        num_nodes=n_nodes, num_features=N_FEATURES,
        num_timesteps=N_TIMESTEPS, avg_degree=N_EDGES / N_NODES, seed=0,
    )
    data = make_temporal_masks(data, 34, 43)
    data = symmetrize_edges(data)
    cfg = {
        "run_name": "bd", "seed": 42, "arch": "sage_resbn",
        "hidden_dim": 64, "layers": 3, "dropout": 0.2, "lr": 5e-4,
        "weight_decay": 5e-5, "grad_clip": 1.0, "time_embed_dim": 2,
        "time_embed_type": "sin", "max_timestep": N_TIMESTEPS,
        "patience": 10_000, "amp": True, "max_epochs": 8,
    }
    if cfg_extra:
        cfg.update(cfg_extra)
    return cfg, build_train_state(cfg, data, 42)


def main():
    import elliptic_gnn_tpu.utils.metrics as M
    from elliptic_gnn_tpu.kernels import spmm
    from elliptic_gnn_tpu.kernels.bsda import BsdaGraph

    dev = jax.devices()[0]
    log(f"[bench] device: {dev.device_kind} ({dev.platform})")
    cfg, (data, model, gops, params, state, tx, opt_state, loss_fn) = build()

    n0 = data.num_nodes
    n_pad = gops.num_chunks * gops.chunk if isinstance(gops, BsdaGraph) else n0
    pad = n_pad - n0

    def pad_rows(a, fill=0):
        if pad == 0:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=fill)

    x = jnp.asarray(pad_rows(data.x))
    y_all = jnp.asarray(pad_rows(np.maximum(data.y, 0).astype(np.int32)))
    t_all = jnp.asarray(pad_rows(data.timestep.astype(np.int32), fill=1))
    tm = jnp.asarray(pad_rows(data.train_mask.astype(np.float32)))
    row_mask = (
        jnp.asarray((np.arange(n_pad) < n0).astype(np.float32))
        if pad else None
    )
    val_idx = jnp.asarray(np.where(data.val_mask)[0].astype(np.int32))
    y_val = jnp.asarray((data.y[data.val_mask] == 1).astype(np.int32))
    t_idx_arg = t_all if model.uses_time_embed else None
    log(f"[bench] val nodes: {val_idx.shape[0]}")

    def train_only(carry, x, y_all, tm, gops, t_):
        params, state, opt_state = carry
        rng = jax.random.key(0)

        def lf(p):
            logits, new_state = model.apply(
                p, state, x, gops, t_, training=True, rng=rng,
                row_mask=row_mask,
            )
            return loss_fn(p, logits, y_all, None, tm), new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, new_opt)

    def eval_only(probs_carry, x, gops, t_):
        logits, _ = model.apply(params, state, x, gops, t_, training=False)
        p = jax.nn.softmax(logits, axis=1)[:, 1]
        return probs_carry * 0.5 + p * 0.5

    def epoch_step(carry, x, y_all, tm, gops, t_):
        carry2 = train_only(carry, x, y_all, tm, gops, t_)
        logits, _ = model.apply(carry2[0], carry2[1], x, gops, t_,
                                training=False)
        probs_val = jax.nn.softmax(logits, axis=1)[:, 1][val_idx]
        pr = M.pr_auc_illicit_device(y_val, probs_val).astype(jnp.float32)
        # fold pr into params grad-free so the scan carries it (dependency)
        return jax.tree.map(
            lambda a: a + 0.0 * pr.astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, carry2
        )

    carry0 = (params, state, opt_state)
    dt_train, _ = differential_time(train_only, carry0, x, y_all, tm, gops,
                                    t_idx_arg, n_small=2, n_big=12, repeats=2)
    log(f"[bench] train step (fwd+bwd+Adam): {dt_train*1e3:.3f} ms")

    probs0 = jnp.zeros(n_pad, jnp.float32)
    dt_eval, _ = differential_time(eval_only, probs0, x, gops, t_idx_arg,
                                   n_small=2, n_big=12, repeats=2)
    log(f"[bench] eval forward: {dt_eval*1e3:.3f} ms")

    dt_epoch, _ = differential_time(epoch_step, carry0, x, y_all, tm, gops,
                                    t_idx_arg, n_small=2, n_big=12, repeats=2)
    log(f"[bench] epoch step (train+eval+device AP): {dt_epoch*1e3:.3f} ms")

    def ap_only(c, y_val):
        pr = M.pr_auc_illicit_device(y_val, c)
        return c * 0.999 + 0.001 * pr

    probs_v = jnp.asarray(
        np.random.default_rng(0).random(val_idx.shape[0], np.float32))
    dt_ap, _ = differential_time(ap_only, probs_v, y_val,
                                 n_small=4, n_big=40, repeats=2)
    log(f"[bench] device AP metric alone: {dt_ap*1e3:.3f} ms")

    xh = jnp.asarray(
        np.random.default_rng(0).standard_normal((n_pad, 64)).astype(
            np.float32))
    dt_spmm, _ = differential_time(lambda c, g: spmm(g, c), xh, gops,
                                   n_small=2, n_big=22, repeats=2)
    log(f"[bench] one SpMM pass (F=64): {dt_spmm*1e3:.3f} ms")

    # dropout-off variant isolates the threefry RNG cost
    cfg2, (data2, model2, gops2, params2, state2, tx2, opt2, loss2) = build(
        {"dropout": 0.0})

    def train_nodrop(carry, x, y_all, tm, gops, t_):
        params, state, opt_state = carry
        rng = jax.random.key(0)

        def lf(p):
            logits, new_state = model2.apply(
                p, state, x, gops, t_, training=True, rng=rng,
                row_mask=row_mask,
            )
            return loss2(p, logits, y_all, None, tm), new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, new_opt = tx2.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, new_opt)

    dt_nd, _ = differential_time(
        train_nodrop, (params2, state2, opt2), x, y_all, tm, gops2,
        t_idx_arg, n_small=2, n_big=12, repeats=2)
    log(f"[bench] train step, dropout=0: {dt_nd*1e3:.3f} ms")

    log(f"[summary] epoch={dt_epoch*1e3:.2f} train={dt_train*1e3:.2f} "
        f"eval={dt_eval*1e3:.2f} ap={dt_ap*1e3:.3f} spmm={dt_spmm*1e3:.3f} "
        f"train_nodrop={dt_nd*1e3:.2f} "
        f"(rng_cost~{(dt_train-dt_nd)*1e3:.2f})")


if __name__ == "__main__":
    main()
