"""GNN training engine: jitted full-batch + neighbor-sampled training.

The TPU-native counterpart of the reference trainer
(/root/reference/src/train_gnn.py:282-564). Behavior and artifact contract
match the reference exactly — same YAML config keys, same `outputs/gnn/<run>`
layout (metrics.json, scores_*.npy, y_*.npy, node_idx_*.npy,
timestep_*.npy, best.ckpt, config_used.yaml, training_log.csv, optional
metrics_hub_removed.json) — while the execution model is re-designed for
XLA:

  - one jitted `train_step` per epoch: forward over the full graph via ELL
    aggregation, masked loss on train nodes, grad, clip, Adam — no Python
    in the hot loop;
  - per-epoch evaluation pulls back only the val-slice probabilities
    (the reference transfers full-graph probs every epoch,
    train_gnn.py:254-257);
  - early stopping on val PR-AUC with patience + best-params snapshot
    (train_gnn.py:375-413);
  - temperature calibration as a jitted Newton solve (train/calibrate.py)
    instead of torch LBFGS;
  - mixed precision: TPU MXU executes f32 matmuls with bf16 multiplier
    passes by default, so the reference's AMP flag (train_gnn.py:36-47) is
    accepted and implied;
  - periodic `resume.ckpt` (params + opt state + epoch) adds the
    mid-training resume the reference lacks (SURVEY.md §5);
  - `mini_batch: true` uses the fixed-shape neighbor sampler
    (train/sampler.py), the TPU analogue of PyG NeighborLoader
    (train_gnn.py:329-348).

CLI:  python -m elliptic_gnn_tpu.train.train_gnn --config configs/rec_k8.yaml
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from ..graph import load_processed, make_temporal_masks
from ..graph.transform import append_scalar_time, remove_hub_edges, symmetrize_edges
from ..models import MODEL_GRAPH_KIND, build_model, prepare_graph_ops
from ..models.losses import class_weights, make_loss_fn
from ..parallel import multihost
from ..utils.common import ensure_dir, log_device_info, save_json, set_seed
from ..utils.logger import NullLogger, RunLogger
from ..utils import metrics as M
from . import calibrate, checkpoint


def make_optimizer(cfg: dict) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 weight decay added to the gradient
    *before* the Adam moments (not AdamW), grad-norm clip applied first
    (train_gnn.py:203-205,357-359)."""
    chain = []
    grad_clip = float(cfg.get("grad_clip", 0) or 0)
    if grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    wd = float(cfg.get("weight_decay", 0.0))
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale(-float(cfg["lr"])))
    return optax.chain(*chain)


def prepare_data(cfg: dict):
    """Load the processed graph and apply the reference's preprocessing
    pipeline: rolling window re-mask, scalar-time append, symmetrization
    (train_gnn.py:294-326)."""
    data = load_processed(cfg["processed_dir"])
    if data.train_mask is None:
        raise RuntimeError(
            "Build graph first: python -m elliptic_gnn_tpu.graph.build_graph "
            "--config configs/split.yaml"
        )

    window_k = cfg.get("train_window_k")
    if window_k is not None:
        train_ts = data.timestep[data.train_mask]
        if train_ts.size == 0:
            raise RuntimeError("Train mask is empty; cannot apply rolling window.")
        val_ts = data.timestep[data.val_mask]
        if val_ts.size == 0:
            raise RuntimeError("Validation mask is empty; cannot infer t_val_end.")
        data = make_temporal_masks(
            data, int(train_ts.max()), int(val_ts.max()), int(window_k)
        )

    if cfg.get("use_time_scalar", False) and int(cfg.get("time_embed_dim", 0) or 0) == 0:
        data = append_scalar_time(data)

    if cfg.get("symmetrize_edges", False):
        data = symmetrize_edges(data)
    return data


def _pick_aggregation(cfg: dict, data, kind: str) -> str:
    """Choose the aggregation encoding:
      'shard_map'    explicit-collective halo path (multi-device default:
                     boundary-only ppermute exchange + per-shard banded
                     Pallas kernel, parallel/shardmap_step.py); non-banded
                     graphs fall back to GSPMD at partition time
                     (_train_loop_fullbatch catches the ValueError)
      'bsda_pallas'  banded Pallas kernel over the int8 factored-scale
                     encoding (primary on TPU; sage/gcn, full-batch)
      'bsda'         MXU block-sparse dense via XLA einsum (primary
                     off-TPU; the GSPMD multi-device fallback)
      'ell'          pure-XLA gather ELL (always valid)
    """
    mode = cfg.get("aggregation", "auto")
    if cfg.get("use_pallas", False):  # legacy switch for the Pallas path
        mode = "bsda_pallas"
    if cfg.get("mini_batch", False) or kind not in ("sage", "gcn", "gat"):
        return "ell"
    if mode == "auto":
        mesh_cfg = cfg.get("mesh_devices", 1) or 1
        n_mesh = len(jax.devices()) if mesh_cfg == "all" else int(mesh_cfg)
        if n_mesh > 1:
            # multi-device default since round 5: the certified explicit
            # halo path carries every model family and the full loss
            # surface (VERDICT r4 #3) — the best path the framework has
            # should be the one users get by default. GSPMD einsum remains
            # the automatic fallback for graphs partition_bsda rejects.
            return "shard_map"
        if kind in ("sage", "gcn") and jax.default_backend() == "tpu":
            return "bsda_pallas"
        return "bsda"
    if mode == "bsda_pallas":
        # the banded kernel covers sage/gcn; GAT attention stays on the
        # dense-chunk path (kernels/bsda_gat.py)
        return "bsda" if kind == "gat" else "bsda_pallas"
    if mode not in ("bsda", "ell", "shard_map"):
        raise ValueError(
            f"Unknown aggregation {mode!r}; expected one of "
            "auto/bsda/bsda_pallas/ell/shard_map"
        )
    return str(mode)


def build_train_state(cfg: dict, data, seed: int):
    """Construct (data, model, gops, params, state, tx, opt_state, loss_fn).

    Returns the (possibly renumbered) data along with the train state."""
    arch = cfg["arch"]
    if arch not in MODEL_GRAPH_KIND:
        raise ValueError(
            f"Unknown arch {arch!r}; expected one of {sorted(MODEL_GRAPH_KIND)}"
        )
    kind = MODEL_GRAPH_KIND[arch]
    agg = _pick_aggregation(cfg, data, kind)
    if agg in ("bsda", "bsda_pallas", "shard_map"):
        # BFS renumbering groups connected neighborhoods into contiguous
        # MXU chunks; artifacts translate back via data.orig_index.
        from ..kernels.bsda import bfs_order, build_bsda_for_kind

        rank = bfs_order(data.edge_index, data.num_nodes, data.timestep)
        data = data.renumber(rank)
        if agg in ("bsda_pallas", "shard_map"):
            # factored int8 multiplicity tables: 4x less A traffic; the
            # banded kernel applies the per-node scales in VMEM
            a_dtype = "int8"
        else:
            a_dtype = "bfloat16" if cfg.get("amp", False) else "float32"
        # the explicit-collective path differentiates through shard_map
        # AD (ppermute transposes itself); no A^T encoding needed. GAT
        # stopped needing transpose tables in round 5 — the one-sweep
        # backward walks the forward tables only (pallas_gat_bwd.py) —
        # EXCEPT when the two-sweep fallback is forced via
        # EGNN_GAT_ONE_SWEEP=0 (then packed_gat_train_forward requires
        # g.transpose or silently falls back to autodiff). SAGE/GCN
        # still route gradients through the A^T encoding.
        import os as _os

        from ..models.modules import resolve_gat_fused

        want_transpose = agg != "shard_map" and (
            kind != "gat"
            or (resolve_gat_fused(cfg)
                and _os.environ.get("EGNN_GAT_ONE_SWEEP", "1") == "0")
        )
        # GAT defaults to depth 4: its occupancy-gated backward skips the
        # extra slot capacity where unused, the near-zero spill (5 rows vs
        # 433 at depth 3, Elliptic scale) shrinks the compact merge, and
        # the fused step measured ~2% faster in same-process A/B
        # (docs/PERF_NOTES.md round 5). SAGE/GCN keep 3 (the banded SpMM
        # kernel streams every slot; more table = more HBM).
        gops = build_bsda_for_kind(
            data.edge_index, data.num_nodes, kind,
            depth=int(cfg.get("bsda_depth", 4 if kind == "gat" else 3)),
            a_dtype=a_dtype,
            transpose=want_transpose,
        )
        if agg == "bsda_pallas":
            import dataclasses

            gops = dataclasses.replace(gops, use_pallas_kernel=True)
            if gops.transpose is not None:
                gops = dataclasses.replace(
                    gops,
                    transpose=dataclasses.replace(
                        gops.transpose, use_pallas_kernel=True
                    ),
                )
    else:
        gops = prepare_graph_ops(data.edge_index, data.num_nodes, kind)
        # Bucket renumbering: relabel nodes so aggregation output lands
        # directly in node order, skipping the per-layer reorder gather
        # (~30% of SpMM time at Elliptic scale). Artifacts translate back
        # via data.orig_index.
        if bool(cfg.get("renumber", True)) and not cfg.get("mini_batch", False):
            from ..kernels.ell import renumber_for_ell

            gops, rank = renumber_for_ell(gops)
            data = data.renumber(rank)
    model = build_model(arch, data.num_features, cfg)
    params, state = model.init(jax.random.key(seed))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    if cfg.get("class_weight_pos", "auto") == "auto":
        cw = class_weights(data.y[data.train_mask])
    else:
        cw = np.array([1.0, float(cfg["class_weight_pos"])], dtype=np.float32)
    t_train = data.timestep[data.train_mask]
    t_min, t_max = int(t_train.min()), int(t_train.max())
    loss_fn = make_loss_fn(cfg, cw, t_min, t_max)
    return data, model, gops, params, state, tx, opt_state, loss_fn


def main(cfg: dict) -> dict:
    # multi-controller (multi-host) runs: initialize jax.distributed from
    # config/env; every host runs the identical lockstep loop, host 0 owns
    # all artifact IO (SURVEY.md §2.3 comm-backend row)
    multihost.maybe_initialize(cfg)
    primary = multihost.is_primary()
    set_seed(cfg.get("seed", 42))
    outdir = os.path.join(cfg.get("output_root", "outputs"), "gnn", cfg["run_name"])
    if primary:
        ensure_dir(outdir)
        logger = RunLogger(outdir)
    else:
        logger = NullLogger()
    log_device_info()

    data = prepare_data(cfg)
    data, model, gops, params, state, tx, opt_state, loss_fn = build_train_state(
        cfg, data, cfg.get("seed", 42)
    )

    t_start = time.time()
    if cfg.get("mini_batch", False):
        from .sampler import train_loop_minibatch

        params, state, best_val, epochs_run = train_loop_minibatch(
            cfg, data, model, params, state, tx, opt_state, loss_fn, logger
        )
    else:
        params, state, best_val, epochs_run = _train_loop_fullbatch(
            cfg, outdir, data, model, gops, params, state, tx, opt_state,
            loss_fn, logger
        )
    train_seconds = time.time() - t_start

    return _finalize(
        cfg, outdir, data, model, gops, params, state, best_val, logger,
        train_seconds, epochs_run,
    )


def _train_loop_fullbatch(cfg, outdir, data, model, gops, params, state, tx,
                          opt_state, loss_fn, logger):
    # Multi-device: `mesh_devices: N` shards node rows + aggregation tables
    # over an N-device `nodes` mesh. Default 1. `aggregation: shard_map`
    # selects the explicit-collective path (boundary-only halo exchange,
    # parallel/shardmap_step.py); anything else uses GSPMD.
    mesh_cfg = cfg.get("mesh_devices", 1) or 1
    # 'all' = every chip across every host (the multi-controller setting)
    n_mesh = len(jax.devices()) if mesh_cfg == "all" else int(mesh_cfg)
    if multihost.process_count() > 1 and n_mesh != len(jax.devices()):
        raise ValueError(
            f"multi-host runs must shard over all {len(jax.devices())} "
            f"global devices: set mesh_devices: all (got {mesh_cfg})"
        )
    kind_tl = MODEL_GRAPH_KIND[cfg["arch"]]
    # `aggregation: auto` resolves to the explicit shard_map halo path on
    # meshes (round-5 default; _pick_aggregation); a user-pinned value is
    # honored as-is. Non-banded graphs fall back to GSPMD below. An
    # explicit `aggregation: shard_map` also engages the machinery at
    # mesh_devices: 1 (degenerate single-shard ring — useful for driving
    # the full halo path on one chip, e.g. bench.py's shardmap stages).
    explicit_sm = (
        (n_mesh > 1 and _pick_aggregation(cfg, data, kind_tl) == "shard_map")
        or str(cfg.get("aggregation", "auto")) == "shard_map"
    )
    row_mask = None
    sm_sg = None
    if n_mesh > 1 or explicit_sm:
        from ..parallel import make_mesh, shard_graph_inputs
        from ..parallel.mesh import replicated

        mesh = make_mesh(n_mesh)
        if explicit_sm:
            from ..kernels.bsda import pad_bsda_chunks
            from ..parallel.shardmap_step import partition_bsda

            # route the per-shard dense aggregation through the banded
            # Pallas kernel (default on TPU): N-chip training inherits the
            # single-chip kernel win instead of falling back to the einsum.
            # GAT's chunk-pair attention runs the XLA formulation per shard
            # (sharded_gat_attend) — no linear-kernel tables needed.
            sm_pk = cfg.get("shard_map_pallas", "auto")
            kind_sm = kind_tl
            use_pk = (
                jax.default_backend() == "tpu" and kind_sm != "gat"
                if sm_pk == "auto" else bool(sm_pk)
            )
            gops_sm = pad_bsda_chunks(gops, n_mesh)
            try:
                sm_sg = partition_bsda(gops_sm, n_mesh, use_pallas=use_pk)
                gops = gops_sm
            except ValueError as exc:
                if str(cfg.get("aggregation", "auto")) == "shard_map":
                    raise  # explicitly requested; surface the reason
                print(f"[MESH] graph not banded for boundary-only halo "
                      f"exchange ({exc}); falling back to GSPMD einsum")
                explicit_sm = False
                # rebuild the GSPMD-flavored encoding on the already-
                # renumbered data: bf16/f32 weights + transpose tables for
                # the 2x-faster backward (GAT stays transpose-free so the
                # model's fused dispatch falls back to the partitionable
                # XLA attention)
                from ..kernels.bsda import build_bsda_for_kind

                gops = build_bsda_for_kind(
                    data.edge_index, data.num_nodes, kind_sm,
                    depth=int(cfg.get("bsda_depth", 3)),
                    a_dtype=(
                        "bfloat16" if cfg.get("amp", False) else "float32"
                    ),
                    transpose=kind_sm != "gat",
                )
        if explicit_sm:
            x, y_all, t_all, train_mask_f, row_mask, _, n_pad = (
                shard_graph_inputs(mesh, data, gops, shard_tables=False)
            )
        else:
            x, y_all, t_all, train_mask_f, row_mask, gops, n_pad = (
                shard_graph_inputs(mesh, data, gops)
            )
        rep = replicated(mesh)
        params = jax.device_put(params, rep)
        state = jax.device_put(state, rep)
        opt_state = jax.device_put(opt_state, rep)
        print(f"[MESH] training sharded over {n_mesh} devices "
              f"({n_pad} padded rows, "
              f"{'explicit shard_map' if explicit_sm else 'GSPMD'})")
    else:
        # pad node arrays to the BSDA chunk grid once: without this every
        # spmm call pays two full-array copies (XLA materializes the
        # pad-concat and the [:n] slice even for a 7-row pad). Padded rows
        # are unlabeled, edge-free, and excluded from BN via row_mask.
        from ..kernels.bsda import BsdaGraph

        n0 = data.num_nodes
        n_target = (
            gops.num_chunks * gops.chunk
            if isinstance(gops, BsdaGraph) else n0
        )
        pad = n_target - n0

        def pad_rows(a, fill=0):
            if pad == 0:
                return a
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, widths, constant_values=fill)

        x = jnp.asarray(pad_rows(data.x))
        y_all = jnp.asarray(pad_rows(np.maximum(data.y, 0).astype(np.int32)))
        t_all = jnp.asarray(pad_rows(data.timestep.astype(np.int32), fill=1))
        train_mask_f = jnp.asarray(
            pad_rows(data.train_mask.astype(np.float32))
        )
        if pad:
            row_mask = jnp.asarray(
                (np.arange(n_target) < n0).astype(np.float32)
            )
    val_idx = jnp.asarray(np.where(data.val_mask)[0].astype(np.int32))
    if n_mesh > 1:
        # every input to the global-mesh jit must live on the global mesh
        # (multi-host forbids mixing process-local and global arrays)
        val_idx = jax.device_put(val_idx, rep)
    t_idx_arg = t_all if model.uses_time_embed else None
    use_time_loss = str(cfg.get("time_loss_weighting", "none")) != "none"

    # NB: graph arrays are jit ARGUMENTS, not closure constants — closures
    # would embed hundreds of MB of tables/features into the compile payload
    # (pathological for remote-compile setups) and re-upload per retrace.
    # Train + val-eval are ONE fused executable per epoch returning a single
    # vector [probs_val..., loss]: one dispatch and one device->host
    # transfer per epoch (device round-trips dominate epoch time on
    # high-latency links; the reference pulls full-graph probs each epoch,
    # train_gnn.py:254-257).
    if explicit_sm:
        from ..models.losses import make_loss_parts
        from ..parallel.shardmap_step import make_shardmap_train_step

        if cfg.get("class_weight_pos", "auto") == "auto":
            cw = class_weights(data.y[data.train_mask])
        else:
            cw = np.array([1.0, float(cfg["class_weight_pos"])], np.float32)
        t_train = data.timestep[data.train_mask]
        loss_parts = make_loss_parts(
            cfg, cw, int(t_train.min()), int(t_train.max())
        )
        sm_step = make_shardmap_train_step(mesh, model, tx, loss_parts, sm_sg)

        @jax.jit
        def _fuse(probs, loss, val_idx):
            return jnp.concatenate(
                [probs[val_idx], loss[None].astype(probs.dtype)]
            )

        def epoch_step(params, state, opt_state, rng, x, gops_, t_):
            p, s, o, loss, probs = sm_step(
                params, state, opt_state, rng, x, y_all, t_all,
                train_mask_f, row_mask, sm_sg,
            )
            return p, s, o, _fuse(probs, loss, val_idx)
    else:
        # NB: device data (labels/masks/val_idx) are ARGUMENTS, not closures
        # — multi-host jit forbids closing over global arrays, and closures
        # re-upload per retrace
        @jax.jit
        def _gspmd_step(params, state, opt_state, rng, x, gops, t_idx_arg,
                        y_all, t_all, train_mask_f, row_mask, val_idx):
            def lf(p):
                logits, new_state = model.apply(
                    p, state, x, gops, t_idx_arg, training=True, rng=rng,
                    row_mask=row_mask,
                )
                loss = loss_fn(
                    p, logits, y_all, t_all if use_time_loss else None,
                    train_mask_f,
                )
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)

            logits, _ = model.apply(
                new_params, new_state, x, gops, t_idx_arg, training=False
            )
            probs_val = jax.nn.softmax(logits, axis=1)[:, 1][val_idx]
            fused = jnp.concatenate(
                [probs_val, loss[None].astype(probs_val.dtype)]
            )
            return new_params, new_state, new_opt, fused

        def epoch_step(params, state, opt_state, rng, x, gops_, t_):
            return _gspmd_step(
                params, state, opt_state, rng, x, gops_, t_,
                y_all, t_all, train_mask_f, row_mask, val_idx,
            )

    y_val_bin = (data.y[data.val_mask] == 1).astype(int)

    best_val, bad = -1.0, 0
    best_params, best_state = params, state
    patience = int(cfg.get("patience", 20))
    start_epoch = 1
    ckpt_every = int(cfg.get("checkpoint_every", 0) or 0)

    if cfg.get("resume", False) and checkpoint.has_resume(outdir):
        (params, state, opt_state, start_epoch, best_val, bad,
         best_params, best_state) = checkpoint.load_resume(
            outdir, params, state, opt_state
        )
        start_epoch += 1
        print(f"[RESUME] from epoch {start_epoch} (best_val={best_val:.4f})")

    rng = jax.random.key(cfg.get("seed", 42) + 1)
    epochs_run = 0
    profile_dir = cfg.get("profile_dir")

    # epochs_per_sync: 'auto' (default) runs the K-epoch device-side scan
    # with K=8 on TPU — decisions are proven identical to the serial loop
    # (tests/test_train.py::test_epochs_per_sync_scan_matches_serial), and
    # the per-epoch device->host sync otherwise bounds the epoch rate
    # (~30 ms through a relayed TPU; docs/PERF_NOTES.md round 3). On
    # CPU/debug backends the sync is cheap and the serial loop's per-epoch
    # logging is worth more, so auto stays serial there. An integer pins K
    # explicitly; 1 forces the serial loop.
    k_cfg = cfg.get("epochs_per_sync", "auto")
    if k_cfg in (None, "auto"):
        k_sync = 8 if jax.default_backend() == "tpu" else 1
        if profile_dir and k_sync > 1:
            # jax.profiler trace capture brackets individual epochs, which
            # only exist host-side in the serial loop — a K-epoch scan
            # would silently capture nothing. Auto defers to profiling; an
            # explicit integer K overrides (the user asked for the scan).
            print("[PROFILE] profile_dir set: epochs_per_sync auto -> 1 "
                  "(serial loop; pin an integer K to override)")
            k_sync = 1
    else:
        k_sync = int(k_cfg) or 1
    if k_sync > 1:
        # ---- K-epoch device-side scan (one host sync per K epochs) ----
        # The per-epoch device->host sync costs ~30 ms through a relayed
        # TPU and bounds the epoch rate even with the software-pipelined
        # loop below. With `epochs_per_sync: K` the ENTIRE early-stopping
        # loop — val PR-AUC (tie-exact, utils/metrics.py
        # pr_auc_illicit_device), best-(params, state) tracking, patience
        # counting — runs on device inside one lax.scan, frozen via
        # lax.cond once patience is exhausted; the host reads a 3K-float
        # report per block and re-dispatches. Same per-epoch decisions as
        # the serial loop (the host logs the device-computed PR values);
        # checkpoints land on block boundaries.
        y_val_dev = jnp.asarray(y_val_bin.astype(np.int32))
        if n_mesh > 1:
            y_val_dev = jax.device_put(y_val_dev, rep)
        max_ep = int(cfg["max_epochs"])
        total = max_ep - start_epoch + 1

        def scan_body(carry, _):
            p, s, o, key, bval, bad_c, bp, bs, done = carry
            active = jnp.logical_and(bad_c < patience, done < total)

            def do(_):
                key2, step_rng = jax.random.split(key)
                p2, s2, o2, fused = epoch_step(
                    p, s, o, step_rng, x, gops, t_idx_arg
                )
                probs_val = fused[:-1]
                loss = fused[-1]
                pr = M.pr_auc_illicit_device(
                    y_val_dev, probs_val
                ).astype(jnp.float32)
                improved = pr > bval
                bval2 = jnp.where(improved, pr, bval)
                bad2 = jnp.where(improved, 0, bad_c + 1)
                bp2 = jax.tree.map(
                    lambda a, b: jnp.where(improved, a, b), p2, bp
                )
                bs2 = jax.tree.map(
                    lambda a, b: jnp.where(improved, a, b), s2, bs
                )
                out = jnp.stack([
                    loss.astype(jnp.float32), pr,
                    jnp.asarray(1.0, jnp.float32),
                ])
                return (p2, s2, o2, key2, bval2, bad2, bp2, bs2,
                        done + 1), out

            def skip(_):
                return carry, jnp.zeros(3, jnp.float32)

            return jax.lax.cond(active, do, skip, None)

        @jax.jit
        def run_block(carry):
            carry2, ys = jax.lax.scan(scan_body, carry, None, length=k_sync)
            return carry2, ys.T.reshape(-1)  # [losses K | prs K | ran K]

        carry = (
            params, state, opt_state, rng,
            jnp.asarray(best_val, jnp.float32), jnp.asarray(bad, jnp.int32),
            best_params, best_state, jnp.asarray(0, jnp.int32),
        )
        ep = start_epoch
        stopped = False
        while ep <= max_ep and not stopped:
            block_start = ep
            carry, report = run_block(carry)
            report = multihost.replicate_to_all_hosts(report)
            rh = np.asarray(report)  # single host sync per K epochs
            losses = rh[:k_sync]
            prs = rh[k_sync: 2 * k_sync]
            ran = rh[2 * k_sync:] > 0.5
            for i in range(k_sync):
                if not ran[i] or ep > max_ep:
                    stopped = stopped or bad >= patience
                    break
                loss_f, pr_val = float(losses[i]), float(prs[i])
                logger.log_epoch(ep, loss_f, pr_val)
                epochs_run += 1
                if pr_val > best_val:
                    best_val, bad = pr_val, 0
                else:
                    bad += 1
                if ep % 10 == 0 or ep == start_epoch:
                    print(
                        f"Epoch {ep:4d} | loss {loss_f:.4f} | "
                        f"val PR-AUC(illicit) {pr_val:.4f} "
                        f"(best {best_val:.4f})"
                    )
                ep += 1
                if bad >= patience:
                    print("Early stopping.")
                    stopped = True
                    break
            if (ckpt_every and multihost.is_primary() and not stopped
                    and (ep - 1) // ckpt_every > (block_start - 1) // ckpt_every):
                checkpoint.save_resume(
                    outdir, carry[0], carry[1], carry[2], ep - 1, best_val,
                    bad, best_params=carry[6], best_state=carry[7],
                )
        return carry[6], carry[7], best_val, epochs_run

    def _process(ep, fused_dev, params_e, state_e, opt_e):
        """Host-side tail of one epoch: pull the fused vector, compute val
        PR-AUC, track best, checkpoint, decide early stop. Runs while the
        NEXT epoch executes on device (software pipelining: the
        device->host sync latency — ~30 ms through the axon relay —
        overlaps the next step instead of serializing the loop)."""
        nonlocal best_val, bad, best_params, best_state, epochs_run
        fused_h = np.asarray(fused_dev)  # single host sync per epoch
        p_val, loss_f = fused_h[:-1], float(fused_h[-1])
        pr_val = 0.0 if p_val.size == 0 else M.pr_auc_illicit(y_val_bin, p_val)
        logger.log_epoch(ep, loss_f, pr_val)
        epochs_run += 1

        if pr_val > best_val:
            best_val = pr_val
            best_params, best_state = params_e, state_e
            bad = 0
        else:
            bad += 1

        if ep % 10 == 0 or ep == 1:
            print(
                f"Epoch {ep:4d} | loss {loss_f:.4f} | "
                f"val PR-AUC(illicit) {pr_val:.4f} (best {best_val:.4f})"
            )
        if ckpt_every and ep % ckpt_every == 0 and multihost.is_primary():
            checkpoint.save_resume(
                outdir, params_e, state_e, opt_e, ep, best_val, bad,
                best_params=best_params, best_state=best_state,
            )
        if bad >= patience:
            print("Early stopping.")
            return True
        return False

    pending = None
    for epoch in range(start_epoch, int(cfg["max_epochs"]) + 1):
        if profile_dir and epoch == start_epoch + 3:
            try:
                jax.profiler.start_trace(profile_dir)
            except Exception as exc:  # profiling is best-effort on relays
                print(f"[PROFILE] start_trace failed: {exc}")
                profile_dir = None
        rng, step_rng = jax.random.split(rng)
        params, state, opt_state, fused = epoch_step(
            params, state, opt_state, step_rng, x, gops, t_idx_arg
        )
        # multi-host: replicate the fused (val-probs, loss) vector so every
        # host reads it and takes the same early-stop decision (no-op
        # single-process)
        fused = multihost.replicate_to_all_hosts(fused)
        if profile_dir and epoch == start_epoch + 5:
            try:
                jax.profiler.stop_trace()
            except Exception as exc:
                print(f"[PROFILE] stop_trace failed: {exc}")
        # process the PREVIOUS epoch while this one runs on device (the
        # early-stop check therefore lags one epoch: same decisions as the
        # reference's serial loop, one discarded in-flight epoch at stop)
        if pending is not None and _process(*pending):
            pending = None
            break
        pending = (epoch, fused, params, state, opt_state)
    if pending is not None:
        _process(*pending)

    return best_params, best_state, best_val, epochs_run


def _finalize(cfg, outdir, data, model, gops, params, state, best_val, logger,
              train_seconds: float, epochs_run: int) -> dict:
    """Post-training tail shared by full-batch and mini-batch paths:
    full-graph eval, temperature scaling, artifacts, threshold + metrics,
    checkpoint, optional hub ablation, config echo (train_gnn.py:416-564)."""
    if multihost.process_count() > 1:
        # the trained params/state live replicated on the GLOBAL mesh; the
        # final full-graph eval is cheap and runs per-host on local devices
        # (fully-replicated arrays may be fetched host-side)
        def _local(t):
            return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), t)

        params, state = _local(params), _local(state)
    x = jnp.asarray(data.x)
    t_all = jnp.asarray(data.timestep.astype(np.int32))
    t_idx_arg = t_all if model.uses_time_embed else None

    @jax.jit
    def eval_full(params, state, x, gops, t_idx_arg):
        logits, _ = model.apply(params, state, x, gops, t_idx_arg, training=False)
        return logits

    logits_full = np.asarray(eval_full(params, state, x, gops, t_idx_arg))
    y_val_bin = (data.y[data.val_mask] == 1).astype(int)

    temp = 1.0
    if bool(cfg.get("calibrate_temperature", True)):
        temp = calibrate.fit_temperature(logits_full[data.val_mask], y_val_bin)
        print(f"[CALIB] temperature T={temp:.4f}")

    def probs_from_logits(lg):
        z = lg / temp
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return (e / e.sum(axis=1, keepdims=True))[:, 1]

    primary = multihost.is_primary()
    probs = probs_from_logits(logits_full)
    metrics = finish_run(cfg, outdir, data, probs, best_val, extra={
        "train_seconds": float(train_seconds),
        "epochs_run": int(epochs_run),
        "edges_per_s": float(data.num_edges) * epochs_run / max(train_seconds, 1e-9),
        "temperature": float(temp),
    }, write=primary)
    if primary:
        checkpoint.save_best(outdir, params, state)

    frac = float(cfg.get("ablate_hubs_frac", 0.0) or 0.0)
    if frac > 0:
        ei_abl, num_hubs = remove_hub_edges(data.edge_index, data.num_nodes, frac)
        gops_abl = prepare_graph_ops(
            ei_abl, data.num_nodes, MODEL_GRAPH_KIND[cfg["arch"]]
        )
        logits_abl, _ = model.apply(
            params, state, x, gops_abl, t_idx_arg, training=False
        )
        p_abl = probs_from_logits(np.asarray(logits_abl))
        y_te = data.y[data.test_mask]
        hub_metrics = test_metrics_at_threshold(
            cfg, (y_te == 1).astype(int), p_abl[data.test_mask],
            metrics["threshold"],
        )
        hub_metrics.update(
            n_hubs=int(num_hubs),
            hub_fraction=frac,
            n_edges_remaining=int(ei_abl.shape[1]),
        )
        if primary:
            save_json(os.path.join(outdir, "metrics_hub_removed.json"), hub_metrics)

    if primary:
        with open(os.path.join(outdir, "config_used.yaml"), "w") as f:
            yaml.safe_dump(cfg, f)
        print(json.dumps(metrics, indent=2))
    logger.close()
    multihost.barrier("finalize")  # all hosts exit the run together
    return metrics


def test_metrics_at_threshold(cfg: dict, y_bin: np.ndarray, p_te: np.ndarray,
                              thr: float) -> dict:
    """The reference's standard test-metric block at a fixed threshold
    (train_gnn.py:477-495), shared by the final eval, the inline hub
    ablation, and the standalone analysis tools."""
    return dict(
        pr_auc_illicit=M.pr_auc_illicit(y_bin, p_te),
        roc_auc=M.roc_auc_illicit(y_bin, p_te),
        f1_illicit_at_thr=M.f1_at_threshold(y_bin, p_te, thr),
        threshold=float(thr),
        precision_at_k=M.precision_at_k(y_bin, p_te, int(cfg.get("topk", 100))),
        recall_at_precision=M.recall_at_precision(
            y_bin, p_te, float(cfg.get("precision_target", 0.90) or 0.90)
        ),
        ece=M.expected_calibration_error(y_bin, p_te),
        n_test=int(len(y_bin)),
    )


def finish_run(cfg: dict, outdir: str, data, probs: np.ndarray, best_val: float,
               extra: Optional[dict] = None, write: bool = True) -> dict:
    """Shared artifact + metrics emission: the run-directory contract
    (train_gnn.py:456-523). `probs` are calibrated P(illicit) for all nodes.
    `write=False` (non-primary hosts) computes metrics without touching disk."""
    y_np = data.y
    val_mask, test_mask = data.val_mask, data.test_mask
    timestep_np = data.timestep

    y_val, p_val = y_np[val_mask], probs[val_mask]
    y_te, p_te = y_np[test_mask], probs[test_mask]

    # node indices reported in ON-DISK numbering even if training ran on a
    # renumbered graph (GraphData.renumber)
    orig = (
        data.orig_index
        if data.orig_index is not None
        else np.arange(len(y_np), dtype=np.int64)
    )
    if write:
        np.save(os.path.join(outdir, "scores_val.npy"), p_val)
        np.save(os.path.join(outdir, "y_val.npy"), y_val)
        np.save(os.path.join(outdir, "node_idx_val.npy"), orig[val_mask])
        np.save(os.path.join(outdir, "timestep_val.npy"), timestep_np[val_mask])
        np.save(os.path.join(outdir, "scores_test.npy"), p_te)
        np.save(os.path.join(outdir, "y_test.npy"), y_te)
        np.save(os.path.join(outdir, "node_idx_test.npy"), orig[test_mask])
        np.save(os.path.join(outdir, "timestep_test.npy"), timestep_np[test_mask])

    # threshold selection (train_gnn.py:466-474)
    if cfg.get("use_val_for_thresholds", True):
        pt = float(cfg.get("precision_target", 0.0) or 0.0)
        if pt > 0:
            thr = M.pick_threshold_for_precision((y_val == 1).astype(int), p_val, pt)
        else:
            thr, _ = M.pick_threshold_max_f1((y_val == 1).astype(int), p_val)
    else:
        thr, _ = M.pick_threshold_max_f1((y_te == 1).astype(int), p_te)

    y_bin = (y_te == 1).astype(int)
    metrics = test_metrics_at_threshold(cfg, y_bin, p_te, thr)
    metrics["best_val_pr_auc"] = best_val

    test_ts = timestep_np[test_mask]
    if test_ts.size > 0:
        _, pr_by_t = M.per_timestep_pr_auc(y_bin, p_te, test_ts)
        metrics["test_pr_auc_by_time"] = pr_by_t
        if pr_by_t:
            metrics["pr_auc_last1"] = float(pr_by_t[-1])
            metrics.update(M.tail_means(pr_by_t, ks=(3, 5)))
    if extra:
        metrics.update(extra)

    if write:
        save_json(os.path.join(outdir, "metrics.json"), metrics)
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    main(cfg)
