"""Fixed-shape neighbor-sampled mini-batch training (TPU NeighborLoader).

The reference's mini-batch path uses PyG's NeighborLoader — C++ host-side
sampling producing variable-size subgraphs (train_gnn.py:329-348). Variable
shapes force recompilation on TPU, so this module re-designs sampling around
*static* shapes:

  - layered fanout sampling (with replacement) over a host-side CSR of
    incoming edges, vectorized in numpy;
  - the union subgraph is padded to a fixed node budget N_SUB and encoded
    as a single-bucket fixed-width ELL table (every row has width
    W = 1 + sum(fanout)), so one jit compilation serves every batch;
  - loss is computed on the first `batch_size` seed rows of each batch,
    like the reference (train_gnn.py:227-233).

Full-batch is the primary TPU path (the whole Elliptic graph fits in HBM);
sampling exists for API parity and for graphs that outgrow a chip.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kernels.ell import EllGraph, build_csr
from ..models import MODEL_GRAPH_KIND
from ..utils import metrics as M


class NeighborSampler:
    """Host-side layered fanout sampler over incoming edges."""

    def __init__(self, edge_index: np.ndarray, num_nodes: int, fanout, batch_size: int,
                 kind: str, seed: int = 0):
        self.num_nodes = num_nodes
        self.fanout = [int(f) for f in fanout]
        self.batch_size = int(batch_size)
        self.kind = kind
        self.rng = np.random.default_rng(seed)
        indptr, col, _ = build_csr(
            np.asarray(edge_index[0], np.int64), np.asarray(edge_index[1], np.int64),
            num_nodes,
        )
        self.indptr, self.col = indptr, col
        self.deg = np.diff(indptr)
        # static shape budgets
        mult = 1
        budget = self.batch_size
        for f in self.fanout:
            mult *= f
            budget += self.batch_size * mult
        self.n_sub = int(min(budget, num_nodes))
        # row width: self-loop slot + per-hop fanout contributions
        self.width = 1 + sum(self.fanout)

    def _sample_neighbors(self, frontier: np.ndarray, f: int):
        """For each frontier node draw f in-neighbors with replacement;
        nodes with deg 0 yield masked slots."""
        deg = self.deg[frontier]
        has = deg > 0
        r = self.rng.random((frontier.size, f))
        offs = np.floor(r * np.maximum(deg, 1)[:, None]).astype(np.int64)
        idx = self.indptr[frontier][:, None] + offs
        nbr = self.col[np.minimum(idx, self.col.size - 1 if self.col.size else 0)]
        mask = np.broadcast_to(has[:, None], nbr.shape)
        return nbr, mask

    def sample_batch(self, seeds: np.ndarray):
        """Returns (node_ids [N_SUB], ell: EllGraph, n_seed_valid, seed_mask).

        node_ids: global ids, seeds first; padding rows repeat node 0 with
        zeroed adjacency. The ELL table indexes *local* rows.
        """
        b = self.batch_size
        n_seed = seeds.size
        seeds_p = np.zeros(b, dtype=np.int64)
        seeds_p[:n_seed] = seeds

        # collect sampled edges (global src, global dst)
        all_src, all_dst, all_ok = [], [], []
        frontier = seeds_p[:n_seed]
        for f in self.fanout:
            nbr, mask = self._sample_neighbors(frontier, f)
            dst = np.repeat(frontier, f).reshape(frontier.size, f)
            all_src.append(nbr[mask])
            all_dst.append(dst[mask])
            frontier = np.unique(nbr[mask])
            if frontier.size == 0:
                break

        if all_src:
            e_src = np.concatenate(all_src)
            e_dst = np.concatenate(all_dst)
        else:
            e_src = np.zeros(0, np.int64)
            e_dst = np.zeros(0, np.int64)

        # local relabeling: seeds occupy rows [0, n_seed); vectorized via
        # sorted binary search (no per-edge Python dict lookups)
        uniq = np.unique(np.concatenate([seeds_p[:n_seed], e_src, e_dst]))
        rest = np.setdiff1d(uniq, seeds_p[:n_seed], assume_unique=False)
        order = np.concatenate([seeds_p[:n_seed], rest])
        if order.size > self.n_sub:
            # drop overflow nodes (and their edges) beyond the static budget
            order = order[: self.n_sub]
            kept_sorted = np.sort(order)
            in_s = kept_sorted[
                np.clip(np.searchsorted(kept_sorted, e_src), 0, order.size - 1)
            ] == e_src
            in_d = kept_sorted[
                np.clip(np.searchsorted(kept_sorted, e_dst), 0, order.size - 1)
            ] == e_dst
            keep_e = in_s & in_d
            e_src, e_dst = e_src[keep_e], e_dst[keep_e]
        sorter = np.argsort(order, kind="stable")
        order_sorted = order[sorter]
        l_src = sorter[np.searchsorted(order_sorted, e_src)].astype(np.int64)
        l_dst = sorter[np.searchsorted(order_sorted, e_dst)].astype(np.int64)

        node_ids = np.zeros(self.n_sub, dtype=np.int32)
        node_ids[: order.size] = order

        # dedup repeated sampled edges per (src, dst)
        if l_src.size:
            key = l_dst * self.n_sub + l_src
            key_u = np.unique(key)
            l_dst_u = (key_u // self.n_sub).astype(np.int64)
            l_src_u = (key_u % self.n_sub).astype(np.int64)
        else:
            l_dst_u = l_src_u = np.zeros(0, np.int64)

        nbr, w, scale = self._fixed_ell(l_src_u, l_dst_u, order.size)
        ell = EllGraph(
            nbrs=(jnp.asarray(nbr),),
            weights=(jnp.asarray(w),),
            rows=(jnp.arange(self.n_sub, dtype=jnp.int32),),
            inv_perm=jnp.arange(self.n_sub, dtype=jnp.int32),
            row_scale=(jnp.asarray(scale),),
            num_nodes=self.n_sub,
            widths=(self.width,),
            n_zero_deg=0,
        )
        seed_mask = np.zeros(b, dtype=np.float32)
        seed_mask[:n_seed] = 1.0
        return node_ids, ell, n_seed, seed_mask

    def _fixed_ell(self, l_src, l_dst, n_valid):
        """Pack local edges into a fixed [N_SUB, W] table with the model
        kind's semantics (sage: mean; gcn: self-loops + sym-norm;
        gat: self-loops + validity)."""
        n, wdt = self.n_sub, self.width
        add_loops = self.kind in ("gcn", "gat")
        nbr = np.zeros((n, wdt), dtype=np.int32)
        w = np.zeros((n, wdt), dtype=np.float32)
        fill = np.zeros(n, dtype=np.int64)

        if add_loops:
            rows = np.arange(n_valid)
            nbr[rows, 0] = rows
            w[rows, 0] = 1.0
            fill[:n_valid] = 1

        # vectorized slot assignment: sort edges by destination, compute each
        # edge's within-destination offset, truncate beyond the static width
        if l_dst.size:
            srt = np.argsort(l_dst, kind="stable")
            d_s, s_s = l_dst[srt], l_src[srt]
            counts = np.bincount(d_s, minlength=n)
            seg_start = np.cumsum(np.r_[0, counts[:-1]])
            within = np.arange(d_s.size) - seg_start[d_s] + fill[d_s]
            ok = within < wdt
            nbr[d_s[ok], within[ok]] = s_s[ok]
            w[d_s[ok], within[ok]] = 1.0
            fill = np.minimum(fill + counts, wdt)

        deg = (w > 0).sum(axis=1).astype(np.float32)
        if self.kind == "sage":
            scale = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0).astype(np.float32)
        elif self.kind == "gcn":
            dinv = np.where(deg > 0, deg**-0.5, 0.0)
            w = w * dinv[nbr] * dinv[:, None]
            scale = np.ones(n, dtype=np.float32)
        else:  # gat: validity only
            scale = np.ones(n, dtype=np.float32)
        return nbr, w.astype(np.float32), scale


def train_loop_minibatch(cfg, data, model, params, state, tx, opt_state, loss_fn,
                         logger) -> Tuple:
    """Epoch loop over sampled batches; early stopping on sampled-val PR-AUC
    (mirrors train_epoch_minibatch / eval_val_minibatch,
    train_gnn.py:212-279)."""
    kind = MODEL_GRAPH_KIND[cfg["arch"]]
    fanout = cfg.get("fanout", [10, 10])
    batch_size = int(cfg.get("batch_size", 8192))
    seed = int(cfg.get("seed", 42))
    sampler = NeighborSampler(
        data.edge_index, data.num_nodes, fanout, batch_size, kind, seed
    )

    x_full = jnp.asarray(data.x)
    y_full = jnp.asarray(np.maximum(data.y, 0).astype(np.int32))
    t_full = jnp.asarray(data.timestep.astype(np.int32))
    uses_time = model.uses_time_embed
    use_time_loss = str(cfg.get("time_loss_weighting", "none")) != "none"

    @jax.jit
    def train_step(params, state, opt_state, node_ids, ell, seed_mask, rng):
        xb = x_full[node_ids]
        tb = t_full[node_ids] if uses_time else None

        def lf(p):
            logits, new_state = model.apply(
                p, state, xb, ell, tb, training=True, rng=rng
            )
            logits_seed = logits[: seed_mask.shape[0]]
            y_seed = y_full[node_ids[: seed_mask.shape[0]]]
            t_seed = (
                t_full[node_ids[: seed_mask.shape[0]]] if use_time_loss else None
            )
            loss = loss_fn(p, logits_seed, y_seed, t_seed, seed_mask)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt, loss

    @jax.jit
    def eval_step(params, state, node_ids, ell):
        xb = x_full[node_ids]
        tb = t_full[node_ids] if uses_time else None
        logits, _ = model.apply(params, state, xb, ell, tb, training=False)
        probs = jax.nn.softmax(logits, axis=1)[:, 1]
        return probs

    train_idx = np.where(data.train_mask)[0]
    val_idx = np.where(data.val_mask)[0]
    host_rng = np.random.default_rng(seed)

    best_val, bad = -1.0, 0
    best_params, best_state = params, state
    patience = int(cfg.get("patience", 20))
    rng = jax.random.key(seed + 1)
    epochs_run = 0

    for epoch in range(1, int(cfg["max_epochs"]) + 1):
        perm = host_rng.permutation(train_idx)
        total_loss, total_n = 0.0, 0
        for i in range(0, perm.size, batch_size):
            seeds = perm[i : i + batch_size]
            node_ids, ell, n_seed, seed_mask = sampler.sample_batch(seeds)
            rng, step_rng = jax.random.split(rng)
            params, state, opt_state, loss = train_step(
                params, state, opt_state,
                jnp.asarray(node_ids), ell, jnp.asarray(seed_mask), step_rng,
            )
            total_loss += float(loss) * n_seed
            total_n += n_seed
        loss_f = total_loss / max(total_n, 1)

        ys, ps = [], []
        for i in range(0, val_idx.size, batch_size):
            seeds = val_idx[i : i + batch_size]
            node_ids, ell, n_seed, _ = sampler.sample_batch(seeds)
            probs = np.asarray(eval_step(params, state, jnp.asarray(node_ids), ell))
            ps.append(probs[:n_seed])
            ys.append(data.y[seeds])
        y_val = np.concatenate(ys) if ys else np.zeros(0)
        p_val = np.concatenate(ps) if ps else np.zeros(0)
        pr_val = (
            0.0 if y_val.size == 0 else M.pr_auc_illicit((y_val == 1).astype(int), p_val)
        )
        logger.log_epoch(epoch, loss_f, pr_val)
        epochs_run += 1

        if pr_val > best_val:
            best_val, bad = pr_val, 0
            best_params, best_state = params, state
        else:
            bad += 1
        if epoch % 10 == 0 or epoch == 1:
            print(
                f"Epoch {epoch:4d} | loss {loss_f:.4f} | "
                f"val PR-AUC(illicit) {pr_val:.4f} (best {best_val:.4f})"
            )
        if bad >= patience:
            print("Early stopping.")
            break

    return best_params, best_state, best_val, epochs_run
