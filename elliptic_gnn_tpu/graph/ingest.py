"""Robust Elliptic CSV ingestion -> GraphData.

Behavior-compatible with the reference loader
(/root/reference/src/data/dataset_elliptic.py:49-265):
  - label mapping {class1/1/illicit -> 1, class2/2/licit -> 0, unknown -> -1}
  - timestep source: classes.csv `time_step`/`timestep` column if present,
    else autodetected from the features CSV's 2nd column via the 1..49
    integer heuristic
  - headerless features CSV: col0 = txId, (col1 = timestep), rest = features
  - edgelist header sniffing ('txId1,txId2' or headerless)
  - edges with unmapped endpoints dropped; intra-timestep edges enforced
Unlike the reference's per-edge Python dict lookups (~234k iterations,
dataset_elliptic.py:232-233), the txId -> row-index mapping here is a
vectorized sorted-array binary search; when the native C++ ingest library is
built (native/), it is used for the large features CSV parse.
"""
from __future__ import annotations

import os
import warnings
from typing import Dict, Tuple

import numpy as np

LABEL_STR_MAP = {
    "class1": 1,
    "1": 1,
    "illicit": 1,
    "class2": 0,
    "2": 0,
    "licit": 0,
    "unknown": -1,
    "-1": -1,
}


def map_labels(values) -> np.ndarray:
    """Vectorized label normalization to {-1, 0, 1}."""
    out = np.full(len(values), -1, dtype=np.int32)
    for i, v in enumerate(values):
        s = str(v).strip().lower()
        out[i] = LABEL_STR_MAP.get(s, -1)
    return out


def looks_like_timestep(col: np.ndarray, t_max: int = 49) -> bool:
    """Heuristic: integer-valued column within [1..t_max]
    (dataset_elliptic.py:31-46)."""
    try:
        vals = col.astype(np.float64)
    except (TypeError, ValueError):
        return False
    vals = vals[~np.isnan(vals)]
    if vals.size == 0:
        return False
    return bool(
        vals.min() >= 1
        and vals.max() <= t_max
        and np.mean(np.round(vals) == vals) > 0.95
    )


def _vectorized_tx_to_idx(tx_ids: np.ndarray, queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Map txIds -> row indices via binary search (native C++ when built).
    Returns (idx, found_mask)."""
    from ..native import map_ids

    return map_ids(tx_ids, queries)


def load_elliptic_as_graph(
    data_dir: str,
    features_csv: str = "elliptic_txs_features.csv",
    classes_csv: str = "elliptic_txs_classes.csv",
    edgelist_csv: str = "elliptic_txs_edgelist.csv",
) -> Tuple["GraphData", Dict]:
    """Parse the three raw CSVs into a GraphData + meta dict."""
    import pandas as pd

    from .data import GraphData

    f_path = os.path.join(data_dir, features_csv)
    c_path = os.path.join(data_dir, classes_csv)
    e_path = os.path.join(data_dir, edgelist_csv)

    # ---- classes: txId, class, optional time column ----
    df_cls = pd.read_csv(c_path)
    df_cls.columns = [str(c).strip() for c in df_cls.columns]
    if "txId" not in df_cls.columns:
        for col in df_cls.columns:
            if col.lower().startswith("tx"):
                df_cls = df_cls.rename(columns={col: "txId"})
                break
    has_cls_ts = False
    if "time_step" in df_cls.columns:
        df_cls = df_cls.rename(columns={"time_step": "timestep"})
        has_cls_ts = True
    elif "timestep" in df_cls.columns:
        has_cls_ts = True
    if "class" not in df_cls.columns:
        for col in df_cls.columns:
            if col.lower().startswith("class"):
                df_cls = df_cls.rename(columns={col: "class"})
                break

    cls_tx = pd.to_numeric(df_cls["txId"], errors="raise").to_numpy(np.int64)
    cls_label = map_labels(df_cls["class"].tolist())
    cls_ts = (
        pd.to_numeric(df_cls["timestep"], errors="raise").to_numpy(np.int64)
        if has_cls_ts
        else None
    )

    # ---- features: headerless, col0 txId, col1 maybe timestep ----
    # (the big file — hundreds of MB on the real dataset — parsed by the
    # native mmap CSV reader when built, ~10x faster than pandas)
    from ..native import parse_numeric_csv

    raw = parse_numeric_csv(f_path)
    # accept the native parse only when column 0 is a plausible id column
    # (finite integers); the strict native parser already bailed (-> None)
    # on quoted/ragged/textual content and >15-digit ids, so anything else
    # falls through to the full pandas reader
    if (
        raw is not None and raw.shape[1] >= 2
        and np.isfinite(raw[:, 0]).all()
        and (np.mod(raw[:, 0], 1) == 0).all()
    ):
        feat_tx = raw[:, 0].astype(np.int64)
        second_col = raw[:, 1].astype(np.float64)
        feat_has_ts = looks_like_timestep(second_col)
        if feat_has_ts:
            feat_ts = second_col.astype(np.int64)
            x = raw[:, 2:].astype(np.float32)
        else:
            feat_ts = None
            x = raw[:, 1:].astype(np.float32)
    else:
        df_feat = pd.read_csv(f_path, header=None)
        if df_feat.shape[1] < 2:
            raise ValueError("features CSV malformed (needs >= txId + 1 column)")
        feat_tx = pd.to_numeric(df_feat.iloc[:, 0], errors="raise").to_numpy(np.int64)
        second_col = pd.to_numeric(df_feat.iloc[:, 1], errors="coerce").to_numpy(np.float64)
        feat_has_ts = looks_like_timestep(second_col)
        if feat_has_ts:
            feat_ts = second_col.astype(np.int64)
            x = df_feat.iloc[:, 2:].to_numpy(np.float32)
        else:
            feat_ts = None
            x = df_feat.iloc[:, 1:].to_numpy(np.float32)

    n = feat_tx.size

    # ---- timestep source resolution (classes preferred, then features) ----
    if has_cls_ts:
        ts_source = "CLASSES"
        idx, found = _vectorized_tx_to_idx(feat_tx, cls_tx)
        timestep = np.zeros(n, dtype=np.int64)
        timestep[idx[found]] = cls_ts[found]
        if not found.all():
            warnings.warn("some classes.csv txIds not present in features.csv")
        if feat_has_ts:
            missing = timestep == 0
            timestep[missing] = feat_ts[missing]
        n_unresolved = int((timestep == 0).sum())
        if n_unresolved:
            # the reference would fail loudly on the NaN join here; these
            # rows are unlabeled so splits are unaffected, but t=0 (outside
            # the documented 1..T range) would feed time embeddings silently
            warnings.warn(
                f"{n_unresolved} feature rows missing from classes.csv keep "
                "timestep=0 (outside 1..T); they are unlabeled but feed t=0 "
                "into time embeddings and message passing."
            )
    elif feat_has_ts:
        ts_source = "FEATURES"
        timestep = feat_ts.copy()
    else:
        raise ValueError(
            "No timestep column found in classes and features did not contain "
            "a valid timestep column (expected classes 'time_step'/'timestep' "
            "or features col 2 in 1..49)."
        )
    print(f"[TS] using timestep from: {ts_source}")

    # ---- labels joined onto feature rows (unlabeled -> -1) ----
    y = np.full(n, -1, dtype=np.int32)
    idx, found = _vectorized_tx_to_idx(feat_tx, cls_tx)
    y[idx[found]] = cls_label[found]

    # ---- edges: header sniff, vectorized mapping, intra-timestep filter ----
    # sniff the FIRST LINE textually: a header row ('txId1,txId2') has
    # non-numeric cells; dtype-based sniffing mis-fired on headerless files
    # (pandas promotes the first data row to column names, leaving numeric
    # dtypes either way — the first edge silently became the header)
    try:
        with open(e_path, "r") as fh:
            first = fh.readline()
        cells = [c.strip().strip('"').strip("'")
                 for c in first.replace("\r", "").split(",")]

        def _numeric(s: str) -> bool:
            try:
                float(s)
                return True
            except ValueError:
                return False

        has_header = len(cells) >= 2 and not all(_numeric(c) for c in cells)
        df_edge = pd.read_csv(e_path, header=0 if has_header else None)
    except Exception:
        df_edge = pd.read_csv(e_path, header=None)

    if {"txId1", "txId2"}.issubset(set(df_edge.columns)):
        e_src = df_edge["txId1"]
        e_dst = df_edge["txId2"]
    else:
        e_src = df_edge.iloc[:, 0]
        e_dst = df_edge.iloc[:, 1]
    e_src = pd.to_numeric(e_src, errors="coerce").to_numpy(np.float64)
    e_dst = pd.to_numeric(e_dst, errors="coerce").to_numpy(np.float64)
    ok = ~(np.isnan(e_src) | np.isnan(e_dst))
    e_src = e_src[ok].astype(np.int64)
    e_dst = e_dst[ok].astype(np.int64)
    edges_total = e_src.size

    src_idx, src_found = _vectorized_tx_to_idx(feat_tx, e_src)
    dst_idx, dst_found = _vectorized_tx_to_idx(feat_tx, e_dst)
    keep = src_found & dst_found
    src_idx, dst_idx = src_idx[keep], dst_idx[keep]
    n_mapped = int(keep.sum())
    if n_mapped == 0 and edges_total > 0:
        warnings.warn(
            "No edges mapped to known txIds. If testing with a partial "
            "features CSV this is expected."
        )

    same_t = timestep[src_idx] == timestep[dst_idx]
    src_idx, dst_idx = src_idx[same_t], dst_idx[same_t]
    edge_index = np.stack([src_idx, dst_idx]).astype(np.int32)

    print(
        f"[EDGES] total_in_csv={edges_total} mapped={n_mapped} "
        f"same_t={int(same_t.sum())} kept_in_graph={edge_index.shape[1]}"
    )

    data = GraphData(
        x=x.astype(np.float32),
        y=y,
        timestep=timestep.astype(np.int32),
        edge_index=edge_index,
    )
    meta = data.meta()
    meta["timestep_source"] = ts_source
    return data, meta
