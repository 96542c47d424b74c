"""Similarity search over embedding columns (list<float>).

- ``knn_brute``: exact cosine top-k — per-batch numpy matmul against a
  BROADCAST query matrix (ray.put once; each task reads the same plasma
  object), local top-k per block, tiny global reduce. The baseline.
- ``knn_ivf``: the scale path — coarse k-means centroids (sampled,
  driver-side numpy), vectors pre-assigned to cells in one pass
  (``groupby(cell)`` layout), queries probe only the nearest ``n_probe``
  cells, so each query touches ~n_probe/C of the corpus instead of all
  of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _norm_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def knn_brute(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank) — float scores stay internal
    so the result is oracle-comparable without float-hash hazards.
    """
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)
    qid_ref = ray.put(list(query_ids))

    def local_topk(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        qids = ray.get(qid_ref)
        X = _norm_rows(_stack(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        S = Qm @ X.T  # (q, n)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), S.shape[1])
        for qi in range(S.shape[0]):
            part = np.argpartition(-S[qi], kk - 1)[:kk]
            for j in part:
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(S[qi, j])
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, grp in local.groupby("query_id"):
        if exclude_self:
            grp = grp[grp["neighbor_id"] != qid]
        # deterministic ordering: score desc, id asc for ties
        grp = grp.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(grp.iterrows(), start=1):
            rows.append((qid, r["neighbor_id"], rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]).astype(
        {"query_id": "int64", "neighbor_id": "int64", "rank": "int64"}
    )


def kmeans_centroids(sample: np.ndarray, n_cells: int, iters: int = 8) -> np.ndarray:
    """Tiny k-means (driver-side, seeded) over a sample → cell centroids."""
    rng = np.random.default_rng(0xCE11)
    X = _norm_rows(sample)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _norm_rows(C)
    return C


def knn_ivf(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 2048,
) -> pd.DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells only."""
    sample = _stack(
        pa.concat_tables(
            list(
                ds.select_columns([vec_col])
                .limit(sample_rows)
                .iter_batches(batch_format="pyarrow")
            )
        )[vec_col]
    )
    C = kmeans_centroids(sample, n_cells)
    c_ref = ray.put(C)

    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (q, n_probe)
    wanted = set(int(c) for row in probe_cells for c in row)

    def assign_and_filter(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        X = _norm_rows(_stack(t[vec_col]))
        cells = np.argmax(X @ Cm.T, axis=1)
        mask = np.isin(cells, list(wanted))
        return t.filter(pa.array(mask))

    pruned = ds.map_batches(assign_and_filter, batch_format="pyarrow")
    return knn_brute(pruned, Q, query_ids, k=k, id_col=id_col, vec_col=vec_col)
