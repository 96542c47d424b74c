"""Similarity search over embedding columns (list<float>).

- ``knn_brute``: exact cosine top-k — per-batch numpy matmul against a
  BROADCAST query matrix (ray.put once; each task reads the same plasma
  object), local top-k per block, tiny global reduce. The baseline.
- ``knn_ivf``: the scale path — coarse k-means centroids trained on a
  HASH-sampled subset, the corpus written ONCE hive-partitioned on
  ``cell=N/`` (``build_ivf_index``), and probes that READ only the
  ``n_probe`` nearest cell directories (``knn_ivf_probe``) — IO, not
  just compute, scales with n_probe/n_cells.
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


def pack_vectors(
    t: pa.Table, vec_col: str = "embedding", out_col: str = "emb_bin"
) -> pa.Table:
    """list<float> → fixed_size_binary so embeddings can ride through
    engine hash joins/shuffles (Ray's join rejects list-typed non-key
    payloads). Zero per-row Python: one contiguous float32 buffer,
    reinterpreted as n fixed-width binary cells."""
    if t.num_rows == 0:
        vt = t[vec_col].type
        if not pa.types.is_fixed_size_list(vt):
            raise ValueError(
                "pack_vectors: empty batch with variable-size list type — "
                "the binary width cannot be derived"
            )
        packed = pa.array([], pa.binary(vt.list_size * 4))
        return t.drop_columns([vec_col]).append_column(out_col, packed)
    X = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float32)
    n, d = X.shape
    packed = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(d * 4), n, [None, pa.py_buffer(np.ascontiguousarray(X).tobytes())]
    )
    return t.drop_columns([vec_col]).append_column(out_col, packed)


def unpack_vectors(
    t: pa.Table, bin_col: str = "emb_bin", out_col: str = "embedding"
) -> pa.Table:
    """Inverse of ``pack_vectors``: fixed_size_binary → list<float32>
    via one buffer reinterpret (no per-row work)."""
    col = t[bin_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.type.byte_width // 4
    if col.null_count:
        raise ValueError("unpack_vectors: null embedding cells")
    start = col.offset * d
    flat = np.frombuffer(col.buffers()[1], dtype=np.float32)[
        start : start + len(col) * d
    ]
    vecs = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), d)
    return t.drop_columns([bin_col]).append_column(out_col, vecs)


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
        kk = min(k + (1 if exclude_self else 0), S.shape[1])
        # vectorized emit: one argpartition over axis=1, then fancy
        # indexing — no per-(query, k) Python appends
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]  # (q, kk)
        rows = np.repeat(np.arange(S.shape[0]), kk)
        cols = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids)[rows]),
                "neighbor_id": pa.array(ids[cols]),
                "score": pa.array(S[rows, cols], pa.float64()),
            }
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if exclude_self:
        local = local[local["neighbor_id"] != local["query_id"]]
    # deterministic ordering: score desc, id asc for ties — one
    # vectorized sort + grouped head/cumcount, no per-row iteration
    out = (
        local.sort_values(
            ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id", sort=True)
        .head(k)
    )
    out = out.assign(rank=out.groupby("query_id", sort=False).cumcount() + 1)
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True).astype(
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


def hash_sample_vectors(
    ds: Dataset, id_col: str, vec_col: str, sample_rows: int
) -> np.ndarray:
    """Deterministic hash sample of ~``sample_rows`` vectors.

    A ``limit(N)`` sample is the FIRST rows — correlated with insert
    order, so centroids trained on it skew toward one corner of the
    corpus. Knuth-multiplicative hashing of the id column gives an
    unbiased spread in one streamed pass."""
    n = ds.count()
    rate = min(1.0, sample_rows / max(1, n))
    thresh = np.uint64(int(rate * (1 << 24)))

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)  # top 24 bits
        return t.select([vec_col]).filter(pa.array(h < thresh))

    parts = list(
        ds.select_columns([id_col, vec_col])
        .map_batches(keep, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return np.empty((0, 0), dtype=np.float64)
    return _stack(pa.concat_tables(parts)[vec_col])


def build_ivf_index(
    ds: Dataset,
    index_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 2048,
) -> str:
    """ONE pass writes the corpus hive-partitioned on ``cell=N/`` plus the
    centroid matrix — probing then READS only n_probe directories instead
    of scanning every vector (the r1 design pruned compute, not IO; at
    100 TB the IO is the cost)."""
    import os

    sample = hash_sample_vectors(ds, id_col, vec_col, sample_rows)
    C = kmeans_centroids(sample, n_cells)
    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        X = _norm_rows(_stack(t[vec_col]))
        cells = np.argmax(X @ Cm.T, axis=1).astype(np.int64)
        return t.append_column("cell", pa.array(cells))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    import json

    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "n": int(ds.count()),
                "n_cells": int(n_cells),
                "probe": _content_probe(ds, id_col, vec_col),
            },
            f,
        )
    return index_dir


def _content_probe(ds: Dataset, id_col: str, vec_col: str) -> str:
    """Cheap corpus fingerprint for cache invalidation: sha1 of the first
    row's id + vector bytes. Heuristic — a regenerated corpus whose FIRST
    row is bit-identical but whose tail changed would still hit the
    cache; combined with the row count it catches the regenerated-table
    case without scanning the corpus."""
    import hashlib as _hl

    row = ds.take(1)
    if not row:
        return "empty"
    vec = np.asarray(row[0][vec_col], dtype=np.float64).tobytes()
    return _hl.sha1(str(row[0][id_col]).encode() + vec).hexdigest()


def _probe_files(index_dir: str, cells: set[int]) -> tuple[list[str], int]:
    """(files in the probed cell dirs, total files in the index)."""
    import glob

    all_files = sorted(glob.glob(f"{index_dir}/cell=*/*.parquet"))
    probed = [
        f
        for f in all_files
        if int(f.split("cell=")[1].split("/")[0]) in cells
    ]
    return probed, len(all_files)


def knn_ivf_probe(
    index_dir: str,
    queries: np.ndarray,
    query_ids: list,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Query a built IVF index: read ONLY the n_probe nearest cell dirs."""
    import os

    import ray.data as rd

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (q, n_probe)
    wanted = set(int(c) for row in probe_cells for c in row)
    files, _total = _probe_files(index_dir, wanted)
    if not files:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "rank"]).astype(
            {"query_id": "int64", "neighbor_id": "int64", "rank": "int64"}
        )
    pruned = rd.read_parquet(files, columns=[id_col, vec_col])
    return knn_brute(pruned, Q, query_ids, k=k, id_col=id_col, vec_col=vec_col)


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
    index_dir: str | None = None,
    cache_key: str | None = None,
) -> pd.DataFrame:
    """IVF approximate top-k: build (or reuse) the cell-partitioned index,
    then probe the ``n_probe`` nearest cells only.

    ``cache_key`` (e.g. the source path) derives a deterministic index
    dir under /tmp so repeated queries REUSE the build — "build once,
    probe many"; the stored meta (row count + cells) invalidates a stale
    index. Without either dir the build is ephemeral and removed after
    the probe (a leaked corpus-sized /tmp copy per call otherwise)."""
    import hashlib as _hl
    import json
    import os
    import shutil
    import tempfile

    ephemeral = False
    if index_dir is None:
        if cache_key is not None:
            tag = _hl.sha1(f"{cache_key}|{n_cells}|{id_col}|{vec_col}".encode()).hexdigest()[:16]
            index_dir = os.path.join("/tmp", "bbcrawl_ivf", tag)
        else:
            index_dir = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
            ephemeral = True

    derived = ephemeral or cache_key is not None

    def _index_valid() -> bool:
        meta_path = os.path.join(index_dir, "meta.json")
        if not os.path.exists(meta_path):
            return False
        try:
            meta = json.load(open(meta_path))
        except Exception:  # noqa: BLE001
            return False
        return (
            meta.get("n_cells") == n_cells
            and meta.get("n") == ds.count()
            and meta.get("probe") == _content_probe(ds, id_col, vec_col)
        )

    try:
        if not _index_valid():
            if os.path.isdir(index_dir) and os.listdir(index_dir) and not derived:
                # NEVER destroy a caller-supplied directory that is
                # not a matching index — it may hold anything
                raise ValueError(
                    f"index_dir {index_dir!r} exists but does not match "
                    "this dataset/params; clear it or pass a fresh path"
                )
            if cache_key is not None:
                # ATOMIC publish into the SHARED deterministic cache dir:
                # build in a unique sibling, take the tag's flock, and
                # swap with renames only. The canonical path always
                # points at nothing or a VALID index; a stale index is
                # moved ASIDE (atomic), never rmtree'd in place — a
                # process whose staleness check predates another's
                # publish can therefore never delete the live winner.
                # The aside keeps files intact for readers holding open
                # descriptors; a PATH-based reader racing the swap can
                # still hit FileNotFoundError (handled below with one
                # re-validate + retry). Aside dirs are reaped lazily.
                import fcntl
                import glob as _glob
                import time as _time

                parent = os.path.dirname(index_dir)
                os.makedirs(parent, exist_ok=True)
                tmp = tempfile.mkdtemp(prefix=".ivf_build_", dir=parent)
                build_ivf_index(
                    ds, tmp, n_cells, id_col=id_col, vec_col=vec_col, sample_rows=sample_rows
                )
                with open(index_dir + ".lock", "w") as lf:
                    fcntl.flock(lf, fcntl.LOCK_EX)
                    if _index_valid():
                        # someone equivalent published while we built
                        shutil.rmtree(tmp, ignore_errors=True)
                    else:
                        if os.path.isdir(index_dir):
                            aside = f"{index_dir}.stale-{os.getpid()}-{_time.time_ns()}"
                            os.rename(index_dir, aside)
                        os.rename(tmp, index_dir)
                for aside in _glob.glob(index_dir + ".stale-*"):
                    try:
                        if _time.time() - os.path.getmtime(aside) > 600:
                            shutil.rmtree(aside, ignore_errors=True)
                    except OSError:
                        pass
            else:
                if os.path.isdir(index_dir) and os.listdir(index_dir):
                    shutil.rmtree(index_dir, ignore_errors=True)
                build_ivf_index(
                    ds, index_dir, n_cells, id_col=id_col, vec_col=vec_col, sample_rows=sample_rows
                )
        try:
            return knn_ivf_probe(
                index_dir, queries, query_ids, k=k, n_probe=n_probe,
                id_col=id_col, vec_col=vec_col,
            )
        except FileNotFoundError:
            # a concurrent stale-swap moved listed files out from under
            # this path-based probe; the canonical path now holds the
            # (equivalent or fresher) published index — retry once
            return knn_ivf_probe(
                index_dir, queries, query_ids, k=k, n_probe=n_probe,
                id_col=id_col, vec_col=vec_col,
            )
    finally:
        if ephemeral:
            shutil.rmtree(index_dir, ignore_errors=True)
