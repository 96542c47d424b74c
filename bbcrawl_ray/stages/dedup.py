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

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(ds: Dataset, key: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct ``key``: (doc_id = min id, dup_count)."""
    return (
        ds.groupby(key)
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="dup_count"))
        .drop_columns([key])
    )


def exact_dedup_keep_first(ds: Dataset, key: str = "text") -> Dataset:
    """Keep the full first row (min doc_id) per distinct key."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")


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


def band_rows(
    doc_id, sig: np.ndarray, bands: int = 16, rows_per_band: int = 4
) -> list[tuple]:
    """(doc_id, band_id, band_hash) rows for the LSH groupby."""
    out = []
    for b in range(bands):
        chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
        bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        out.append((doc_id, b, int.from_bytes(bh, "little")))
    return out


class MinHashStage:
    """map_batches fn: (id_col, text_col) → exploded LSH band rows.

    Signatures are computed per doc (numpy over 64 perms at once);
    output is the small (doc_id, band_id, band_hash) table — the text
    and signatures never enter the shuffle.
    """

    def __init__(self, id_col="doc_id", text_col="text", k=5, bands=16, rows_per_band=4):
        self.id_col, self.text_col = id_col, text_col
        self.k, self.bands, self.rpb = k, bands, rows_per_band

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        texts = t[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, txt in zip(ids, texts):
            sig = minhash_signature(char_shingles(txt, self.k))
            for did, b, bh in band_rows(i, sig, self.bands, self.rpb):
                out_id.append(did)
                out_band.append(b)
                out_hash.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.uint64()),
            }
        )


_PAIR_CAP = 200  # per-bucket cap guards a degenerate bucket's O(n²) blowup


def _shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Pairs for every ≥2-member bucket inside one hash shard — a pandas
    groupby over the shard (vectorized), not a per-bucket UDF call."""
    left, right = [], []
    multi = g.groupby(["band_id", "band_hash"])["doc_id"]
    for _, ids in multi:
        if len(ids) < 2:
            continue
        u = np.sort(ids.unique())[:_PAIR_CAP]
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                left.append(u[i])
                right.append(u[j])
    df = pd.DataFrame({"left_id": left, "right_id": right})
    return df.drop_duplicates()


def minhash_candidates(ds: Dataset, shards: int = 32, **stage_kw) -> Dataset:
    """documents → distinct candidate pairs from banded minhash LSH.

    Two-level scheme: band rows shuffle on a COARSE shard key
    (hash(band) % shards) so the grouped stage runs one vectorized
    pandas groupby per shard instead of one Python call per bucket —
    buckets are almost all singletons, and per-group UDF overhead at
    ~1M buckets would dwarf the real work.
    """
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


class JaccardVerify:
    """Broadcast-join verify: candidates + text lookup → jaccard ≥ τ.

    ``texts_ref`` is a ray.put({doc_id: text}) broadcast — the verify
    stage re-shingles only candidate docs (tiny vs corpus).
    """

    def __init__(self, texts_ref, k: int = 5, threshold: float = 0.8):
        import ray

        self.texts = ray.get(texts_ref)
        self.k = k
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        lefts = t["left_id"].to_pylist()
        rights = t["right_id"].to_pylist()
        keep_l, keep_r, jac = [], [], []
        cache: dict = {}

        def sh(d):
            if d not in cache:
                cache[d] = char_shingles(self.texts.get(d, ""), self.k)
            return cache[d]

        for l, r in zip(lefts, rights):
            a, b = sh(l), sh(r)
            if len(a) == 0 and len(b) == 0:
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            j = inter / max(1, union)
            if j >= self.threshold:
                keep_l.append(l)
                keep_r.append(r)
                jac.append(j)
        return pa.table(
            {
                "left_id": pa.array(keep_l),
                "right_id": pa.array(keep_r),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )


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


def minhash_dedup(
    ds: Dataset, id_col="doc_id", text_col="text", k=5, threshold=0.8
) -> pd.DataFrame:
    """Full near-dup pipeline → (doc_id, cluster_id) for clustered docs.

    Scale posture: only CANDIDATE docs' texts are broadcast to the
    verify stage — LSH prunes the corpus to the (tiny) candidate set
    first, then a broadcast semi-join pulls just those texts. The full
    corpus text never leaves its blocks and never lands on the driver.
    """
    import ray

    cands = minhash_candidates(ds, id_col=id_col, text_col=text_col, k=k).materialize()
    cand_ids: set = set()
    for b in cands.iter_batches(batch_format="pyarrow"):
        cand_ids.update(b["left_id"].to_pylist())
        cand_ids.update(b["right_id"].to_pylist())
    if not cand_ids:
        return pd.DataFrame({"doc_id": [], "cluster_id": []})
    id_set_ref = ray.put(pa.array(sorted(cand_ids)))

    def keep_candidates(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=ray.get(id_set_ref)))

    texts: dict = {}
    for b in (
        ds.select_columns([id_col, text_col])
        .map_batches(keep_candidates, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        texts.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    texts_ref = ray.put(texts)
    verified = cands.map_batches(
        JaccardVerify,
        fn_constructor_args=(texts_ref, k, threshold),
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
    )
    pairs = verified.to_pandas().drop_duplicates(["left_id", "right_id"])
    return connected_components(pairs)


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


def add_simhash(t: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [simhash64(x) for x in t[text_col].to_pylist()]
    tbl = t.append_column("simhash", pa.array(hs, pa.uint64()))
    # 8 bands × 8 bits: two hashes within hamming ≤ 7 are GUARANTEED to
    # share at least one band (pigeonhole) — candidate recall, not luck
    for band in range(8):
        vals = [(h >> (band * 8)) & 0xFF for h in hs]
        tbl = tbl.append_column(f"sim_band{band}", pa.array(vals, pa.int32()))
    return tbl


def simhash_near_dup(ds: Dataset, id_col="doc_id", text_col="text", max_hamming=3) -> Dataset:
    """Near-dup pairs by simhash: candidates share ≥1 of 8 8-bit bands
    (guaranteed for hamming ≤ 7), verified by popcount."""
    with_hash = ds.map_batches(
        lambda t: add_simhash(t, text_col), batch_format="pyarrow"
    ).select_columns([id_col, "simhash"] + [f"sim_band{b}" for b in range(8)])

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        left, right, dist = [], [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(hs[i + 1 :], hs[i])
            d = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(d <= max_hamming)[0]:
                left.append(ids[i])
                right.append(ids[i + 1 + j])
                dist.append(int(d[j]))
        return pd.DataFrame({"left_id": left, "right_id": right, "hamming": dist})

    parts = []
    for band in range(8):
        parts.append(
            with_hash.groupby(f"sim_band{band}").map_groups(
                pairs_in_bucket, batch_format="pandas"
            )
        )
    allpairs = parts[0]
    for p in parts[1:]:
        allpairs = allpairs.union(p)
    return allpairs.groupby(["left_id", "right_id"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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
