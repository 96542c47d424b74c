"""Unit tests for text-analysis operators (pure, no Ray)."""

import pyarrow as pa

from bbcrawl_ray.stages import textops as T


def tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    t = T.add_token_counts(tbl(["a b  c", "", "  ", "don't stop-me 42!"]))
    assert t["n_tokens"].to_pylist() == [3, 0, 0, 3]
    # BPE-ish: don ' t stop - me 42 ! → 8
    assert t["n_subtokens"].to_pylist() == [3, 0, 0, 8]


def test_quality_counts_and_score():
    t = T.quality_score_batch(tbl(["The cat and the dog.", "1234!!!", ""]))
    assert t["n_alpha"].to_pylist() == [15, 0, 0]
    assert t["n_digit"].to_pylist() == [0, 4, 0]
    assert t["n_punct"].to_pylist() == [1, 3, 0]
    assert t["n_stopwords"].to_pylist() == [3, 0, 0]
    scores = t["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]  # clean English beats digit noise


def test_detect_lang():
    assert T.detect_lang("the cat is on the mat and it is happy") == "en"
    assert T.detect_lang("der Hund ist nicht mit der Katze") == "de"
    assert T.detect_lang("el perro que corre por la casa con una bola") == "es"
    assert T.detect_lang("你好世界") == "zh"
    assert T.detect_lang("zzz qqq") == "und"
    assert T.detect_lang("") == "und"


def test_fingerprint_deterministic():
    a = T.fingerprint("the quick brown fox jumps over the lazy dog")
    b = T.fingerprint("the quick brown fox jumps over the lazy dog")
    c = T.fingerprint("a completely different sentence here entirely now")
    assert a == b != c
    assert T.fingerprint("") == 0
    # min-window property: appending junk far away often preserves the min window
    d = T.fingerprint("the quick brown fox jumps over the lazy dog zzz yyy xxx")
    assert isinstance(d, int)


def test_fingerprint_batch_matches_scalar():
    import numpy as np

    texts = [
        "",
        "one",
        "two words",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog zzz yyy xxx " * 20,
        "exact five token window here",
        "six tokens in this one right",
        "unicode tökens ünd ßtuff 日本語 mixed in here too okay",
    ]
    batch = T.fingerprint_batch(texts)
    scalar = np.array([T.fingerprint(x) for x in texts], dtype=np.uint64)
    assert (batch == scalar).all()


def test_repetition_signals_scalar_parity():
    """Vectorized signals vs a straightforward per-doc Python reference."""
    import math

    import numpy as np
    import pyarrow as pa

    texts = [
        "a b a b c",
        "x x x x",
        "",
        "solo",
        "  leading and trailing  ",
        "tab\tand\nnewline separated toks",
        "p q r s t u v w",
        ("rep " * 50).strip(),
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = T.repetition_signals_batch(t).to_pandas()

    for i, txt in enumerate(texts):
        toks = txt.split()
        n = len(toks)
        row = out.iloc[i]
        assert row["n_tokens"] == n
        if n == 0:
            assert math.isnan(row["distinct_token_ratio"])
            assert math.isnan(row["top_token_fraction"])
        else:
            assert row["distinct_token_ratio"] == len(set(toks)) / n
            top = max(toks.count(x) for x in set(toks))
            assert row["top_token_fraction"] == top / n
        bigrams = [(toks[j], toks[j + 1]) for j in range(n - 1)]
        if not bigrams:
            assert math.isnan(row["distinct_bigram_ratio"])
        else:
            assert row["distinct_bigram_ratio"] == len(set(bigrams)) / len(bigrams)
    assert out["n_tokens"].dtype == np.int64


def test_repetition_signals_batch_boundary_independence():
    """Signals are per-doc: computing docs in one batch or two must agree
    (guards the flattened-array bigram masking at block boundaries)."""
    import pyarrow as pa

    texts = ["a b c a", "c a c a c", "b b"]
    whole = T.repetition_signals_batch(
        pa.table({"doc_id": [0, 1, 2], "text": texts})
    ).to_pandas()
    parts = [
        T.repetition_signals_batch(
            pa.table({"doc_id": [i], "text": [texts[i]]})
        ).to_pandas()
        for i in range(3)
    ]
    import pandas as pd

    pd.testing.assert_frame_equal(whole, pd.concat(parts, ignore_index=True))


def test_pack_sequences_invariants(ray_session, sf_dir):
    """Sequence packing: every row exactly seq_len ids; total packed
    tokens = total corpus tokens minus each shard's partial tail."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from bbcrawl_ray.pipelines import relops as R

    seq_len = 64
    ds = R.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    packed = T.pack_sequences(ds, seq_len=seq_len, n_shards=4).to_pandas()
    assert len(packed) > 0
    assert all(len(row) == seq_len for row in packed["token_ids"])
    # per-shard conservation: k = floor(shard_tokens / seq_len)
    total_tokens = (
        ds.map_batches(
            lambda t: pa.table(
                {"n": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["n"]
        .sum()
    )
    packed_tokens = len(packed) * seq_len
    assert packed_tokens <= total_tokens
    # the loss is bounded by shards * (seq_len - 1)
    assert total_tokens - packed_tokens < 4 * seq_len
    # deterministic: same input, same pack
    again = T.pack_sequences(ds, seq_len=seq_len, n_shards=4).to_pandas()
    a = sorted(map(tuple, packed["token_ids"]))
    b = sorted(map(tuple, again["token_ids"]))
    assert a == b
    # ids stay in the vocab space
    flat = np.concatenate([np.asarray(x) for x in packed["token_ids"]])
    assert flat.min() >= 0 and flat.max() < (1 << 16)


def test_pack_sequences_docs_touched_and_empty_shard(ray_session):
    """n_docs_touched counts docs whose span overlaps each sequence (not
    the shard total), and token-starved shards emit TYPED empty blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    # 3 docs x 30 tokens in ONE shard, seq_len 40: 90 tokens -> 2 seqs.
    # seq 0 = [0,40) spans docs 1-2; seq 1 = [40,80) spans docs 2-3.
    texts = [" ".join(f"w{d}t{i}" for i in range(30)) for d in range(3)]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": texts})
    )
    out = (
        T.pack_sequences(ds, seq_len=40, n_shards=1)
        .to_pandas()
        .sort_values("seq_index")
    )
    assert len(out) == 2
    assert out["n_docs_touched"].tolist() == [2, 2]
    # many shards + tiny corpus: some shards have < seq_len tokens and
    # must produce TYPED empties that concat cleanly with packed blocks
    sparse_ds = T.pack_sequences(ds, seq_len=20, n_shards=8)
    assert sparse_ds.schema() is not None
    sparse = sparse_ds.to_pandas()
    assert len(sparse) >= 1  # every doc (30 tokens) packs >= 1 seq of 20
    assert all(len(r) == 20 for r in sparse["token_ids"])
    flat = np.concatenate([np.asarray(x) for x in sparse["token_ids"]])
    assert len(flat) % 20 == 0
