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
