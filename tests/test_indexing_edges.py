"""Boundary-value tests for the indexing plans: chunk windows at the
exact size/stride edges, and containment semantics on a constructed
subset-inclusion corpus (the case Jaccard misses by design)."""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    JACCARD_THRESHOLD,
    dedup_containment,
    dedup_ngram_jaccard,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.indexing import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    _chunk_rows,
)


@pytest.mark.parametrize(
    "n",
    [1, CHUNK_TOKENS - 1, CHUNK_TOKENS, CHUNK_TOKENS + 1,
     CHUNK_TOKENS + CHUNK_STRIDE - 1, CHUNK_TOKENS + CHUNK_STRIDE,
     CHUNK_TOKENS + CHUNK_STRIDE + 1, 3 * CHUNK_STRIDE + CHUNK_TOKENS],
)
def test_chunk_boundaries_exact(spark, n):
    text = " ".join(f"t{i}" for i in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(_chunk_rows(docs).collect(), key=lambda r: r["chunk_id"])
    # expected chunk count: 1 + ceil(max(n-C,0)/S)
    want_chunks = 1 + max(0, -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE))
    assert len(rows) == want_chunks
    # every chunk non-empty, tokens reconstruct exactly, last reaches n
    for k, r in enumerate(rows):
        assert r["start_tok"] == k * CHUNK_STRIDE
        toks = r["chunk_text"].split(" ")
        assert toks == [f"t{i}" for i in range(r["start_tok"], r["start_tok"] + r["n_chunk_tokens"])]
        assert 1 <= r["n_chunk_tokens"] <= CHUNK_TOKENS
    assert rows[-1]["start_tok"] + rows[-1]["n_chunk_tokens"] == n


def test_text_normalize_idempotent_and_unifies_renderings(spark, tmp_path):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
        text_normalize,
    )

    a = "Spark  Tables, JOIN window!"
    b = "spark tables join   window"
    df = spark.createDataFrame(
        [
            (0, a, "en", "s", len(a)),
            (1, b, "en", "s", len(b)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "norm")
    import os

    os.makedirs(sf)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = {r["doc_id"]: r for r in text_normalize(spark, sf).collect()}
    # two byte-different renderings canonicalize to one fingerprint
    assert rows[0]["norm_text"] == rows[1]["norm_text"] == "spark tables join window"
    assert rows[0]["norm_fp"] == rows[1]["norm_fp"]
    assert rows[0]["changed"] and rows[1]["changed"]
    # idempotence: normalizing the normalized text is a no-op
    df2 = spark.createDataFrame(
        [(2, rows[0]["norm_text"], "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf2 = str(tmp_path / "norm2")
    os.makedirs(sf2)
    df2.coalesce(1).write.parquet(f"{sf2}/documents.parquet")
    again = text_normalize(spark, sf2).collect()[0]
    assert not again["changed"] and again["bytes_removed"] == 0


def _mini_corpus(spark, tmp_path):
    short = " ".join(f"w{i}" for i in range(10))
    long_ = short + " " + " ".join(f"x{i}" for i in range(90))
    other = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (0, short, "en", "s", len(short)),
            (1, long_, "en", "s", len(long_)),
            (2, other, "en", "s", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "mini")
    import os

    os.makedirs(sf)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_containment_catches_subset_jaccard_misses(spark, tmp_path):
    sf = _mini_corpus(spark, tmp_path)
    pairs = {(r["ia"], r["ib"]): r for r in dedup_containment(spark, sf).collect()}
    # doc 0 (10 tokens → 8 trigrams) is wholly inside doc 1: full
    # containment on the short side
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["contain_a"] == 1.0
    # jaccard for the same pair is 8/(8+99-8) ≈ 0.08 — below threshold,
    # so the symmetric detector misses exactly this pair
    jacc = {(r["ia"], r["ib"]) for r in dedup_ngram_jaccard(spark, sf).collect()}
    assert (0, 1) not in jacc
    assert JACCARD_THRESHOLD > 8 / 99
    # unrelated doc pairs appear in neither
    assert (0, 2) not in pairs and (1, 2) not in pairs
