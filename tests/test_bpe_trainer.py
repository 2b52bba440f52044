"""BPE trainer: merge-sequence parity with a pure-Python reference
implementation of classic subword-NMT training (same marker, same
count-desc/pair-asc tiebreak, same greedy non-overlapping merge), on
the Sennrich-style toy corpus and on sf0.001 testdata; segment_expr
must reproduce the trainer's own final segmentation.
"""

from __future__ import annotations

from collections import Counter

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.bpe_trainer import (
    EOW,
    segment_expr,
    train_bpe,
)


def _ref_merge_word(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_train(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += word_counts[w]
        if not pair_counts:
            break
        (a, b), _c = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b))
        vocab = {w: _ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges, vocab


TOY = ["low low low", "lower lower", "newest newest newest", "widest"]


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame([(t,) for t in TOY], "text string")


def test_toy_corpus_matches_reference(spark, toy_docs):
    words = Counter(w for t in TOY for w in t.split())
    want_merges, want_vocab = _ref_train(dict(words), 12)
    got_merges, got_vocab = train_bpe(toy_docs, n_merges=12)
    assert got_merges == want_merges
    got = {r["w"]: list(r["syms"]) for r in got_vocab.collect()}
    assert got == want_vocab


def test_testdata_matches_reference(spark, sf_dir):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    words = Counter(
        w
        for r in docs.select("text").collect()
        for w in r["text"].strip().split(" ")
    )
    want_merges, _ = _ref_train(dict(words), 8)
    got_merges, got_vocab = train_bpe(docs, n_merges=8)
    assert got_merges == want_merges
    # every word's symbols concatenate back to word + marker
    for r in got_vocab.collect():
        assert "".join(r["syms"]) == r["w"] + EOW


def test_segment_expr_matches_training_vocab(spark, toy_docs):
    from pyspark.sql import functions as F

    merges, vocab = train_bpe(toy_docs, n_merges=12)
    seg = vocab.select(
        "w", "syms", segment_expr(F.col("w"), merges).alias("re_syms")
    )
    for r in seg.collect():
        assert list(r["re_syms"]) == list(r["syms"]), r["w"]
