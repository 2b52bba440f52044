"""lexicon_sentiment: hand-computed parity on crafted docs (via a
temp-view override of the documents table is unnecessary — the pure
Column expression is testable directly) and non-degeneracy on the sf
corpus. Oracle parity at sf0.01 is the driver/check_oracle gate."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
    SENTIMENT_LEXICON,
    lexicon_sentiment,
)


def test_hand_computed_docs(spark, sf_dir, tmp_path, monkeypatch):
    crafted = spark.createDataFrame(
        [
            (1, "fast fast big"),        # +2 +2 +1 = +5, 3 hits
            (2, "slow line small slow"),  # -2 -1 -2 = -5, 3 hits
            (3, "fast slow"),             # net 0, 2 hits
            (4, "table scan join"),       # no hits
        ],
        "doc_id long, text string",
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (
        text as text_mod,
    )

    monkeypatch.setattr(
        text_mod, "load_table", lambda s, name, sf: crafted
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_hits"],
            r["valence"],
            r["label"],
        )
        for r in lexicon_sentiment(spark, sf_dir).collect()
    }
    assert got == {
        1: (3, 3, 5, "positive"),
        2: (4, 3, -5, "negative"),
        3: (2, 2, 0, "neutral"),
        4: (3, 0, 0, "neutral"),
    }


def test_sf_corpus_non_degenerate(spark, sf_dir):
    rows = lexicon_sentiment(spark, sf_dir).collect()
    labels = {r["label"] for r in rows}
    assert labels == {"positive", "negative", "neutral"}
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_tokens"]
        cap = max(abs(v) for v in SENTIMENT_LEXICON.values())
        assert abs(r["valence"]) <= cap * r["n_hits"]
