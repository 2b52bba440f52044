"""weak_label_vote: hand-computed label-matrix diagnostics on a
crafted 4-document corpus (one doc per vote pattern — unanimous keep,
unanimous drop, abstain-heavy, conflicted). Oracle parity at sf0.01 is
the driver/check_oracle gate; this pins the vote semantics themselves.
"""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    weak_label_vote,
)


def _mk(tokens: list[str]) -> str:
    return " ".join(tokens)


# votes per doc (v_length, v_lang, v_stopword, v_distinct) -> consensus:
#   A (+1,+1,+1,+1) -> +1      B (-1,-1,-1,-1) -> -1
#   C ( 0,+1, 0, 0) -> +1      D (-1,+1,+1,+1) -> +1  (conflicted)
DOCS = [
    # A: 20 distinct non-stopword tokens, n_chars=200, en
    (0, _mk([f"word{i:02d}" for i in range(20)]), "en", "src0", 200),
    # B: 4 stopword tokens, 1 distinct, n_chars=10, de
    (1, _mk(["the"] * 4), "de", "src0", 10),
    # C: 20 tokens, 3 stopwords, 8 distinct, n_chars=100, en
    (
        2,
        _mk(
            ["the", "the", "a"]
            + ["w1"] * 3 + ["w2"] * 3 + ["w3"] * 3
            + ["w4"] * 3 + ["w5"] * 3 + ["w6"] * 2
        ),
        "en",
        "src1",
        100,
    ),
    # D: 5 distinct non-stopword tokens, n_chars=30, en
    (3, _mk(["alpha", "beta", "gamma", "delta", "eps"]), "en", "src1", 30),
]

EXPECT = {
    # lf: (n_pos, n_neg, coverage, n_overlap, n_conflict, agree_rate)
    "lf_length": (1, 2, 0.75, 3, 1, 0.666667),
    "lf_lang": (3, 1, 1.0, 3, 1, 1.0),
    "lf_stopword": (2, 1, 0.75, 3, 1, 1.0),
    "lf_distinct": (2, 1, 0.75, 3, 1, 1.0),
    "consensus": (3, 1, 1.0, 0, 0, 1.0),
}


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("weaklabel_sf")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_weak_label_vote_hand_computed(spark, crafted_sf):
    got = {
        r["lf"]: (
            r["n_pos"],
            r["n_neg"],
            r["coverage"],
            r["n_overlap"],
            r["n_conflict"],
            r["agree_rate"],
        )
        for r in weak_label_vote(spark, crafted_sf).collect()
    }
    assert got == EXPECT


def test_weak_label_vote_invariants_on_testdata(spark, sf_dir):
    rows = {r["lf"]: r for r in weak_label_vote(spark, sf_dir).collect()}
    assert set(rows) == set(EXPECT)
    for lf, r in rows.items():
        voted = r["n_pos"] + r["n_neg"]
        # conflicts only happen where another LF also voted
        assert r["n_conflict"] <= r["n_overlap"] <= voted
        assert 0.0 <= r["coverage"] <= 1.0
        if r["agree_rate"] is not None:
            assert 0.0 <= r["agree_rate"] <= 1.0
    # lf_lang never abstains -> full coverage
    assert rows["lf_lang"]["coverage"] == 1.0
