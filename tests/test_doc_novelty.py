"""doc_novelty: hand-computed df=1 shingle shares on a crafted corpus
(identical twins, a partial mosaic, a fully-unique doc, a too-short
doc). Oracle parity at sf0.01 is the driver/check_oracle gate; this
pins the shingle-df accounting itself.
"""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    doc_novelty,
)

DOCS = [
    # X and Y: identical -> every shingle df>=2 -> novelty 0
    (0, "a b c d e", "en", "src0", 9),
    (1, "a b c d e", "en", "src0", 9),
    # W: shares only the leading trigram (abc, df=3); bcx/cxy are df=1
    (2, "a b c x y", "en", "src0", 9),
    # Z: fully unique -> novelty 1
    (3, "p q r s", "en", "src1", 7),
    # V: 2 tokens -> no trigram shingles -> absent from output
    (4, "a b", "en", "src1", 3),
]

EXPECT = {
    0: (3, 0, 0.0),
    1: (3, 0, 0.0),
    2: (3, 2, 0.666667),
    3: (2, 2, 1.0),
}


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("novelty_sf")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_doc_novelty_hand_computed(spark, crafted_sf):
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in doc_novelty(spark, crafted_sf).collect()
    }
    assert got == EXPECT  # doc 4 absent: no shingles


def test_doc_novelty_bounds_on_testdata(spark, sf_dir):
    rows = doc_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0.0 <= r["novelty"] <= 1.0
