"""Prefix-filtered exact containment join: bit-identical to the exact
anchor (losslessness of the asymmetric prefix filter — the smaller
doc's ``s − ⌈t·s⌉ + 1`` rarest shingles must intersect any qualifying
partner) while probing strictly fewer postings pairs than the full
self-join. Oracle parity at sf0.01 (against the anchor's own SQL) is
the driver/check_oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    _containment_prefix_candidates,
    _shingle_postings,
    _shingle_sets,
    dedup_containment,
    dedup_containment_prefix,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_identical_to_exact_anchor(spark, sf_dir):
    want = {
        (r["ia"], r["ib"], r["shared"], r["contain_a"], r["contain_b"])
        for r in dedup_containment(spark, sf_dir).collect()
    }
    got = {
        (r["ia"], r["ib"], r["shared"], r["contain_a"], r["contain_b"])
        for r in dedup_containment_prefix(spark, sf_dir).collect()
    }
    assert got == want
    assert got  # the corpus actually has containment pairs to compare


def test_prefix_join_prunes_candidates(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    postings = _shingle_postings(docs)
    n_prefix = _containment_prefix_candidates(_shingle_sets(docs)).count()
    a = postings.select(F.col("doc_id").alias("ia"), "sid")
    b = postings.select(
        F.col("doc_id").alias("ib"), F.col("sid").alias("sidb")
    )
    n_full = (
        a.join(
            b, (F.col("sid") == F.col("sidb")) & (F.col("ia") < F.col("ib"))
        )
        .select("ia", "ib")
        .distinct()
        .count()
    )
    n_answers = dedup_containment_prefix(spark, sf_dir).count()
    # lossless: every true pair is a candidate; useful: strictly fewer
    # candidates than the full self-join examines
    assert n_answers <= n_prefix < n_full
