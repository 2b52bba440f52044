"""release_readiness: the one-row gate report must agree with each
component operator it composes (it CALLS them, so drift is
impossible by construction — this pins that property and the shape).
Oracle parity at sf0.01 is the driver/check_oracle gate.
"""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    dedup_minhash_lsh,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    contamination_check,
    k_anonymity_audit,
    quality_funnel,
    release_readiness,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_manifest_matches_components(spark, sf_dir):
    (row,) = release_readiness(spark, sf_dir).collect()
    assert row["n_documents"] == load_table(spark, "documents", sf_dir).count()
    funnel = {r["stage_no"]: r for r in quality_funnel(spark, sf_dir).collect()}
    assert row["n_funnel_survivors"] == funnel[4]["n_pass"]
    assert row["n_neardup_pairs"] == dedup_minhash_lsh(spark, sf_dir).count()
    assert (
        row["n_contaminated_pairs"]
        == contamination_check(spark, sf_dir).count()
    )
    risky = sum(
        1 for r in k_anonymity_audit(spark, sf_dir).collect() if r["at_risk"]
    )
    assert row["n_risky_qi_classes"] == risky
    # sanity: survivors never exceed the corpus
    assert 0 <= row["n_funnel_survivors"] <= row["n_documents"]
