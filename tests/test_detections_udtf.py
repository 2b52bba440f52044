"""UDTF route (operators/detections_udtf.py) must produce exactly the
codegen route's relation — either parser can serve the pipeline."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.detections import (
    parse_detections,
    synthesize_raw,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.detections_udtf import (
    parse_detections_via_udtf,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _rel(df):
    return {tuple(r) for r in df.collect()}


def test_rounding_matches_spark_half_up(spark):
    # Python round() is half-to-even; Spark F.round is decimal HALF_UP.
    # 0.1015625 = 13/128 is exactly representable and ties at 6 dp —
    # the case that separates the two
    from pyspark.sql import functions as F

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.detections_udtf import (
        _round_half_up6,
    )

    ties = [0.1015625, 0.5156255, 0.9843755, 0.2031255, 2.674999999999999]
    want = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in ties], "v double")
        .select(F.round("v", 6).alias("r"))
        .collect()
    ]
    assert [_round_half_up6(v) for v in ties] == want
    assert round(0.1015625, 6) != _round_half_up6(0.1015625)  # the trap


def test_udtf_route_matches_codegen_route(spark, sf_dir):
    raw = synthesize_raw(load_table(spark, "events", sf_dir))
    want = parse_detections(raw)
    got = parse_detections_via_udtf(spark, raw)
    assert got.columns == want.columns
    assert _rel(got) == _rel(want)
    # the gate filtered something (the parity isn't vacuous)
    assert 0 < got.count() < raw.count()
