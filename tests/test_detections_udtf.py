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


def test_udtf_route_matches_codegen_route(spark, sf_dir):
    raw = synthesize_raw(load_table(spark, "events", sf_dir))
    want = parse_detections(raw)
    got = parse_detections_via_udtf(spark, raw)
    assert got.columns == want.columns
    assert _rel(got) == _rel(want)
    # the gate filtered something (the parity isn't vacuous)
    assert 0 < got.count() < raw.count()
