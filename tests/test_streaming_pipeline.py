"""End-to-end streaming crowd pipeline ≡ batch crowd_alerts_pipeline
(SURVEY.md EP1 under Structured Streaming)."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.surveillance import (
    crowd_alerts_pipeline,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.pipeline import (
    streaming_crowd_alerts,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    stream_events,
)


def test_streaming_crowd_pipeline_matches_batch(spark, sf_dir):
    got: dict = {}

    def collect_batch(df, batch_id):
        for r in df.collect():
            got[(r.camera_id, r.frame_id)] = (r.n_persons, r.crowded)

    q = streaming_crowd_alerts(stream_events(spark, sf_dir), collect_batch)
    q.processAllAvailable()
    q.stop()

    want = {
        (r.camera_id, r.frame_id): (r.n_persons, r.crowded)
        for r in crowd_alerts_pipeline(spark, sf_dir).collect()
    }
    assert got == want
