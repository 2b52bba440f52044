"""Inference surface + idempotent sink tests (SURVEY.md §7.3 steps 6-7)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.inference import (
    make_stub_scorer,
    scores_udf,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.sinks import (
    IdempotentAlertSink,
    alert_stream,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    stream_events,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful import (
    streaming_rising_edges,
)


def test_stub_scorer_deterministic_shapes():
    model = make_stub_scorer(n_classes=5)
    x = np.arange(12, dtype="float32").reshape(3, 4)
    out = model(x)
    assert out.shape == (3, 5)
    assert np.array_equal(out, model(x))


def test_predict_batch_udf_end_to_end(spark):
    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(50)], "id long, feat array<float>"
    )
    udf = scores_udf(n_classes=4, batch_size=16)
    out = df.withColumn("scores", udf(F.col("feat"))).collect()
    assert all(len(r.scores) == 4 for r in out)
    # executor-side model must agree with a driver-side stub
    model = make_stub_scorer(n_classes=4)
    want = model(np.array([[0.0, 1.0]], dtype="float32"))[0]
    got = next(r.scores for r in out if r.id == 0)
    assert np.allclose(got, want, atol=1e-9)


def test_idempotent_alert_sink(spark, sf_dir):
    sink = IdempotentAlertSink()
    q = alert_stream(streaming_rising_edges(stream_events(spark, sf_dir)), sink)
    q.processAllAvailable()
    q.stop()
    assert len(sink.fired) > 0
    assert len(sink.fired) == len(set(sink.fired))  # no double-fires
    # replaying the same keys must not re-fire
    n = len(sink.fired)
    sink((spark.createDataFrame([(u, e) for u, e in sink.fired[:3]], "user_id long, episode long")), 999)
    assert len(sink.fired) == n
