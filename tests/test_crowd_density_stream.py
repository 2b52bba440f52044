"""Streaming crowd density (streaming/crowd_density.py): stream ==
batch parity over the ordered replay, hot-flag semantics, exact cents."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.crowd_density import (
    batch_crowd_density,
    streaming_crowd_density,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)


def _key(r):
    return (r.win_start, r.cell_x, r.cell_y)


def test_stream_matches_batch(spark, sf_dir):
    q = run_to_memory(
        streaming_crowd_density(stream_events(spark, sf_dir)),
        "density_out",
        output_mode="complete",
    )
    try:
        got = {
            _key(r): (r.n_events, r.value_cents, r.n_errors, r.hot)
            for r in spark.sql("SELECT * FROM density_out").collect()
        }
    finally:
        q.stop()
    want = {
        _key(r): (r.n_events, r.value_cents, r.n_errors, r.hot)
        for r in batch_crowd_density(
            load_table(spark, "events", sf_dir)
        ).collect()
    }
    assert got == want
    assert want, "parity over an empty result proves nothing"
    # the windows must genuinely split the data (multiple days) and the
    # hot flag must fire both ways, or the assertions are vacuous
    assert len({k[0] for k in want}) > 1
    flags = {v[3] for v in want.values()}
    assert flags == {True, False}


def test_cents_reaggregate_to_table_total(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql import functions as F

    cells = batch_crowd_density(ev)
    assert cells.agg(F.sum("value_cents")).first()[0] == ev.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).first()[0]
