"""Stream-stream interval join (SURVEY.md §2.9 extension): the same
click↔purchase pairing runs as a batch join and as a watermarked
stream-stream join over the replayed events table, and must produce
identical pairs (Structured Streaming's batch/stream unification)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    click_purchase_pairs,
    click_purchase_pairs_outer,
    run_to_memory,
    stream_events,
)

WINDOW_S = 1800


def _split(events):
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return purchases, clicks


def test_stream_stream_join_matches_batch(spark, sf_dir):
    batch_events = load_table(spark, "events", sf_dir)
    bp, bc = _split(batch_events)
    expected = sorted(
        (r.user_id, r.purchase_id, r.click_id)
        for r in click_purchase_pairs(bp, bc, WINDOW_S).collect()
    )
    assert expected, "fixture must produce at least one pair"

    sp, sc = _split(stream_events(spark, sf_dir))
    q = run_to_memory(
        click_purchase_pairs(sp, sc, WINDOW_S), "ss_join_pairs"
    )
    try:
        got = sorted(
            (r.user_id, r.purchase_id, r.click_id)
            for r in spark.table("ss_join_pairs").collect()
        )
    finally:
        q.stop()
    assert got == expected


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, sf_dir
):
    """The left-outer form must (a) emit the SAME matched pairs as the
    batch inner join, and (b) emit one NULL-click row per unmatched
    purchase once the watermark proves no click can still match — for
    purchases near the stream's end the watermark never advances far
    enough, so the assertion splits on the decidability horizon."""
    batch_events = load_table(spark, "events", sf_dir)
    bp, bc = _split(batch_events)
    matched = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in click_purchase_pairs(bp, bc, WINDOW_S).collect()
    }
    matched_purchases = {pid for _, pid, _ in matched}
    all_purchases = {
        (r.purchase_id, r.p_ts) for r in bp.collect()
    }
    unmatched = {
        pid for pid, _ in all_purchases if pid not in matched_purchases
    }
    assert unmatched, "fixture must leave some purchases clickless"

    sp, sc = _split(stream_events(spark, sf_dir))
    q = run_to_memory(
        click_purchase_pairs_outer(sp, sc, WINDOW_S), "ss_outer_pairs"
    )
    try:
        rows = spark.table("ss_outer_pairs").collect()
    finally:
        q.stop()
    got_matched = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in rows
        if r.click_id is not None
    }
    got_null = {r.purchase_id for r in rows if r.click_id is None}
    assert got_matched == matched
    # soundness: a null row must be a genuinely unmatched purchase, and
    # plenty must have emitted (eviction — hence null emission — only
    # happens in a batch AFTER the watermark passes, so the replay's
    # tail chunk stays undecided forever; exact completeness is pinned
    # on the controlled chunk harness below, where a later chunk exists)
    assert got_null <= unmatched
    assert len(got_null) >= len(unmatched) // 2
    assert all_purchases  # non-vacuous


def test_left_outer_null_emission_is_exact_on_controlled_chunks(
    spark, tmp_path
):
    """Chunk-controlled completeness: with later chunks driving the
    watermark past the decision horizon AND a subsequent batch to apply
    the eviction, the null set is EXACTLY the unmatched purchases."""
    import datetime as dt
    import os

    from conftest import events_chunk_schema, write_events_chunk

    T0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # purchases have value >= 200, clicks < 200 (the chunk schema has
    # no event_type column; the threshold split mirrors rising-edge
    # tests). P#1 (user 1) gets a click 10 min later; P#2 (user 2)
    # never matches.
    write_events_chunk(
        spark,
        src,
        "f1",
        [
            (1, 101, 250.0, T0 + dt.timedelta(hours=1)),
            (1, 11, 50.0, T0 + dt.timedelta(hours=1, minutes=10)),
            (2, 102, 250.0, T0 + dt.timedelta(hours=2)),
        ],
    )
    # f2 advances the watermark far past P#2 + window; f3 triggers the
    # batch in which f2's watermark actually evicts (and decides) P#2.
    # BOTH sides need late rows: the global watermark is the MIN of the
    # two inputs' watermarks (multipleWatermarkPolicy=min), so a
    # click-only chunk would leave the purchase-side watermark at zero
    write_events_chunk(
        spark,
        src,
        "f2",
        [
            (8, 900, 50.0, T0 + dt.timedelta(hours=30)),
            (9, 950, 250.0, T0 + dt.timedelta(hours=31)),
        ],
    )
    write_events_chunk(
        spark,
        src,
        "f3",
        [
            (8, 901, 50.0, T0 + dt.timedelta(hours=60)),
            (9, 951, 250.0, T0 + dt.timedelta(hours=61)),
        ],
    )
    stream = (
        spark.readStream.schema(events_chunk_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    purchases = stream.filter(F.col("value") >= 200).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = stream.filter(F.col("value") < 200).select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    q = run_to_memory(
        click_purchase_pairs_outer(purchases, clicks, WINDOW_S),
        "ss_outer_exact",
    )
    try:
        rows = spark.table("ss_outer_exact").collect()
    finally:
        q.stop()
    matched = {
        (r.purchase_id, r.click_id) for r in rows if r.click_id is not None
    }
    nulls = {r.purchase_id for r in rows if r.click_id is None}
    assert matched == {(101, 11)}
    # P#2 is decided and MUST emit its null; the matched P#1 must not.
    # The far-future watermark-driver purchases (950/951) may or may
    # not have been decided by a trailing no-data batch — either is
    # legal, so they're excluded from the exactness claim.
    assert 102 in nulls
    assert nulls <= {102, 950, 951}
