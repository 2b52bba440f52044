"""Kafka source wiring for the event stream (SURVEY.md §1.2: the
production frame/event transport; the reference's webcam loop
main.py:143-149 maps to a readStream with per-camera keys).

The Kafka connector jar (spark-sql-kafka) is not in this container, so
the module is split along the testable seam:

- :func:`kafka_source_options` — pure option-dict construction
  (bootstrap servers, topic, offsets, backpressure cap).
- :func:`parse_kafka_payload` — DataFrame → DataFrame JSON decode of
  the Kafka ``value`` column into typed event rows. Works on ANY
  relation with a binary/string ``value`` column, so tests drive it
  with an in-memory frame and production drives it with the real
  ``format("kafka")`` load; the transformation under test is identical.
- :func:`kafka_events_stream` — the composition; raises a clear error
  if the connector is absent.

Backpressure: ``maxOffsetsPerTrigger`` bounds rows per micro-batch the
same way ``maxFilesPerTrigger`` bounds the file-source tests
(tests/test_streaming_backpressure.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JSON payload schema: event fields as producers serialize them
# (ts as ISO-8601 string; epoch-micros also accepted via fallback).
EVENT_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.StringType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Options for ``readStream.format("kafka")``, with the
    backpressure cap (maxOffsetsPerTrigger) made explicit — unbounded
    micro-batches are the first thing to fall over at 100 TB replay."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_kafka_payload(records: DataFrame) -> DataFrame:
    """Kafka record frame (key, value, topic, partition, offset,
    timestamp, ...) → typed event rows.

    ``value`` is cast to string and JSON-decoded with an explicit
    schema (from_json; permissive — corrupt payloads yield a null
    struct, surfaced as ``corrupt = true`` rather than dropped, so the
    sink can route them to a dead-letter table). The Kafka ingest
    timestamp is kept as ``ingest_ts`` for end-to-end latency
    accounting; event time comes from the payload."""
    parsed = records.select(
        F.col("value").cast("string").alias("raw"),
        F.col("timestamp").alias("ingest_ts"),
    ).withColumn("payload", F.from_json(F.col("raw"), EVENT_PAYLOAD_SCHEMA))
    return parsed.select(
        F.col("payload.event_id").alias("event_id"),
        F.to_timestamp(F.col("payload.ts")).alias("ts"),
        F.col("payload.user_id").alias("user_id"),
        F.col("payload.event_type").alias("event_type"),
        F.col("payload.value").alias("value"),
        F.col("payload.props").alias("props"),
        F.col("ingest_ts"),
        # PERMISSIVE from_json yields an all-null struct (not a null
        # struct) on corrupt input — detect via every-field-null
        (
            F.col("payload").isNull()
            | (
                F.col("payload.event_id").isNull()
                & F.col("payload.ts").isNull()
                & F.col("payload.user_id").isNull()
                & F.col("payload.event_type").isNull()
                & F.col("payload.value").isNull()
                & F.col("payload.props").isNull()
            )
        ).alias("corrupt"),
    )


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    **kwargs,
) -> DataFrame:
    """The production event stream: Kafka records → typed events.

    Requires the spark-sql-kafka connector on the classpath (not
    bundled in this container — tests cover the option construction
    and the payload decode seams instead)."""
    opts = kafka_source_options(bootstrap_servers, topic, **kwargs)
    try:
        raw = spark.readStream.format("kafka").options(**opts).load()
    except Exception as exc:  # connector jar absent
        raise NotImplementedError(
            "spark-sql-kafka connector not available in this environment; "
            "add org.apache.spark:spark-sql-kafka-0-10 to spark.jars.packages"
        ) from exc
    return parse_kafka_payload(raw)
