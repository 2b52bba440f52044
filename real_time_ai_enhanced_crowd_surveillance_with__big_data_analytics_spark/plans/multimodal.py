"""Multimodal-column plans (north-star: binary payloads + typed
metadata + batched feature extraction; operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    FRAME_SIZE,
    FRAME_STRIDE,
    multimodal_features,
    video_frame_sample,
    with_binary_payload,
)
from ..sources.tables import load_table


def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Typed metadata over binary payloads: byte length, 8-byte header
    hex, pointer URI. Pure column expressions over BINARY — the scan
    never deserializes payloads it doesn't need (column pruning)."""
    docs = load_table(spark, "documents", sf)
    payloads = with_binary_payload(docs)
    return payloads.select(
        "doc_id",
        "payload_uri",
        F.length("payload").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 8))).alias("header_hex"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'blob://docs/' || CAST(doc_id AS VARCHAR) AS payload_uri,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(substr(text, 1, 8)))) AS header_hex
FROM documents
"""


def multimodal_features_q(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched feature extraction (stubbed decode). Deterministic
    byte-histogram features over the 8×8 padded byte image
    (operators/multimodal.py::decode_image); the first two histogram
    bins are SQL-expressible, so even the mapInPandas path gets a full
    oracle hash check."""
    docs = load_table(spark, "documents", sf)
    out = multimodal_features(docs)
    return out.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
    )


# the fake image = first 64 bytes of the payload, zero-padded to 64;
# histogram bins are 32 codes wide over [0,256); f_i = bin_count / 64.
MULTIMODAL_FEATURES_SQL = """
WITH codes AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         list_transform(generate_series(1, least(64, length(text))),
                        i -> ascii(substr(text, CAST(i AS INT), 1))) AS cs,
         64 - least(64, length(text)) AS pad
  FROM documents
)
SELECT doc_id, n_bytes,
       round((pad + len(list_filter(cs, x -> x < 32))) / 64.0, 6) AS f0,
       round(len(list_filter(cs, x -> x >= 32 AND x < 64)) / 64.0, 6) AS f1
FROM codes
"""


def video_frame_sample_q(spark: SparkSession, sf: str) -> DataFrame:
    """Every FRAME_STRIDE-th fixed-size frame per payload via
    mapInPandas (operators/multimodal.py::sample_frames). The chunk
    arithmetic is SQL-expressible, so the Python fan-out path gets a
    full oracle hash check — the pattern for verifying any future real
    demuxer against a relational spec."""
    docs = load_table(spark, "documents", sf)
    return video_frame_sample(docs)


VIDEO_FRAME_SAMPLE_SQL = f"""
WITH sized AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
)
SELECT doc_id,
       unnest(generate_series(
         0, CAST(ceil(n_bytes / {FRAME_SIZE}.0) AS BIGINT) - 1,
         {FRAME_STRIDE})) AS frame_idx,
       least({FRAME_SIZE},
             n_bytes - unnest(generate_series(
               0, CAST(ceil(n_bytes / {FRAME_SIZE}.0) AS BIGINT) - 1,
               {FRAME_STRIDE})) * {FRAME_SIZE}) AS frame_bytes
FROM sized
"""


MULTIMODAL_QUERIES = {
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
    "multimodal_features": (multimodal_features_q, MULTIMODAL_FEATURES_SQL),
    "video_frame_sample": (video_frame_sample_q, VIDEO_FRAME_SAMPLE_SQL),
}
